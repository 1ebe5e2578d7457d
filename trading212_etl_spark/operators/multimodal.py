"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The container ships exactly one codec — the stdlib ``wave`` module —
so the AUDIO path is fully real (``synth_wav_payload`` encodes PCM16
WAV, ``audio_features`` parses it back and computes time-domain DSP,
DuckDB-oracled end to end). The image/video *decode kernels* remain
deterministic fakes (clearly marked — swap in PIL/ffmpeg in a real
deployment). Everything Spark-side is real and tested throughout:
binary schema, Arrow batch transfer, UDF signatures,
partition-parallel execution, metadata struct shape.

Scale design: decode is the textbook Pandas-UDF case — per-row Python
would serialize row-by-row; ``mapInPandas`` moves whole Arrow batches
into one Python worker per partition, amortizing serde. Partitioning
stays whatever the upstream scan had (no shuffle); heavy decode is
CPU-bound so ``spark.sql.files.maxPartitionBytes`` sizes the work
units.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# metadata struct every decoded asset carries
IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column. In production this is the
    image/audio payload read from object storage; here the document
    text's UTF-8 bytes stand in (deterministic, schema-identical).

    Deliberately NOT fanned out: each mapInPandas partition forks a
    Python worker (pandas import + Arrow setup, ~0.4 s each), so at
    bench scale 32 near-empty partitions cost more than one full one
    (measured 6x slower). At 100 TB the scan's own splits provide the
    parallelism and the per-worker cost amortizes."""
    return docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))


def decode_image_meta(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched decode: binary payload → typed metadata row.

    ``mapInPandas`` receives an iterator of pandas batches per
    partition; each batch is decoded in bulk and yielded with the
    pinned output schema — the pattern for any codec-style kernel
    (resize, frame-sample, spectrogram) over multimodal columns.

    Everything the kernel needs lives inside the closure: the driver
    process is the only place this package is importable (the driver
    injects it via sys.path), so Python workers must receive the UDF
    pickled by value, never by module reference.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def decode_image_bytes(payload: bytes) -> tuple[int, int, int, int, float]:
            # STUB decode kernel — deterministic fake. A real deployment
            # replaces this body with e.g. PIL.Image.open(io.BytesIO(p));
            # the container ships no codecs, so dims derive from byte
            # content and mean_intensity is the true byte mean.
            n = len(payload)
            width = 64 + (n % 640)
            height = 64 + ((n * 31) % 480)
            channels = 3
            mean_intensity = (sum(payload) / n) if n else 0.0
            return n, width, height, channels, mean_intensity

        for pdf in batches:
            meta = [decode_image_bytes(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                meta,
                columns=["n_bytes", "width", "height", "channels", "mean_intensity"],
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return binary_df.mapInPandas(decode, IMAGE_META_SCHEMA)


def synth_wav_payload(docs: DataFrame, sample_rate: int = 8000) -> DataFrame:
    """Deterministic synthetic PCM16 mono WAV corpus — REAL WAV
    encoding via the stdlib ``wave`` module (the only audio codec this
    container ships). Stands in for the object-storage audio scan of a
    production pipeline: doc ``d`` gets ``n = 256 + (d*37) % 128``
    samples, sample ``j`` = the ``j%8``-th 4-hex-char slice of
    ``md5(f"{d}:{j//8}")`` minus 32768 — an md5-keystream waveform
    both engines can regenerate, so downstream feature extraction is
    fully DuckDB-oracle-able (the same construction as the md5-mode
    MinHash signatures). Runs distributed in ``mapInPandas``; one md5
    digest yields 8 samples, so synthesis is ~n/8 digests per doc."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import io
        import wave

        import numpy as np

        def wav_bytes(doc_id: int) -> bytes:
            n = 256 + (doc_id * 37) % 128
            hexs = "".join(
                hashlib.md5(f"{doc_id}:{g}".encode()).hexdigest()
                for g in range((n + 7) // 8)
            )
            vals = np.array(
                [int(hexs[4 * j : 4 * j + 4], 16) - 32768 for j in range(n)],
                dtype="<i2",
            )
            buf = io.BytesIO()
            with wave.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(sample_rate)
                w.writeframes(vals.tobytes())
            return buf.getvalue()

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": [wav_bytes(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(synth, out_schema)


def audio_features(binary_df: DataFrame, n_bands: int = 4) -> DataFrame:
    """REAL audio feature extraction (no stub): parse the WAV
    container with the stdlib ``wave`` module — actual header +
    PCM16 frame decoding — then compute time-domain DSP features in
    numpy: per-band RMS energy (``n_bands`` equal time buckets),
    zero-crossing count, and peak amplitude. The binary→feature
    mapInPandas shape — the template for any featurization kernel; a
    production deployment swaps the feature block for a log-mel
    spectrogram (numpy rfft + mel filterbank) without touching the
    Spark plumbing.

    RMS is emitted RAW (unrounded): sum-of-squares stays exact in
    int64 (|s| ≤ 2^15, n ≤ 384 ⇒ ss < 2^39 < 2^53) and IEEE divide +
    sqrt are bit-identical across engines, so callers round once at
    the comparison edge (registry rounds to 4 dp)."""
    band_fields = [
        T.StructField(f"rms_b{b}", T.DoubleType()) for b in range(n_bands)
    ]
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("peak", T.IntegerType()),
            T.StructField("zero_crossings", T.IntegerType()),
            *band_fields,
        ]
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        def feats(payload: bytes) -> tuple:
            with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                rate = w.getframerate()
                nf = w.getnframes()
                raw = w.readframes(nf)
            v = np.frombuffer(raw, dtype="<i2").astype(np.int64)
            peak = int(np.abs(v).max()) if nf else 0
            zc = int(np.sum(v[1:] * v[:-1] < 0)) if nf > 1 else 0
            band = (np.arange(nf) * n_bands) // max(nf, 1)
            rms = []
            for b in range(n_bands):
                sel = v[band == b]
                ss = int(np.sum(sel * sel))
                rms.append(float(np.sqrt(ss / len(sel))) if len(sel) else 0.0)
            return (rate, nf, peak, zc, *rms)

        for pdf in batches:
            rows = [feats(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                rows,
                columns=[
                    "sample_rate",
                    "n_frames",
                    "peak",
                    "zero_crossings",
                    *[f"rms_b{b}" for b in range(n_bands)],
                ],
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return binary_df.mapInPandas(featurize, out_schema)


def frame_sample_stub(binary_df: DataFrame, every_n_bytes: int = 100) -> DataFrame:
    """STUB frame sampler: emits one 'frame' row per ``every_n_bytes``
    of payload (a real video pipeline emits one row per sampled frame
    with its own binary column). Demonstrates the 1→N mapInPandas
    shape (row explosion inside the Arrow batch)."""

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_byte", T.IntegerType()),
        ]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i, off in enumerate(range(0, len(payload), every_n_bytes)):
                    rows.append((doc_id, i, payload[off]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_byte"])

    return binary_df.mapInPandas(sample, schema)


def synth_bmp_payload(binary_docs: DataFrame) -> DataFrame:
    """Deterministic synthetic 24-bit BMP corpus — REAL BMP encoding
    (BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up rows padded to
    4 bytes, the actual on-disk format), no codec library needed: BMP
    is struct arithmetic. Doc ``d`` gets a ``(16 + d%16) ×
    (12 + (d*7)%12)`` grayscale image whose pixel ``i`` (row-major
    from the TOP) is byte ``i%16`` of ``md5(f"{d}:{i//16}")`` — the
    md5-keystream construction shared with synth_wav_payload, so
    downstream kernels are DuckDB-oracle-able. Distributed
    ``mapInPandas``; one digest yields 16 pixels."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    encode, _ = _bmp_codec()

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 16 + d % 16, 12 + (d * 7) % 12
                n = w * h
                raw = b"".join(
                    hashlib.md5(f"{d}:{g}".encode()).digest()
                    for g in range((n + 15) // 16)
                )[:n]
                gray = np.frombuffer(raw, dtype=np.uint8).reshape(h, w)
                payloads.append(encode(gray))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    return binary_docs.select("doc_id").mapInPandas(synth, out_schema)


def _bmp_codec():
    """24-bit BMP encoder/decoder pair, defined INSIDE a factory so
    kernel closures capture them BY VALUE (cloudpickle): Python
    workers cannot import this package (the driver injects it via
    sys.path — see decode_image_meta), so a module-level reference
    would die with ModuleNotFoundError on the executor."""

    def encode(gray) -> bytes:
        # real format: 54-byte header, rows padded to 4-byte
        # multiples, stored BOTTOM-UP per the spec
        import struct

        import numpy as np

        h, w = gray.shape
        row = ((w * 3 + 3) // 4) * 4
        size = 54 + row * h
        header = struct.pack(
            "<2sIHHIIiiHHIIiiII",
            b"BM", size, 0, 0, 54,          # file header
            40, w, h, 1, 24, 0, row * h,    # info header (BI_RGB)
            2835, 2835, 0, 0,
        )
        px = np.zeros((h, row), dtype=np.uint8)
        bgr = np.repeat(gray[:, :, None], 3, axis=2).reshape(h, w * 3)
        px[:, : w * 3] = bgr
        return header + px[::-1].tobytes()  # bottom-up row order

    def decode(payload: bytes):
        # parse headers, strip row padding, undo bottom-up order;
        # returns the grayscale (blue-channel) array
        import struct

        import numpy as np

        assert payload[:2] == b"BM", "not a BMP payload"
        off = struct.unpack_from("<I", payload, 10)[0]
        w, h = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        assert bpp == 24, f"expected 24-bit BMP, got {bpp}"
        row = ((w * 3 + 3) // 4) * 4
        px = np.frombuffer(payload, dtype=np.uint8, count=row * h, offset=off)
        px = px.reshape(h, row)[::-1]  # back to top-down
        return px[:, : w * 3].reshape(h, w, 3)[:, :, 0].copy()

    return encode, decode


# module-level aliases for tests and driver-side callers
_bmp_encode, _bmp_decode = _bmp_codec()


def resize_images(
    binary_df: DataFrame, target_w: int = 16, target_h: int = 12
) -> DataFrame:
    """REAL image resize (no stub): decode the BMP container,
    nearest-neighbor resample in numpy (``src = (dst · src_dim) //
    dst_dim`` — pure integer index math, so the DuckDB oracle can
    regenerate every sampled pixel), re-encode as BMP. Emits the
    resized binary plus verifiable facts: output dims, the exact
    re-encoded byte size (pins the row-padding layout), and the
    integer pixel sum of the resized image (pins the resample map and
    the container round-trip). The 1→1 binary-to-binary mapInPandas
    shape — the template for any re-encode kernel; swap the resample
    line for PIL/cv2 interpolation in a deployment with codecs."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("image", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_bytes", T.IntegerType()),
            T.StructField("pixel_sum", T.LongType()),
        ]
    )

    encode, decode = _bmp_codec()

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        xs = (np.arange(target_w)[None, :], np.arange(target_h)[:, None])

        def one(payload: bytes):
            gray = decode(bytes(payload))
            sh, sw = gray.shape
            out = gray[(xs[1] * sh) // target_h, (xs[0] * sw) // target_w]
            enc = encode(out.astype(np.uint8))
            return enc, len(enc), int(out.sum(dtype=np.int64))

        for pdf in batches:
            rows = [one(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "image": [r[0] for r in rows],
                    "width": target_w,
                    "height": target_h,
                    "n_bytes": [r[1] for r in rows],
                    "pixel_sum": [r[2] for r in rows],
                }
            )

    return binary_df.mapInPandas(resize, out_schema)
