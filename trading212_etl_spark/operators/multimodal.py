"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The container has no image/audio codecs, so the *decode kernels* are
deterministic fakes behind ``_decode_image_bytes`` (clearly marked —
swap in PIL/librosa/ffmpeg in a real deployment). Everything
Spark-side is real and tested: binary schema, Arrow batch transfer,
UDF signatures, partition-parallel execution, metadata struct shape.

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


def resize_stub(binary_df: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """STUB image resize: binary in → binary out with target-dim
    metadata (a real deployment swaps the kernel body for
    PIL ``Image.resize``; here the payload is deterministically
    truncated/cycled to w*h*3 bytes so downstream schema and sizing
    logic are real). The 1→1 binary-to-binary mapInPandas shape —
    the template for any re-encode kernel."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("image", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = target_w * target_h * 3

        def fake_resize(payload: bytes) -> bytes:
            # STUB kernel — deterministic fake: cycle payload bytes to
            # the target buffer size (real: decode + resample + encode)
            if not payload:
                return bytes(n_out)
            reps = n_out // len(payload) + 1
            return (payload * reps)[:n_out]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "image": [fake_resize(p) for p in pdf["payload"]],
                    "width": target_w,
                    "height": target_h,
                }
            )

    return binary_df.mapInPandas(resize, out_schema)


def audio_features_stub(binary_df: DataFrame, n_mels: int = 16) -> DataFrame:
    """STUB audio feature extraction: binary in → fixed-width float
    feature vector out (a real deployment computes a log-mel
    spectrogram via librosa/torchaudio; here bucketed byte means stand
    in, deterministically). The binary→vector mapInPandas shape — the
    template for any embedding/featurization kernel, output ready for
    the similarity operators (ArrayType(FloatType))."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("n_frames", T.IntegerType()),
        ]
    )

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def fake_mels(payload: bytes) -> list[float]:
            # STUB kernel — deterministic fake: per-bucket byte means
            if not payload:
                return [0.0] * n_mels
            step = max(len(payload) // n_mels, 1)
            return [
                float(sum(payload[i * step:(i + 1) * step]) / max(len(payload[i * step:(i + 1) * step]), 1))
                for i in range(n_mels)
            ]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "features": [fake_mels(p) for p in pdf["payload"]],
                    "n_frames": [max(len(p) // n_mels, 1) for p in pdf["payload"]],
                }
            )

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
