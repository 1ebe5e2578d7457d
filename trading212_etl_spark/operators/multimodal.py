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
