"""Structured Streaming forms of the event operators.

The reference's ingestion is a poll-until-ready loop with fixed
sleeps (T2/T3, trading212.py:95, 100-111 — which never re-fetches the
status response, so it can spin forever). The streaming engine
replaces polling with a file-source stream + event-time windows +
watermark-bounded state: late data is handled by the watermark instead
of the reference's crude full-table dedup (trading212.py:121).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_STREAM_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # nanos (see sources/readers.py)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def streaming_tumbling_agg(
    stream: DataFrame, duration: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window aggregate over an event stream.

    The watermark bounds state: at 100 TB/day of events the store only
    holds windows newer than (max event time - watermark); older state
    is evicted instead of accumulating forever.
    """
    return (
        stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_streaming_tumbling_agg(
    spark: SparkSession, events_dir: str, duration: str = "1 hour"
) -> DataFrame:
    """Drive the streaming aggregate to completion over a static
    directory of event parquet (trigger availableNow semantics via
    processAllAvailable) and return the materialized result.

    This is the local-smoke harness; a production deployment swaps the
    file source for Kafka and the memory sink for a Parquet/foreachBatch
    sink — the transformation graph is identical.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file source requires a directory; the corpus keeps one
    # parquet per table in the sf dir, so glob-filter to events only
    stream = (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(events_dir)
    )
    agg = streaming_tumbling_agg(stream, duration)
    name = "stream_tumbling_out"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
