"""Event-table operators (SURVEY §2.9): the batch forms of the
reference's incremental-processing intent.

T1 (chunked 365-day window extraction, trading212.py:89-97) becomes a
declarative tumbling window; the poll-until-ready ingestion loop (T2,
trading212.py:100-111) becomes a Structured Streaming file source in
``streaming/`` — these batch forms stay DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_agg(
    events: DataFrame, duration: str, slide: str | None = None
) -> DataFrame:
    """Tumbling (or sliding, if ``slide`` given) event-time window
    aggregate. ``F.window`` computes the bucket per row — fully
    parallel, no driver loop, and at scale the groupBy shuffle is the
    only exchange."""
    w = F.window("ts", duration, slide) if slide else F.window("ts", duration)
    return (
        events.groupBy(w.alias("w"), "event_type")
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


def sessionize(events: DataFrame, gap_minutes: int) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to
    the previous event of the same user exceeds ``gap_minutes``.

    lag → gap flag → running sum = session id; two window passes over
    the same (user_id, ts) partitioning, so Catalyst reuses one
    shuffle. This is the batch twin of Structured Streaming's
    ``session_window`` (see streaming/windows.py).
    """
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(by_user)
    is_new = F.when(gap_s.isNull() | (gap_s > gap_minutes * 60), 1).otherwise(0)
    with_session = events.withColumn(
        "session_seq",
        F.sum(is_new).over(by_user.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        with_session.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows via the native ``F.session_window`` expression
    (the same operator Structured Streaming uses for stateful
    sessionization, here in its batch form).

    Merge semantics: each event opens ``[ts, ts+gap)``; overlapping
    windows merge, so a gap of *exactly* ``gap`` starts a new session
    (strict ``<`` overlap). The oracle's lag-based rewrite must use
    ``>=`` on the gap to match. Window end = last event + gap.
    """
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def json_props(events: DataFrame) -> DataFrame:
    """F13/F14 — JSON field extraction from the semi-structured
    ``props`` column (the reference navigates REST JSON dicts in
    Python, trading212.py:65-67, 105-111; pd.json_normalize at :59).

    ``get_json_object`` evaluates JVM-side; for hot paths with many
    fields, ``from_json`` with a pinned schema parses once.
    """
    return events.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        F.from_json("props", "k LONG").getField("k").alias("k_typed"),
    )
