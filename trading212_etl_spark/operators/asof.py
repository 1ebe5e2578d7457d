"""Time-series joins Spark has no native operator for: as-of join and
interval range join.

The reference has no joins at all (SURVEY §2.3); these are the
extension operators a market-data/trading engine actually needs —
"price as of this fill's timestamp" is THE canonical query over the
reference's domain (Trading 212 transaction exports).

Scale design: the as-of join is built as a tagged union + one keyed
window — a single shuffle on the join key, linear per-row state, no
range-condition join that Spark would plan as a broadcast-nested-loop
or explode into per-bucket cross products. The range join keeps an
equi-key conjunct so Catalyst plans a hash join (shuffled or
broadcast), with the range as a cheap post-filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    left_by: str,
    right_by: str,
    value_cols: list[str],
    right_order: str | None = None,
) -> DataFrame:
    """Backward as-of join: each left row gains ``value_cols`` from the
    *latest* right row with ``right_ts <= left_ts`` and equal key
    (pandas ``merge_asof`` / DuckDB ``ASOF LEFT JOIN`` semantics,
    tie-inclusive). Unmatched left rows keep nulls.

    Plan shape: tag-union both sides onto one (key, ts) spine, then
    ``last(value, ignorenulls=True)`` over a per-key window ordered by
    (ts, side-tag, right_order) with an unbounded-preceding row frame —
    the carried-forward value is exactly the as-of match. One exchange
    on the key; window state is one row; at 100 TB this is shuffle +
    sort, never a range-join blowup.

    ``right_order`` breaks ties among right rows sharing (key, ts) —
    the max wins (sorted last ⇒ picked by ``last``). Pass it whenever
    (key, ts) is not unique on the right, or the result is
    plan-dependent.
    """
    rv = F.struct(*[F.col(c) for c in value_cols]).alias("__rv")
    order_tail = [F.col("__rord").asc()] if right_order else []
    r = right.select(
        F.col(right_by).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        (F.col(right_order) if right_order else F.lit(0)).alias("__rord"),
        rv,
        *[F.lit(None).alias(f"__l_{c}") for c in left.columns],
    )
    l = left.select(  # noqa: E741
        F.col(left_by).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(0).alias("__rord"),
        F.lit(None).cast(r.schema["__rv"].dataType).alias("__rv"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc(), *order_tail)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumn(
        "__match", F.last("__rv", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("__tag") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *[F.col("__match")[c].alias(c) for c in value_cols],
    )


def interval_range_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    lower: Column,
    upper: Column,
    how: str = "inner",
) -> DataFrame:
    """Join rows whose ``right`` timestamp falls in a per-``left``-row
    interval, anchored by an equi-key conjunct.

    ``on`` must be an equality (the hash-join key); ``lower <= x <
    upper`` is applied as the join's residual condition. Keeping the
    equality separate is what lets Catalyst pick SortMergeJoin /
    broadcast instead of BroadcastNestedLoopJoin — the difference
    between O(n log n) and O(n*m) at 100 TB. A pure range join (no
    equi-key) should bucket the time axis first and equi-join on the
    bucket (see streaming/windows.py tumbling logic).
    """
    return left.join(right, on & lower & upper, how)
