"""Partitioning helpers: the scale levers SURVEY §7 step 7 calls for.

Two distinct hazards at the two ends of the scale spectrum:

- **Under-split input** (bench/local): a small parquet file arrives as
  ONE split, so a CPU-heavy operator (regex shingling, MinHash, Arrow
  decode) serializes on one core while 31 idle. ``fan_out`` widens the
  plan to cluster parallelism — and is a guarded no-op at 100 TB,
  where the scan already yields thousands of splits.
- **Skewed shuffle keys** (cluster): one hot key turns a shuffle stage
  into a single straggler task. ``with_salt``/``unsalt_agg`` implement
  two-phase salted aggregation; AQE's skew-join splitting (enabled in
  session.py) covers the join case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fan_out(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Ensure ``df`` has at least cluster-parallelism partitions before
    CPU-bound per-row work.

    The round-robin repartition shuffle moves each row once — trivially
    amortized when downstream does regex/hash/codec work per row.

    Conf-driven, not plan-driven: the previous width check
    (``df.rdd.getNumPartitions() >= target``) forced a full
    physical-plan translation on the driver on EVERY call — pure
    driver-side overhead for the many operators that wrap their input
    in ``fan_out``. Whether fan-out is useful is a property of the
    DEPLOYMENT, not of one plan: under-split inputs happen in
    local/bench mode (one small parquet file = one split), while on a
    real cluster a 100 TB scan is already thousands of
    ``maxPartitionBytes`` splits wide. So the switch is a session conf:
    ``spark.trading212.fanout.enabled=false`` (set it in the cluster
    session) makes every call a zero-cost no-op; the default (local)
    widens unconditionally.
    """
    spark = df.sparkSession
    if spark.conf.get("spark.trading212.fanout.enabled", "true") == "false":
        return df
    target = spark.sparkContext.defaultParallelism * multiplier
    return df.repartition(target)


def materialize(df: DataFrame, *, truncate: bool = True) -> DataFrame:
    """Conf-driven materialization policy for multi-consumer and
    iterative plan nodes — the deployment lever behind every
    ``localCheckpoint`` in this package.

    ``localCheckpoint`` is the right *local* call: eager, truncates
    lineage, stores blocks on the executors. But it pins executor
    memory/disk and dies with an executor, so a 1000-executor 100 TB
    job wants a different strategy without touching operator code.
    ``spark.trading212.materialize`` selects it:

    - ``local`` (default) — ``localCheckpoint()``: eager + truncating,
      executor-resident; the bench/local mode.
    - ``reliable`` — ``checkpoint()``: eager + truncating, written to
      the fault-tolerant ``sparkContext.setCheckpointDir`` location
      (HDFS/S3); survives executor loss. The 100 TB setting.
    - ``persist`` — ``persist(DISK_ONLY)``: lazy, avoids recomputation
      across consumers but does NOT truncate lineage.
    - ``none`` — pass-through (recompute per consumer).

    ``truncate=True`` marks call sites that *require* lineage cutting
    (iterative fixpoints like connected_components, whose round-N plan
    would otherwise embed rounds 1..N-1): there, non-truncating modes
    (``persist``/``none``) are upgraded to the truncating equivalent
    (``reliable`` if a checkpoint dir is configured, else ``local``)
    rather than silently producing the plan-blowup the checkpoint
    exists to prevent.
    """
    spark = df.sparkSession
    mode = spark.conf.get("spark.trading212.materialize", "local")
    if mode in ("persist", "none") and truncate:
        has_dir = spark.sparkContext.getCheckpointDir() is not None
        mode = "reliable" if has_dir else "local"
    if mode == "reliable":
        return df.checkpoint()
    if mode == "persist":
        from pyspark import StorageLevel

        return df.persist(StorageLevel.DISK_ONLY)
    if mode == "none":
        return df
    return df.localCheckpoint()


def with_salt(df: DataFrame, n_buckets: int, col_name: str = "__salt") -> DataFrame:
    """Attach a uniform salt column in [0, n_buckets). Deterministic
    per row is NOT required (salt only spreads rows); monotonically_
    increasing_id avoids an RNG so re-runs of a stage stay stable."""
    return df.withColumn(
        col_name, (F.monotonically_increasing_id() % n_buckets).cast("int")
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}. Phase 1 aggregates on (keys + salt) —
    spreading a hot key over ``n_buckets`` tasks — phase 2 re-combines
    per key (sum/count combine via sum; min/max via themselves).
    Associative-only by construction; avg = sum/count downstream.
    """
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    salted = with_salt(df, n_buckets)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[first[fn](col).alias(out) for out, (col, fn) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[recombine[fn](out).alias(out) for out, (_, fn) in aggs.items()]
    )
