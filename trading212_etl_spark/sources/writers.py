"""Sinks.

The reference's sink is a replace-write of the final table into a
Google Sheet (trading212.py:136, SURVEY §2.1 S8). The engine's storage
substrate is Parquet (BASELINE.json ``spark_approach``): columnar,
splittable, predicate-pushdown-capable — the format that makes the
100 TB read side work at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
    table_name: str | None = None,
) -> None:
    """Overwrite-write Parquet, optionally hive-partitioned.

    ``partition_by`` is the principled version of the reference's
    manual 365-day window chunking (trading212.py:86-97, SURVEY §2.9
    T1): writing ``partitionBy("dt")`` gives every later reader
    partition pruning for free instead of hand-scheduled date loops.

    ``bucket_by=(n, keys)`` pre-shuffles on the join key at write time
    so repeated large joins on ``keys`` skip their shuffle entirely —
    the 100 TB lever for fact-fact joins. Bucketing requires a
    metastore table, hence ``table_name``.
    """
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by is not None:
        n, keys = bucket_by
        if not table_name:
            raise ValueError("bucketBy requires table_name (saveAsTable)")
        writer.bucketBy(n, *keys).sortBy(*keys).format("parquet").saveAsTable(table_name)
        return
    writer.parquet(path)
