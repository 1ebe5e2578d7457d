"""Window-function operators (SURVEY §2.5 — absent in the reference;
required by the driver corpus). The keyed keep-first dedup is the
principled generalization of the reference's order-dependent
``drop_duplicates(keep='first')`` (trading212.py:121)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keep_first_by(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """Keyed 'first occurrence wins' dedup: row_number over
    (partitionBy keys, orderBy order) == 1. One shuffle on ``keys``;
    skewed keys are AQE-split. The ordering makes 'first' explicit
    where pandas relied on physical row order."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def top_n_per_group(
    df: DataFrame, keys: list[str], order: list[Column], n: int
) -> DataFrame:
    """Top-N per group via rank-limit — the distributed form of
    'latest N per account'. Unlike global top-k, this shuffles once on
    the group keys and never collects."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
