"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual registry lives in ``trading212_etl_spark.registry`` so the
test suite exercises the same entries the driver does.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from trading212_etl_spark.plans.pipeline import flagship_pipeline
    from trading212_etl_spark.registry import pin_oracle_confs
    from trading212_etl_spark.sources import load_table

    pin_oracle_confs(spark)
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    return flagship_pipeline(orders)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from trading212_etl_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins of ``queries()`` entries."""
    from trading212_etl_spark.registry import ORACLES

    return dict(ORACLES)
