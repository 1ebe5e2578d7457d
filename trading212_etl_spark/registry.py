"""Query registry: the driver-facing inventory of implemented
operators (SURVEY.md §2), each as a (PySpark program, DuckDB oracle
SQL) pair.

Conventions for oracle parity (SURVEY §7 hard parts):
- every computed column aliased identically on both sides;
- DOUBLE aggregates rounded to 2 dp on both sides;
- session timezone pinned to UTC (see session.py);
- in-cell orderings (string_agg / collect_list) made explicit;
- DuckDB ``regexp_replace`` needs the ``'g'`` flag to match Spark's
  replace-all semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .sources import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def pin_oracle_confs(spark: SparkSession) -> None:
    """Pin runtime confs required for value-parity with the DuckDB
    oracle, whatever session the driver hands us (SURVEY §7: DuckDB
    timestamps are UTC-naive; a non-UTC Spark session shifts
    date_format/to_date output by the zone offset)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def register(name: str, oracle: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame program under
    ``name``, with its DuckDB oracle SQL (None → rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            pin_oracle_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship (SURVEY §3 EP3)
# ---------------------------------------------------------------------------

@register(
    "flagship_pipeline",
    oracle="""
    WITH canonical AS (
      SELECT * EXCLUDE (pc_raw),
             upper(substr(pc_raw, 1, 1)) || lower(substr(pc_raw, 2)) AS priority_class
      FROM (
        SELECT DISTINCT
               o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
               regexp_replace(
                 CASE WHEN regexp_replace(o_orderpriority, '1-|2-|3-|4-|5-', '', 'g')
                           = 'NOT SPECIFIED'
                      THEN 'NONE'
                      ELSE regexp_replace(o_orderpriority, '1-|2-|3-|4-|5-', '', 'g')
                 END, '^\\s+|\\s+$', '', 'g') AS pc_raw,
               strftime(o_orderdate, '%Y-%m-%d') AS order_date,
               0 AS split_ratio
        FROM orders
        WHERE o_orderstatus IN ('O', 'F')
      )
    ),
    manual AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_orderdate FROM orders
      WHERE o_orderstatus = 'P'
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
           priority_class, order_date, split_ratio
    FROM (SELECT * FROM canonical UNION ALL BY NAME SELECT * FROM manual)
    ORDER BY o_orderdate ASC, o_orderkey ASC
    """,
)
def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .plans.pipeline import flagship_pipeline

    return flagship_pipeline(_t(spark, sf_dir, "orders"))
