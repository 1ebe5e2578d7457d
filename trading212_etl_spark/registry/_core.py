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

from ..partitioning import bounded_bucket
from ..sources import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def pin_oracle_confs(spark: SparkSession) -> None:
    """Pin runtime confs required for value-parity with the DuckDB
    oracle, whatever session the driver hands us (SURVEY §7: DuckDB
    timestamps are UTC-naive; a non-UTC Spark session shifts
    date_format/to_date output by the zone offset)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Right-size shuffles for the local correctness harness: a vanilla
    # session's 200 shuffle partitions are pure scheduling overhead at
    # sf0.01 — AQE coalesces them for batch plans, but streaming
    # queries run with AQE off and pay all 200 tasks per stage. A
    # runtime conf, value-neutral for every query.
    spark.conf.set("spark.sql.shuffle.partitions", "32")


def register(name: str, oracle: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame program under
    ``name``, with its DuckDB oracle SQL (None → rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Release the lazy persists pinned by PREVIOUS registry
            # invocations (freeze_partitions / materialize=persist):
            # registry consumers run build->action->build->action
            # serially (driver, bench, tests), so pins from the prior
            # query are dead weight by the time the next one is built —
            # without this, a long-lived session accumulates
            # CacheManager entries forever (VERDICT r5 item 5). This
            # sweep is safe ONLY under that serial discipline: a swept
            # freeze pin whose frame is actioned again later can
            # mis-join ordered_prefix offsets (branches resample the
            # range exchange independently — see release_pins). A
            # caller that interleaves its own pinned frames with
            # registry builds must finish its actions first or wrap
            # them in pinned_scope().
            from ..partitioning import release_pins

            release_pins()
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
# §2.1 Sources / sinks: CSV scan (S6/S7), JSON records + flatten
# (S2-S5, F13), partitioned Parquet sink (S8 + §7 scale layout).
# Each query materializes the non-parquet format into .scratch/ first —
# the engine's own writers produce the files its readers are tested on.
# ---------------------------------------------------------------------------

def _d38(c: str):
    """Column cast to DECIMAL(38,0) — the exact-moment widening idiom
    shared by the integer-statistics entries (sums of products stay
    inside 38 digits; see each entry's magnitude note)."""
    from pyspark.sql import functions as F

    return F.col(c).cast("decimal(38,0)")


def _scratch(sf_dir: str, name: str) -> str:
    """Scratch dir for engine-written intermediates, rooted at the
    repo checkout (derived from __file__, not hardcoded, so relocated
    checkouts keep working)."""
    import os

    repo_root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    base = os.path.basename(sf_dir.rstrip("/"))
    return os.path.join(repo_root, ".scratch", f"{name}_{base}")



# BPE-ish tokenizer regex, shared verbatim with the DuckDB side
_TOKS = r"regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')"
# distinct word-3-gram shingle set (DuckDB list comprehension)
_SHINGLES = (
    "list_distinct([array_to_string(toks[CAST(i AS INTEGER):CAST(i AS INTEGER)+2], ' ') "
    "for i in range(1, greatest(len(toks)-2, 1)+1)])"
)


# Spark/DuckDB twins of the decimal-quantized money sum: the double
# product quantizes identically on both engines, decimal addition is
# exact, so the 2-dp round never sits on an engine-dependent boundary.
def _dsum(col):
    from pyspark.sql import functions as F

    return F.round(F.sum(col.cast("decimal(18,6)")), 2).cast("double")


def _dsum_sql(expr: str) -> str:
    return f"CAST(round(sum(CAST({expr} AS DECIMAL(18,6))), 2) AS DOUBLE)"


def _lsh_oracle_banded(n_planes: int = 4, n_tables: int = 8, dim: int = 64) -> str:
    """DuckDB SQL fragment: (vec_id, tbl, bkt) banding of view ``v``
    (vec_id, emb) under the engine's exact seeded hyperplanes, inlined
    as double literals — the planes are deterministic (fixed numpy
    seed per table), so the sketch is oracle-reproducible; only the
    float sign test at a dot product of exactly ~0 could diverge, and
    gaussian-plane dots sit O(1) away from 0."""
    from ..operators.similarity import _hyperplanes

    branches = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed=42 + t)
        bucket = " + ".join(
            "(CASE WHEN list_dot_product(emb, [{lits}]) > 0 THEN {w} ELSE 0 END)".format(
                lits=", ".join(repr(float(x)) for x in p), w=2 ** i
            )
            for i, p in enumerate(planes)
        )
        branches.append(
            f"SELECT vec_id, {t} AS tbl, {bucket} AS bkt FROM v"
        )
    return " UNION ALL ".join(branches)
