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
    # Shuffle floor for a vanilla session (200 partitions are pure
    # scheduling overhead at harness SFs); the registry wrapper then
    # overrides per-query with the bytes-scaled advisory below.
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(max(_SHUFFLE_FLOOR, spark.sparkContext.defaultParallelism)),
    )


# bytes → shuffle-partition advisory (VERDICT r10 item 3: the
# partitions-scale-with-bytes deployment rule as CODE, not prose).
# 8 MiB of COMPRESSED parquet input per shuffle partition: zstd
# decode plus the token/shingle explosions the heavy entries run put
# the in-flight bytes at roughly 10x the on-disk bytes, i.e. ~100 MB
# per task — the classic healthy-shuffle size. Calibration: the 125x
# corpus (1.99 GB) maps to ~240 partitions, matching the measured
# bm25 optimum (83.5 s at 32 partitions vs 51.3 s at 256; AQE can
# coalesce small partitions but cannot SPLIT non-skewed oversize
# ones), while sf0.1 (17.5 MB) stays at the 32-partition floor so the
# bench protocol is untouched.
_SHUFFLE_TARGET_BYTES = 8 << 20
_SHUFFLE_FLOOR = 32
_SHUFFLE_CAP = 4096
_CORPUS_BYTES: dict[str, int] = {}


def _corpus_bytes(sf_dir: str) -> int:
    """Total on-disk parquet bytes under ``sf_dir`` (cached — the
    corpora are immutable for a session's lifetime). Non-local or
    unreadable paths fall back to 0, i.e. the partition floor."""
    if sf_dir not in _CORPUS_BYTES:
        import os

        total = 0
        try:
            for root, _dirs, files in os.walk(sf_dir):
                for f in files:
                    if f.endswith(".parquet"):
                        try:
                            total += os.path.getsize(os.path.join(root, f))
                        except OSError:
                            pass
        except OSError:
            total = 0
        _CORPUS_BYTES[sf_dir] = total
    return _CORPUS_BYTES[sf_dir]


def scaled_shuffle_partitions(spark: SparkSession, sf_dir: str) -> int:
    """Shuffle-partition count scaled to the corpus' input bytes:
    ``max(floor, cores, ceil(bytes / 8 MiB))`` capped at 4096. The
    floor keeps the sf0.01 driver harness and sf0.1 bench at 32
    (a vanilla session's 200 partitions are pure scheduling overhead
    there — AQE coalesces them for batch plans, but streaming queries
    run with AQE off and pay every task per stage); the bytes term
    grows partitions once a corpus outruns what ``floor`` partitions
    can hold in executor memory. ``SPARK_GRAFT_SHUFFLE_TARGET_BYTES``
    overrides the per-partition target (0 disables scaling)."""
    import os

    target = int(
        os.environ.get(
            "SPARK_GRAFT_SHUFFLE_TARGET_BYTES", str(_SHUFFLE_TARGET_BYTES)
        )
    )
    floor = max(_SHUFFLE_FLOOR, spark.sparkContext.defaultParallelism)
    if target <= 0:
        return floor
    scaled = -(-_corpus_bytes(sf_dir) // target)
    return max(floor, min(_SHUFFLE_CAP, scaled))


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
            spark.conf.set(
                "spark.sql.shuffle.partitions",
                str(scaled_shuffle_partitions(spark, sf_dir)),
            )
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
