"""Registry entries: deterministic selection: splits / sampling / packing / mixtures.

Split from the monolithic registry.py (VERDICT r4 item 6).
Importing this module REGISTERS its entries; modules are
imported by registry/__init__ in the original file order, so
registration order — which the external driver consumes — is
unchanged."""

from __future__ import annotations

from ._core import (  # noqa: F401
    ORACLES,
    QUERIES,
    _SHINGLES,
    _TOKS,
    _d38,
    _dsum,
    _dsum_sql,
    _lsh_oracle_banded,
    _scratch,
    _t,
    bounded_bucket,
    pin_oracle_confs,
    register,
)

# ---------------------------------------------------------------------------
# Deterministic selection layer (north-star extensions): hash-based
# split / stratified sampling / sequence packing / mixture planning.
# All decisions are md5-of-key, never RNG — stable under task retries
# and re-runs (operators/sampling.py docstring), and bit-reproducible
# by the DuckDB oracle.
# ---------------------------------------------------------------------------

@register(
    "sample_hash_split",
    oracle="""
    SELECT doc_id, lang, source,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc'
                THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
                THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def q_sample_hash_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split keyed on
    md5(doc_id): a pure projection (zero shuffle at 100 TB) whose
    assignment survives re-runs, retries, and corpus regeneration —
    the anti-leakage property RNG splits don't have."""
    from ..operators.sampling import hash_split

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return hash_split(d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})


@register(
    "sample_stratified",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE (lang = 'en')
       OR (lang = 'de' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000')
       OR (lang = 'es' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '4000')
       OR (lang = 'fr' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '4000')
    """,
)
def q_sample_stratified(spark, sf_dir):
    """Deterministic per-stratum downsampling (keep all en, half de,
    quarter es/fr; drop zh) — the reproducible form of sampleBy. Pure
    filter, pushes to the scan."""
    from ..operators.sampling import stratified_sample

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return stratified_sample(
        d, "lang", {"en": 1.0, "de": 0.5, "es": 0.25, "fr": 0.25}, "doc_id"
    )


@register(
    "sample_pack_sequences",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source, CAST(len({_TOKS}) AS INTEGER) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT *,
             CAST(coalesce(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS pack_offset
      FROM t
    )
    SELECT doc_id, source, n_tokens, pack_offset,
           CAST(floor(pack_offset / 4096.0) AS BIGINT) AS pack_id
    FROM c
    """,
)
def q_sample_pack_sequences(spark, sf_dir):
    """Token-budget sequence packing (context-window filling): running
    token count per source shard, new pack every 4096 tokens. One
    shuffle on the shard key; packing is per-shard by design — a
    global pack order would serialize the corpus through one
    partition."""
    from ..operators.sampling import pack_sequences

    return pack_sequences(_t(spark, sf_dir, "documents"), budget=4096)


@register(
    "sample_domain_mixture",
    oracle=f"""
    WITH c AS (
      SELECT lang AS domain,
             CAST(sum(len({_TOKS})) AS BIGINT) AS tokens_avail,
             CAST(CASE lang WHEN 'en' THEN 0.7 WHEN 'de' THEN 0.2
                            WHEN 'fr' THEN 0.1 END AS DOUBLE) AS weight
      FROM documents
      WHERE lang IN ('en', 'de', 'fr')
      GROUP BY lang
    ),
    m AS (SELECT *, min(tokens_avail / weight) OVER () AS scale FROM c)
    SELECT domain, tokens_avail, weight,
           round(least(1.0, weight * scale / tokens_avail), 4) AS rate,
           CAST(floor(round(least(1.0, weight * scale / tokens_avail), 4)
                      * tokens_avail) AS BIGINT) AS tokens_take
    FROM m
    """,
)
def q_sample_domain_mixture(spark, sf_dir):
    """Domain mixture planning: per-domain sampling rates realizing a
    70/20/10 en/de/fr token mixture while taking the binding domain in
    full. Tiny agg + |domains|-row window; rates feed
    stratified_sample for the shuffle-free selection pass."""
    from ..operators.sampling import domain_mixture_plan

    return domain_mixture_plan(
        _t(spark, sf_dir, "documents"), {"en": 0.7, "de": 0.2, "fr": 0.1}
    )


@register(
    "tpch_q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
                   AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 shape — the 6-way star: lineitem is the only large
    input, every dim (customer, orders-filtered, supplier, nation,
    region) broadcasts into its scan, so the single shuffle is the
    final n_name aggregate. The s_nationkey = c_nationkey equi-arm
    rides the same broadcast join — no extra exchange. Revenue summed
    in DECIMAL(18,6) so the 2-dp round is independent of partition /
    accumulation order (same hazard as tpch_q10)."""
    from pyspark.sql import functions as F

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00")
        & (F.col("o_orderdate") < "1997-01-01 00:00:00")
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           round(c.c_acctbal, 2) AS acctbal
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 shape — returned-item revenue by customer: returnflag
    filter pushed to the lineitem scan, quarter-filtered orders and the
    customer/nation dims broadcast, top-20 via TakeOrderedAndProject
    (deterministic tie-break on custkey)."""
    from pyspark.sql import functions as F

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00")
        & (F.col("o_orderdate") < "1996-04-01 00:00:00")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    # revenue summed in DECIMAL: the double product quantizes to 6 dp
    # identically on both engines and decimal addition is exact, so the
    # sum is independent of partition/accumulation order — a plain
    # double sum here lands within 1e-9 of a .xx5 rounding boundary and
    # flips the 2-dp round between engines (SURVEY §7 float hazard)
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
        )
    )


@register(
    "merge_upsert_orders",
    oracle="""
    WITH base AS (SELECT *, CAST(1 AS BIGINT) AS version,
                         0 AS src FROM orders),
    chg AS (
      SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             CAST(round(CAST(o_totalprice * 1.1 AS DECIMAL(18,6)), 2)
                  AS DOUBLE) AS o_totalprice,
             o_orderdate, o_orderpriority, CAST(2 AS BIGINT) AS version,
             1 AS src
      FROM orders WHERE o_orderkey % 7 = 0
    ),
    u AS (SELECT * FROM base UNION ALL BY NAME SELECT * FROM chg),
    -- src DESC encodes the operator's 'changes win ties' contract, so
    -- the oracle's pick is deterministic even on tied versions
    r AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                       ORDER BY version DESC, src DESC) AS rn
          FROM u)
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           o_orderdate, o_orderpriority, version
    FROM r WHERE rn = 1
    """,
)
def q_merge_upsert(spark, sf_dir):
    """MERGE/upsert via union + keyed keep-latest window (the
    principled trading212.py:127 union-with-manual-records): a change
    batch (10% price bump, status 'U', higher version) overwrites its
    keys, untouched keys pass through. One shuffle on the merge key."""
    from pyspark.sql import functions as F

    from ..operators.relational import merge_upsert

    o = _t(spark, sf_dir, "orders")
    base = o.withColumn("version", F.lit(1).cast("long"))
    changes = (
        o.filter(F.col("o_orderkey") % 7 == 0)
        # price bump quantized through DECIMAL so the 2-dp round is
        # boundary-stable across engines (same hazard as tpch_q10)
        .withColumn(
            "o_totalprice",
            F.round((F.col("o_totalprice") * 1.1).cast("decimal(18,6)"), 2).cast(
                "double"
            ),
        )
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("version", F.lit(2).cast("long"))
    )
    return merge_upsert(base, changes, ["o_orderkey"], "version")


@register(
    "scd2_customer_history",
    oracle="""
    WITH obs AS (
      SELECT o_custkey, o_orderdate, o_orderstatus, o_orderpriority,
             lag(o_orderstatus) OVER w AS ps,
             lag(o_orderpriority) OVER w AS pp,
             row_number() OVER w AS rn
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderstatus, o_orderpriority)
    ),
    chg AS (
      SELECT o_custkey, o_orderdate, o_orderstatus, o_orderpriority
      FROM obs
      WHERE rn = 1
         OR ps IS DISTINCT FROM o_orderstatus
         OR pp IS DISTINCT FROM o_orderpriority
    )
    SELECT o_custkey, o_orderstatus, o_orderpriority,
           o_orderdate AS effective_from,
           lead(o_orderdate) OVER w2 AS effective_to,
           lead(o_orderdate) OVER w2 IS NULL AS is_current
    FROM chg
    WINDOW w2 AS (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderstatus, o_orderpriority)
    """,
)
def q_scd2_customer_history(spark, sf_dir):
    """SCD type-2 dimension build (Kimball): treat each order as an
    observation of the customer's (status, priority) state, collapse
    consecutive no-op observations, emit validity intervals with an
    open current row. Both windows share one partition key, so the
    whole history build is a single shuffle on o_custkey
    (operators/relational.py:scd2_build)."""
    from ..operators.relational import scd2_build

    return scd2_build(
        _t(spark, sf_dir, "orders"),
        key="o_custkey",
        ts_col="o_orderdate",
        attrs=["o_orderstatus", "o_orderpriority"],
    )


@register(
    "source_schema_evolution",
    oracle="""
    WITH b1 AS (
      SELECT o_orderkey, o_orderstatus
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    b2 AS (
      SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS total
      FROM orders WHERE o_orderkey % 2 = 1
    )
    SELECT * FROM b1 UNION ALL BY NAME SELECT * FROM b2
    """,
)
def q_source_schema_evolution(spark, sf_dir):
    """Schema drift across ingest batches — the 100 TB reality the
    reference met as mixed CSV/Sheets dtypes (trading212.py:127): an
    early batch lands without a column a later batch adds. The engine
    reads the whole directory with mergeSchema, so old files surface
    the new column as NULL — the distributed form of
    unionByName(allowMissingColumns=True), resolved at scan time from
    parquet footers instead of a driver-side union."""
    from pyspark.sql import functions as F

    o = _t(spark, sf_dir, "orders")
    path = _scratch(sf_dir, "parquet_schema_evolution")
    (
        o.filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_orderstatus")
        .write.mode("overwrite")
        .parquet(f"{path}/batch=1")
    )
    (
        o.filter(F.col("o_orderkey") % 2 == 1)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("total"),
        )
        .write.mode("overwrite")
        .parquet(f"{path}/batch=2")
    )
    return (
        spark.read.option("mergeSchema", True)
        .option("recursiveFileLookup", True)
        .parquet(path)
        .select("o_orderkey", "o_orderstatus", "total")
    )


@register(
    "join_salted_skew",
    oracle="""
    WITH big AS (
      SELECT l_orderkey % 8 AS skew_key,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS price
      FROM lineitem
    ),
    dim AS (
      SELECT o_orderkey % 8 AS skew_key, count(*) AS n_orders
      FROM orders GROUP BY o_orderkey % 8
    )
    SELECT b.skew_key,
           count(*) AS n_rows,
           CAST(sum(b.price) AS DOUBLE) AS total_price,
           min(d.n_orders) AS n_orders
    FROM big b JOIN dim d USING (skew_key)
    GROUP BY b.skew_key
    """,
)
def q_join_salted(spark, sf_dir):
    """Skew-mitigated equi-join (operators/relational.py salted_join):
    the probe side's 8 pathologically hot keys (l_orderkey % 8 — each
    ~12.5% of the table) are scattered across n_salts=16 sub-keys while
    the build side explodes into 16 replicas, so each hot key becomes
    16 shuffle partitions instead of one straggler task. Join result is
    EXACT (each probe row matches exactly one replica); the aggregate
    collapses it back per key. Money summed in DECIMAL(18,2) — the
    cast is exact (2-dp doubles) and decimal addition is
    order-independent, so no round() is needed anywhere.
    Plan-asserted in tests/test_plans.py: the join exchange partitions
    on (skew_key, __salt)."""
    from pyspark.sql import functions as F

    from ..operators.relational import salted_join

    big = _t(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") % 8).alias("skew_key"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
    )
    dim = (
        _t(spark, sf_dir, "orders")
        .groupBy((F.col("o_orderkey") % 8).alias("skew_key"))
        .agg(F.count("*").alias("n_orders"))
    )
    joined = salted_join(big, dim, "skew_key", n_salts=16)
    return joined.groupBy("skew_key").agg(
        F.count("*").alias("n_rows"),
        F.sum("price").cast("double").alias("total_price"),
        F.min("n_orders").alias("n_orders"),
    )


@register(
    "flagship_pipeline_decimal",
    oracle="""
    WITH c AS (
      SELECT upper(substr(pc_raw, 1, 1)) || lower(substr(pc_raw, 2)) AS priority_class,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM (
        SELECT regexp_replace(
                 CASE WHEN regexp_replace(o_orderpriority, '1-|2-|3-|4-|5-', '', 'g')
                           = 'NOT SPECIFIED'
                      THEN 'NONE'
                      ELSE regexp_replace(o_orderpriority, '1-|2-|3-|4-|5-', '', 'g')
                 END, '^\\s+|\\s+$', '', 'g') AS pc_raw,
               o_totalprice
        FROM orders
        WHERE o_orderstatus IN ('O', 'F')
      )
    )
    SELECT priority_class,
           count(*) AS n_orders,
           CAST(sum(price) AS DOUBLE) AS revenue,
           CAST(min(price) AS DOUBLE) AS min_price,
           CAST(max(price) AS DOUBLE) AS max_price
    FROM c GROUP BY priority_class
    """,
)
def q_flagship_decimal(spark, sf_dir):
    """The money-correct flagship variant (SURVEY §1.2): the money
    column rides the whole pipeline as DecimalType(18,2) — the cast
    from the source's exact-2-dp doubles is rounding-free, decimal
    addition is exact and therefore independent of partition /
    accumulation order, and the output needs NO round() crutch: the
    final cast to double is exact for every representable total. This
    is the contract the reference's float64 money columns
    (trading212.py:132-133) cannot give — a double sum's 2-dp round
    can flip near .xx5 boundaries depending on execution order.
    Exact decimal-vs-DuckDB-DECIMAL equality (raw tuples, no float
    canonicalization) is additionally asserted in
    tests/test_pipeline.py."""
    from pyspark.sql import functions as F

    from ..plans.pipeline import canonicalize_actions

    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderstatus").isin("O", "F"))
        .select(
            canonicalize_actions("o_orderpriority").alias("priority_class"),
            F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
        )
        .groupBy("priority_class")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("price").cast("double").alias("revenue"),
            F.min("price").cast("double").alias("min_price"),
            F.max("price").cast("double").alias("max_price"),
        )
    )


