from pyspark.sql import functions as F

from trading212_etl_spark.plans.pipeline import canonicalize_actions, flagship_pipeline
from trading212_etl_spark.sources import load_table


def test_canonicalize_actions(spark):
    df = spark.createDataFrame(
        [("1-URGENT",), ("4-NOT SPECIFIED",), ("  5-LOW  ",), ("3-MEDIUM",)],
        ["o_orderpriority"],
    )
    got = [r[0] for r in df.select(canonicalize_actions("o_orderpriority")).collect()]
    # capitalize lowercases the tail (pandas .str.capitalize semantics,
    # trading212.py:117) — NOT initcap.
    assert got == ["Urgent", "None", "Low", "Medium"]


def test_reference_domain_exact_semantics(spark):
    """The reference's OWN domain strings through the exact T-chain
    (trading212.py:115-121): prefix strip is anywhere-in-string and
    list-sequential ('Stop Limit sell' loses both words), the Dividend
    mapping is whole-cell only, capitalize lowercases the tail, and
    the Buy/Sell filter then drops the Div row (the dead-code mapping,
    SURVEY §2.11)."""
    from trading212_etl_spark.functions.strings import (
        capitalize,
        regexp_strip_prefixes,
        replace_exact,
        strict_trim,
    )

    rows = [
        ("Market buy",),
        ("Limit sell",),
        ("Stop Limit sell",),       # both prefixes stripped sequentially
        ("  Market sell \t",),      # strict trim: tabs too
        ("Dividend (Ordinary)",),   # whole-cell -> Div, then filtered out
        ("My Dividend (Ordinary) x",),  # substring NOT replaced, filtered out
        ("Deposit",),               # filtered out
        ("Market buy",),            # exact duplicate -> deduped
    ]
    df = spark.createDataFrame(rows, ["Action"])
    canon = df.withColumn(
        "Action",
        capitalize(
            strict_trim(
                replace_exact(
                    regexp_strip_prefixes("Action", ["Market ", "Limit ", "Stop "]),
                    "Dividend (Ordinary)",
                    "Div",
                )
            )
        ),
    )
    got = sorted(
        r[0]
        for r in canon.filter(F.col("Action").isin("Buy", "Sell"))
        .dropDuplicates()
        .collect()
    )
    # all three sell variants canonicalize to 'Sell'; dedup collapses them
    assert got == ["Buy", "Sell"]


def test_flagship_pipeline_smoke(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    out = flagship_pipeline(orders)
    n_of = orders.filter(F.col("o_orderstatus").isin("O", "F")).count()
    n_p = orders.filter(F.col("o_orderstatus") == "P").count()
    assert out.count() == n_of + n_p  # dedup is a no-op on unique orders
    assert out.columns == [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "priority_class",
        "order_date",
        "split_ratio",
    ]
    # manual slice rows carry nulls in the missing columns (U3 semantics)
    manual_rows = out.filter(F.col("o_orderstatus") == "P")
    assert manual_rows.filter(F.col("o_totalprice").isNull()).count() == n_p
    assert set(
        r[0] for r in out.select("priority_class").distinct().collect()
    ) <= {"Urgent", "High", "Medium", "None", "Low", None}


def test_flagship_decimal_exact_vs_duckdb(spark):
    """DecimalType(18,2) money pipeline: the per-group decimal sums
    must equal DuckDB's DECIMAL sums EXACTLY — compared as
    decimal.Decimal on both sides (raw tuples, no float
    canonicalization, no rounding). This is the guarantee the
    registered double-output entry (`flagship_pipeline_decimal`)
    derives from; here the intermediate decimal aggregate itself is
    checked before any output cast."""
    import decimal

    from pyspark.sql import functions as F

    from trading212_etl_spark.plans.pipeline import canonicalize_actions
    from trading212_etl_spark.sources import load_table

    from .oracle_harness import duckdb_conn

    sf = "/root/testdata/sf0.01"
    o = load_table(spark, sf, "orders")
    got = {
        r["priority_class"]: r["revenue"]
        for r in (
            o.filter(F.col("o_orderstatus").isin("O", "F"))
            .select(
                canonicalize_actions("o_orderpriority").alias("priority_class"),
                F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
            )
            .groupBy("priority_class")
            .agg(F.sum("price").alias("revenue"))
            .collect()
        )
    }
    con = duckdb_conn(sf)
    want = dict(
        con.execute(
            """
            SELECT upper(substr(pc, 1, 1)) || lower(substr(pc, 2)),
                   sum(CAST(o_totalprice AS DECIMAL(18,2)))
            FROM (
              SELECT regexp_replace(o_orderpriority, '1-|2-|3-|4-|5-', '', 'g') AS pc0,
                     CASE WHEN regexp_replace(o_orderpriority, '1-|2-|3-|4-|5-', '', 'g')
                               = 'NOT SPECIFIED' THEN 'NONE'
                          ELSE regexp_replace(o_orderpriority, '1-|2-|3-|4-|5-', '', 'g')
                     END AS pc,
                     o_totalprice
              FROM orders WHERE o_orderstatus IN ('O', 'F')
            ) GROUP BY 1
            """
        ).fetchall()
    )
    con.close()
    assert set(got) == set(want)
    for k, v in want.items():
        assert isinstance(got[k], decimal.Decimal)
        assert got[k] == v, f"{k}: spark={got[k]!r} duckdb={v!r}"
