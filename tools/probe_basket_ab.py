"""Interleaved A/B for the orders_basket_affinity pair generator
(VERDICT r14 item 6; guide §2.4): OLD = distinct items + co-partitioned
self-join; NEW = triangle_count's basket pattern — ONE l_orderkey
shuffle builds sorted baskets via collect_set (subsuming the distinct),
ordered pairs explode from a slice/transform expression, per-part
frequencies and the order count both derive from the SAME basket frame
(freq = explode, n_orders = count), so the join, its exchange and the
distinct disappear.

Row-for-row equivalence: sorted collect_set slice pairs == the join's
(a.part < b.part per order) rows; explode(parts) == distinct (order,
part); count(baskets) == count_distinct(l_orderkey). Checked here with
a full collect-compare before timing.

Usage: python tools/probe_basket_ab.py [--sf DIR] [--n N] [--check]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from trading212_etl_spark.registry import pin_oracle_confs  # noqa: E402
from trading212_etl_spark.session import get_session  # noqa: E402
from trading212_etl_spark.sources.readers import load_table  # noqa: E402


def old_shape(spark, sf_dir):
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = items.agg(F.count_distinct("l_orderkey").alias("n_orders"))
    freq = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_f"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )
    fa = freq.select(F.col("l_partkey").alias("part_a"), F.col("n_f").alias("n_fa"))
    fb = freq.select(F.col("l_partkey").alias("part_b"), F.col("n_f").alias("n_fb"))
    return (
        pairs.join(F.broadcast(fa), "part_a")
        .join(F.broadcast(fb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a", "part_b", "pair_count",
            F.expr("pair_count * n_orders * 10000 DIV (n_fa * n_fb)").alias("lift_bp"),
        )
        .orderBy(F.col("pair_count").desc(), "part_a", "part_b")
        .limit(20)
    )


def new_shape(spark, sf_dir):
    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
    )
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    freq = baskets.select(F.explode("parts").alias("l_partkey")).groupBy(
        "l_partkey"
    ).agg(F.count(F.lit(1)).alias("n_f"))
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(parts, (x, i) ->"
                    " transform(slice(parts, i + 2, size(parts)),"
                    " y -> struct(x AS part_a, y AS part_b))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.part_a").alias("part_a"), F.col("p.part_b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )
    fa = freq.select(F.col("l_partkey").alias("part_a"), F.col("n_f").alias("n_fa"))
    fb = freq.select(F.col("l_partkey").alias("part_b"), F.col("n_f").alias("n_fb"))
    return (
        pairs.join(F.broadcast(fa), "part_a")
        .join(F.broadcast(fb), "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a", "part_b", "pair_count",
            F.expr("pair_count * n_orders * 10000 DIV (n_fa * n_fb)").alias("lift_bp"),
        )
        .orderBy(F.col("pair_count").desc(), "part_a", "part_b")
        .limit(20)
    )


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale", "sf12.5",
    )
    n = 2
    check = "--check" in args
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a == "--n":
            n = int(next(it))
    spark = get_session(app_name="probe_basket_ab")
    pin_oracle_confs(spark)

    if check:
        o = [tuple(r) for r in old_shape(spark, sf_dir).collect()]
        m = [tuple(r) for r in new_shape(spark, sf_dir).collect()]
        assert o == m, f"row mismatch:\nold={o[:5]}\nnew={m[:5]}"
        print(f"rows_equal: True ({len(o)} rows)")

    def run(arm: str) -> float:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"basket_ab:{arm}")
        shape = old_shape if arm == "old" else new_shape
        t0 = time.perf_counter()
        shape(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    walls = {"new": [], "old": []}
    for i in range(n):
        for arm in ("new", "old") if i % 2 == 0 else ("old", "new"):
            walls[arm].append(run(arm))
    print(json.dumps({
        "sf": sf_dir,
        "loadavg": round(os.getloadavg()[0], 2),
        "walls": walls,
        "min": {a: min(w) for a, w in walls.items()},
    }))


if __name__ == "__main__":
    main()
