"""Stage decomposition for graph_triangle_count at 125x (guide §1):
(a) basket aggregate, (b) pair explode + support-2 edge aggregate,
(c) the full entry — so the wall splits into basket shuffle vs pair
exchange vs the three-way join.

Usage: python tools/probe_triangle_stages.py [--sf DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from trading212_etl_spark.registry import QUERIES, pin_oracle_confs  # noqa: E402
from trading212_etl_spark.session import get_session  # noqa: E402
from trading212_etl_spark.sources.readers import load_table  # noqa: E402


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[sys.argv.index("--sf") + 1] if "--sf" in sys.argv else \
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".scale", "sf12.5")
    spark = get_session(app_name="probe_triangle")
    pin_oracle_confs(spark)
    t: dict = {"sf": sf_dir, "loadavg0": round(os.getloadavg()[0], 2)}

    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    spark.sparkContext.setJobDescription("triangle: baskets")
    t["baskets_noop"] = noop(baskets.select(F.size("parts").alias("n")))

    pairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(parts, (x, i) ->"
                " transform(slice(parts, i + 2, size(parts)),"
                " y -> struct(x AS u, y AS v))))"
            )
        ).alias("p")
    ).select("p.u", "p.v")
    edges = (
        pairs.groupBy("u", "v").agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= 2).select("u", "v")
    )
    spark.sparkContext.setJobDescription("triangle: edges (pairs+support)")
    t["edges_noop"] = noop(edges)
    t["n_edges"] = edges.count()

    spark.sparkContext.setJobDescription("triangle: full entry")
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    t["full_noop"] = noop(QUERIES["graph_triangle_count"](spark, sf_dir))
    t["loadavg1"] = round(os.getloadavg()[0], 2)
    print(json.dumps(t))


if __name__ == "__main__":
    main()
