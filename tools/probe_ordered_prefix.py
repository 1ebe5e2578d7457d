"""Measure the ordered_prefix range-sampling double-pass (VERDICT r14
item 9) on the two entries whose ordered_prefix input is scan-sized:
sample_curriculum_order (tokenize+quality chain) and
parts_abc_classification (lineitem revenue aggregate).

repartitionByRange SAMPLES its child to pick range bounds, so the
upstream chain executes twice (sample pass + shuffle pass). This probe
times, at 125x, interleaved min-of-N:

  upstream_noop   one execution of the ordered_prefix input
  entry           the current entry (double-pass)
  pinned          the same entry shape with the input freeze-pinned
                  before ordered_prefix (the candidate fix: the sample
                  pass then reads the cache)

Usage: python tools/probe_ordered_prefix.py [--sf DIR] [--n N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from trading212_etl_spark.partitioning import (  # noqa: E402
    freeze_partitions,
    is_heavy,
    ordered_prefix,
    release_pins,
)
from trading212_etl_spark.registry import pin_oracle_confs  # noqa: E402
from trading212_etl_spark.session import get_session  # noqa: E402
from trading212_etl_spark.sources.readers import load_table  # noqa: E402


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def curriculum_input(spark, sf_dir):
    from trading212_etl_spark.operators.textual import _with_tokens, quality_bp_col

    docs = load_table(spark, sf_dir, "documents")
    return _with_tokens(docs, "doc_id", "text").select(
        "doc_id",
        quality_bp_col(F.col("__toks"), F.col("text")).alias("quality_bp"),
    )


def curriculum_out(q):
    ranked = ordered_prefix(
        q, [F.col("quality_bp").desc(), F.col("doc_id")],
        rn_name="curriculum_rank",
    )
    return ranked.select(
        "doc_id", "quality_bp",
        F.col("curriculum_rank").cast("bigint").alias("curriculum_rank"),
    )


def abc_input(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey").agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")) * 100)
        .cast("bigint").alias("rev_cents")
    )


def abc_out(rev):
    r = ordered_prefix(
        rev, [F.col("rev_cents").desc(), F.col("l_partkey")],
        sum_cols=["rev_cents"],
    )
    return r.select(
        "l_partkey", "rev_cents",
        F.expr("CAST(run_rev_cents * 10000 DIV total_rev_cents AS BIGINT)")
        .alias("cum_share_bp"),
    )


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale", "sf12.5",
    )
    n = 2
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a == "--n":
            n = int(next(it))
    spark = get_session(app_name="probe_ordered_prefix")
    pin_oracle_confs(spark)

    cases = {
        "curriculum": (curriculum_input, curriculum_out),
        "abc": (abc_input, abc_out),
    }
    out: dict = {"sf": sf_dir, "loadavg0": round(os.getloadavg()[0], 2)}
    for name, (inp, shape) in cases.items():
        out[name] = {"is_heavy_input": is_heavy(inp(spark, sf_dir))}
        walls: dict = {"upstream": [], "entry": [], "pinned": []}
        for i in range(n):
            for arm in ("upstream", "entry", "pinned"):
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
                spark.sparkContext.setJobDescription(f"{name}:{arm}:{i}")
                t0 = time.perf_counter()
                q = inp(spark, sf_dir)
                if arm == "upstream":
                    df = q
                elif arm == "entry":
                    df = shape(q)
                else:
                    df = shape(freeze_partitions(q))
                df.write.format("noop").mode("overwrite").save()
                walls[arm].append(round(time.perf_counter() - t0, 3))
                release_pins()
        out[name]["walls"] = walls
        out[name]["min"] = {a: min(w) for a, w in walls.items()}
    out["loadavg1"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
