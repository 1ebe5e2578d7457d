"""125x invariant check for the 2 rows-only sketch entries (VERDICT
r13 item 7): agg_approx_sketches and events_hll_rollup carry
error-bound tests at sf0.01 only — this probe re-proves the published
bounds against EXACT aggregates at an arbitrary corpus (default
.scale/sf12.5, the 125x replication), closing the last
untested-at-scale corner of the registry.

Bounds checked (all published, none tuned to the data):
- approx_count_distinct(rsd=0.02): HLL++ relative standard deviation
  2% — assert every group within 5 sd (10%) of exact countDistinct.
- percentile_approx(accuracy=10000): deterministic RANK error
  <= 1/accuracy — assert the exact rank fraction of each returned
  value within target +/- 2/accuracy (x2 slack for ties/interp).
- hll_sketch_agg(lgConfigK=12) union-rollup: rsd ~= 1.04/sqrt(2^12)
  = 1.63% — assert every day within 5% of exact (the sf0.01 test's
  bar, now at 125x cardinalities).

Usage: python tools/probe_sketch_bounds.py [sf_dir]
Prints one JSON line with per-entry worst deltas; exit 1 on breach.
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".scale/sf12.5"
    spark = get_session(app_name="probe_sketch_bounds")
    pin_oracle_confs(spark)
    out: dict = {"sf_dir": sf_dir}
    ok = True

    # --- agg_approx_sketches ---------------------------------------
    t0 = time.monotonic()
    approx = {
        r["l_returnflag"]: r
        for r in QUERIES["agg_approx_sketches"](spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()
    }
    hll_rel = []
    for flag, a in approx.items():
        e = exact[flag]["n_orders"]
        hll_rel.append(abs(a["n_orders_approx"] - e) / e)
    out["approx_count_distinct"] = {
        "groups": len(approx),
        "worst_rel_err": round(max(hll_rel), 5),
        "bound_5sd": 0.10,
    }
    ok &= max(hll_rel) <= 0.10

    # rank check for the two percentile estimates: fraction of rows
    # <= returned value must sit within target +/- 2/accuracy
    rank_errs = []
    for q_target, col in ((0.5, "median_approx"), (0.9, "p90_approx")):
        # one conditional-avg aggregate per flag, single pass
        row = li.agg(
            *[
                F.avg(
                    F.when(
                        F.col("l_returnflag") == flag,
                        (
                            F.col("l_extendedprice")
                            <= F.lit(float(approx[flag][col]))
                        ).cast("double"),
                    )
                ).alias(flag)
                for flag in approx
            ]
        ).collect()[0]
        for flag in approx:
            rank_errs.append(abs(row[flag] - q_target))
    out["percentile_approx"] = {
        "checks": len(rank_errs),
        "worst_rank_err": round(max(rank_errs), 6),
        "bound_2_over_accuracy": 2.0 / 10000,
    }
    ok &= max(rank_errs) <= 2.0 / 10000
    out["agg_approx_sketches_sec"] = round(time.monotonic() - t0, 1)

    # --- events_hll_rollup ------------------------------------------
    t0 = time.monotonic()
    est = {
        r["day"]: r["n_users_est"]
        for r in QUERIES["events_hll_rollup"](spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    exact_day = {
        r["day"]: r["n"]
        for r in ev.groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    day_rel = [abs(est[d] - exact_day[d]) / exact_day[d] for d in est]
    out["events_hll_rollup"] = {
        "days": len(est),
        "worst_rel_err": round(max(day_rel), 5),
        "bound": 0.05,
    }
    ok &= max(day_rel) <= 0.05
    out["events_hll_rollup_sec"] = round(time.monotonic() - t0, 1)

    out["ok"] = bool(ok)
    print(json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
