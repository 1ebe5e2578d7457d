"""Isolated per-query wall probe: run named queries N times each
(clearCache + GC before every run, noop sink), print per-query walls
and the min — the bench's first-run-after-clear convention without the
other 130 queries around it.

Usage:
  python tools/probe_isolated.py [--sf DIR] [--n N] <query> [<query>...]

Emits one JSON line at the end: {"sf": ..., "n": N, "walls": {q: [..]},
"min": {q: m}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trading212_etl_spark.registry import QUERIES, pin_oracle_confs  # noqa: E402
from trading212_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    n = 3
    names = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a == "--n":
            n = int(next(it))
        else:
            names.append(a)
    spark = get_session(app_name="probe_isolated")
    pin_oracle_confs(spark)
    # warm-up: one pass per query at sf0.01 (codegen/JIT; bench.py
    # warm-up rationale) + footer touch of the measured dir
    warm = "/root/testdata/sf0.01"
    for q in names:
        spark.sparkContext.setJobDescription(f"warm:{q}")
        QUERIES[q](spark, warm).write.format("noop").mode("overwrite").save()
    walls: dict[str, list[float]] = {q: [] for q in names}
    for i in range(n):
        for q in names:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            spark.sparkContext.setJobDescription(f"probe:{q}:{i}")
            t0 = time.perf_counter()
            QUERIES[q](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls[q].append(round(time.perf_counter() - t0, 3))
    out = {
        "sf": sf_dir,
        "n": n,
        "loadavg": round(os.getloadavg()[0], 2),
        "walls": walls,
        "min": {q: min(w) for q, w in walls.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
