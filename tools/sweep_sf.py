"""Full-registry robustness sweep at an arbitrary SF directory.

Runs EVERY registry entry end-to-end (noop sink — full physical
execution, no driver collect) against the given data directory and
records per-entry wall + row-agnostic status to a JSONL artifact.
Purpose: demonstrate that the whole 260-entry registry — not just the
ten heaviest used in BENCH_SCALING's tertiary block — executes cleanly
at 5x data density (tools/gen_scale.py corpus), i.e. no entry hides an
assumption that only holds at the driver SFs.

Usage:
    python tools/sweep_sf.py [--unbounded] <sf_dir> <out.jsonl> [start [end]]
    python tools/sweep_sf.py [--unbounded] <sf_dir> <out.jsonl> <name> [name ...]

start/end slice the registry order so the sweep can run in chunks that
fit under a shell timeout; passing entry NAMES instead probes just
those entries (the bucket-skew protocol uses this to sweep the banded
LSH/IVF families against .scale/*_bskew corpora).

The harness SETS ``SPARK_GRAFT_PAIRS_TOP_K=8`` itself unless the env
var is already exported or ``--unbounded`` is passed (VERDICT r13
item 4): the 5 exact-pair consumers' true answers are quadratic in a
replicated corpus' copy count, and the one r13 launch that forgot the
lever ran two unbounded quadratics in parallel and drained /tmp
20G→0.8G. Bounded is the documented sweep deployment mode;
``--unbounded`` is the loud opt-out for oracle-semantics probes.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = list(sys.argv[1:])
    unbounded = "--unbounded" in argv
    if unbounded:
        argv.remove("--unbounded")
    if unbounded:
        os.environ.pop("SPARK_GRAFT_PAIRS_TOP_K", None)
        print("sweep mode: UNBOUNDED exact-pair semantics (--unbounded)",
              flush=True)
    elif "SPARK_GRAFT_PAIRS_TOP_K" not in os.environ:
        os.environ["SPARK_GRAFT_PAIRS_TOP_K"] = "8"
        print("sweep mode: SPARK_GRAFT_PAIRS_TOP_K=8 (harness default; "
              "pass --unbounded for exact-pair oracle semantics)",
              flush=True)
    else:
        print("sweep mode: SPARK_GRAFT_PAIRS_TOP_K="
              f"{os.environ['SPARK_GRAFT_PAIRS_TOP_K']} (inherited)",
              flush=True)
    # import AFTER the lever is pinned — registry modules read the env
    # var at query-build time, but keeping the order strict means a
    # future import-time read cannot silently bypass the default
    from trading212_etl_spark.registry import QUERIES, pin_oracle_confs
    from trading212_etl_spark.session import get_session

    sf_dir = argv[0]
    out_path = argv[1]
    sys.argv = [sys.argv[0]] + argv  # keep the positional parsing below
    if len(sys.argv) > 3 and not sys.argv[3].isdigit():
        names = sys.argv[3:]
        unknown = [n for n in names if n not in QUERIES]
        assert not unknown, f"unknown entries: {unknown}"
        start = 0
    else:
        start = int(sys.argv[3]) if len(sys.argv) > 3 else 0
        end = int(sys.argv[4]) if len(sys.argv) > 4 else len(QUERIES)
        names = list(QUERIES)[start:end]

    spark = get_session(app_name="sweep_sf")
    pin_oracle_confs(spark)
    failures = 0
    with open(out_path, "a") as out:
        for i, name in enumerate(names):
            t0 = time.monotonic()
            try:
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                rec = {"name": name, "sec": round(time.monotonic() - t0, 3),
                       "ok": True}
            except Exception:
                failures += 1
                err_lines = [
                    l for l in traceback.format_exc(limit=3).splitlines()
                    if l.strip()
                ]
                rec = {"name": name, "sec": round(time.monotonic() - t0, 3),
                       "ok": False,
                       "err": err_lines[-1] if err_lines else "unknown"}
            out.write(json.dumps(rec) + "\n")
            out.flush()
            print(f"[{start + i + 1}/{start + len(names)}] {name}: "
                  f"{'ok' if rec['ok'] else 'FAIL'} {rec['sec']}s",
                  flush=True)
    print(f"FAILURES: {failures}", flush=True)


if __name__ == "__main__":
    main()
