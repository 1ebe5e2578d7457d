"""Full-registry robustness sweep at an arbitrary SF directory.

Runs EVERY registry entry end-to-end (noop sink — full physical
execution, no driver collect) against the given data directory and
records per-entry wall + row-agnostic status to a JSONL artifact.
Purpose: demonstrate that the whole 260-entry registry — not just the
ten heaviest used in BENCH_SCALING's tertiary block — executes cleanly
at 5x data density (tools/gen_scale.py corpus), i.e. no entry hides an
assumption that only holds at the driver SFs.

Usage:
    python tools/sweep_sf.py <sf_dir> <out.jsonl> [start [end]]
    python tools/sweep_sf.py <sf_dir> <out.jsonl> <name> [name ...]

start/end slice the registry order so the sweep can run in chunks that
fit under a shell timeout; passing entry NAMES instead probes just
those entries (the bucket-skew protocol uses this to sweep the banded
LSH/IVF families against .scale/*_bskew corpora).
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trading212_etl_spark.registry import QUERIES, pin_oracle_confs  # noqa: E402
from trading212_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2]
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
