"""Sweep every bench query's FORMATTED plan for the duplicate-subtree
defect class batch 1 of r14 fixed: the same parquet table scanned by
MORE THAN ONE DISTINCT scan node (plan branches that re-execute a
shared subtree instead of pinning it).

A reprint of one cached/reused node does NOT count — we key on the
distinct `(N) Scan parquet` detail-section node ids, which appear
once each regardless of how many tree positions reference them.

Legit >1 cases exist (self-joins on different filters/columns, tiny
query sides) — output is a REVIEW LIST ranked by scan multiplicity,
not an error gate.

Usage: python tools/scan_dup_audit.py [query ...]   (default: all
bench queries)  -> JSON lines per flagged query.
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trading212_etl_spark.registry import QUERIES, pin_oracle_confs  # noqa: E402
from trading212_etl_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

# bench.py's headline set = every registry entry not excluded there
_BENCH_EXCLUDES_RE = re.compile(r"^(streaming_|sink_sig|incremental_)")


def main() -> None:
    names = sys.argv[1:] or sorted(QUERIES)
    spark = get_session(app_name="scan_dup_audit")
    pin_oracle_confs(spark)
    scan_hdr = re.compile(r"^\(\d+\) Scan parquet\b")
    loc = re.compile(r"Location: \S+ \[[^\]]*/([a-z_0-9]+)\.parquet\]")
    flagged = 0
    for name in names:
        try:
            df = QUERIES[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.toString() if hasattr(buf, "toString") else buf.getvalue()
        except Exception as e:  # noqa: BLE001 - audit tool: report and move on
            print(json.dumps({"query": name, "error": str(e)[:200]}))
            continue
        tables: dict[str, int] = {}
        lines = txt.splitlines()
        for i, ln in enumerate(lines):
            if scan_hdr.match(ln.strip()):
                for lk in lines[i : i + 6]:
                    m = loc.search(lk)
                    if m:
                        tables[m.group(1)] = tables.get(m.group(1), 0) + 1
                        break
        dups = {t: c for t, c in tables.items() if c > 1}
        if dups:
            flagged += 1
            print(
                json.dumps(
                    {
                        "query": name,
                        "dup_scans": dups,
                        "windows": len(
                            [
                                ln
                                for ln in lines
                                if re.match(r"^\(\d+\) Window\b", ln.strip())
                            ]
                        ),
                    }
                )
            )
    print(f"# flagged {flagged}/{len(names)}", file=sys.stderr)


if __name__ == "__main__":
    main()
