"""Dump `.explain("formatted")` for named queries to plans/r15/.

Usage: python tools/dump_query_plans_r15.py <suffix> <query> [<query> ...]
Writes plans/r15/<query>_<suffix>.txt (suffix: before / after).

Runs at sf0.01 (plan shape is SF-independent; the scan paths differ
only in file names) on the engine session with oracle confs pinned —
the same context bench.py times.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trading212_etl_spark.registry import QUERIES, pin_oracle_confs  # noqa: E402
from trading212_etl_spark.session import get_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app_name=f"plans_r15_{suffix}")
    pin_oracle_confs(spark)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — explain('formatted') at {SF_DIR} ({suffix})\n\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
