"""Deterministic skew-stress corpus: reassign a share of foreign keys
to ONE hot key.

gen_scale.py answers "does the plan survive k-times the rows?" — this
tool answers the orthogonal 100 TB question: "does it survive a hot
key?" Real event logs and order books are Zipfian; a single power user
(or instrument) routinely owns a double-digit share of a partition key.
The engine's skew answers are (a) AQE skew-join splitting, (b) partial
(map-side) aggregation for groupBys, (c) salted_agg / salted-join
helpers, and (d) for per-key ORDER BY windows — where the semantics
pin every row of a key to one task — documented serialization on the
hot key. This tool makes those answers measurable instead of asserted.

Transform (share s, default 0.30, selection keyed on a row-identity
hash so it is deterministic and join-consistent):

- events:   s of rows get user_id = min(user_id)  -> one mega-user
            for sessionization / per-user windows / DAU aggregates;
- orders:   s of rows get o_custkey = min(o_custkey) -> one mega-
            customer for customer joins (AQE skew path);
- lineitem: s of rows get l_suppkey = min(l_suppkey) -> one mega-
            supplier for supplier joins/scorecards.

Orderkey linkage (orders <-> lineitem) is untouched, so referential
integrity and fact-fact fan-outs survive. All other tables copy
verbatim.

Usage: python tools/gen_skew.py [--src .scale/sf2.5]
                                [--out .scale/sf2.5_skew] [--share 0.3]
       python tools/gen_skew.py --zipf 1.1 --out .scale/sf2.5_zipf
           (multi-hot-key variant: every key redrawn from the table's
           own key universe under a Zipf rank-frequency law — many
           warm keys with geometrically decaying shares, the r8
           verdict's task-6 shape, vs the single 30% mega-key above)
Output is gitignored (.scale/); probe with tools/sweep_sf.py or the
BENCH_SWEEP artifact's skew block protocol.
"""

from __future__ import annotations

import argparse
import os
import shutil
import zlib

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# table -> (identity column for the selection hash, key column to skew)
SKEWED = {
    "events": ("event_id", "user_id"),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_suppkey"),
}


def _skew_table(src: str, dst: str, id_col: str, key_col: str, share: float) -> None:
    t = pq.read_table(src)
    ids = t.column(id_col).to_pylist()
    keys = t.column(key_col)
    hot = pc.min(keys).as_py()
    bound = int(share * 1000)
    # crc32 of (column name, id) — deterministic, independent of row
    # order, and different per table so the same orderkey is not
    # always selected in both orders and lineitem
    mask = pa.array(
        [zlib.crc32(f"{key_col}\x00{i}".encode()) % 1000 < bound for i in ids]
    )
    new_keys = pc.if_else(mask, pa.scalar(hot, type=keys.type), keys)
    t = t.set_column(t.schema.get_field_index(key_col), key_col, new_keys)
    pq.write_table(t, dst)
    n_hot = pc.sum(pc.equal(new_keys, pa.scalar(hot, type=keys.type))).as_py()
    print(f"{os.path.basename(dst)}: {len(ids)} rows, hot {key_col}={hot} "
          f"owns {n_hot} ({100.0 * n_hot / len(ids):.1f}%)")


def _zipf_table(src: str, dst: str, id_col: str, key_col: str, s: float) -> None:
    """Reassign EVERY row's key by sampling the table's own key
    universe under a Zipf(s) rank-frequency law — the r8 verdict's
    task 6 corpus: not one mega-key but the real power-law shape
    (many warm keys of geometrically decaying share) that AQE's
    skew-split and salting see in production. Deterministic: the
    row's uniform draw is crc32(column, id) / 2^32 inverted through
    the Zipf CDF; rank r maps to the r-th smallest existing key, so
    referential joins against dimension tables keep resolving."""
    import numpy as np

    t = pq.read_table(src)
    ids = t.column(id_col).to_pylist()
    keys = t.column(key_col)
    uniq = sorted(pc.unique(keys).to_pylist())
    n = len(uniq)
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    cdf = np.cumsum(w) / w.sum()
    draws = np.array(
        [zlib.crc32(f"zipf\x00{key_col}\x00{i}".encode()) for i in ids],
        dtype=np.float64,
    ) / 2**32
    ranks = np.searchsorted(cdf, draws, side="left")
    new_keys = pa.array([uniq[r] for r in ranks], type=keys.type)
    t = t.set_column(t.schema.get_field_index(key_col), key_col, new_keys)
    pq.write_table(t, dst)
    top = pc.value_counts(new_keys).to_pylist()
    top.sort(key=lambda kv: -kv["counts"])
    shares = [round(100.0 * kv["counts"] / len(ids), 2) for kv in top[:5]]
    print(f"{os.path.basename(dst)}: {len(ids)} rows, Zipf({s}) over "
          f"{n} keys, top-5 key shares % = {shares}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=os.path.join(REPO, ".scale", "sf2.5"))
    ap.add_argument("--out", default=os.path.join(REPO, ".scale", "sf2.5_skew"))
    ap.add_argument("--share", type=float, default=0.30)
    ap.add_argument(
        "--zipf",
        type=float,
        default=None,
        metavar="S",
        help="instead of one hot key, redraw every key from the "
        "table's own key universe under a Zipf(S) rank-frequency "
        "law (e.g. --zipf 1.1 --out .scale/sf2.5_zipf)",
    )
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    for fn in sorted(os.listdir(args.src)):
        if not fn.endswith(".parquet"):
            continue
        name = fn[: -len(".parquet")]
        src, dst = os.path.join(args.src, fn), os.path.join(args.out, fn)
        if name in SKEWED:
            id_col, key_col = SKEWED[name]
            if args.zipf is not None:
                _zipf_table(src, dst, id_col, key_col, args.zipf)
            else:
                _skew_table(src, dst, id_col, key_col, args.share)
        else:
            shutil.copyfile(src, dst)


if __name__ == "__main__":
    main()
