"""Deterministic scale-up of a driver testdata dir (VERDICT r6 item 7).

The driver ships sf0.001/0.01/0.1 only; the sf0.01->sf0.1 wall ratios
are overhead-dominated (0.33-0.95x), so they cannot evidence
data-scaling behavior. This tool manufactures a k-times corpus from an
existing SF dir by KEY-OFFSET REPLICATION — the standard snowflake
scale-up that preserves per-key fan-outs and value distributions
exactly (every copy is the original relation under a key translation),
so per-query wall ratios at k x rows are attributable to data volume,
not to a distribution shift:

- dimension tables with bounded real-world domains (region, nation)
  are NOT replicated — at 100 TB there are still 25 nations;
- every surrogate key (custkey, orderkey, partkey, suppkey, event_id,
  user_id, doc_id, vec_id) is offset per copy by (max_key + 1), so
  referential integrity and join fan-outs survive verbatim;
- documents: copy 0 is byte-identical; later copies deterministically
  replace ~30% of tokens keyed on (copy, token, position) — NOT on
  doc_id — so planted intra-copy duplicate/near-dup structure is
  preserved bit-for-bit per copy (identical texts perturb identically)
  while cross-copy Jaccard lands ~0.54, below near-dup thresholds:
  the dedup workload sees k x the data with the SAME dup rate, not a
  k-times-duplicated corpus;
- embeddings: each copy applies a fixed seeded PERMUTATION of the
  dimensions — norms and all intra-copy pairwise distances are exactly
  preserved (the ANN workload shape scales, cosine structure intact),
  while cross-copy vectors decorrelate.

Usage: python tools/gen_scale.py [--k 5] [--src /root/testdata/sf0.1]
                                 [--out <repo>/.scale/sf0.5]
Output lands INSIDE the repo (driver dirs are read-only) and is
gitignored; bench.py picks it up as the tertiary scaling block.
"""

from __future__ import annotations

import argparse
import os
import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# table -> {column: key-space} ; columns sharing a key-space share one
# offset so foreign keys keep resolving after translation
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
STATIC = ["region", "nation"]
# name columns that EMBED their row's key as a digit run
# ('Customer#000000042'): the digits must be rewritten to the shifted
# key, or every copy carries the same name and any name-derived
# attribute (ER blocking keys, name joins) sees k-times duplication —
# a distribution shift this tool's contract forbids. Found the hard
# way: at k=125 the un-rewritten c_name turned each customer's ER
# block into a 375-node clique (~1B true edges) and OOM'd the
# connected-components probe.
NAME_KEYED = {
    "customer": ("c_name", "c_custkey"),
    "supplier": ("s_name", "s_suppkey"),
}
_TOKEN_RE = re.compile(r"\S+")
_DIGIT_RUN_RE = re.compile(r"\d+$")


def _perturb_text(text: str, copy: int) -> str:
    """Replace ~30% of whitespace tokens.  Token SELECTION hashes
    (token text, position) only — doc_id- and copy-independent, so
    identical texts stay identical within a copy (planted dup
    structure survives) and the same positions are rewritten in every
    copy; the REPLACEMENT token embeds `copy`, so cross-copy shingle
    overlap drops to ~0.54 Jaccard."""
    toks = list(_TOKEN_RE.finditer(text))
    hits = {
        i
        for i, m in enumerate(toks)
        if zlib.crc32(f"{m.group()}\x00{i}".encode()) % 10 < 3
    }

    def _alpha(n: int) -> str:
        # replacement tokens must be ALPHA-ONLY: the corpus tokenizer
        # is '[a-z]+|[0-9]+|[^a-z0-9\s]', so a digit-bearing token
        # like 'w1q123' splits into FOUR tokens and the scaled corpus
        # carries ~2x the token volume of the source — which made the
        # first tertiary bench read rake/bigram/minhash as
        # superlinear when the real scaling was in the inputs
        out = []
        while True:
            out.append(chr(ord("a") + n % 26))
            n //= 26
            if not n:
                return "".join(out)
    if toks and not hits:
        # a short doc whose tokens all hash outside the replace set
        # would otherwise be byte-identical across copies,
        # manufacturing cross-copy exact dups the source corpus never
        # had; text-content-only decision keeps identical texts
        # identical within a copy
        hits = {0}
    out = []
    last = 0
    for i, m in enumerate(toks):
        out.append(text[last : m.start()])
        h = zlib.crc32(f"{m.group()}\x00{i}".encode())
        out.append(
            f"w{_alpha(copy)}q{_alpha(h % 9973)}" if i in hits else m.group()
        )
        last = m.end()
    out.append(text[last:])
    return "".join(out)


def scale_table(src: str, out: str, table: str, k: int) -> int:
    t = pq.read_table(os.path.join(src, f"{table}.parquet"))
    if table in STATIC:
        pq.write_table(t, os.path.join(out, f"{table}.parquet"))
        return t.num_rows
    keymap = KEYED[table]
    offsets = {
        col: int(pa.compute.max(t[col]).as_py()) + 1 for col in keymap
    }
    copies = []
    for c in range(k):
        tc = t
        for col, _space in keymap.items():
            idx = tc.schema.get_field_index(col)
            shifted = pa.compute.add(tc[col], c * offsets[col])
            tc = tc.set_column(idx, tc.schema.field(idx), shifted.cast(t.schema.field(idx).type))
        if table in NAME_KEYED and c > 0:
            name_col, key_col = NAME_KEYED[table]
            keys = tc[key_col].to_pylist()
            names = [
                _DIGIT_RUN_RE.sub(
                    lambda m, k=k: str(k).zfill(len(m.group())), nm
                )
                for nm, k in zip(tc[name_col].to_pylist(), keys)
            ]
            ni = tc.schema.get_field_index(name_col)
            tc = tc.set_column(
                ni, tc.schema.field(ni), pa.array(names, pa.string())
            )
        if table == "documents" and c > 0:
            texts = [_perturb_text(x, c) for x in tc["text"].to_pylist()]
            ti = tc.schema.get_field_index("text")
            tc = tc.set_column(ti, tc.schema.field(ti), pa.array(texts, pa.string()))
            ni = tc.schema.get_field_index("n_chars")
            tc = tc.set_column(
                ni,
                tc.schema.field(ni),
                pa.array([len(x) for x in texts], tc.schema.field(ni).type),
            )
        if table == "embeddings" and c > 0:
            vecs = np.array(tc["embedding"].to_pylist(), dtype=np.float32)
            rng = np.random.default_rng(1000 + c)  # seeded: deterministic
            perm = rng.permutation(vecs.shape[1])
            ei = tc.schema.get_field_index("embedding")
            tc = tc.set_column(
                ei,
                tc.schema.field(ei),
                pa.array(list(vecs[:, perm]), tc.schema.field(ei).type),
            )
        copies.append(tc)
    full = pa.concat_tables(copies)
    pq.write_table(full, os.path.join(out, f"{table}.parquet"))
    return full.num_rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=os.path.join(REPO, ".scale", "sf0.5"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for table in STATIC + list(KEYED):
        n = scale_table(args.src, args.out, table, args.k)
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    main()
