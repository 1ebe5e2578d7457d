"""Bucket-skew stress corpus for the banded LSH / IVF families.

gen_skew.py stresses HOT JOIN/GROUP KEYS (one user owns 30% of
events).  This tool stresses the orthogonal surface the r8 verdict
names as the last untested skew risk: a HOT SKETCH BUCKET.  Banded
dedup / ANN operators avoid the O(n²) cross join by only pairing
within equal (band, signature) buckets — which goes quadratic again
*inside* a bucket if a corpus slice is boilerplate-identical (every
doc shares the band signature) or embedding-collapsed (every vector
in one IVF cell / hyperplane bucket).  At 100 TB this is the normal
case, not the corner case: scraped corpora are full of template
boilerplate, and embedding models emit dense clusters for it.

Transform (share s, default 0.25, selection keyed on crc32 of the id
so it is deterministic and order-independent):

- documents:  s of docs get text = ONE template document's text with
  ~3% of tokens rewritten per doc (keyed on doc_id) — pairwise
  shingle Jaccard ≈ 0.9, far above the 0.5/0.7 thresholds, so the
  whole slice co-buckets in most MinHash bands and lands on one
  SimHash band signature: one mega-bucket of |s·n| docs.
- embeddings: s of vectors get embedding = ONE anchor vector + a
  per-vector deterministic perturbation at 1% relative magnitude —
  cosine ≈ 0.9999 pairwise, so the slice shares an IVF cell and every
  hyperplane bucket: one mega-cell.

All other tables copy verbatim; doc_id/vec_id keys are untouched so
referential behavior is unchanged.

Usage: python tools/gen_bucket_skew.py [--src .scale/sf0.5]
                                       [--out .scale/sf0.5_bskew]
                                       [--share 0.25]
Output is gitignored (.scale/); probe with tools/bucket_skew_probe.py
and record results in BENCH_SCALING's bucket_skew block.
"""

from __future__ import annotations

import argparse
import os
import re
import shutil
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TOKEN_RE = re.compile(r"\S+")


def _selected(ident: int, tag: str, share: float) -> bool:
    return zlib.crc32(f"{tag}\x00{ident}".encode()) % 1000 < int(share * 1000)


def _near_dup_text(template: str, ident: int, rate: float = 0.03) -> str:
    """Template text with ~rate of tokens rewritten, keyed on (doc id,
    position) — each hot doc is a distinct near-dup of the template
    (exact-dup structure would vanish at the dedup_exact stage and
    never stress the banded path).  Replacements are alpha-only for
    the same tokenizer-volume reason as gen_scale._perturb_text."""
    toks = list(_TOKEN_RE.finditer(template))
    bound = int(rate * 1000)
    out, last = [], 0
    for i, m in enumerate(toks):
        out.append(template[last : m.start()])
        h = zlib.crc32(f"{ident}\x00{i}".encode())
        if h % 1000 < bound:
            out.append("zq" + "".join(chr(ord("a") + (h >> (5 * j)) % 26) for j in range(4)))
        else:
            out.append(m.group())
        last = m.end()
    out.append(template[last:])
    return "".join(out)


def _skew_documents(src: str, dst: str, share: float) -> None:
    t = pq.read_table(src)
    ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    # template = text of the smallest selected doc_id with a non-empty
    # text, so the hot slice is anchored on real corpus content
    sel = [i for i, d in enumerate(ids) if _selected(d, "doc", share)]
    template = next(
        texts[i] for i in sorted(sel, key=lambda i: ids[i]) if texts[i]
    )
    n_hot = 0
    for i in sel:
        texts[i] = _near_dup_text(template, ids[i])
        n_hot += 1
    t = t.set_column(
        t.schema.get_field_index("text"), "text", pa.array(texts, type=pa.string())
    )
    if "n_chars" in t.schema.names:
        t = t.set_column(
            t.schema.get_field_index("n_chars"),
            "n_chars",
            pa.array([len(x) if x is not None else 0 for x in texts], type=pa.int64()),
        )
    pq.write_table(t, dst)
    print(f"documents: {len(ids)} rows, hot template slice = {n_hot} "
          f"({100.0 * n_hot / len(ids):.1f}%)")


def _skew_embeddings(src: str, dst: str, share: float) -> None:
    t = pq.read_table(src)
    ids = t.column("vec_id").to_pylist()
    embs = t.column("embedding").to_pylist()
    sel = [i for i, v in enumerate(ids) if _selected(v, "vec", share)]
    anchor_i = min(sel, key=lambda i: ids[i])
    anchor = embs[anchor_i]
    scale = max(abs(x) for x in anchor) or 1.0
    for i in sel:
        v = ids[i]
        embs[i] = [
            x + 0.01 * scale * (((zlib.crc32(f"{v}\x00{d}".encode()) % 2001) - 1000) / 1000.0)
            for d, x in enumerate(anchor)
        ]
    t = t.set_column(
        t.schema.get_field_index("embedding"),
        "embedding",
        pa.array(embs, type=t.schema.field("embedding").type),
    )
    pq.write_table(t, dst)
    print(f"embeddings: {len(ids)} rows, hot cell slice = {len(sel)} "
          f"({100.0 * len(sel) / len(ids):.1f}%)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=os.path.join(REPO, ".scale", "sf0.5"))
    ap.add_argument("--out", default=os.path.join(REPO, ".scale", "sf0.5_bskew"))
    ap.add_argument("--share", type=float, default=0.25)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    for fn in sorted(os.listdir(args.src)):
        if not fn.endswith(".parquet"):
            continue
        name = fn[: -len(".parquet")]
        src, dst = os.path.join(args.src, fn), os.path.join(args.out, fn)
        if name == "documents":
            _skew_documents(src, dst, args.share)
        elif name == "embeddings":
            _skew_embeddings(src, dst, args.share)
        else:
            shutil.copyfile(src, dst)


if __name__ == "__main__":
    main()
