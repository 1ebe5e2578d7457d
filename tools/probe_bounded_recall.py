"""Measure bounded exact-pair recall on mixed-similarity corpora
(VERDICT r12 item 6): with ``top_k_per_doc`` set, the kept pair set
is proven bit-identical to unbounded+truncate on REPLICATED cliques,
but recall above the per-bucket hub cap on buckets holding UNEQUAL
similarities is documented-approximate. This probe puts the missing
number on it.

Corpora (both hostile to the hub cap):
- ``bskew``  — a deterministic doc_id-sample of .scale/sf0.5_bskew's
  documents (25% of docs are near-dups of ONE template), sized so the
  UNBOUNDED listing — the ground truth — is still feasible; on the
  full corpus the truth is quadratic by construction, which is
  exactly why bounded mode exists.
- ``graded`` — a synthetic mixed-similarity corpus: families whose
  members share a family template but mutate a per-member fraction of
  tokens (0–50%), so one family's shingle buckets hold a SPREAD of
  pairwise Jaccards instead of one value — the regime where the
  hub-subgraph candidate route can miss above-cap pairs.

Metrics per (corpus, hubs setting), at threshold 0.5, k = 8:
- ``recall_vs_topk``  — |kept ∩ true-top-k| / |true-top-k| where
  true-top-k is the unbounded listing truncated by the same
  _top_k_per_doc rule: the number a top_k_per_doc user loses.
- ``recall_vs_full``  — |kept| coverage of the full >=-threshold
  listing (context only: top-k truncation makes this < 1 by DESIGN).
- ``kept`` / ``truth_topk`` / ``truth_full`` pair counts.

Hub settings: the default max(k+1, 8) floor, and 4x that — the
recall/cost dial _candidate_common_counts exposes via ``hubs``.

Usage: python tools/probe_bounded_recall.py [out.json] — prints ONE
JSON line (and merges it under BENCH_SCALING.json["bounded_pair_recall"]
if an existing path is given); run on an otherwise idle host.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trading212_etl_spark.session import get_session  # noqa: E402

K = 8
THRESHOLD = 0.5


def _top_k_truth(pairs: list[tuple[int, int, float]], k: int) -> set:
    """Reference reimplementation of _top_k_per_doc's per-SIDE rule
    over a collected pair list: keep a pair if it ranks <= k among
    doc_a's pairs (jaccard DESC, doc_b ASC) or <= k among doc_b's
    (jaccard DESC, doc_a ASC)."""
    from collections import defaultdict

    by_a = defaultdict(list)
    by_b = defaultdict(list)
    for a, b, j in pairs:
        by_a[a].append((-j, b))
        by_b[b].append((-j, a))
    keep = set()
    for a, lst in by_a.items():
        for _, b in sorted(lst)[:k]:
            keep.add((a, b))
    for b, lst in by_b.items():
        for _, a in sorted(lst)[:k]:
            keep.add((a, b))
    return keep


def _graded_corpus(spark):
    """300 families x 16 members; member m of a family keeps the
    96-token family template but replaces a deterministic fraction
    (m/32, i.e. 0..47%) of token positions with member-unique tokens
    — pairwise Jaccard within a family spans ~0.05..1.0, crossing the
    0.5 threshold mid-family."""
    return spark.sql(
        """
        SELECT fam * 100 + m AS doc_id,
               array_join(transform(sequence(0, 95), p ->
                 CASE WHEN pmod(hash(fam, p), 32) < m
                      THEN concat('u', fam, 'x', m, 'x', p)
                      ELSE concat('w', fam, 'p', p) END), ' ') AS text
        FROM (SELECT explode(sequence(0, 299)) AS fam)
        LATERAL VIEW explode(sequence(0, 15)) t AS m
        """
    )


def main() -> None:
    from pyspark.sql import functions as F

    from trading212_etl_spark.operators.dedup import jaccard_pairs
    from trading212_etl_spark.sources.readers import load_table

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = get_session(app_name="probe_bounded_recall")
    bskew = (
        load_table(spark, os.path.join(repo, ".scale", "sf0.5_bskew"), "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select("doc_id", "text")
    )
    corpora = {"bskew_sample5": bskew, "graded": _graded_corpus(spark)}
    out: dict = {"k": K, "threshold": THRESHOLD, "corpora": {}}
    for cname, docs in corpora.items():
        truth_full = [
            (r.doc_a, r.doc_b, r.jaccard)
            for r in jaccard_pairs(docs, THRESHOLD).collect()
        ]
        truth_topk = _top_k_truth(truth_full, K)
        full_set = {(a, b) for a, b, _ in truth_full}
        block = {
            "n_docs": docs.count(),
            "truth_full": len(full_set),
            "truth_topk": len(truth_topk),
            "hubs": {},
        }
        for hubs in (None, 4 * max(K + 1, 8)):
            kept = {
                (r.doc_a, r.doc_b)
                for r in jaccard_pairs(
                    docs, THRESHOLD, top_k_per_doc=K, hubs=hubs
                ).collect()
            }
            label = f"hubs={hubs or max(K + 1, 8)}{'(default)' if hubs is None else ''}"
            block["hubs"][label] = {
                "kept": len(kept),
                "recall_vs_topk": round(
                    len(kept & truth_topk) / max(len(truth_topk), 1), 4
                ),
                "recall_vs_full": round(
                    len(kept & full_set) / max(len(full_set), 1), 4
                ),
            }
        out["corpora"][cname] = block
        print(cname, json.dumps(block))
    print(json.dumps(out))
    if len(sys.argv) > 1 and os.path.exists(sys.argv[1]):
        with open(sys.argv[1]) as fh:
            scaling = json.load(fh)
        scaling["bounded_pair_recall"] = out
        with open(sys.argv[1], "w") as fh:
            json.dump(scaling, fh, indent=1)


if __name__ == "__main__":
    main()
