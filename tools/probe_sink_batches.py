"""Measure that the incremental signature sink's per-batch join cost
HOLDS as batches accumulate, and still holds after compaction
(VERDICT r11 item 6's measured note).

Protocol: at the 125x corpus, build the snapshot sink once
(doc_id % 10 > 4), then absorb 4 ingest batches (doc_id % 10 in
1..4) one at a time; after every absorb, time the NEXT batch's
incremental join (doc_id % 10 == 0 as a fixed probe batch) against
the grown sink. Then compact and re-time the same probe. The claim
under test: per-batch cost is O(batch + matches) — flat-ish as the
sink grows — and compaction changes file counts, not results or
cost class.

Usage: python tools/probe_sink_batches.py [sf_dir] — prints ONE JSON
line; run on an otherwise idle host.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trading212_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale",
        "sf12.5",
    )
    from pyspark.sql import functions as F

    from trading212_etl_spark.operators.dedup import (
        absorb_batch_into_sink,
        compact_signature_sink,
        incremental_minhash_pairs,
        write_signature_sink,
    )
    from trading212_etl_spark.sources.readers import load_table

    spark = get_session(app_name="probe_sink_batches")
    docs = load_table(spark, sf_dir, "documents")
    probe = docs.filter(F.col("doc_id") % 10 == 0)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "sink_v1")
        t0 = time.monotonic()
        write_signature_sink(docs.filter(F.col("doc_id") % 10 > 4), path)
        build_s = round(time.monotonic() - t0, 1)

        def probe_join() -> tuple[float, int]:
            t0 = time.monotonic()
            n = incremental_minhash_pairs(probe, path, threshold=0.5).count()
            return round(time.monotonic() - t0, 1), n

        walls, absorb_walls = [], []
        w, n0 = probe_join()
        walls.append(w)
        for b in (1, 2, 3, 4):
            t0 = time.monotonic()
            absorb_batch_into_sink(docs.filter(F.col("doc_id") % 10 == b), path)
            absorb_walls.append(round(time.monotonic() - t0, 1))
            w, n = probe_join()
            walls.append(w)
        t0 = time.monotonic()
        stats = compact_signature_sink(spark, path)
        compact_s = round(time.monotonic() - t0, 1)
        w_post, n_post = probe_join()
        print(
            json.dumps(
                {
                    "probe": "sink_batches",
                    "sf_dir": os.path.basename(sf_dir.rstrip("/")),
                    "snapshot_build_s": build_s,
                    "probe_join_s_after_0_to_4_absorbs": walls,
                    "absorb_s": absorb_walls,
                    "pairs_after_4_absorbs": n,
                    "compact_s": compact_s,
                    "compact_stats": stats,
                    "probe_join_s_post_compact": w_post,
                    "pairs_post_compact_match": n_post == n,
                }
            )
        )


if __name__ == "__main__":
    main()
