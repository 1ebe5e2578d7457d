"""Stage-decomposition probe for the r15 top-wall families (guide §1:
measure first): where do dedup_connected_components (454.7 s at 125x)
and dedup_minhash_lsh (461.3 s) actually spend their wall?

Times, at --sf (default the 125x corpus):
  - minhash md5 pipeline stage by stage: shingle freeze, signature,
    banding, hits window, pairs (full op);
  - the exact-route pair generation feeding connected_components
    (with SPARK_GRAFT_PAIRS_TOP_K honored, like the sweeps);
  - the CC fixpoint itself: edges materialize, seeded init, and each
    propagation round (wall + changed count), so the O(rounds) vs
    O(per-round) split is explicit.

One JSON line at the end. Read-only: no repo state, no caches kept.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from trading212_etl_spark.registry import pin_oracle_confs  # noqa: E402
from trading212_etl_spark.session import get_session  # noqa: E402
from trading212_etl_spark.sources.readers import load_table  # noqa: E402


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[sys.argv.index("--sf") + 1] if "--sf" in sys.argv else \
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".scale", "sf12.5")
    spark = get_session(app_name="probe_cc_minhash")
    pin_oracle_confs(spark)
    out: dict = {"sf": sf_dir, "loadavg0": round(os.getloadavg()[0], 2)}

    docs = load_table(spark, sf_dir, "documents")

    # ---- minhash md5 stage decomposition -------------------------------
    from trading212_etl_spark.operators.dedup import (
        _band_frame,
        _shingle_sets,
        _signature_frame,
        minhash_lsh_pairs,
    )
    from trading212_etl_spark.partitioning import release_pins

    t = {}
    spark.sparkContext.setJobDescription("probe: shingles")
    sh = _shingle_sets(docs, 3, "doc_id", None)
    t["shingles_noop"] = noop(sh.select("id", F.size("shingles").alias("n")))
    spark.sparkContext.setJobDescription("probe: signature")
    sig = _signature_frame(sh, 32, "md5")
    t["signature_noop"] = noop(sig)
    spark.sparkContext.setJobDescription("probe: banding+window count")
    banded = _band_frame(sig, 32, 16, "md5")
    t["banded_noop"] = noop(banded)
    spark.sparkContext.setJobDescription("probe: full minhash pairs")
    t["pairs_full_noop"] = noop(
        minhash_lsh_pairs(docs, threshold=0.5, num_hashes=32, bands=16,
                          hash_fn="md5")
    )
    release_pins()
    spark.catalog.clearCache()
    out["minhash_md5"] = t

    # ---- exact-route pairs + CC fixpoint --------------------------------
    from trading212_etl_spark.operators.dedup import jaccard_pairs
    from trading212_etl_spark.partitioning import materialize

    top_k = os.environ.get("SPARK_GRAFT_PAIRS_TOP_K")
    t2 = {}
    spark.sparkContext.setJobDescription("probe: jaccard pairs")
    pairs = jaccard_pairs(
        docs, threshold=0.5, n=3,
        top_k_per_doc=int(top_k) if top_k else None,
    )
    t0 = time.perf_counter()
    pairs = materialize(pairs)
    t2["pairs_materialize"] = round(time.perf_counter() - t0, 3)
    t2["n_pairs"] = pairs.count()

    spark.sparkContext.setJobDescription("probe: cc edges")
    fwd = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    t0 = time.perf_counter()
    edges = materialize(fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ))
    t2["edges_materialize"] = round(time.perf_counter() - t0, 3)

    spark.sparkContext.setJobDescription("probe: cc seeded init")
    t0 = time.perf_counter()
    labels = materialize(
        edges.groupBy("src").agg(F.min("dst").alias("__mn")).select(
            F.col("src").alias("node"), F.least("src", "__mn").alias("label")
        )
    )
    t2["init_materialize"] = round(time.perf_counter() - t0, 3)
    t2["n_nodes"] = labels.count()

    rounds = []
    for i in range(20):
        spark.sparkContext.setJobDescription(f"probe: cc round {i}")
        t0 = time.perf_counter()
        neigh = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src").agg(F.min("label").alias("nlabel"))
        )
        nlabel = F.coalesce(F.col("nlabel"), labels.label)
        new = materialize(
            labels.join(neigh, labels.node == neigh.src, "left").select(
                labels.node,
                F.least(labels.label, nlabel).alias("label"),
                (nlabel < labels.label).alias("__changed"),
            )
        )
        changed = new.filter(F.col("__changed")).count()
        rounds.append({
            "wall": round(time.perf_counter() - t0, 3), "changed": changed,
        })
        labels = new.select("node", "label")
        if changed == 0:
            break
    t2["rounds"] = rounds
    out["cc"] = t2
    out["loadavg1"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
