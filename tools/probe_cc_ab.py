"""Interleaved A/B for the r15 connected_components rewrite (guide
§1.2: measure, don't assume): OLD = union(fwd, swap) edges + full-label
propagation rounds; NEW = the committed operator (explode-both-
directions edges + frontier/broadcast rounds).

Both arms run the FULL entry cost — pair generation is NOT
pre-materialized, so the old arm pays the union's double execution of
the pair plan exactly as the old operator did. Arms interleave
new,old per round (clearCache + GC between runs); emits one JSON line
with walls and min per arm.

Usage: python tools/probe_cc_ab.py [--sf DIR] [--n N] [--entry NAME]
  NAME in {cc, leakage} (default cc). SPARK_GRAFT_PAIRS_TOP_K honored.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from trading212_etl_spark.partitioning import materialize, release_pins  # noqa: E402
from trading212_etl_spark.registry import pin_oracle_confs  # noqa: E402
from trading212_etl_spark.session import get_session  # noqa: E402
from trading212_etl_spark.sources.readers import load_table  # noqa: E402


def old_connected_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """The pre-r15 implementation, verbatim (operators/dedup.py at
    commit fd403cd) — the A arm of the A/B."""
    fwd = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = materialize(fwd.union(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ))
    labels = materialize(
        edges.groupBy("src")
        .agg(F.min("dst").alias("__mn"))
        .select(
            F.col("src").alias("node"),
            F.least("src", "__mn").alias("label"),
        )
    )
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        nlabel = F.coalesce(F.col("nlabel"), labels.label)
        new = materialize(
            labels.join(neigh, labels.node == neigh.src, "left")
            .select(
                labels.node,
                F.least(labels.label, nlabel).alias("label"),
                (nlabel < labels.label).alias("__changed"),
            )
        )
        changed = new.filter(F.col("__changed")).limit(1).count()
        labels = new.select("node", "label")
        if changed == 0:
            break
    else:
        raise RuntimeError("old CC did not converge")
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("component"))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale", "sf12.5",
    )
    n = 2
    entry = "cc"
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a == "--n":
            n = int(next(it))
        elif a == "--entry":
            entry = next(it)
    spark = get_session(app_name="probe_cc_ab")
    pin_oracle_confs(spark)

    from trading212_etl_spark.operators.dedup import (
        connected_components as new_cc,
        jaccard_pairs,
    )

    top_k = os.environ.get("SPARK_GRAFT_PAIRS_TOP_K")

    def build_pairs():
        docs = load_table(spark, sf_dir, "documents")
        return jaccard_pairs(
            docs, threshold=0.5, n=3,
            top_k_per_doc=int(top_k) if top_k else None,
        )

    def run(arm: str) -> float:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"cc_ab:{arm}")
        t0 = time.perf_counter()
        cc = old_connected_components if arm == "old" else new_cc
        comp = cc(build_pairs())
        if entry == "leakage":
            from trading212_etl_spark.operators.sampling import hash_split

            docs = load_table(spark, sf_dir, "documents")
            grouped = (
                docs.select("doc_id")
                .join(F.broadcast(comp), "doc_id", "left")
                .select(
                    "doc_id",
                    F.coalesce("component", "doc_id").alias("group_key"),
                )
            )
            out = hash_split(
                grouped, "group_key", {"train": 0.8, "val": 0.1, "test": 0.1}
            )
        else:
            out = comp
        out.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        release_pins()
        return wall

    # warm-up both arms at sf0.01 (codegen)
    warm = sf_dir
    for arm in ("new", "old"):
        pass  # warm at the measured dir is the cold-cache convention

    walls = {"new": [], "old": []}
    for i in range(n):
        for arm in ("new", "old") if i % 2 == 0 else ("old", "new"):
            walls[arm].append(run(arm))
    print(json.dumps({
        "sf": sf_dir, "entry": entry, "top_k": top_k,
        "loadavg": round(os.getloadavg()[0], 2),
        "walls": walls,
        "min": {a: min(w) for a, w in walls.items()},
    }))


if __name__ == "__main__":
    main()
