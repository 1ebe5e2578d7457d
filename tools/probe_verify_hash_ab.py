"""Interleaved A/B for the r15 hashed-verify lever (guide §1.2): given
the SAME cached shingle frame and materialized md5-banding candidates,
time the exact-Jaccard verify joins with (old) string shingle arrays
vs (new) xxhash64 long arrays as the shuffled payload. Also collects
row-count equality of the two verified outputs (the |∩| sizes must
agree modulo the documented 2^-64 collision class).

Usage: python tools/probe_verify_hash_ab.py [--sf DIR] [--n N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F  # noqa: E402

from trading212_etl_spark.operators.dedup import (  # noqa: E402
    _band_frame,
    _shingle_sets,
    _signature_frame,
)
from trading212_etl_spark.partitioning import freeze_partitions, materialize  # noqa: E402
from trading212_etl_spark.registry import pin_oracle_confs  # noqa: E402
from trading212_etl_spark.session import get_session  # noqa: E402
from trading212_etl_spark.sources.readers import load_table  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale", "sf12.5",
    )
    n = 2
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a == "--n":
            n = int(next(it))
    spark = get_session(app_name="probe_verify_hash_ab")
    pin_oracle_confs(spark)
    docs = load_table(spark, sf_dir, "documents")

    sh = freeze_partitions(
        _shingle_sets(docs, 3, "doc_id", None).withColumn(
            "__hsh", F.transform("shingles", lambda s: F.xxhash64(s))
        )
    )
    sig = _signature_frame(sh, 32, "md5")
    banded = _band_frame(sig, 32, 16, "md5")
    wb = Window.partitionBy("band_idx", "band_hash")
    hits = freeze_partitions(
        banded.withColumn("__n", F.count(F.lit(1)).over(wb))
        .withColumn("__hub", F.min("id").over(wb))
        .filter(F.col("__n") > 1)
    )
    buckets = (
        hits.filter(F.col("__n") <= 4096)
        .groupBy("band_idx", "band_hash")
        .agg(F.sort_array(F.collect_set("id")).alias("ids"))
    )
    small = (
        buckets.select(F.explode("ids").alias("doc_a"), "ids")
        .select("doc_a", F.explode("ids").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
    )
    star = (
        hits.filter(F.col("__n") > 4096)
        .filter(F.col("id") != F.col("__hub"))
        .select(F.col("__hub").alias("doc_a"), F.col("id").alias("doc_b"))
    )
    spark.sparkContext.setJobDescription("fill caches + materialize cand")
    cand = materialize(small.unionByName(star).distinct())
    n_cand = cand.count()

    def verify(col: str):
        a = sh.select(F.col("id").alias("doc_a"), F.col(col).alias("sh_a"))
        b = sh.select(F.col("id").alias("doc_b"), F.col(col).alias("sh_b"))
        pairs = cand.join(a, "doc_a").join(b, "doc_b")
        n_common = F.size(F.array_intersect("sh_a", "sh_b"))
        jac = n_common / (F.size("sh_a") + F.size("sh_b") - n_common)
        return (
            pairs.withColumn("jaccard", F.round(jac, 4))
            .filter(F.col("jaccard") >= 0.5)
            .select("doc_a", "doc_b", "jaccard")
        )

    n_old = verify("shingles").count()
    n_new = verify("__hsh").count()

    def run(arm: str) -> float:
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"verify_ab:{arm}")
        t0 = time.perf_counter()
        verify("shingles" if arm == "old" else "__hsh").write.format(
            "noop"
        ).mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    walls = {"new": [], "old": []}
    for i in range(n):
        for arm in ("new", "old") if i % 2 == 0 else ("old", "new"):
            walls[arm].append(run(arm))
    print(json.dumps({
        "sf": sf_dir, "n_cand": n_cand,
        "verified_rows": {"old": n_old, "new": n_new},
        "loadavg": round(os.getloadavg()[0], 2),
        "walls": walls,
        "min": {a: min(w) for a, w in walls.items()},
    }))


if __name__ == "__main__":
    main()
