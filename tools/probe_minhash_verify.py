"""Decompose dedup_minhash_lsh's md5-mode wall at 125x past the
signature/banding stages (probe_cc_minhash_stages measured shingles
17.8 s, signature ~54 s steady, full op 209 s — so ~137 s live in the
window/bucket/verify tail). Times, each from a PINNED upstream so the
stage cost is isolated:

  hits_noop       window count/hub over banding (from cached sh)
  cand_noop       bucket pair expansion + star + distinct (from cached hits)
  n_cand          candidate count
  verify_noop     exact-Jaccard verify joins (from cached sh + materialized cand)

One JSON line. Read-only probe.
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


def noop(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[sys.argv.index("--sf") + 1] if "--sf" in sys.argv else \
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".scale", "sf12.5")
    spark = get_session(app_name="probe_minhash_verify")
    pin_oracle_confs(spark)
    docs = load_table(spark, sf_dir, "documents")
    t: dict = {"sf": sf_dir, "loadavg0": round(os.getloadavg()[0], 2)}

    sh = freeze_partitions(_shingle_sets(docs, 3, "doc_id", None))
    spark.sparkContext.setJobDescription("warm shingle cache")
    t["sh_fill"] = noop(sh.select("id", F.size("shingles").alias("n")))

    sig = _signature_frame(sh, 32, "md5")
    banded = _band_frame(sig, 32, 16, "md5")
    wb = Window.partitionBy("band_idx", "band_hash")
    hits = (
        banded.withColumn("__n", F.count(F.lit(1)).over(wb))
        .withColumn("__hub", F.min("id").over(wb))
        .filter(F.col("__n") > 1)
    )
    hits = freeze_partitions(hits)
    spark.sparkContext.setJobDescription("hits (sig+band+window) from cached sh")
    t["hits_noop"] = noop(hits)

    max_bucket = 4096
    buckets = (
        hits.filter(F.col("__n") <= max_bucket)
        .groupBy("band_idx", "band_hash")
        .agg(F.sort_array(F.collect_set("id")).alias("ids"))
    )
    small_pairs = (
        buckets.select(F.explode("ids").alias("doc_a"), "ids")
        .select("doc_a", F.explode("ids").alias("doc_b"))
        .filter(F.col("doc_a") < F.col("doc_b"))
    )
    star_pairs = (
        hits.filter(F.col("__n") > max_bucket)
        .filter(F.col("id") != F.col("__hub"))
        .select(F.col("__hub").alias("doc_a"), F.col("id").alias("doc_b"))
    )
    cand = small_pairs.unionByName(star_pairs).distinct()
    spark.sparkContext.setJobDescription("cand from cached hits")
    t["cand_noop"] = noop(cand)
    cand = materialize(cand)
    t["n_cand"] = cand.count()

    a = sh.select(F.col("id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    pairs = cand.join(a, "doc_a").join(b, "doc_b")
    n_common = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = n_common / (F.size("sh_a") + F.size("sh_b") - n_common)
    out = (
        pairs.withColumn("jaccard", F.round(jac, 4))
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    )
    spark.sparkContext.setJobDescription("verify joins from cached sh + cand")
    t["verify_noop"] = noop(out)
    t["loadavg1"] = round(os.getloadavg()[0], 2)
    print(json.dumps(t))


if __name__ == "__main__":
    main()
