"""Interleaved A/B: embedding_near_dup_pairs_lsh (merged single-branch
tile shape, r13) vs the guard-free r9 shape (no window, one gram task
per bucket) — VERDICT r13 item 6's "one more interleaved A/B" before
either shaving the ~20% residual or recording it as the accepted price
of the chunked-tile skew guard.

The r9 shape is reconstructed inline (it no longer exists in the
tree): banded rows → groupBy(tbl, bkt) → full-bucket triangular gram
in ONE applyInPandas task → min-collapse. It is the fastest possible
shape on driver-SF data (no window sort, no tile bookkeeping) and the
one that straggles on a hot bucket (r9 bucket-skew sweep: 4.49× at a
2 470-vector bucket) — i.e. the A/B measures exactly what the guard
costs where the guard isn't needed.

Protocol: alternating A/B/A/B... in ONE session (across-session walls
drift ±40% — see the 125x-measured-wins memory), min per variant,
canary bracketing. Usage:

    python tools/probe_near_dup_ab.py [rounds] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as _np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from trading212_etl_spark.operators.similarity import (  # noqa: E402
    _bands_arrow_udf,
    _hyperplanes,
    embedding_near_dup_pairs_lsh,
)
from trading212_etl_spark.partitioning import fan_out  # noqa: E402
from trading212_etl_spark.registry import pin_oracle_confs  # noqa: E402
from trading212_etl_spark.session import get_session  # noqa: E402
from trading212_etl_spark.sources.readers import load_table  # noqa: E402


def r9_shape(corpus, threshold=0.4, n_planes=4, n_tables=8, dim=64,
             round_dp=4):
    """Guard-free near-dup LSH: one gram task per (tbl, bkt) bucket."""
    tables = [_hyperplanes(dim, n_planes, seed=42 + t) for t in range(n_tables)]
    cutoff = threshold - 0.5 * 10 ** (-round_dp) - 1e-12

    def _score_bucket(pdf):
        import pandas as _pd

        m = _np.asarray(pdf["emb"].tolist(), dtype=_np.float64)
        ids = pdf["vec_id"].to_numpy()
        normed = m / _np.linalg.norm(m, axis=1, keepdims=True)
        cos = normed @ normed.T
        ia, ib = _np.triu_indices(len(ids), k=1)
        keep = cos[ia, ib] >= cutoff
        lo = _np.minimum(ids[ia[keep]], ids[ib[keep]])
        hi = _np.maximum(ids[ia[keep]], ids[ib[keep]])
        return _pd.DataFrame(
            {"vec_a": lo, "vec_b": hi, "raw_cos": cos[ia, ib][keep]}
        )

    v = fan_out(corpus).select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("emb")
    )
    banded = v.select(
        "vec_id", "emb",
        F.posexplode(_bands_arrow_udf(tables)("emb")).alias("tbl", "bkt"),
    )
    scored = banded.groupBy("tbl", "bkt").applyInPandas(
        _score_bucket, "vec_a long, vec_b long, raw_cos double"
    )
    return (
        scored.select(
            "vec_a", "vec_b", F.round(F.col("raw_cos"), round_dp).alias("cos_sim")
        )
        .groupBy("vec_a", "vec_b")
        .agg(F.min("cos_sim").alias("cos_sim"))
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_session(app_name="probe_near_dup_ab")
    pin_oracle_confs(spark)
    emb = load_table(spark, sf_dir, "embeddings")

    def canary() -> float:
        t0 = time.perf_counter()
        (
            spark.range(0, 32_000_000, 1, 32)
            .select((F.col("id") % 1000).alias("k"),
                    F.sha2(F.col("id").cast("string"), 256).alias("h"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.min("h").alias("lo"),
                 F.max("h").alias("hi"))
            .write.format("noop").mode("overwrite").save()
        )
        return round(time.perf_counter() - t0, 3)

    def run(df) -> float:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 3)

    # row-identity check once: the merged shape must equal the r9
    # shape on guard-free data (driver SFs never trip either guard)
    merged_rows = {
        tuple(r) for r in embedding_near_dup_pairs_lsh(emb).collect()
    }
    r9_rows = {tuple(r) for r in r9_shape(emb).collect()}
    assert merged_rows == r9_rows, (
        len(merged_rows), len(r9_rows),
        list(merged_rows ^ r9_rows)[:5],
    )
    print(f"row-identity OK: {len(merged_rows)} pairs", flush=True)

    # warm both variants once (codegen/JIT), then interleave
    run(embedding_near_dup_pairs_lsh(emb))
    run(r9_shape(emb))
    print(f"canary_before={canary()}", flush=True)
    a_walls, b_walls = [], []
    for i in range(rounds):
        a_walls.append(run(embedding_near_dup_pairs_lsh(emb)))
        b_walls.append(run(r9_shape(emb)))
        print(f"round {i}: merged={a_walls[-1]} r9={b_walls[-1]}", flush=True)
    print(f"canary_after={canary()}", flush=True)
    print(
        {
            "merged_min": min(a_walls), "merged_walls": a_walls,
            "r9_min": min(b_walls), "r9_walls": b_walls,
            "residual_ratio": round(min(a_walls) / min(b_walls), 3),
        },
        flush=True,
    )


if __name__ == "__main__":
    main()
