"""Prove decontaminate_bloom in its own regime (VERDICT r11 item 3):
a reference set too large to broadcast.

The 125x corpus is key-offset REPLICATED text, so its distinct-shingle
set stays sf0.1-sized and the plain broadcast-exact path never
struggles — which is why the r11 measurement could only show the
Bloom variant costing ~1.2x in the regime where both work. This probe
builds the regime the operator exists for:

- reference: N synthetic documents of globally-unique words (every
  doc contributes 18 unique 3-shingles), so distinct shingles = 18*N
  — tens of millions of 8-byte keys, far past what a constrained
  driver can collect+broadcast;
- probe corpus: the real .scale/sf12.5 documents table, plus a planted
  contamination slice (reference texts re-keyed as corpus docs) so the
  output is non-empty;
- both paths run in a FRESH constrained JVM (spark.driver.memory set
  before launch; local mode, so driver heap IS the executor heap) as
  separate subprocesses — the expected OOM of the exact path must not
  take the Bloom measurement down with it.

Usage:
    python tools/probe_bloom_regime.py exact|bloom [n_ref_docs]
        one path, one measurement, prints ONE JSON line
    python tools/probe_bloom_regime.py both [n_ref_docs]
        orchestrates the two subprocesses and prints both results
    python tools/probe_bloom_regime.py sink_write|bloom_sink [n_ref_docs]
        VERDICT r12 item 7: persist the reference state once
        (write_decontamination_sink under .scale/) / run the
        decontamination from the persisted sink — the rebuild-vs-load
        wall delta, same constrained JVM
    python tools/probe_bloom_regime.py sink [n_ref_docs]
        orchestrates sink_write then bloom_sink and prints both
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF12_5 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf12.5"
)
DRIVER_MEM = os.environ.get("PROBE_BLOOM_MEM", "2g")
CORES = os.environ.get("PROBE_BLOOM_CORES", "8")
# m=2^26 bits: ~1M-row (8 MiB bit-data, ~35 MB as a hashed relation)
# summary — fits the constrained heap where the exact path's 43M-key
# broadcast (>1.5 GB as a hashed relation) cannot. fp ~62% pass-rate
# at 43M keys: pruning is partial in this deliberately undersized
# probe, but the broadcast stays O(m), not O(reference) — the cost
# class under test. (A first attempt at bits=2^28 showed the flip
# side: size the summary past the heap and the Bloom path inherits
# the exact path's failure mode.)
BITS_LOG2 = 26


def _session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CORES}]")
        .appName("probe_bloom_regime")
        .config("spark.driver.memory", DRIVER_MEM)
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def _frames(spark, n_ref: int):
    from pyspark.sql import functions as F

    # 20 globally-unique words per reference doc -> 18 unique shingles
    ref = spark.range(n_ref).selectExpr(
        "id AS doc_id",
        "concat_ws(' ', transform(sequence(0, 19),"
        " i -> substr(md5(concat(cast(id AS string), ':',"
        " cast(i AS string))), 1, 10))) AS text",
    )
    corpus = spark.read.parquet(os.path.join(SF12_5, "documents.parquet")).select(
        "doc_id", "text"
    )
    # plant contamination: every 1024th reference text appears in the
    # corpus under a fresh doc_id, so n_hits > 0 proves the join found
    # real leaks, not just survived
    planted = ref.filter(F.col("doc_id") % 1024 == 0).select(
        (F.col("doc_id") + 100_000_000).alias("doc_id"), "text"
    )
    return corpus.unionByName(planted), ref


def _sink_path(n_ref: int) -> str:
    return os.path.join(
        os.path.dirname(SF12_5),
        f"decon_sink_b{BITS_LOG2}k3_n{n_ref}_v1",
    )


def run_one(mode: str, n_ref: int) -> None:
    from trading212_etl_spark.operators.dedup import (
        decontaminate,
        decontaminate_bloom,
        decontaminate_bloom_from_sink,
        write_decontamination_sink,
    )

    spark = _session()
    probe, ref = _frames(spark, n_ref)
    t0 = time.monotonic()
    if mode == "exact":
        out = decontaminate(probe, ref)
    elif mode == "sink_write":
        write_decontamination_sink(ref, _sink_path(n_ref), bits_log2=BITS_LOG2)
        print(
            json.dumps(
                {
                    "mode": mode,
                    "ok": True,
                    "wall_s": round(time.monotonic() - t0, 1),
                    "sink": _sink_path(n_ref),
                    "n_ref_docs": n_ref,
                    "driver_memory": DRIVER_MEM,
                    "cores": int(CORES),
                }
            )
        )
        return
    elif mode == "bloom_sink":
        out = decontaminate_bloom_from_sink(probe, _sink_path(n_ref))
    else:
        out = decontaminate_bloom(probe, ref, bits_log2=BITS_LOG2)
    n = out.count()
    print(
        json.dumps(
            {
                "mode": mode,
                "ok": True,
                "wall_s": round(time.monotonic() - t0, 1),
                "contaminated_docs": n,
                "n_ref_docs": n_ref,
                "distinct_ref_shingles": 18 * n_ref,
                "driver_memory": DRIVER_MEM,
                "cores": int(CORES),
            }
        )
    )


def main() -> None:
    mode = sys.argv[1]
    n_ref = int(sys.argv[2]) if len(sys.argv) > 2 else 2_400_000
    if mode in ("exact", "bloom", "sink_write", "bloom_sink"):
        run_one(mode, n_ref)
        return
    assert mode in ("both", "sink"), mode
    results = []
    for m in ("bloom", "exact") if mode == "both" else ("sink_write", "bloom_sink"):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), m, str(n_ref)],
            capture_output=True,
            text=True,
            timeout=7200,
        )
        line = next(
            (l for l in reversed(p.stdout.splitlines()) if l.startswith("{")),
            None,
        )
        if p.returncode == 0 and line:
            results.append(json.loads(line))
        else:
            blob = (p.stderr or "") + (p.stdout or "")
            err = next(
                (
                    l
                    for l in blob.splitlines()
                    if "Not enough memory" in l
                    or "OutOfMemoryError" in l
                    or "Total size" in l
                    or "broadcastTimeout" in l
                ),
                (blob.splitlines() or ["no output"])[-1],
            )
            results.append(
                {
                    "mode": m,
                    "ok": False,
                    "returncode": p.returncode,
                    "error": err.strip()[:300],
                    "n_ref_docs": n_ref,
                    "driver_memory": DRIVER_MEM,
                }
            )
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"probe": "bloom_regime", "results": results}))


if __name__ == "__main__":
    main()
