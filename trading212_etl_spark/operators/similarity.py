"""Similarity search over embedding columns (``array<float>``).

Two paths, same contract:

- **brute-force cosine top-k** — the correctness baseline. Query set
  broadcast against the corpus; dot products via higher-order
  functions (zip_with + aggregate), JVM-side, no Python. O(n·q) —
  right when q is small or n fits a scan budget.
- **random-hyperplane LSH buckets** — the 100 TB path: each vector
  maps to a sign-bit bucket; only same-bucket (or probed-neighbor-
  bucket) pairs are scored. Turns O(n·q) into per-bucket work with one
  groupBy shuffle.

An IVF variant (coarse quantizer = deterministic seed vectors) rides
the same bucketing skeleton with argmin-centroid assignment.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..partitioning import fan_out, freeze_partitions


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def write_ivf_cells(
    assigned: DataFrame, path: str, rows_per_task: int = 512
) -> None:
    """Write a cell-assigned corpus ``partitionBy("cell")`` with the
    hot cells SALTED across writer tasks (VERDICT r9 item 2): without
    the salt, one task owns each post-repartition cell and a
    natural-skew cell holding 25% of the corpus is one straggler
    writer — at 100 TB, one task writing 25 TB. Every cell's rows are
    split into ``ceil(cell_rows / rows_per_task)`` sub-groups (cell
    counts from a tiny broadcast aggregate; salt =
    pmod(xxhash64(vec_id))), and ``repartition(cell, salt)`` fans the
    hot cell's write across that many tasks. The salt column is
    dropped before the write, so the directory layout — and therefore
    probe-side ``cell=`` partition pruning — is unchanged; the hot
    cell simply lands as several files, which also splits the
    probe-side scan. Layout-only: the row set written is identical.
    """
    cell_counts = (
        assigned.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .persist()
    )
    # explicit partition count: a bare repartition(cols) is an AQE
    # coalescing target, and at sub-advisory-size corpora AQE merges
    # the salted groups back into one writer task — exactly the
    # straggler the salt exists to break. The count must ALSO be at
    # least the total number of salted sub-groups (ADVICE r10): with
    # fewer hash-partition slots than groups, a hot cell's salt groups
    # collide into one partition and the write is a straggler again
    # (deterministically so on low-parallelism hosts). cell_counts is
    # one row per IVF cell — bounded by the quantizer, so the scalar
    # .first() is ML-init-sized, not data-plane.
    n_groups = int(
        cell_counts.agg(
            F.coalesce(
                F.sum(
                    F.greatest(
                        F.lit(1).cast("long"),
                        F.ceil(
                            F.col("__cnt") / F.lit(rows_per_task)
                        ).cast("long"),
                    )
                ),
                F.lit(1).cast("long"),
            ).alias("g")
        ).first()["g"]
    )
    num_parts = max(
        assigned.sparkSession.sparkContext.defaultParallelism, n_groups
    )
    # left join + coalesce(__cnt, 1): rows with a NULL cell never
    # equi-match the counts side — an inner join would silently DROP
    # them (ADVICE r10), breaking the 'row set written is identical'
    # contract (they belong under the null-partition directory).
    salted = (
        assigned.join(F.broadcast(cell_counts), on="cell", how="left")
        .withColumn(
            "__salt",
            F.pmod(
                F.xxhash64("vec_id"),
                F.greatest(
                    F.lit(1).cast("long"),
                    F.ceil(
                        F.coalesce(F.col("__cnt"), F.lit(1))
                        / F.lit(rows_per_task)
                    ).cast("long"),
                ),
            ),
        )
        .repartition(num_parts, F.col("cell"), F.col("__salt"))
        .drop("__cnt", "__salt")
    )
    salted.write.mode("overwrite").partitionBy("cell").parquet(path)
    cell_counts.unpersist()


def cosine_topk_bruteforce(
    corpus: DataFrame, queries: DataFrame, k: int, round_dp: int = 4
) -> DataFrame:
    """Exact cosine top-k for each query vector against the corpus.

    ``queries`` is broadcast (the query set is small by construction),
    so the corpus — the 100 TB side — is scanned once with zero
    shuffle; the only exchange is the final per-query top-k, which is
    rank-limited, not sorted globally. Scores computed in float64
    (embeddings cast up) and rounded for oracle parity; ties broken by
    vec_id for determinism.
    """
    from pyspark.sql import Window

    c = fan_out(corpus).select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").cast("array<double>").alias("c_emb"),
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("q_emb"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("corpus_id") != F.col("query_id"))
        .select(
            "query_id",
            "corpus_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), round_dp).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (fixed seed →
    reproducible buckets across runs and engines)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def _bands_arrow_udf(tables: list[list[list[float]]]):
    """Arrow-vectorized multi-table banding: ``array<double>`` embedding
    -> ``array<bigint>`` of the sign-bit bucket for every table, one
    numpy matmul per Arrow batch.

    Evolution of this hot spot: the Column-builder form was driver-
    compile-bound (a Py4J round trip per plane literal); the round-2
    fix parsed ONE giant SQL string, which killed compile time but left
    n_tables × n_planes interpreted ``aggregate(zip_with(...))`` lambda
    folds per row — Catalyst evaluates higher-order functions on the
    interpreted path, and the measured cost was a 17 s cold / 4 s warm
    banding pass over just 2000 vectors. A single (batch × dim) @
    (dim × n_tables·n_planes) BLAS matmul does the identical arithmetic
    SIMD-vectorized: this is exactly the workload Arrow-batched pandas
    UDFs exist for (linear algebra Catalyst can only express
    element-at-a-time). Sign parity with the SQL/DuckDB-oracle fold is
    safe: gaussian-plane dots sit O(1) from zero, float64 summation-
    order noise is ~1e-15.
    """
    from pyspark.sql.functions import pandas_udf

    n_tables = len(tables)
    n_planes = len(tables[0])
    planes = np.asarray(
        [p for tbl in tables for p in tbl], dtype=np.float64
    )  # (n_tables*n_planes, dim)
    weights = 2 ** np.arange(n_planes, dtype=np.int64)

    @pandas_udf("array<bigint>")
    def bands(emb: pd.Series) -> pd.Series:
        if len(emb) == 0:
            return pd.Series([], dtype=object)
        m = np.asarray(emb.tolist(), dtype=np.float64)  # (n, dim)
        bits = (m @ planes.T > 0.0).reshape(len(m), n_tables, n_planes)
        return pd.Series(list(bits @ weights))  # (n, n_tables) buckets

    return bands


def _pair_cosine_arrow_udf():
    """Arrow-vectorized cosine between two embedding columns (the
    candidate-verify hot loop: one row per candidate PAIR, so at 814 k
    pairs the interpreted zip_with/aggregate fold dominated the whole
    query). Row-wise einsum + norms over each Arrow batch; rounding
    for oracle parity stays in SQL so the boundary semantics are
    identical to the :func:`cosine` expression form."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def pair_cos(ea: pd.Series, eb: pd.Series) -> pd.Series:
        if len(ea) == 0:
            return pd.Series([], dtype=np.float64)
        a = np.asarray(ea.tolist(), dtype=np.float64)
        b = np.asarray(eb.tolist(), dtype=np.float64)
        num = np.einsum("ij,ij->i", a, b)
        den = np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
        return pd.Series(num / den)

    return pair_cos


def lsh_bucket(emb: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit_i = 1 iff emb · plane_i > 0 (single
    table, pure-Column form; see _bands_arrow_udf for the vectorized
    multi-table path the LSH operators use)."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        d = dot(emb, F.lit([float(x) for x in p]))
        bucket = bucket + F.when(d > 0, F.lit(2 ** i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    round_dp: int = 4,
) -> DataFrame:
    """Approximate cosine top-k: multi-table random-hyperplane LSH.

    Per table, same-bucket probability for angle θ is (1-θ/π)^n_planes
    — a single table's recall collapses on near-orthogonal corpora, so
    ``n_tables`` independent plane sets are OR-ed: a pair is a
    candidate if it co-buckets in ANY table, lifting recall to
    1-(1-p^n_planes)^n_tables while each table still partitions the
    corpus into 2^n_planes cells.

    Plan shape: each vector explodes into ``n_tables`` (table, bucket)
    keys; one equi-join on that composite key replaces the cross join.
    At 100 TB the shuffle key is (table, bucket) and per-cell work is
    ~n/2^n_planes per table. Candidates travel as BARE ID PAIRS (the
    banding rows and the candidate distinct never carry vectors — the
    same rule as embedding_near_dup_pairs_lsh: shuffling the banded
    corpus with its embeddings attached moves n_tables copies of every
    vector); embeddings rejoin only for the surviving candidates.
    Recall vs the brute-force baseline is asserted in tests (rows-only
    op — buckets are sketch-dependent, so no SQL oracle).
    """
    from pyspark.sql import Window

    tables = [_hyperplanes(dim, n_planes, seed=42 + t) for t in range(n_tables)]
    # materialized once: three consumers (banding + candidate-side
    # embedding lookup)
    v = freeze_partitions(fan_out(corpus).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    ))
    qv = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("q_emb"),
    )
    bands = _bands_arrow_udf(tables)
    pair_cos = _pair_cosine_arrow_udf()
    c_banded = v.select(
        F.col("vec_id").alias("corpus_id"),
        F.posexplode(bands("emb")).alias("tbl", "bkt"),
    )
    q_banded = qv.select(
        "query_id", F.posexplode(bands("q_emb")).alias("tbl", "bkt")
    )
    cand = (
        c_banded.join(F.broadcast(q_banded), ["tbl", "bkt"])
        .filter(F.col("corpus_id") != F.col("query_id"))
        .select("query_id", "corpus_id")
        .distinct()
    )
    scored = (
        cand.join(v, cand.corpus_id == v.vec_id)
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "corpus_id",
            F.round(pair_cos(F.col("q_emb"), F.col("emb")), round_dp).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


def _cent_dots_expr(emb_sql: str, cents: list[list[float]]) -> Column:
    """array<double> of the row vector's dot product with each
    centroid, as ONE parsed SQL string — the Column-builder form
    (nested zip_with/aggregate lambdas per centroid) costs ~1 s of
    driver-side Py4J round trips per query for the identical
    expression tree (same compile-cost lesson as LSH banding; see
    _bands_arrow_udf for why the LSH side went further, to Arrow)."""
    dots = ", ".join(
        "aggregate(zip_with({e}, array({lits}), (x, y) -> x * y),"
        " 0.0D, (acc, x) -> acc + x)".format(
            e=emb_sql, lits=", ".join(f"{float(x)!r}D" for x in c)
        )
        for c in cents
    )
    return F.expr(f"array({dots})")


def _data_centroids(corpus: DataFrame, n_centroids: int) -> list[list[float]]:
    """Coarse-quantizer centroids = the first ``n_centroids`` corpus
    vectors (by vec_id). Data-derived cells follow the embedding
    distribution — measured 0.93 recall at n_probe=3/8 on the test
    corpus vs 0.45 for fixed random Gaussians, which land near-
    orthogonal to every data vector in high dim. A production build
    k-means a sample instead; the collect here is n_centroids rows,
    driver-side, one-off (ML-style init, not a data-plane collect)."""
    rows = (
        corpus.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .orderBy("vec_id")
        .limit(n_centroids)
        .collect()
    )
    return [r.e for r in rows]


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    n_centroids: int = 8,
    n_probe: int = 3,
    round_dp: int = 4,
) -> DataFrame:
    """Approximate cosine top-k via IVF (inverted-file) partitioning.

    Corpus vectors are assigned to their nearest centroid cell (argmax
    centroid dot product — one linear pass); each query probes only
    its ``n_probe`` nearest cells. The candidate set is the union of
    probed cells (~n_probe/n_centroids of the corpus), scored exactly.

    Plan shape: cell assignment is a pure projection; the probe is an
    equi-join on cell id — at 100 TB the corpus can be *written
    partitioned by cell* so a probe reads n_probe partitions and the
    join does no shuffle at all. Recall vs brute force is asserted in
    tests (rows-only op — cells are seed-dependent)."""
    from pyspark.sql import Window

    cents = _data_centroids(corpus, n_centroids)

    # dots[i] per centroid, materialized once per row (projection
    # boundary — same CSE rule as the tokenizer, see operators/textual).
    cent_dots = lambda emb_sql: _cent_dots_expr(emb_sql, cents)  # noqa: E731

    c = (
        fan_out(corpus)
        .select(
            F.col("vec_id").alias("corpus_id"),
            F.col("embedding").cast("array<double>").alias("c_emb"),
        )
        .withColumn("__dots", cent_dots("c_emb"))
        .withColumn(
            "cell",
            F.array_position(F.col("__dots"), F.array_max("__dots")).cast("int"),
        )
        .drop("__dots")
    )
    # per query: indices of the n_probe largest dots, via sorted
    # (dot desc, idx) structs — JVM-side, no UDF
    q = (
        queries.select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("q_emb"),
        )
        .withColumn("__dots", cent_dots("q_emb"))
        .withColumn(
            "__cell_l",
            F.explode(
                F.slice(
                    F.transform(
                        F.reverse(
                            F.array_sort(
                                F.transform(
                                    F.col("__dots"),
                                    lambda d, i: F.struct(
                                        d.alias("d"), (i + 1).alias("idx")
                                    ),
                                )
                            )
                        ),
                        lambda s: s["idx"],
                    ),
                    1,
                    n_probe,
                )
            ),
        )
        .withColumn("cell", F.col("__cell_l").cast("int"))
        .drop("__dots", "__cell_l")
    )
    # no distinct needed: each corpus vector is assigned to exactly ONE
    # cell (argmax), so a (query, corpus) pair meets at most once even
    # though a query probes n_probe cells — unlike multi-table LSH.
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("corpus_id") != F.col("query_id"))
        .select(
            "query_id",
            "corpus_id",
            F.round(cosine(F.col("q_emb"), F.col("c_emb")), round_dp).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("corpus_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


def embedding_near_dup_pairs_lsh(
    corpus: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    round_dp: int = 4,
    max_bucket: int = 4096,
    gram_cap: int = 512,
) -> DataFrame:
    """Embedding near-dup pairs, LSH-bucketed — the 100 TB path for
    :func:`embedding_near_dup_pairs`: candidate pairs must co-bucket
    in at least one hyperplane table (one (tbl, bkt) groupBy shuffle),
    then exact cosine verifies inside each bucket. Never a cross join;
    precision is exact (every emitted pair is scored), recall is the
    multi-table OR curve (tests assert subset-of-exact + recall
    floor)."""
    import numpy as _np

    tables = [_hyperplanes(dim, n_planes, seed=42 + t) for t in range(n_tables)]
    # Within-bucket verification: the banded rows KEEP their embedding
    # through the (tbl, bkt) shuffle — n_tables copies of the corpus —
    # and each bucket is scored by numpy gram matmuls; only survivors
    # (pairs at/above threshold) leave Python. The alternative shape
    # (candidates as bare id pairs, embeddings re-joined for scoring)
    # moves |candidates| × 2 embeddings instead, which wins only when
    # the sketch is selective; at a low cosine threshold LSH
    # candidates grow ~quadratic (measured: 814 k candidate pairs from
    # a 2 k corpus = 400× the banded-with-vector bytes), so
    # bucket-local scoring is the cheaper contract for the near-dup
    # operator. cosine_topk_lsh keeps the bare-pair shape — its
    # query-side candidates ARE selective.
    #
    # Two-level scale guard:
    # - a bucket over ``max_bucket`` rows falls back to a STAR against
    #   the bucket's min-id vector — O(bucket·dim) FLOPs instead of
    #   the O(bucket²·dim) gram. Star edges are emitted UNFILTERED
    #   (VERDICT r10 item 2): every hub↔member row carries its true
    #   cosine even below ``threshold``, so member pairs within
    #   threshold of EACH OTHER but not of the hub stay hub-reachable
    #   for downstream clustering instead of silently vanishing.
    #   Consumers needing strictly verified pairs filter
    #   ``cos_sim >= threshold`` themselves — any row failing it is
    #   by construction an over-cap star edge. The full pairwise
    #   clique is still traded for boundedness, as on the MinHash
    #   side.
    # - a bucket under the cap but over ``gram_cap`` rows previously
    #   ran its exact gram — all O(bucket²) pair construction — in ONE
    #   task (r9 bucket-skew sweep: 4.49× at a 2 470-vector bucket).
    #   Such buckets are now CHUNKED: rows round-robin into
    #   ``ceil(bucket / gram_cap)`` chunks by their in-bucket rank,
    #   and every chunk-pair tile (ci ≤ cj) is scored by its own task
    #   — the same EXACT pair set (each pair lands in exactly one
    #   tile), distributed across O((bucket/gram_cap)²) bounded tasks
    #   of ≤ gram_cap² pairs each. Driver-SF corpora never exceed
    #   gram_cap, so the oracle-facing single-tile path is unchanged;
    #   both guards are exercised by the bucket-skew corpus
    #   (tools/gen_bucket_skew.py).
    cutoff = threshold - 0.5 * 10 ** (-round_dp) - 1e-12

    def _score_tile(pdf):
        import pandas as _pd

        ci, cj = int(pdf["__ci"].iloc[0]), int(pdf["__cj"].iloc[0])
        m = _np.asarray(pdf["emb"].tolist(), dtype=_np.float64)
        ids = pdf["vec_id"].to_numpy()
        normed = m / _np.linalg.norm(m, axis=1, keepdims=True)
        if bool(pdf["__star"].iloc[0]):
            # star tile of an over-cap bucket: the global hub (the
            # bucket's min id — present in every tile by the __j
            # routing) against this tile's members. NO cutoff: star
            # edges leave unfiltered (true cosine, below-threshold
            # included) so over-cap members keep their hub-reachable
            # connectivity — the consumer applies the test.
            hub = int(_np.argmin(ids))
            cos_h = normed @ normed[hub]
            keep = _np.arange(len(ids)) != hub
            lo = _np.minimum(ids[keep], ids[hub])
            hi = _np.maximum(ids[keep], ids[hub])
            return _pd.DataFrame(
                {"vec_a": lo, "vec_b": hi, "raw_cos": cos_h[keep]}
            )
        if ci == cj:
            # diagonal tile: triangular gram over the chunk
            cos = normed @ normed.T
            ia, ib = _np.triu_indices(len(ids), k=1)
            keep = cos[ia, ib] >= cutoff
            # orient each pair as (low id, high id); keep raw cos —
            # the oracle-parity round + threshold stay SQL-side
            lo = _np.minimum(ids[ia[keep]], ids[ib[keep]])
            hi = _np.maximum(ids[ia[keep]], ids[ib[keep]])
            return _pd.DataFrame(
                {"vec_a": lo, "vec_b": hi, "raw_cos": cos[ia, ib][keep]}
            )
        # cross tile: chunk ci rows × chunk cj rows, full rectangle
        ca = pdf["__c"].to_numpy() == ci
        cos = normed[ca] @ normed[~ca].T
        ia, ib = _np.nonzero(cos >= cutoff)
        ids_a, ids_b = ids[ca][ia], ids[~ca][ib]
        lo = _np.minimum(ids_a, ids_b)
        hi = _np.maximum(ids_a, ids_b)
        return _pd.DataFrame(
            {"vec_a": lo, "vec_b": hi, "raw_cos": cos[ia, ib]}
        )

    v = fan_out(corpus).select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("emb")
    )
    banded = v.select(
        "vec_id", "emb", F.posexplode(_bands_arrow_udf(tables)("emb")).alias("tbl", "bkt")
    )
    # ONE plan branch for both regimes, r9's plan shape restored
    # (r13, VERDICT r12 item 3): the r10 star/tile rework added two
    # window-sorts (bucket size + in-bucket rank) and a two-branch
    # union, and the isolated sf0.1 wall doubled (0.92 s → 1.8 s
    # quiet; pinning the shared frame was WORSE, 2.3–2.5 s — both an
    # eager localCheckpoint and a lazy persist cost more than the
    # subtree, and the checkpoint erased the (tbl, bkt) partitioning).
    # Neither window is needed:
    # - bucket size + hub id come from ONE window node (count + min
    #   over the same unbounded (tbl, bkt) frame — no orderBy, so one
    #   partition-key sort serves both; the r10 row_number needed its
    #   own vec_id sort). A count-aggregate joined back re-executes
    #   the banding subtree (the minhash lesson — measured 2.1 s) and
    #   its broadcast build adds driver latency;
    # - chunk assignment hashes the id (pmod(xxhash64(vec_id), nc))
    #   instead of round-robining the window rank: tile EXACTNESS is
    #   assignment-independent (each pair still lands in exactly one
    #   tile), only chunk balance shifts, and hash balance is within
    #   a few percent at gram_cap scale.
    # Over-cap buckets route through the SAME tile machinery: members
    # emit exactly their own (0, chunk) tile, the hub row (the
    # bucket's min id, chunk pinned to 0) fans out to every (0, j)
    # tile — each star tile holds the hub plus ~gram_cap members and
    # _score_tile's star mode emits hub↔member edges once each. This
    # also fixes the old star path's straggler shape: a 1M-row hot
    # bucket is nc bounded tasks instead of ONE applyInPandas task
    # holding the whole bucket. The window's (tbl, bkt) exchange
    # already clusters the 4-key groupBy below, so the whole operator
    # is two exchanges (fan-out + banding) plus the final pair agg —
    # r9's shape with both scale guards kept.
    #
    # ACCEPTED RESIDUAL (VERDICT r13 item 6, final): vs the guard-free
    # r9 shape (no window, one gram task per bucket) this costs ~1.2×
    # at sf0.1 — two interleaved A/Bs agree (r13: 1.658 vs 1.385 s;
    # r14: 1.87 vs 1.545 s min-of-4, tools/probe_near_dup_ab.py, which
    # also pins row-identity). The residual is the window's
    # partition-key sort plus the tile bookkeeping columns; there is
    # no further shuffle to piggyback (the window's exchange IS the
    # only (tbl, bkt) shuffle and the groupBy reuses it), and every
    # cheaper stats plumbing was measured worse (BENCH_SCALING
    # embedding_near_dup_lsh_r13 rejected_fixes). 20% where the guard
    # is idle buys bounded tasks on the hot-bucket corpus where the
    # unguarded shape straggles 4.5× — the right trade at 100 TB.
    from pyspark.sql import Window

    wb = Window.partitionBy("tbl", "bkt")
    sized = banded.withColumn("__n", F.count(F.lit(1)).over(wb)).withColumn(
        "__hub", F.min("vec_id").over(wb)
    )
    # chunked exact tiles: nc = 1 for ordinary buckets (sequence(0,0)
    # explodes to the single (0,0) tile == the old one-task gram);
    # a chunk-c row emits tile (c, j) once per j, so tile (ci, cj)
    # holds each ci row once (j = cj) and each cj row once (j = ci) —
    # every pair scored in exactly one tile
    tiled = (
        sized.withColumn(
            "__nc", F.ceil(F.col("__n") / F.lit(gram_cap)).cast("int")
        )
        .withColumn("__star", F.col("__n") > F.lit(max_bucket))
        .withColumn("__is_hub", F.col("vec_id") == F.col("__hub"))
        .withColumn(
            "__c",
            F.when(F.col("__star") & F.col("__is_hub"), F.lit(0))
            .otherwise(
                F.pmod(F.xxhash64("vec_id"), F.col("__nc")).cast("int")
            ),
        )
        .withColumn(
            "__j",
            F.explode(
                F.when(
                    F.col("__star") & ~F.col("__is_hub"),
                    F.array(F.lit(0)),
                ).otherwise(F.sequence(F.lit(0), F.col("__nc") - 1))
            ),
        )
        .withColumn("__ci", F.least("__c", "__j"))
        .withColumn("__cj", F.greatest("__c", "__j"))
    )
    # tile pairs verify against the threshold INSIDE the kernel (the
    # numpy `keep` mask); star edges leave UNFILTERED — the same pair
    # seen in k tables has identical float64 cosine, so min() still
    # collapses cleanly
    scored = tiled.groupBy("tbl", "bkt", "__ci", "__cj").applyInPandas(
        _score_tile, "vec_a long, vec_b long, raw_cos double"
    )
    # a pair co-bucketing in k tables is scored k times with identical
    # float64 arithmetic; min() collapses the copies deterministically
    return (
        scored.select(
            "vec_a", "vec_b", F.round(F.col("raw_cos"), round_dp).alias("cos_sim")
        )
        .groupBy("vec_a", "vec_b")
        .agg(F.min("cos_sim").alias("cos_sim"))
    )


def embedding_near_dup_pairs(
    corpus: DataFrame, threshold: float = 0.95, round_dp: int = 4, max_id: int | None = None
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (vec_a < vec_b,
    cos ≥ threshold) — exact form; the LSH bucketing above is the
    scale path (bucket first, verify within buckets)."""
    base = corpus if max_id is None else corpus.filter(F.col("vec_id") < max_id)
    v = base.select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("emb")
    )
    a = v.select(F.col("vec_id").alias("vec_a"), F.col("emb").alias("emb_a"))
    b = v.select(F.col("vec_id").alias("vec_b"), F.col("emb").alias("emb_b"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    return (
        pairs.select(
            "vec_a",
            "vec_b",
            F.round(cosine(F.col("emb_a"), F.col("emb_b")), round_dp).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def kmeans_lloyd_step(
    corpus: DataFrame,
    n_centroids: int = 8,
    emb_col: str = "embedding",
) -> DataFrame:
    """One distributed Lloyd iteration of spherical k-means over an
    embedding column: assign every vector to its highest-dot-product
    centroid (the IVF cell-assignment rule — ties break to the lowest
    centroid index), then recompute each centroid as the per-dimension
    mean of its members. Output: one row per (cell, dim) —
    ``(cell, dim, n_members, centroid_val)``; callers re-normalize and
    feed the new centroids back in to iterate (the engine-side half of
    the IVF build that ``_data_centroids`` stubs with a take-first
    init).

    Cross-engine exactness: per-dimension means of doubles are
    order-dependent under parallel summation, so members are summed as
    ``DECIMAL(28,12)`` (the cast of each double is deterministic, the
    decimal sum is exact and order-free) and ONE double division by
    the member count produces ``centroid_val`` — no accumulated
    floating point anywhere (same policy as the decimal money
    pipeline).

    Scale shape (100 TB): assignment is a pure projection (the k·d
    dot-product expression is one codegen'd SQL string, see
    _cent_dots_expr); the update is a single groupBy(cell, dim) whose
    key space is k·d regardless of corpus size, map-side combined —
    the shuffle carries (cell, dim, partial decimal sum, partial
    count), a few thousand rows per executor. One Lloyd round = one
    shuffle; the driver never sees a vector (the next round's
    centroids are n_centroids·d rows, ML-init scale).
    """
    cents = _data_centroids(corpus, n_centroids)
    assigned = (
        fan_out(corpus)
        .select(F.col(emb_col).cast("array<double>").alias("emb"))
        .withColumn("__dots", _cent_dots_expr("emb", cents))
        .withColumn(
            "cell",
            F.array_position(F.col("__dots"), F.array_max("__dots")).cast("int"),
        )
        .drop("__dots")
    )
    return (
        assigned.select("cell", F.posexplode("emb").alias("dim", "val"))
        .groupBy("cell", "dim")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            (
                F.sum(F.col("val").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("centroid_val"),
        )
    )


def quantize_int8(corpus: DataFrame, round_dp: int = 6) -> DataFrame:
    """Per-vector symmetric int8 quantization of the embedding column:
    scale = max(|x|)/127, q_i = round(x_i·127/max(|x|)) — the standard
    storage/bandwidth reduction for a 100 TB embedding store (4×
    smaller than float32; distance computations dequantize per block).

    Pure projection (two higher-order passes over a 64-wide array per
    row, no shuffle, no Python); emitted scale is rounded for oracle
    parity, the int codes are exact. All-zero vectors quantize to zero
    codes with scale 0 rather than dividing by zero.
    """
    # __mx is materialized as its own projection BEFORE the quantize
    # lambda references it: Catalyst CSE stops at lambda boundaries, so
    # an inline array_max would re-scan the whole array once PER
    # ELEMENT (O(dim²) per row — measured 15x on this op; same lesson
    # as textual._with_tokens).
    emb = F.col("emb")
    m = F.col("__mx")
    q = F.when(m > 0, F.transform(emb, lambda x: F.round(x * 127 / m).cast("int"))).otherwise(
        F.transform(emb, lambda x: F.lit(0))
    )
    return (
        corpus.select(
            "vec_id", "label", F.col("embedding").cast("array<double>").alias("emb")
        )
        .select(
            "vec_id",
            "label",
            "emb",
            F.array_max(F.transform(emb, F.abs)).alias("__mx"),
        )
        .select(
            "vec_id",
            "label",
            F.round(m / 127, round_dp).alias("scale"),
            q.alias("qvec"),
        )
    )


def pca_power_iteration(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """One power-iteration step toward the corpus's top principal
    direction: v1 = X^T (X v0), with the deterministic alternating
    start vector v0 = (+1, -1, +1, ...) — the distributed kernel
    inside every PCA / spectral-embedding / whitening pass (iterate k
    times + normalize to converge; each extra iteration is this same
    plan shape).

    Cross-engine exactness: embedding values quantize once to integer
    micros (floor(x * 1e6) — float→double widening and floor are both
    exact and identical everywhere), the per-row dot product folds
    sequentially inside the array (F.aggregate — deterministic
    in-array order, no shuffle-order drift), and the per-dimension
    accumulation is a DECIMAL(38,0) sum of bigint products — exact and
    order-independent where a double sum would flap by partition
    order, and overflow-proof where a BIGINT sum caps at ~4e5 rows
    (|xq·dot| ≤ 6e5·4e7 ≈ 2.3e13 per row at dim 64). Emitted as a
    string so neither engine coerces the 128-bit value through a
    double.

    Scale shape (100 TB of vectors): ONE pass — quantize + dot + scale
    are all per-row array projections inside codegen; the only
    exchange is the final groupBy(dim), whose cardinality is the
    embedding dimension. X never materializes in long form before the
    dot (the explode happens after the per-row scalar is computed).
    """
    xq = F.transform(
        F.col(vec_col), lambda v: F.floor(v.cast("double") * 1_000_000).cast("long")
    )
    signed = F.transform(
        xq, lambda v, i: F.when(i % 2 == 0, v).otherwise(-v)
    )
    dot_q = F.aggregate(
        signed, F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    return (
        emb.select(xq.alias("__xq"), dot_q.alias("__dot"))
        .select(F.posexplode("__xq").alias("dim", "x"), "__dot")
        .groupBy("dim")
        .agg(
            F.sum((F.col("x") * F.col("__dot")).cast("decimal(38,0)"))
            .cast("string")
            .alias("component")
        )
    )


def pq_codebooks(
    dim: int = 64, m: int = 8, k: int = 16, seed: int = 7
) -> list[list[list[float]]]:
    """Deterministic product-quantization codebooks: ``m`` subspaces ×
    ``k`` centroids × ``dim/m`` dims, seeded per subspace (fixed seed →
    identical codebooks across runs and engines, the _hyperplanes
    convention). Production swaps these for per-subspace k-means
    centroids (kmeans_step is the update); assignment below is
    codebook-agnostic."""
    import numpy as np

    dsub = dim // m
    return [
        np.random.default_rng(seed + i).standard_normal((k, dsub)).tolist()
        for i in range(m)
    ]


def pq_assign(
    corpus: DataFrame,
    codebooks: list[list[list[float]]] | None = None,
    round_dp: int = 4,
) -> DataFrame:
    """Product-quantization encoding: split each vector into ``m``
    subvectors and store only the index of the nearest codebook
    centroid per subspace — the compression half of FAISS-style
    IVF-PQ. 64 floats (256 B) become 8 nibble-codes (4 B at k=16): the
    64x compression that lets a 100 TB embedding corpus's codes sit
    in executor memory for ADC candidate scanning, with exact
    re-ranking only for survivors.

    Kernel shape: Arrow-batched ``mapInPandas`` with one numpy matmul
    per (subspace, batch) — the package's documented vectorized-
    linear-algebra path (see _bands_arrow_udf: the pure-expression
    form was tried first in r6 and overflowed whole-stage codegen's
    generated method at 8×16×8 literals, falling back to interpreted
    evaluation; a 128-wide distance table per row is matmul work,
    not expression work). No shuffle: encode is map-only at any
    corpus size.

    Cross-engine exactness: argmin uses the matmul scores (centroid
    score gaps are O(1), so matmul summation-order ulps cannot flip
    the winner — the _bands_arrow_udf sign argument); the emitted
    ``err_q`` is then RECOMPUTED for the winning centroid only, with
    dim-SEQUENTIAL accumulation (``acc = acc + x_j·l_j`` in index
    order, vectorized across rows) — exactly the left-fold chain the
    DuckDB oracle evaluates, so the doubles match bit-for-bit and the
    4-dp round (applied JVM-side, HALF_UP == DuckDB for positives)
    never sits on an engine-dependent boundary."""
    import numpy as np

    cbs = codebooks if codebooks is not None else pq_codebooks()
    m = len(cbs)
    dsub = len(cbs[0][0])
    books = [np.asarray(b, dtype=np.float64) for b in cbs]

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            x = np.asarray(
                [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
            )
            n = len(pdf)
            codes = np.empty((n, m), dtype=np.int64)
            err = np.zeros(n, dtype=np.float64)
            for mi in range(m):
                xm = x[:, mi * dsub : (mi + 1) * dsub]
                L = books[mi]
                # argmin over ||l||^2 - 2 x.l (||x||^2 constant per row)
                score = (L * L).sum(axis=1)[None, :] - 2.0 * (xm @ L.T)
                c = np.argmin(score, axis=1)
                codes[:, mi] = c
                # exact err: dim-sequential left-fold chain, the
                # oracle's evaluation order
                Lw = L[c]  # winning centroid per row
                dot = np.zeros(n)
                xsq = np.zeros(n)
                for j in range(dsub):
                    dot = dot + xm[:, j] * Lw[:, j]
                    xsq = xsq + xm[:, j] * xm[:, j]
                l2 = np.zeros(n)
                for j in range(dsub):
                    l2 = l2 + Lw[:, j] * Lw[:, j]
                err = err + (xsq + (l2 - 2.0 * dot))
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].values,
                    "pq_code": [
                        "-".join(str(int(v)) for v in row) for row in codes
                    ],
                    "err_q": err,
                }
            )

    import pyspark.sql.types as T

    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("pq_code", T.StringType()),
            T.StructField("err_q", T.DoubleType()),
        ]
    )
    raw = corpus.select("vec_id", "embedding").mapInPandas(encode, out_schema)
    return raw.select(
        "vec_id", "pq_code", F.round("err_q", round_dp).alias("err_q")
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    codebooks: list[list[list[float]]] | None = None,
    round_dp: int = 4,
) -> DataFrame:
    """Approximate top-k by Asymmetric Distance Computation over PQ
    codes — the search half of FAISS-style IVF-PQ (pq_assign is the
    encode half). Per query, a lookup table of ``m × k_cb`` partial
    distances ``||q_m − centroid||²`` is built ONCE; every corpus
    vector's approximate distance is then just ``m`` table lookups on
    its nibble codes — the corpus's float embeddings are never read at
    query time. At 100 TB: codes are ~64x smaller than vectors, the
    LUT frame is KB-sized and broadcast, and the scan is a pure
    projection over the code table, so query cost is independent of
    embedding width.

    Exactness for the oracle: every partial distance is the fixed
    left-fold chain ``(q_j−l_j)² + …`` (same literal text in DuckDB);
    the final distance adds the 8 lookups in fixed subspace order
    (``p0 + p1 + … + p7`` in both engines) — doubles bit-identical,
    ranks tolerance-free. LUT construction is 8 query rows × 128
    centroid rows — interpreted-path cost is irrelevant there; the
    corpus-sized projection below stays codegen'd."""
    from functools import reduce

    from pyspark.sql import Window

    cbs = codebooks if codebooks is not None else pq_codebooks()
    m = len(cbs)
    dsub = len(cbs[0][0])
    k_cb = len(cbs[0])
    spark = corpus.sparkSession

    cb_rows = [
        (mi, ci, [float(v) for v in cent])
        for mi, book in enumerate(cbs)
        for ci, cent in enumerate(book)
    ]
    cb = spark.createDataFrame(
        cb_rows, "m int, c int, l array<double>"
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").cast("array<double>").alias("q_emb"),
    )
    diff = lambda j: (  # noqa: E731
        F.element_at("q_emb", F.col("m") * dsub + j + 1)
        - F.element_at("l", j + 1)
    )
    pdist = reduce(
        lambda acc, j: acc + diff(j) * diff(j),
        range(1, dsub),
        diff(0) * diff(0),
    )
    lut_rows = q.crossJoin(F.broadcast(cb)).select(
        "query_id", "m", "c", pdist.alias("pdist")
    )
    # one row per query with 8 LUT arrays (entries sorted by (m, c) so
    # array index c+1 is centroid c's partial distance)
    lut = lut_rows.groupBy("query_id").agg(
        F.sort_array(F.collect_list(F.struct("m", "c", "pdist"))).alias("es")
    )
    lut = lut.select(
        "query_id",
        *[
            F.expr(
                f"transform(filter(es, e -> e.m = {mi}), e -> e.pdist)"
            ).alias(f"lut{mi}")
            for mi in range(m)
        ],
    )
    codes = pq_assign(corpus, cbs).select(
        F.col("vec_id").alias("corpus_id"),
        *[
            F.element_at(F.split("pq_code", "-"), mi + 1)
            .cast("int")
            .alias(f"c{mi}")
            for mi in range(m)
        ],
    )
    look = lambda mi: F.element_at(  # noqa: E731
        F.col(f"lut{mi}"), F.col(f"c{mi}") + 1
    )
    dist = reduce(lambda acc, mi: acc + look(mi), range(1, m), look(0))
    scored = (
        codes.crossJoin(F.broadcast(lut))
        .filter(F.col("corpus_id") != F.col("query_id"))
        .select("query_id", "corpus_id", dist.alias("adc_dist"))
    )
    # two-phase top-k (the bm25_topk shape): per-(query, scan
    # partition) heads first, so no window partition is corpus-sized
    order = [F.col("adc_dist").asc(), F.col("corpus_id").asc()]
    heads = (
        scored.withColumn("__pid", F.spark_partition_id())
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("query_id", "__pid").orderBy(*order)
            ),
        )
        .filter(F.col("__rn") <= k)
    )
    return (
        heads.withColumn(
            "rank",
            F.row_number().over(Window.partitionBy("query_id").orderBy(*order)),
        )
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "corpus_id",
            F.round("adc_dist", round_dp).alias("adc_dist"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def pq_codebooks_from_data(
    corpus: DataFrame, m: int = 8, k_cb: int = 16
) -> list[list[list[float]]]:
    """Data-derived PQ codebooks: subvector ``mi`` of the first
    ``k_cb`` corpus vectors (by vec_id) becomes subspace ``mi``'s
    codebook — the same take-first ML init as _data_centroids, and for
    the same measured reason: seeded Gaussian codebooks land
    near-orthogonal to every unit-normalized data vector (ADC
    recall@10 vs exact L2 was 0.01 — random), while data-scale
    centroids reach ~0.31 pure-ADC and 0.66/0.89 with 5x/10x
    overfetch + exact re-rank on the test corpus. A production build
    k-means a sample per subspace (kmeans_step is the update); the
    collect is k_cb rows, driver-side, one-off."""
    rows = (
        corpus.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
        .orderBy("vec_id")
        .limit(k_cb)
        .collect()
    )
    dim = len(rows[0].e)
    dsub = dim // m
    return [
        [list(r.e[mi * dsub : (mi + 1) * dsub]) for r in rows]
        for mi in range(m)
    ]


def knn_outlier_scores(
    corpus: DataFrame,
    n_refs: int = 32,
    k: int = 4,
    round_dp: int = 4,
) -> DataFrame:
    """kNN-distance outlier scoring for embedding-space cleaning: each
    vector's distance to its ``k``-th nearest of ``n_refs`` reference
    vectors (the first ``n_refs`` by vec_id — the _data_centroids
    take-first init; production uses a uniform sample). A large
    k-NN-to-reference distance flags out-of-distribution embeddings —
    encoder glitches, corrupted inputs, wrong-modality rows — before
    they poison ANN indexes or clustering.

    Map-only Arrow kernel: the reference block is KB-sized and rides
    the closure; each batch computes all ``n_refs`` squared distances
    with dim-SEQUENTIAL accumulation (the pq_assign exactness
    pattern: ``acc = acc + (x_j − r_j)²`` in index order, vectorized
    across rows) so every distance is bit-identical to the oracle's
    left-fold chain, and the k-th selection under the (distance,
    ref_idx) lexicographic order is therefore engine-identical
    including exact ties — no ulp argument needed anywhere."""
    import pyspark.sql.types as T

    refs = [
        (int(r.vec_id), list(r.e))
        for r in corpus.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
        .orderBy("vec_id")
        .limit(n_refs)
        .collect()
    ]

    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("knn_dist", T.DoubleType()),
        ]
    )
    ref_mat = [e for _, e in refs]
    dsub = len(ref_mat[0])

    def score(batches):
        import numpy as np
        import pandas as pd

        R = np.asarray(ref_mat, dtype=np.float64)  # (n_refs, dim)

        for pdf in batches:
            x = np.asarray(
                [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
            )
            n = len(pdf)
            d = np.zeros((n, len(R)))
            for j in range(dsub):
                diff = x[:, j : j + 1] - R[None, :, j]
                d = d + diff * diff
            # k-th smallest under (distance, ref_idx) lexicographic
            # order; argsort(kind='stable') on d gives exactly that
            order = np.argsort(d, axis=1, kind="stable")
            kth = d[np.arange(n), order[:, k - 1]]
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].values, "knn_dist": kth}
            )

    raw = corpus.select("vec_id", "embedding").mapInPandas(score, out_schema)
    return raw.select(
        "vec_id", F.round("knn_dist", round_dp).alias("knn_dist")
    )
