"""Corpus-curation pipeline — the LLM-training-data north star
(BASELINE.json) as one composed plan: quality filter → language filter
→ exact dedup → near-dup removal.

This is the documents-table analog of the reference's flagship
transactions pipeline (plans/pipeline.py, trading212.py:113-136):
canonicalize → filter → dedup → project, rebuilt over text.

Scale shape, stage by stage:
1. scoring is ONE pass — tokens materialized once (projection
   boundary, see operators/textual), quality + language computed as
   sibling expressions, filters applied before anything shuffles;
2. exact dedup groups 64-byte sha256 digests, not documents;
3. near-dup pairs come from the shingle join (or swap in
   minhash_lsh_pairs at cluster scale — same pair contract);
4. removal is a left-anti join on the drop set (broadcast-able:
   |near-dup pairs| << |corpus|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.dedup import jaccard_pairs, minhash_lsh_pairs, remove_near_dups
from ..operators.textual import lang_pred_col, quality_bp_col, tokens
from ..partitioning import fan_out, freeze_partitions


def curate_corpus(
    docs: DataFrame,
    min_quality_bp: int = 5200,
    langs: tuple[str, ...] = ("en",),
    jaccard_threshold: float = 0.5,
    shingle_n: int = 3,
    use_lsh: bool = False,
    pairs_top_k: int | None = None,
    lsh_hash_fn: str = "xxhash64",
) -> DataFrame:
    """Return the curated corpus: docs scoring ≥ ``min_quality_bp``,
    predicted in ``langs``, exact-deduped (min doc_id per content
    digest wins), with near-duplicates (Jaccard ≥ threshold) removed
    keeping each connected component's minimum doc id (exact closure
    via connected_components — see operators/dedup.remove_near_dups).

    ``pairs_top_k`` (opt-in) bounds the exact pair stage to each
    document's k strongest partners (operators/dedup._top_k_per_doc,
    candidate generation included since r12 via the LSH hub subgraph
    — the quadratic pair mass of a replicated corpus is never
    enumerated, not just truncated after scoring): a replicated
    corpus' true pair listing is quadratic in the copy count, so the
    unbounded exact path DNFs by construction at the 125× probe.
    Equal-J clique connectivity survives the bound, so the removal's
    keep-minimum decision per clique is unchanged; components joined
    only through truncated weak edges may split — the documented
    trade. LSH mode ignores it (banding already bounds candidate
    mass).

    ``lsh_hash_fn`` selects the MinHash hash family in LSH mode:
    ``xxhash64`` (production default, JVM-native) or ``md5`` (the
    cross-engine-replicable mode the DuckDB oracle twin runs —
    registry/timeseries.py pipeline_curate_corpus_lsh)."""
    toks = F.col("__toks")
    scored = fan_out(docs).select(
        "doc_id", "text", "lang", tokens("text").alias("__toks")
    ).select(
        "doc_id",
        "text",
        "lang",
        "__toks",
        F.size(toks).alias("n_tokens"),
        quality_bp_col(toks, F.col("text")).alias("quality_bp"),
        lang_pred_col(toks).alias("lang_pred"),
    )
    kept = scored.filter(
        (F.col("quality_bp") >= min_quality_bp) & F.col("lang_pred").isin(*langs)
    )
    # exact dedup as keep-first-by-digest: ONE shuffle (partition by
    # sha256, min doc_id wins) instead of the groupBy-digest +
    # semi-join-back form, which costs a second exchange plus a
    # materialization of the filtered corpus for its two consumers.
    w = Window.partitionBy(F.sha2("text", 256)).orderBy("doc_id")
    canonical = (
        kept.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        # text is only needed up to the digest — shingling reads the
        # token arrays; dropping it shrinks the materialized survivors
        .drop("__rn", "text")
        # materialized once: the near-dup stage consumes canonical
        # three times (both shingle-join sides + the final anti-join);
        # without this each consumer re-runs tokenize+score+dedup
        # (measured 2x wall). Policy conf-driven: partitioning.materialize.
    )
    canonical = freeze_partitions(canonical)
    # the scoring pass already materialized the token arrays — reuse
    # them for shingling instead of re-running the regex tokenizer
    # use_lsh selects the 100 TB pair generator: MinHash banding with
    # exact-Jaccard candidate verification — same (doc_a, doc_b,
    # jaccard) contract, work bounded by band-bucket collisions
    # instead of shingle co-occurrence. The exact generator remains
    # the test-scale ground truth (LSH can only MISS pairs, so its
    # survivor set is a superset — asserted in tests/test_llm_ops.py).
    if use_lsh:
        pairs = minhash_lsh_pairs(
            canonical,
            threshold=jaccard_threshold,
            shingle_n=shingle_n,
            tokens_col="__toks",
            hash_fn=lsh_hash_fn,
        )
    else:
        pairs = jaccard_pairs(
            canonical,
            jaccard_threshold,
            shingle_n,
            tokens_col="__toks",
            top_k_per_doc=pairs_top_k,
        )
    return remove_near_dups(canonical, pairs).select(
        "doc_id", "lang", "lang_pred", "quality_bp", "n_tokens"
    )
