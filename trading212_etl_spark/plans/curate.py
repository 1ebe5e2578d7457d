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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import jaccard_pairs, remove_near_dups
from ..operators.textual import lang_pred_col, quality_bp_col, tokens
from ..partitioning import fan_out


def curate_corpus(
    docs: DataFrame,
    min_quality_bp: int = 5200,
    langs: tuple[str, ...] = ("en",),
    jaccard_threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Return the curated corpus: docs scoring ≥ ``min_quality_bp``,
    predicted in ``langs``, exact-deduped (min doc_id per content
    digest wins), with near-duplicates (Jaccard ≥ threshold) removed
    keeping each pair's lower id."""
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
    # materialize the scored survivors once: BOTH sides of the exact
    # dedup (the digest group-by and the semi-join probe) and, through
    # canonical, the near-dup stage would otherwise each re-run
    # tokenize+score over the corpus (measured 2x wall on the full
    # pipeline). At cluster scale this is where you'd persist.
    kept = scored.filter(
        (F.col("quality_bp") >= min_quality_bp) & F.col("lang_pred").isin(*langs)
    ).localCheckpoint()
    canonical_ids = (
        kept.groupBy(F.sha2("text", 256).alias("__h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    canonical = kept.join(canonical_ids, "doc_id", "left_semi").localCheckpoint()
    # the scoring pass already materialized the token arrays — reuse
    # them for shingling instead of re-running the regex tokenizer
    pairs = jaccard_pairs(canonical, jaccard_threshold, shingle_n, tokens_col="__toks")
    return remove_near_dups(canonical, pairs).select(
        "doc_id", "lang", "lang_pred", "quality_bp", "n_tokens"
    )
