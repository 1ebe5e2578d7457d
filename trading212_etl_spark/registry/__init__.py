"""Query registry: the driver-facing inventory of implemented
operators (SURVEY.md §2), each as a (PySpark program, DuckDB oracle
SQL) pair — split into domain modules (VERDICT r4 item 6), with the
shared plumbing in ``_core`` and the driver-window ordering here.

Importing a domain module registers its entries into
``QUERIES``/``ORACLES``; the import block below runs in the original
monolithic-file order, so registration order — which the external
correctness driver consumes positionally — is byte-stable across the
split. Conventions for oracle parity live in ``_core``.
"""

from __future__ import annotations

from ._core import (  # noqa: F401
    ORACLES,
    QUERIES,
    pin_oracle_confs,
    register,
)
from . import (  # noqa: E402,F401  (import order IS registration order)
    sources_sinks,
    joins,
    aggregates,
    windows,
    events,
    llm,
    flagship_projections,
    scalars,
    setops,
    selection,
    tpch,
    timeseries,
    governance,
    analytics,
    stats,
)


# ---------------------------------------------------------------------------
# Driver-window ordering. The external correctness driver checks the
# FIRST 50 registered queries per round (CORRECTNESS_r01/r02 are each
# exactly the first 50 in registration order), so registration order is
# evidential, not cosmetic. This block pins a deliberate front window:
#   - the round-2 timestamp-regression family (must re-prove green),
#   - the never-driver-checked TPC-H shapes + flagship pipelines,
#   - merge/SCD2, correlated subqueries, scalar string/timestamp
#     batteries, and the similarity / sampling / curation suites.
# Entries already double-green in r01+r02 (sources, basic joins, agg
# battery) and rows-only streaming entries are demoted behind the
# window; remaining untested entries queue in original order for the
# next rotation. Reordering is a pure dict rebuild — no query changes.
#
# r11 window (exactly 50): executes the r10 verdict's task 1 — FINISH
# the freshness rotation. After r10 the last-green histogram was
# {r4: 35, r5: 40, r6: 36, r8: 48, r9: 49, r10: 50}; this window takes
# every remaining r4 row (group 1), the entries whose plans change in
# r11 (group 2, the growth rule), and the stalest r5 rows (group 3).
# After r11 the oldest surviving proof anywhere is r5 and steady-state
# rotation holds: subsequent windows sample the stalest band plus
# changed plans.
_DRIVER_WINDOW = [
    # --- r11 window (exactly 50) ---
    # (1) ALL 35 entries whose last hash-green driver row is r4 —
    #     finishing the freshness rotation (VERDICT r10 task 1):
    #     after r11 no surviving row is older than r5.
    "agg_argmax_battery",
    "array_funcs",
    "delete_propagation",
    "embedding_norms",
    "embedding_pca_power_iter",
    "events_rollup_hierarchy",
    "filter_isin",
    "grouping_sets_sql",
    "intersect_except",
    "literal_and_derived_columns",
    "map_funcs",
    "math_funcs",
    "null_conditional_funcs",
    "predicate_equality",
    "profile_key_skew",
    "profile_quantiles",
    "projection_reorder",
    "sink_compaction",
    "sink_zorder_layout",
    "sort_limit_topk",
    "source_binary_files",
    "source_csv_gzip_roundtrip",
    "source_csv_malformed",
    "stat_aggs",
    "string_agg_first8",
    "text_chunk_windows",
    "text_code_detection",
    "text_fingerprint",
    "text_model_quality_filter",
    "text_repetition",
    "text_top_ngrams",
    "text_unigram_lm_score",
    "union_dedup_chunks",
    "union_missing_columns",
    "window_running_distinct",
    # (2) plan/code changed in r11 — the growth rule: a changed plan
    #     must re-prove on the driver regardless of age. The star
    #     paths now emit unfiltered over-cap edges (dedup_simhash,
    #     embedding_near_dup_lsh, dedup_semantic_clusters), the IVF
    #     cell writer gained the left-join/null-cell + group-count
    #     fan-out (sink_ivf_partitioned_ann), entity hubs skip
    #     null names (entity_resolution_customers), and the
    #     exact-pair family gained the default-off top-k output
    #     bound (dedup_jaccard/containment_pairs,
    #     dedup_connected_components, sample_leakage_safe_split,
    #     pipeline_curate_corpus).
    "dedup_simhash",
    "embedding_near_dup_lsh",
    "dedup_semantic_clusters",
    "sink_ivf_partitioned_ann",
    "entity_resolution_customers",
    "dedup_jaccard_pairs",
    "dedup_containment_pairs",
    "dedup_connected_components",
    "sample_leakage_safe_split",
    "pipeline_curate_corpus",
    # (3) stalest r5 re-samples filling three slots (iterative graph
    #     pair + the merge-state aggregate), plus the two entries BORN
    #     in r11 — a never-driver-checked entry outranks an r5
    #     re-sample (the displaced events_markov_transitions /
    #     orders_cohort_ltv stay r5-green, within the freshness bar).
    "graph_pagerank",
    "graph_triangle_count",
    "incremental_agg_merge",
    "dedup_decontaminate_bloom",
    "dedup_incremental_snapshot",
]


def _apply_driver_window() -> None:
    missing = [n for n in _DRIVER_WINDOW if n not in QUERIES]
    assert not missing, f"driver window references unknown queries: {missing}"
    rest = [n for n in QUERIES if n not in set(_DRIVER_WINDOW)]
    order = _DRIVER_WINDOW + rest
    for d in (QUERIES, ORACLES):
        snapshot = dict(d)
        d.clear()
        d.update({n: snapshot[n] for n in order if n in snapshot})


_apply_driver_window()

