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
# r07 window (exactly 50): executes the r6 verdict's rotation plan —
# (1) the 21 entries that have never had a driver CORRECTNESS row
# (every r6 addition past slot 50), making cumulative driver coverage
# 254/254; (2) the two entries whose plans changed in r7 (bpe-merge
# rank rewrite, preference-pair self-join aliasing); (3) 27 stale
# high-risk re-samples — the recursive-CTE twins, the seeded-plane
# LSH family, the similarity suite, both pipelines, and the stalest
# r1/r2-row oracles. Any entry ADDED in r7 must displace a slot from
# group (3) so never-checked debt stays zero (r6 verdict item 2).
_DRIVER_WINDOW = [
    # --- r07 window (exactly 50) ---
    # (1) the 21 entries that have NEVER had a driver CORRECTNESS row
    # (r6 additions past window slot 50 — r6 verdict item 1); closing
    # these makes cumulative driver coverage 254/254.
    "events_bounce_rate_daily",
    "events_type_lift_matrix",
    "features_user_behavior_profile",
    "text_bigram_coherence",
    "embedding_knn_outlier",
    "dedup_rate_by_source",
    "sample_curriculum_order",
    "text_rake_keyphrases",
    "pipeline_release_gate",
    "streaming_error_rate_sli",
    "events_time_to_convert",
    "supplier_service_scorecard",
    "orders_reorder_interval",
    "events_burn_rate_alert",
    "parts_abc_classification",
    "orders_revenue_bridge_monthly",
    "orders_gap_burstiness",
    "profile_correlation_matrix",
    "stats_discount_qty_ols",
    "orders_seasonal_decomposition",
    "orders_forecast_seasonal_naive",
    # (2) plans CHANGED in r7 — must re-prove green after the rewrite:
    # bpe merge_rank moved off the foldable-lit(1) window onto
    # ordered_prefix; preference pairs' self-join right side renamed;
    # the r6-regression trio moved off persist+1-row-cross-join onto
    # scalar_bucket windows / a source-side frontier scan.
    "text_bpe_merges",
    "sample_preference_pairs",
    "agg_heavy_hitters",
    "stats_qty_price_independence",
    "events_user_lifecycle_weekly",
    # (r7 sf0.5-sweep catches: CUPED's var_reduction_ppm refactored
    # to the divide-first factorization after the joint form burst
    # Decimal(38,0) at 5x data; benford's 9-row grand total moved
    # onto a scalar_bucket window to kill the last WindowExec warning.
    # Each displaced a group-3 slot: similarity_topk_bruteforce — a
    # plain broadcast+rank baseline whose semantics the PQ/LSH/IVF
    # entries re-derive — and dedup_boilerplate_lines, whose
    # broadcast-probe skeleton dedup_decontaminate keeps covered.)
    "events_cuped_adjustment",
    "orders_benford_first_digit",
    # (same sweep's warning-hygiene pass: the global-total windows in
    # the temperature-mixture operator and the seasonal dow index
    # moved onto scalar_bucket keys — values bit-identical, plans
    # changed, so both re-prove. Displaced join_range_interval (r2
    # textbook equi-anchored shape, untouched since) and
    # agg_salted_skew (salting equivalence is independently fuzzed by
    # tests/test_properties.py).)
    "sample_temperature_mixture",
    "orders_seasonal_dow_index",
    # (3) stale high-risk re-samples (r6 verdict item 1's second half):
    # recursive-CTE twins, the seeded-plane LSH family, the similarity
    # suite, flagship + curation pipelines, and the stalest oracles
    # still holding r1/r2 rows.
    "text_lang_id",  # stalest in the registry (r1)
    "flagship_pipeline",  # r3
    "pipeline_curate_corpus",  # r3, perf-watch
    "dedup_connected_components",  # r2, recursive-CTE oracle
    "dedup_semantic_clusters",  # r5, recursive-CTE oracle
    "similarity_topk_lsh",  # r3, seeded-plane
    "dedup_jaccard_pairs",  # r2
    # (late-r7 hot-key fixes from the skewed-corpus sweep changed SIX
    # entries' plans — the stream-stream join's horizon-bucketed
    # equi-key + foreachBatch-partial drive, the funnel's chained
    # projections (events_time_to_convert shares the operator and is
    # ALREADY in the group-1 window above), the reversed-running-frame
    # forward as-of carries, and attribution's collect_set carry —
    # each must re-prove green. The five new slots displace the
    # remaining low-risk group-3 re-samples: similarity_topk_ivf
    # (seeded-plane family stays covered by similarity_topk_lsh and
    # embedding_near_dup_lsh above), dedup_decontaminate
    # (broadcast-probe skeleton covered by dedup_jaccard_pairs),
    # sink_bucketed_colocated_join (r2 bucketing, untouched),
    # streaming_foreachbatch_ingest (its foreachBatch machinery is
    # exactly what the new stream-stream drive exercises), and
    # window_lag_lead_running (plain r2 battery re-derived across
    # dozens of green applied entries).
    "embedding_near_dup_lsh",  # r3, seeded-plane
    "streaming_stream_stream_join",
    "events_funnel",
    "join_asof_forward",
    "join_asof_nearest",
    "events_attribution_linear",
    # (4) entries ADDED in r7 — never driver-checked by construction,
    # each takes a group-(3) slot per the growth rule (displacing
    # window_keep_first / window_topn_per_group / agg_rollup /
    # agg_cube, all r2-green plain shapes; the window family stays
    # covered by the two entries above)
    "dedup_substring_spans",
    "sample_importance_dsir",
    "similarity_hard_negatives",
    "similarity_matryoshka_recall",
    # (second r7 batch; displaced dedup_exact — trivial digest shape —
    # and dedup_containment_pairs, whose _common_shingle_counts
    # skeleton stays covered by dedup_jaccard_pairs above)
    "orders_cusum_changepoint",
    "source_json_malformed",
    # (third r7 batch; displaced window_analytic_battery — its lag/
    # lead/rank shapes stay covered by window_lag_lead_running above)
    "multimodal_perceptual_dhash",
    # (events_funnel / agg_pivot / tpch_q3_shipping_priority yielded
    # their re-sample slots to the plan-changed trio in group 2 —
    # lowest divergence risk of the stale set: static pivot values, a
    # plain window chain, a textbook join+agg)
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

