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
# r13 window (exactly 50): executes the r12 verdict's task 3 —
# continue the steady-state freshness rotation. After r12 the
# last-green histogram is {r6: 25, r8: 45, r9: 49, r10: 46, r11: 45,
# r12: 50}; this window takes the ENTIRE r6 band (group 1 — after r13
# no surviving proof is older than r8), the entries whose plans
# changed in r13 (group 2, the growth rule — these displace r8
# re-samples first), and the stalest r8 rows in their r8-file
# registration order (group 3), leading with the verdict's mandatory
# pick streaming_stream_stream_join (task 1's hardened drive AND the
# stalest+flakiest streaming proof).
_DRIVER_WINDOW = [
    # --- r13 window (exactly 50) ---
    # (1) ALL 25 entries whose last hash-green driver row is r6.
    "events_power_analysis_mde",
    "events_twap_hourly",
    "events_anomaly_zscore",
    "events_funnel_windowed",
    "events_heatmap_dow_hour",
    "events_ewma_smoothed",
    "events_gap_percentiles",
    "events_watermark_lateness_audit",
    "events_funnel_conversion_ppm",
    "events_error_rate_sli",
    "clean_mad_outliers",
    "dq_freshness_skew",
    "customer_order_count_distribution",
    "sample_weighted",
    "multimodal_audio_features",
    "multimodal_resize",
    "multimodal_frame_sample",
    "multimodal_image_meta",
    "text_bm25_topk",
    "embedding_pq_assign",
    "similarity_topk_pq_adc",
    "privacy_k_anonymity",
    "embedding_drift_split",
    "text_wordpiece_encode",
    "events_concurrency_peak",
    # (2) plan/code changed in r13 — the growth rule:
    #     pipeline_curate_corpus_lsh gained its md5-mode full SQL
    #     oracle (VERDICT r12 item 2 — first-ever driver hash check);
    #     embedding_near_dup_lsh's operator was rebuilt single-branch
    #     (VERDICT r12 item 3) and dedup_semantic_clusters consumes
    #     the same operator.
    "pipeline_curate_corpus_lsh",
    "embedding_near_dup_lsh",
    "dedup_semantic_clusters",
    # (3) streaming_stream_stream_join — the verdict's mandatory pick
    #     (hardened availableNow drive from task 1; its r8 proof was
    #     both the stalest streaming row and the flaky one) — then the
    #     21 stalest r8 rows in r8-file registration order. The 3
    #     growth-rule slots above displaced the next 3 r8 re-samples,
    #     which stay r8-green, within the freshness bar.
    "streaming_stream_stream_join",
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

