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
# r12 window (exactly 50): executes the r11 verdict's task 2 —
# continue the steady-state freshness rotation. After r11 the
# last-green histogram is {r5: 35, r6: 35, r8: 45, r9: 49, r10: 46,
# r11: 50}; this window takes the ENTIRE r5 band (group 1 — after r12
# no surviving proof is older than r6), the entries whose plans
# changed in r12 (group 2, the growth rule — these displace r6
# re-samples first), and the stalest r6 rows in their r6-file
# registration order (group 3).
_DRIVER_WINDOW = [
    # --- r12 window (exactly 50) ---
    # (1) ALL 35 entries whose last hash-green driver row is r5.
    "clean_winsorize_prices",
    "documents_source_overlap",
    "dq_constraints",
    "drift_priority_mix_monthly",
    "drift_value_ks_distance",
    "drift_value_mann_whitney",
    "embedding_dim_variance_ranking",
    "embedding_quantize_int8",
    "eval_lang_id_confusion",
    "events_activation_depth",
    "events_attribution_first_touch",
    "events_burst_detection",
    "events_dau_wau",
    "events_markov_transitions",
    "events_overdispersion_fano",
    "events_rolling_volatility",
    "events_session_paths",
    "events_srm_check",
    "events_stickiness_dau_mau",
    "events_user_presence_bitmap",
    "events_vwap_hourly",
    "features_market_hourly",
    "features_ntile_bins",
    "lineitem_discount_did",
    "lineitem_shipment_lead_time",
    "orders_basket_affinity",
    "orders_churn_labels",
    "orders_cohort_ltv",
    "orders_gini_coefficient",
    "orders_pareto_8020",
    "orders_rfm_segments",
    "orders_trend_residual_daily",
    "stats_returns_rate_wilson",
    "stats_supplier_concentration_hhi",
    "text_inverted_index",
    # (2) plan/code changed in r12 — the growth rule: the exact-pair
    #     family's top_k bound moved from output-only truncation into
    #     CANDIDATE generation (operators/dedup._hub_candidate_pairs;
    #     VERDICT r11 item 2). The bound stays default-off so the
    #     oracle path builds the identical plan, but the operators'
    #     code changed and must re-prove — same convention that put
    #     this family in the r11 window.
    "dedup_jaccard_pairs",
    "dedup_containment_pairs",
    "dedup_connected_components",
    "sample_leakage_safe_split",
    "pipeline_curate_corpus",
    # (3) the 10 stalest r6 rows (r6-file registration order), the
    #     steady-state band sample — the 5 growth-rule slots above
    #     displaced the next 5 r6 re-samples, which stay r6-green,
    #     within the freshness bar.
    "dedup_minhash_lsh",
    "streaming_tumbling_1h",
    "streaming_stream_static_join",
    "streaming_stateful_user_stats",
    "orders_anomalous_days",
    "orders_runs_test_daily",
    "orders_yoy_growth_monthly",
    "orders_fiscal_445_rollup",
    "orders_segment_migration_matrix",
    "events_hourly_autocorrelation",
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

