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
# r10 window (exactly 50): executes the r9 verdict's task 1 — retire
# the driver-proof staleness front. After r9, 80 entries' last
# hash-green driver row was r3 (35) or r4 (45); this window takes
# every r3 row, the entries whose PLANS change in r10, and the
# highest-risk r4 rows, in three groups:
#   (1) ALL 35 entries whose last hash-green row is r3 — the scalar
#       string/timestamp batteries, the tumbling/sliding/OHLC event
#       suite, the tpch q2/q4-q13/q15-q22 family, the sampling
#       splits, and window_range_frame — so after r10 no surviving
#       row is older than r4.
#   (2) 5 entries whose plan/drive changes in r10 (the growth rule: a
#       changed plan must re-prove on the driver regardless of age):
#       sink_ivf_partitioned_ann (hot-cell salted writer, verdict
#       item 2), embedding_near_dup_lsh (chunk-distributed under-cap
#       gram, verdict item 3), dedup_jaccard_pairs and
#       dedup_containment_pairs (env-gated stop-shingle cap, verdict
#       item 5 — default-off, so the driver plan is unchanged, but
#       the entries' code paths moved), and
#       streaming_dedup_exactly_once (drive moved from the
#       driver-resident append memory sink to the foreachBatch
#       parquet sink after the 125× probe burst maxResultSize —
#       displacing window_running_distinct, the lowest-risk group-(3)
#       pick, which queues for r11; streaming_session_window got the
#       same sink change and was already in group (3)).
#   (3) 10 highest-risk r4 re-samples filling the remaining slots:
#       the five stateful streaming batch-twins (cdc_apply,
#       presence_bitmap, session_window, sliding, vwap), the three
#       trickiest join shapes (asof_tolerance, dpp_partitioned,
#       salted_skew), schema evolution, and snapshot diff.
# The remaining 35 r4 rows (incl. the displaced
# window_running_distinct) queue for the r11 rotation (tracked here
# so the next window is not re-derived from scratch).
_DRIVER_WINDOW = [
    # --- r10 window (exactly 50) ---
    # (1) every entry whose last hash-green driver row is r3 (35)
    "embedding_near_dup",
    "events_gapfill_hourly",
    "events_ohlc_daily",
    "events_sliding_2h_1h",
    "events_tumbling_1h",
    "join_asof_backward",
    "sample_domain_mixture",
    "sample_hash_split",
    "sample_stratified",
    "string_funcs",
    "string_funcs_extended",
    "text_quality_score",
    "text_redact",
    "text_tfidf_topk",
    "text_token_stats",
    "timestamp_funcs",
    "tpch_q2_best_supplier_per_part",
    "tpch_q4_priority_check",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_parts",
    "tpch_q12_late_lines_by_year",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_count",
    "tpch_q17_small_quantity_revenue",
    "tpch_q19_disjunctive_revenue",
    "tpch_q20_promotable_suppliers",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_dormant_customers",
    "window_range_frame",
    # (2) plan/drive changed in r10 — must re-prove green
    "sink_ivf_partitioned_ann",
    "embedding_near_dup_lsh",
    "dedup_jaccard_pairs",
    "dedup_containment_pairs",
    "streaming_dedup_exactly_once",
    # (3) 10 highest-risk r4 re-samples
    "streaming_cdc_apply",
    "streaming_presence_bitmap",
    "streaming_session_window",
    "streaming_sliding_2h_1h",
    "streaming_vwap_hourly",
    "join_asof_tolerance",
    "join_dpp_partitioned",
    "join_salted_skew",
    "source_schema_evolution",
    "snapshot_diff_orders",
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

