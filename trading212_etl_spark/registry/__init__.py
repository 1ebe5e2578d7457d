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
# r14 window (exactly 50): executes the r13 verdict's task 2 —
# continue the steady-state freshness rotation. After r13 the
# last-green histogram is {r8: 23, r9: 49, r10: 46, r11: 43, r12: 50,
# r13: 50}; this window takes the ENTIRE r8 band (group 1 — after r14
# no surviving proof is older than r9), the entries whose drive/plan
# code changed in r14 (group 2, the growth rule — these displace r9
# re-samples first), and the stalest r9 rows in their r9-file
# registration order (group 3).
_DRIVER_WINDOW = [
    # --- r14 window (exactly 50) ---
    # (1) ALL 23 entries whose last hash-green driver row is r8, in
    #     r8-file registration order.
    "text_bpe_merges",
    "sample_preference_pairs",
    "agg_heavy_hitters",
    "stats_qty_price_independence",
    "events_user_lifecycle_weekly",
    "events_cuped_adjustment",
    "orders_benford_first_digit",
    "sample_temperature_mixture",
    "orders_seasonal_dow_index",
    "text_lang_id",
    "flagship_pipeline",
    "similarity_topk_lsh",
    "events_funnel",
    "join_asof_forward",
    "join_asof_nearest",
    "events_attribution_linear",
    "dedup_substring_spans",
    "sample_importance_dsir",
    "similarity_hard_negatives",
    "similarity_matryoshka_recall",
    "orders_cusum_changepoint",
    "source_json_malformed",
    "multimodal_perceptual_dhash",
    # (2) drive/plan code changed in r14 — the growth rule:
    #     streaming_stream_stream_join's drive gained the
    #     progress-buffer-capped late-drop audit (ADVICE r13 item 1:
    #     raised numRecentProgressUpdates + loud truncation assert).
    "streaming_stream_stream_join",
    # (3) the 26 stalest r9 rows in r9-file registration order (the
    #     growth-rule slot above displaced the 27th r9 re-sample,
    #     which stays r9-green, within the freshness bar).
    "portfolio_fifo_pnl",
    "portfolio_open_lots",
    "portfolio_max_drawdown",
    "portfolio_sharpe_monthly",
    "agg_cube",
    "agg_distinct_counts",
    "agg_having_top_parts",
    "agg_pivot",
    "agg_pricing_summary",
    "agg_rollup",
    "agg_salted_skew",
    "dedup_boilerplate_lines",
    "dedup_decontaminate",
    "dedup_exact",
    "events_json_props",
    "explode_unnest",
    "join_broadcast_enrich",
    "join_multiway_star",
    "join_outer_coalesce",
    "join_range_interval",
    "join_semi_anti",
    "profile_columns",
    "profile_histogram",
    "sink_bucketed_colocated_join",
    "sink_partitioned_parquet",
    "source_csv_roundtrip",
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

