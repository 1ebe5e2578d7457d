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
# r09 window (exactly 50): executes the r8 verdict's task 2 — the r8
# window was byte-identical to r7's, so this rotation covers the two
# staleness fronts the verdict names:
#   (1) the full portfolio family (4): portfolio_fifo_pnl /
#       _open_lots / _max_drawdown were rewritten in r7 (join-free
#       single-window FIFO merge; drawdown's stacked-window reuse) but
#       their only hash-green driver rows predate the rewrite (r5);
#       portfolio_sharpe_monthly rides along — same r5 vintage, same
#       fills-derived input family.
#   (2) ALL 34 entries whose last hash-green row is r2 — the sources/
#       sinks, joins, aggregate-battery and window-battery blocks the
#       verdict calls 6 rounds stale — so after r9 no row is older
#       than r3.
#   (3) 12 highest-risk r3 re-samples filling the remaining slots:
#       the decimal flagship twin, merge/SCD2 mutation pair, the
#       session/retention event suite, correlated subqueries, the
#       bruteforce+IVF similarity pair, kmeans, sequence packing, and
#       the most join-heavy TPC-H shape (q21 semi+anti).
# The 46-entry r3 block cannot fully fit behind these; the remaining
# 34 r3 rows queue for the r10 rotation (tracked here so the next
# window is not re-derived from scratch).
_DRIVER_WINDOW = [
    # --- r09 window (exactly 50) ---
    # (1) portfolio family — plans rewritten r7, driver rows from r5
    "portfolio_fifo_pnl",
    "portfolio_open_lots",
    "portfolio_max_drawdown",
    "portfolio_sharpe_monthly",
    # (2) every entry whose last hash-green driver row is r2 (34)
    "agg_cube",
    "agg_distinct_counts",
    "agg_having_top_parts",
    "agg_pivot",
    "agg_pricing_summary",
    "agg_rollup",
    "agg_salted_skew",
    "dedup_boilerplate_lines",
    "dedup_containment_pairs",
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
    "source_json_flatten",
    "source_orc_roundtrip",
    "streaming_foreachbatch_ingest",
    "tpch_q14_promo_revenue",
    "tpch_q18_large_orders",
    "tpch_q3_shipping_priority",
    "unpivot_melt",
    "window_analytic_battery",
    "window_keep_first",
    "window_lag_lead_running",
    "window_topn_per_group",
    # (3) 11 highest-risk r3 re-samples
    "flagship_pipeline_decimal",
    "merge_upsert_orders",
    "scd2_customer_history",
    "events_retention_cohorts",
    "events_session_window",
    "events_sessionize_30m",
    "subquery_correlated",
    "similarity_topk_bruteforce",
    "similarity_topk_ivf",
    "embedding_kmeans_step",
    "sample_pack_sequences",
    # (4) plan CHANGED in r9 — the Zipf skew sweep's one straggler,
    # rewritten from equi-hash-join+range-residual to a backward
    # as-of merge (213 s -> ~5 s at sf2.5_zipf); must re-prove green.
    # Displaced tpch_q21_waiting_suppliers per the growth rule —
    # textbook semi+anti shape, lowest divergence risk of group (3).
    "join_point_in_time",
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

