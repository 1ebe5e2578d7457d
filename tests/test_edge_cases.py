"""Empty-input robustness: every core operator must return a
schema-stable, zero-row (or well-defined) result on an empty frame —
at 100 TB, empty partitions, empty date ranges, and freshly-truncated
tables hit every operator eventually, and an operator that throws on
empty input fails the whole job."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import types as T


def _empty_events(spark):
    return spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
            ]
        ),
    )


def _empty_docs(spark):
    return spark.createDataFrame(
        [],
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
                T.StructField("lang", T.StringType()),
                T.StructField("source", T.StringType()),
            ]
        ),
    )


def test_event_operators_on_empty(spark):
    from trading212_etl_spark.operators.events import (
        funnel,
        markov_transitions,
        retention_cohorts,
        rollup_hierarchy,
        session_window_agg,
        sessionize,
        tumbling_agg,
    )

    ev = _empty_events(spark)
    assert tumbling_agg(ev, "1 hour").count() == 0
    assert sessionize(ev, 30).count() == 0
    assert session_window_agg(ev).count() == 0
    assert funnel(ev, ["a", "b"]).count() == 0
    assert funnel(ev, ["a", "b"], max_gap_minutes=10).count() == 0
    assert retention_cohorts(ev).count() == 0
    assert rollup_hierarchy(ev).count() == 0
    assert markov_transitions(ev).count() == 0


def test_text_operators_on_empty(spark):
    from trading212_etl_spark.operators.textual import (
        repetition_stats,
        tfidf_top_terms,
        token_stats,
        top_ngrams,
        unigram_lm_score,
    )

    docs = _empty_docs(spark)
    assert token_stats(docs).count() == 0
    assert repetition_stats(docs).count() == 0
    assert tfidf_top_terms(docs).count() == 0
    assert unigram_lm_score(docs).count() == 0
    assert top_ngrams(docs).count() == 0


def test_dedup_operators_on_empty(spark):
    from trading212_etl_spark.operators.dedup import (
        connected_components,
        exact_dedup,
        jaccard_pairs,
        remove_near_dups,
    )

    docs = _empty_docs(spark)
    assert exact_dedup(docs).count() == 0
    pairs = jaccard_pairs(docs, 0.5)
    assert pairs.count() == 0
    # empty pair graph: CC converges immediately, removal is identity
    assert connected_components(pairs).count() == 0
    assert remove_near_dups(docs, pairs).count() == 0


def test_asof_and_pagerank_on_empty(spark):
    from trading212_etl_spark.operators.asof import asof_join
    from trading212_etl_spark.operators.graph import pagerank_micro

    left = spark.createDataFrame([], "key long, ts long, x long")
    right = spark.createDataFrame([], "key long, ts long, v long")
    for direction in ("backward", "forward"):
        out = asof_join(
            left, right, "ts", "ts", "key", "key", ["v"], direction=direction
        )
        assert out.count() == 0
        assert set(out.columns) == {"key", "ts", "x", "v"}
    edges = spark.createDataFrame([], "src long, dst long, weight long")
    assert pagerank_micro(edges, iterations=1).count() == 0


def test_curate_on_empty(spark):
    from trading212_etl_spark.plans.curate import curate_corpus

    assert curate_corpus(_empty_docs(spark)).count() == 0


def test_null_and_empty_text_rows(spark):
    """NULL and empty text must flow through, not crash: stats rows
    propagate NULL (token counts null for a null document, 0 for an
    empty one), pair generators and the curation filter simply never
    select them."""
    from trading212_etl_spark.operators.dedup import exact_dedup, jaccard_pairs
    from trading212_etl_spark.operators.textual import token_stats
    from trading212_etl_spark.plans.curate import curate_corpus

    docs = spark.createDataFrame(
        [
            (1, "hello world hello", "en", "a"),
            (2, None, "en", "a"),
            (3, "", "en", "a"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    stats = {r["doc_id"]: r["n_tokens"] for r in token_stats(docs).collect()}
    assert stats[1] == 3 and stats[3] == 0 and stats[2] is None
    assert exact_dedup(docs).count() == 3  # null text is its own group
    assert jaccard_pairs(docs, 0.5).count() == 0
    assert curate_corpus(docs).count() == 0  # filtered, not crashed


def test_registry_event_entries_on_empty_events_parquet(spark, tmp_path):
    """The inline registry entries (which scan {sf_dir}/events.parquet
    through the pinned-schema reader, not a passed DataFrame) must
    return schema-stable zero-row frames on an EMPTY events file —
    the freshly-truncated-table case. Covers the round-3 additions:
    TWAP, rolling volatility, EWMA, gap percentiles, burst detection,
    presence bitmap, session paths, heatmap, and the running
    distinct."""
    from trading212_etl_spark import registry
    from trading212_etl_spark.sources.readers import SCHEMAS

    sf_dir = str(tmp_path)
    spark.createDataFrame([], SCHEMAS["events"]).write.mode(
        "overwrite"
    ).parquet(f"{sf_dir}/events.parquet")
    for name in (
        "events_twap_hourly",
        "events_rolling_volatility",
        "events_ewma_smoothed",
        "events_gap_percentiles",
        "events_burst_detection",
        "events_user_presence_bitmap",
        "events_session_paths",
        "events_heatmap_dow_hour",
        "window_running_distinct",
    ):
        df = registry.QUERIES[name](spark, sf_dir)
        assert df.count() == 0, name
        assert len(df.schema.fields) >= 2, name
