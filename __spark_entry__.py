"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All implementations live in ``coursera_etl_pipeline_spark``; this file
is the thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import coursera_etl_pipeline_spark.llm_ops  # noqa: E402,F401  (registers queries)
import coursera_etl_pipeline_spark.operators  # noqa: E402,F401
import coursera_etl_pipeline_spark.plans  # noqa: E402,F401
import coursera_etl_pipeline_spark.streaming  # noqa: E402,F401
from coursera_etl_pipeline_spark.registry import ORACLE, QUERIES  # noqa: E402

# The driver verifies queries in dict order and caps the check at 50 per
# round.  Round 6 FINALLY rotates (rounds 3-5 shipped an identical 50-name
# window, leaving 46 queries on round-2 rows that predate the events-fixture
# regeneration): _FIRST now holds exactly those 46 never-re-certified queries
# — events_* batch family at the very front, since their input encoding
# changed — plus the two repaired real-stream parities and the two dedup.py
# queries whose implementing file changed this round.  The 48 queries green
# in CORRECTNESS_r05 against files untouched this round sit behind the
# window; their r5 rows stay valid.
_FIRST = [
    # events batch family: input encoding changed with the fixture regen —
    # their r2 rows are the most urgently stale evidence in the repo
    "events_tumbling_window",
    "events_sliding_window",
    "events_interval_join",
    "events_session_window",
    # real-stream parities: failed r5 on the ts-unit bug, repaired this round
    "stream_batch_parity",
    "stream_dedup_parity",
    # dedup.py changed this round (_materialize memoization + simhash
    # one-shuffle plan) — first rows against the new code
    "dedup_simhash",
    "dedup_ngram_jaccard",
    # window functions: no green row since r2
    "window_ranking",
    "window_analytic",
    "window_frame_rows",
    "window_frame_range",
    "window_latest_per_key",
    # joins / merge on r2 rows
    "join_asof",
    "merge_upsert_snapshot",
    # TPC-H shapes on r2 rows
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q10_returned_items",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q22_dormant_customers",
    # scalar packs on r2 rows
    "scalar_array_pack",
    "scalar_conditional_pack",
    "scalar_higher_order_pack",
    "scalar_map_pack",
    # sorts / aggs on r2 rows
    "sort_limit_offset",
    "agg_percentile_exact",
    "agg_having",
    "agg_stats_pack",
    "agg_approx_bounds",
    # subqueries / unpivot / nested on r2 rows
    "subquery_scalar",
    "subquery_in",
    "subquery_exists_correlated",
    "unpivot_stack",
    "nested_explode_roundtrip",
    "nested_unnest_roundtrip",
    # llm-ops on r2 rows
    "multimodal_blob_metadata",
    "sample_stratified_hash",
    "text_pack_sequences",
    "text_token_count",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprint",
    "text_tfidf_top_terms",
    "dedup_minhash_lsh",
    "similarity_ann_lsh",
    "similarity_ann_recall",
    "similarity_ann_ivf",
    "similarity_ivf_recall",
]
_LAST: list[str] = []
# First in line for round 7: dedup_exact lives in this round's edited
# dedup.py but its function body is untouched and it doesn't call
# _materialize — semantically zero change, so it yields its window slot to
# the 46 never-re-certified queries this round.
_NEXT = [
    "dedup_exact",
]


def _ordered(names: list[str]) -> list[str]:
    first = [n for n in _FIRST if n in names]
    nxt = [n for n in _NEXT if n in names]
    last = [n for n in _LAST if n in names]
    mid = [n for n in names if n not in set(first) | set(nxt) | set(last)]
    return first + nxt + mid + last


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary: scan->filter->agg->sort) on
    sf0.001; driver checks rows>0 and a stable schema."""
    from coursera_etl_pipeline_spark.operators.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {n: QUERIES[n] for n in _ordered(list(QUERIES))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (same column aliases)."""
    return {n: ORACLE[n] for n in _ordered(list(QUERIES)) if n in ORACLE}
