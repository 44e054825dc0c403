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
# round, so dict ORDER decides which queries get a current-round green row.
# Rounds 3-5 shipped a hand-maintained static order that silently stopped
# rotating (the list held exactly 50 names, so everything behind it was
# never re-certified — and the events-fixture encoding changed underneath
# those stale rows).  The order is now SELF-ROTATING: read the recorded
# CORRECTNESS_r*.json files and put least-recently-certified queries first
# (never-certified and last-round failures sort earliest), so every query
# is re-certified at least every ceil(96/50)=2 rounds no matter what —
# the rotation can't stall again because it is computed, not promised.
_EDITED_THIS_ROUND = [
    # Queries whose implementing FILE changed this round: their recorded
    # green rows predate the change, so they outrank everything the history
    # says is current.  Update per round alongside the round's edits.
    # Round 10 continues the restraint discipline: the stalest cohort
    # (the 11 r7-green rows) leads automatically via _latest_green;
    # new queries (never certified) lead without entries here.
    # similarity_lsh_index_update: the r9 red row — bucket CAST to
    # BIGINT on both the Spark select and the oracle's outer select
    # (HUGEINT/int32 value-type divergence, VERDICT r9 item 1).
    # Never green, so it leads anyway; listed for the audit trail.
    "similarity_lsh_index_update",
    # stream_late_data_parity (new r10): never certified, leads
    # without an entry — the watermark late-drop/append-emission
    # semantics under the hash gate (streaming/parity.py tail note).
    # streaming/parity.py changed again late in r10 (tmpfs scratch
    # roots + micro-batch replay idempotence markers; then an
    # end-of-round review pass made the markers checkpoint-scoped via
    # run_token and staged them alongside the data): the epoch
    # markers are underscore-prefixed files Spark readers ignore, so
    # results are unchanged BY DESIGN — but the execution path of the
    # streamed parities did change, so the certified ones re-certify
    # in this window rather than ride a carve-out:
    "stream_index_update_parity",
    "stream_index_delete_parity",
    "stream_ann_index_parity",
    # (stream_ann_index_delete_parity, dedup_index_compact,
    # similarity_index_delete, multimodal_frame_sample,
    # stream_late_data_parity, dq_audit_orders are new this round —
    # never certified, they lead without entries.)
    # Carve-outs (files edited, NO forcing, each provably output-
    # invariant and oracle-rechecked at sf0.01 post-change):
    # multimodal.py + plans/queries.py fixture dirs moved to tmpfs
    # scratch (same bytes written, different parent dir); bench.py
    # sampling changes touch no query code.
    # q5_local_supplier_volume: rewritten onto the three-stage
    # split-BIGINT dsum with the micros projection pushed below the
    # join (registry round-10 resolution note) — values bit-identical
    # (asserted in tools/ab_split_dsum_r10.py and oracle-rechecked),
    # but the PLAN changed, so it re-certifies in the r10 window.
    # q3/q6/q10 measured parity in the same A/B and are UNCHANGED.
    "q5_local_supplier_volume",
    # Round-10 carve-outs (files edited, NO forcing — each provably
    # leaves every registered result unchanged):
    #  - multimodal.py ID3v1 trailer length guard (ADVICE r9): no
    #    registered query decodes MP3 (blob_metadata slices metadata
    #    of the fixture formats, resize/dHash are netpbm-only);
    #    pytest covers the decode path.
    #  - streaming/parity.py apply_index_delete removed-ids
    #    validation + staged-state preservation on failed commits
    #    (ADVICE r9): stream_index_delete_parity's returned frame and
    #    values are unchanged (validation is a side count that passes
    #    for the registered takedown slice; the staging change only
    #    alters the FAILURE path) — oracle-rechecked at sf0.01
    #    post-change alongside dedup_index_delete and
    #    stream_index_update_parity.
    #  - late-r10 pure additions: similarity.py gained
    #    similarity_rrf_fusion, text.py gained text_repetition_score,
    #    sampling.py gained sample_corpus_mix — appended functions
    #    only, no shared helper or existing plan touched (the three
    #    new queries lead as never-certified). The pre-existing
    #    queries of all three files that are NOT already in the r10
    #    window by rotation (text_lang_id, text_decontaminate,
    #    similarity_topk_bruteforce, similarity_neardup_pairs,
    #    similarity lifecycle rows — all r9-green) keep their rows:
    #    plans provably unchanged, and the end-of-round full
    #    oracle-check triple re-verifies every query at all three
    #    scales regardless.
]


def _latest_green() -> dict[str, int]:
    """query name -> highest round with a green CORRECTNESS row (hash
    match, or rows match for rows-only entries). Absent/failed-only
    queries are simply missing (treated as round 0 = most stale)."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        for name, rec in rows.items():
            if not isinstance(rec, dict):
                continue
            ok = rec.get("hash_match")
            if ok is None:  # rows-only entry (no oracle): weaker gate
                ok = rec.get("rows_match")
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def _ordered(names: list[str]) -> list[str]:
    latest = _latest_green()
    pos = {n: i for i, n in enumerate(names)}  # stable within a cohort
    forced = {n: -1 for n in _EDITED_THIS_ROUND}
    return sorted(names, key=lambda n: (forced.get(n, latest.get(n, 0)), pos[n]))


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
