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
    # Round 8 primary goal (VERDICT r7 item 1) is *restraint*: the 15
    # r5-certified queries are the stalest cohort and must rotate through
    # this window.  Entries are appended below ONLY for plans that round-8
    # edits actually changed; tests/test_entry_rotation.py derives helper
    # consumers at runtime and fails if a changed-helper user is missing.
    # agg_having: HAVING threshold rewritten to micro-units on both sides
    # (ADVICE r7 item 5) — plan and oracle changed together.
    "agg_having",
    # join_salted_skew: single-join hot-key annotation + sampled
    # detection (VERDICT r7 item 6) — plan changed.
    "join_salted_skew",
    # pipeline_courses_parity: latest-file selection switched from a
    # broadcast semi join to the reference's driver-side max + narrow
    # filter (VERDICT r7 item 3 drift fix) — plan changed.
    "pipeline_courses_parity",
    # text_tfidf_top_terms: total_docs moved from a per-construction
    # driver d.count() to a broadcast 1-row aggregate (the oracle's
    # CROSS JOIN n mirrored) — same values, plan changed.
    "text_tfidf_top_terms",
    # A split-bigint dsum rewrite was TRIED and REVERTED late in the
    # round (1.9x slower on q1's composite expressions — measured
    # negative in registry.dsum's docstring): the emission is back to
    # the r7-certified decimal-partial byte-for-byte, so no dsum
    # consumer is forced. The rotation-guard test fired on the change
    # and again on the revert, producing the full consumer list both
    # times — the r7-ADVICE mechanism is proven live.
    # Round-8 carve-outs (files edited, NO forcing — each provably
    # leaves every registered result unchanged):
    #  - dedup.py `_banded`/`dsum_micros` helper extractions emit
    #    byte-identical expressions (pinned by test_entry_rotation);
    #    the `carry=()` default keeps _verify_exact_jaccard's plan
    #    identical for all pre-existing callers (oracle-rechecked).
    #  - multimodal.py decode additions: multimodal_blob_metadata
    #    never calls decode_media (metadata slice only).
    #  - stateful.py object-dtype accumulation: identical values when
    #    no overflow occurs, and overflow is unreachable at fixture
    #    scale — stream_stateful_profile_parity rotates normally.
    #  - catalog.py fingerprint robustness: cache-key logic only.
    # window_latest_per_key is NOT listed: VERDICT r7 item 5 closed as
    # a recorded negative (operators/windows.py docstring) — the
    # sort-window plan beat all three alternatives, so no plan changed.
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
