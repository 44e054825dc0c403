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
# is re-certified at least every ceil(N/50) rounds no matter what — the
# rotation can't stall again because it is computed, not promised. At
# any registry size inside the 100-150 band the currency bound is
# ceil(N/50)=3 rounds: no green row is ever more than 3 driver runs old,
# minus whatever _EDITED_THIS_ROUND forcing consumes
# (tests/test_entry_rotation pins the band AND the COVERAGE.md paragraph
# that publishes the bound; don't re-pin an exact count here — it went
# stale twice).
_EDITED_THIS_ROUND = [
    # Queries whose implementing FILE changed this round: their recorded
    # green rows predate the change, so they outrank everything the history
    # says is current.  Update per round alongside the round's edits.
    #
    # Round 11. New queries (never certified, lead without entries):
    # similarity_lsh_index_delete, dedup_semantic,
    # stream_lsh_index_delete_parity, stream_dq_gate_parity,
    # dedup_boilerplate, text_pii_scrub, similarity_quantize_int8,
    # similarity_quantize_recall.
    #
    # similarity_lsh_index_update: its band-flatten select was
    # extracted into the shared `flatten_band_index` helper so the
    # append/delete/storage verbs all flatten through one definition.
    # The plan is byte-identical (same select, new callee), but the
    # implementing code moved, so it re-certifies rather than ride a
    # carve-out:
    "similarity_lsh_index_update",
    # q3: round-11 sf100-driven rewrite (dim-first join reorder +
    # SHUFFLE_HASH on the reduced orders side; values bit-identical,
    # asserted pre-conversion at sf0.01, oracle unchanged) — plan
    # changed, so it re-certifies:
    "q3_shipping_priority",
    # q7: same rewrite class, late round 11 (dim-first nation cuts on
    # BOTH fact sides before the fact-fact shuffle + SHUFFLE_HASH;
    # ~7x at sf10 AND sf100, identity asserted row-for-row at sf0.01,
    # oracle unchanged) — plan changed, so it re-certifies:
    "q7_nation_volume",
    # q5: the audit-rule sweep's last hit (ASIA customer cut moved
    # before the fact-fact shuffle + SHUFFLE_HASH; sf10 3/4 cycle
    # wins, sf100 3/3, identity bit-equal at sf0.01, oracle
    # unchanged) — plan changed, so it re-certifies:
    "q5_local_supplier_volume",
    # Round-11 carve-outs (files edited, NO forcing — each provably
    # leaves every registered result unchanged, oracle-rechecked at
    # all three fixture scales post-change):
    #  - similarity.py pure additions (similarity_lsh_index_delete,
    #    dedup_semantic + semantic_dedup_verdicts): appended
    #    functions only; no pre-existing plan touched beyond the
    #    flatten extraction forced above. The file's other r9/r10
    #    rows (topk_bruteforce, neardup_pairs, ann_lsh/ivf/recalls,
    #    index_update/delete, rrf_fusion) keep their rows — plans
    #    unchanged, and the end-of-round full oracle-check triple
    #    re-verifies every query at all three scales regardless.
    #  - streaming/parity.py pure additions (the two new streamed
    #    parities + apply_lsh_index_increment/apply_dq_gate/stagers):
    #    appended code only; no existing parity's plan or helper
    #    changed.
    #  - dedup.py / text.py / similarity.py pure additions
    #    (dedup_boilerplate + remove_boilerplate, text_pii_scrub +
    #    scrub_pii, similarity_quantize_int8/_recall + quantize_int8):
    #    appended functions only; no pre-existing plan in any of the
    #    three files touched, and all new queries lead the window as
    #    never-certified.
    #  - session.py AQE SMJ->SHJ conversion default
    #    (maxShuffledHashJoinLocalMapThreshold=128MB): changes only
    #    the physical JOIN STRATEGY AQE may pick at runtime, never a
    #    logical plan or a value — every aggregate is exact (decimal
    #    accumulators, registry.dsum/davg), every registered output is
    #    certified order-insensitively, and no query reads
    #    strategy-dependent row order (position-dependent results all
    #    array_sort/ORDER BY explicitly). Backed empirically, not just
    #    argued: the full 131-query oracle gate was re-run at all
    #    three fixture scales with the flag on (green) before commit.
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
