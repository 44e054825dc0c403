"""Fixed-output scale point for PAIRWISE text operators (VERDICT r15
item 5): K DISTINCT corpora concatenated, not key-shifted replicas.

The replica protocol (scale_probe.build_scaled) copies each document's
TEXT verbatim K times, so every true near-dup pair replicates K^2-fold
— a pairwise operator's output then grows quadratically and its timing
measures the data generator, not the plan. Here each replica i keeps
the fixture's duplicate topology but rewrites every whitespace token
with an '~i' suffix: shingles/tokens are globally DISTINCT across
replicas, so cross-replica pairs are impossible and the true output is
exactly K x (pairs at 1x) — linear, like ingesting K unrelated
corpora. Shingle df distributions per replica are identical to the
fixture's, so prefix filtering / LSH banding behave as at 1x, just K
times wider — the realistic 100 TB shape for dedup-family plans.

Usage:
  python tools/scale_pairwise.py K SAMPLES query [query ...]
      quiet_probe protocol (warm + N samples, noop sink vs DuckDB
      fetchall on the query's own oracle) at the distinct-corpus point.
  python tools/scale_pairwise.py K SAMPLES --ab-jaccard
      A/B the jaccard inverted-index postings key: the production
      64-bit xxhash64 key (landed round 6, commit 31b1925) vs the
      string-shingle key it replaced — settles COVERAGE.md's r15
      "fingerprint upgrade" note with a measured number (the engine
      was ALREADY hashed; this quantifies what the conversion is
      worth at a K-wide corpus).

Prints one JSON line per run.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from coursera_etl_pipeline_spark.catalog import table_path  # noqa: E402
from coursera_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = "/tmp/spark_graft_pairwise"
SHIFT = 10_000_000  # doc_id stride per replica (disjoint, like scale_probe)


def build_distinct(spark, k: int, dest: str | None = None,
                   reuse: bool = True) -> str:
    """documents-only dataset: K replicas, doc_id shifted AND every
    token suffixed '~i' so replica corpora share no shingle/token."""
    dest = dest or f"{OUT_DIR}_{k}x"
    if os.path.exists(dest):
        if reuse:
            return dest
        shutil.rmtree(dest)
    if k > 100 and k % 100 == 0:
        # Two-stage build (the scale_point_sf100.build_1000x precedent):
        # a k-branch union plan stops being practical past ~100, so
        # K=1000 re-suffixes the K=100 DISTINCT corpus 10x. Token
        # distinctness composes ('tok~i' + '~j' = 'tok~i~j', never equal
        # to any single-stage 'tok~ij'); outer doc_id stride 1e9 clears
        # the inner 100 x SHIFT = 1e9 range and keeps doc_id % 10 (the
        # INCREMENTAL_BATCH_MOD split) invariant.
        inner = build_distinct(spark, 100)
        os.makedirs(dest)
        src = spark.read.parquet(os.path.join(inner, "documents.parquet"))
        outer = []
        for j in range(k // 100):
            tag = F.lit(f"~{j}")
            retok = F.array_join(
                F.transform(F.split(F.col("text"), " "),
                            lambda t: F.concat(t, tag)), " ")
            new_text = F.when(F.col("text").isNotNull(), retok)
            outer.append(src.select(
                (F.col("doc_id") + F.lit(j * 1_000_000_000)).alias("doc_id"),
                new_text.alias("text"),
                "lang", "source",
                F.coalesce(F.length(new_text), F.lit(0)).cast("bigint")
                .alias("n_chars")))
        out = outer[0]
        for r in outer[1:]:
            out = out.union(r)
        out.repartition(256).write.mode("overwrite").parquet(
            os.path.join(dest, "documents.parquet"))
        return dest
    os.makedirs(dest)
    src = spark.read.parquet(table_path(SF_DIR, "documents"))
    replicas = []
    for i in range(k):
        tag = F.lit(f"~{i}")
        retok = F.array_join(
            F.transform(F.split(F.col("text"), " "),
                        lambda t: F.concat(t, tag)), " ")
        new_text = F.when(F.col("text").isNotNull(), retok)
        replicas.append(src.select(
            (F.col("doc_id") + F.lit(i * SHIFT)).alias("doc_id"),
            new_text.alias("text"),
            "lang", "source",
            # recompute, don't copy: the suffix rewrite lengthens the
            # text, and a stale n_chars would silently skew any
            # n_chars-derived operator timed at this point (r16 review)
            F.coalesce(F.length(new_text), F.lit(0)).cast("bigint")
            .alias("n_chars")))
    out = replicas[0]
    for r in replicas[1:]:
        out = out.union(r)
    # spread replicas across files so scans parallelize like real data
    out.repartition(max(32, k)).write.mode("overwrite").parquet(
        os.path.join(dest, "documents.parquet"))
    return dest


def _times(fn, samples: int) -> list[float]:
    fn()  # warm
    out = []
    for _ in range(samples):
        t0 = time.monotonic()
        fn()
        out.append(round(time.monotonic() - t0, 3))
    return out


def main() -> None:
    k = int(sys.argv[1])
    samples = int(sys.argv[2])
    names = sys.argv[3:]
    spark = get_spark("scale_pairwise")
    spark.sparkContext.setLogLevel("ERROR")
    dest = build_distinct(spark, k)

    if names == ["--ab-jaccard"]:
        from coursera_etl_pipeline_spark.catalog import load_table
        from coursera_etl_pipeline_spark.llm_ops.dedup import (
            _materialize,
            _shingle_index,
            jaccard_pairs_prefix,
            shingles,
        )

        docs = load_table(spark, dest, "documents")

        def hashed():
            jaccard_pairs_prefix(_shingle_index(docs)) \
                .write.format("noop").mode("overwrite").save()

        def string_keyed():
            # the pre-r6 shape: postings keyed on the shingle STRING
            d = shingles(docs, n=3)
            sh = d.select("doc_id", F.size("_shingles").alias("nsh"),
                          F.explode("_shingles").alias("shingle"))
            jaccard_pairs_prefix(_materialize(sh)) \
                .write.format("noop").mode("overwrite").save()

        rows = {"hashed_key": _times(hashed, samples),
                "string_key": _times(string_keyed, samples)}
        med = {n: statistics.median(v) for n, v in rows.items()}
        print(json.dumps({
            "k": k, "ab": "jaccard_postings_key", "rows": rows,
            "medians": med,
            "string_over_hashed": round(
                med["string_key"] / med["hashed_key"], 3)}))
        return

    import duckdb

    import __spark_entry__ as entrymod

    queries, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duckdb.connect()
    # Bound the oracle side's memory as well as its wall clock: a
    # feasibility-class rebuild that outgrows RAM must fail as a
    # recorded duckdb_error, not summon the kernel OOM killer onto the
    # whole probe process (observed at K=1000: 70 GB anon RSS ->
    # SIGKILL). DuckDB spills what it can under the limit and raises
    # OutOfMemoryException for the rest — either way the row is
    # bounded evidence. Override with DUCK_MEM_LIMIT.
    con.execute(f"SET memory_limit = "
                f"'{os.environ.get('DUCK_MEM_LIMIT', '24GB')}'")
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(dest, 'documents.parquet')}/*.parquet')")
    out = {}
    for name in names:
        fn = queries[name]

        def run_engine():
            fn(spark, dest).write.format("noop").mode("overwrite").save()

        eng = _times(run_engine, samples)
        row = {"engine": eng, "engine_median": statistics.median(eng)}
        # flush the engine result BEFORE touching the oracle side: at
        # feasibility-class K the DuckDB rebuild can die by OOM (the
        # K=1000 first attempt was oom-killed at ~70 GB RSS, taking
        # the not-yet-printed engine medians with it)
        print(json.dumps({name: row}), file=sys.stderr, flush=True)
        if name in oracles:
            sql = oracles[name]
            # Optional wall-clock cap for the oracle side (the §4
            # feasibility-row protocol: "DuckDB capped at 10 min"):
            # DUCK_CAP_SECS interrupts the running query so a
            # cap-blowing rebuild records as a bounded timeout instead
            # of hanging the probe.
            cap = float(os.environ.get("DUCK_CAP_SECS", "0") or 0)

            def run_duck():
                if cap:
                    import threading
                    t = threading.Timer(cap, con.interrupt)
                    t.start()
                    try:
                        con.sql(sql).fetchall()
                    finally:
                        t.cancel()
                else:
                    con.sql(sql).fetchall()

            try:
                dk = _times(run_duck, samples)
                row.update(duckdb=dk,
                           duckdb_median=statistics.median(dk),
                           ratio=round(row["engine_median"]
                                       / statistics.median(dk), 3))
            except Exception as exc:  # oracle may be infeasible at K
                row["duckdb_error"] = str(exc)[:200]
                if cap:
                    row["duckdb_cap_secs"] = cap
        out[name] = row
    print(json.dumps({"k": k, "distinct_corpora": True, "rows": out}))


if __name__ == "__main__":
    main()
