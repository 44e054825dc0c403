"""Quiet-window probe for the PRE-BUILT (not yet registered) operators.

quiet_probe.py keys on the registry, so the deferred-registration
pre-builds (COVERAGE.md round-15 queue) can't ride it; this sibling
times the same engine-vs-DuckDB pair straight off the production
functions and their oracle builders, with the identical protocol
(noop-sink materialization, warm run + N samples, fetchall on the
DuckDB side, K-fold replica via scale_probe.build_scaled).

Usage: python tools/probe_prebuilt.py K SAMPLES [name ...]
Names default to all four; prints one JSON line like quiet_probe.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coursera_etl_pipeline_spark.catalog import load_table  # noqa: E402
from coursera_etl_pipeline_spark.session import get_spark  # noqa: E402


def _prebuilt():
    from coursera_etl_pipeline_spark.llm_ops.dedup import (
        r17_dedup_soft_weight_oracle,
        soft_dedup_weights,
    )
    from coursera_etl_pipeline_spark.llm_ops.sampling import (
        dsir_importance,
        epoch_plan,
        r17_dsir_importance_oracle,
        r17_sample_epoch_plan_oracle,
    )
    from coursera_etl_pipeline_spark.llm_ops.text import (
        c4_rules,
        ccnet_buckets,
        r17_text_c4_rules_oracle,
        r17_text_ccnet_bucket_oracle,
    )

    return {
        "dsir_importance": (dsir_importance, r17_dsir_importance_oracle()),
        "sample_epoch_plan": (epoch_plan, r17_sample_epoch_plan_oracle()),
        "dedup_soft_weight": (soft_dedup_weights,
                              r17_dedup_soft_weight_oracle()),
        "text_c4_rules": (c4_rules, r17_text_c4_rules_oracle()),
        "text_ccnet_bucket": (ccnet_buckets, r17_text_ccnet_bucket_oracle()),
    }


def main() -> None:
    import duckdb

    from tools.quiet_probe import _duck_con
    from tools.scale_probe import build_scaled

    k = int(sys.argv[1])
    samples = int(sys.argv[2])
    ops = _prebuilt()
    names = sys.argv[3:] or list(ops)
    spark = get_spark("probe_prebuilt")
    spark.sparkContext.setLogLevel("ERROR")
    if k == 1:
        dest = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        con = duckdb.connect()
        con.execute("CREATE VIEW documents AS SELECT * FROM read_parquet("
                    f"'{os.path.join(dest, 'documents.parquet')}')")
    elif k == 1000:
        from tools.scale_point_sf100 import build_1000x

        dest = build_1000x(spark)
        con = _duck_con(dest)
    else:
        dest = build_scaled(spark, k, dest=f"/tmp/spark_graft_bench_{k}x",
                            reuse=True)
        con = _duck_con(dest)
    rows = {}
    for name in names:
        fn, sql = ops[name]

        def run_engine():
            fn(load_table(spark, dest, "documents")) \
                .write.format("noop").mode("overwrite").save()

        run_engine()  # warm
        eng = []
        for _ in range(samples):
            t0 = time.perf_counter()
            run_engine()
            eng.append(round(time.perf_counter() - t0, 3))
            print(json.dumps({name: {"engine_sample": eng[-1]}}),
                  file=sys.stderr)
        con.execute(sql).fetchall()  # warm
        duck = []
        for _ in range(samples):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            duck.append(round(time.perf_counter() - t0, 3))
            print(json.dumps({name: {"duckdb_sample": duck[-1]}}),
                  file=sys.stderr)
        em, dm = statistics.median(eng), statistics.median(duck)
        rows[name] = {"engine": eng, "duckdb": duck,
                      "engine_median": round(em, 3),
                      "duckdb_median": round(dm, 3),
                      "ratio": round(em / dm, 2)}
    print(json.dumps({"k": k, "samples": samples, "rows": rows}))


if __name__ == "__main__":
    main()
