"""Plan-shape gates for the adapted TPC-H shapes (operators/tpch_extra):
the EXISTS/NOT EXISTS forms must decorrelate to hash semi/anti joins,
dimension joins must broadcast, and selective predicates must reach the
parquet scan — the properties that keep these plans 100 TB-safe."""

from __future__ import annotations

import re

from coursera_etl_pipeline_spark.operators.tpch_extra import (
    q9_product_type_profit,
    q11_important_parts,
    q13_customer_distribution,
    q16_supplier_part_count,
    q20_excess_suppliers,
    q21_waiting_suppliers,
)


def plan_of(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q21_decorrelates_to_semi_and_anti_joins(spark, sf_dir):
    plan = plan_of(q21_waiting_suppliers(spark, sf_dir))
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    # no numbered nested-loop node over the fact table
    assert not re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", plan, re.M)


def test_q13_outer_join_then_reagg(spark, sf_dir):
    df = q13_customer_distribution(spark, sf_dir)
    plan = plan_of(df)
    assert "LeftOuter" in plan
    assert plan.count("HashAggregate") >= 2  # partial aggs both levels
    rows = {r.c_count: r.custdist for r in df.collect()}
    # every customer lands in exactly one bucket
    assert sum(rows.values()) > 0


def test_q9_pushes_like_filter_and_broadcasts_dims(spark, sf_dir):
    plan = plan_of(q9_product_type_profit(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    pushed = " ".join(ln for ln in plan.splitlines() if "PushedFilters" in ln)
    assert "p_name" in pushed  # LIKE '%red%' reaches the part scan


def test_q16_not_in_plans_as_anti_join(spark, sf_dir):
    plan = plan_of(q16_supplier_part_count(spark, sf_dir))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_q20_in_chain_plans_as_semi_join(spark, sf_dir):
    plan = plan_of(q20_excess_suppliers(spark, sf_dir))
    assert "LeftSemi" in plan


def test_q11_scalar_subquery_single_loop_at_most(spark, sf_dir):
    plan = plan_of(q11_important_parts(spark, sf_dir))
    loops = re.findall(r"^\(\d+\) BroadcastNestedLoopJoin", plan, re.M)
    assert len(loops) <= 1  # only the 1-row scalar threshold broadcast
    assert "BroadcastHashJoin" in plan
