"""Plan-shape asserts for correlated-subquery-class TPC-H queries.

The reference would evaluate a correlated aggregate subquery per outer
row; the Spark-first formulation decorrelates it into aggregate-then-
join. These tests pin that shape in the EXECUTED plan at the sf0.001
fixture scale so a regression (e.g. an accidental re-correlation into a
nested-loop re-execution) fails fast — the difference between O(n) and
O(n²) at 100 TB.
"""

from __future__ import annotations

import pytest

from chapterhouseqe_spark.queries.registry import get_queries


def _executed_plan(df) -> str:
    df.collect()  # materialize so AQE finalizes the plan
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def queries():
    return get_queries()


@pytest.mark.parametrize(
    "name",
    [
        "correlated_agg_subquery",   # q17 core shape
        "tpch_q17_small_quantity_revenue",
        "tpch_q20_excess_supplier",
        "tpch_q21_waiting_supplier",
        "tpch_q2_min_cost_supplier",
        "scalar_subquery",
        "exists_subquery",
    ],
)
def test_no_per_row_subquery_reexecution(queries, spark, sf_dir, name):
    plan = _executed_plan(queries[name](spark, sf_dir))
    # A correlated subquery that survived to execution shows up as a
    # nested-loop/cartesian re-execution per outer row — none allowed.
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_q22_scalar_broadcast_is_single_row(queries, spark, sf_dir):
    # q22 compares every customer against ONE global average — a
    # non-equi predicate against a 1-row aggregate. The right plan IS a
    # BroadcastNestedLoopJoin whose build side is that single aggregated
    # row (O(n)·1, each task holds one scalar), never a shuffled or
    # per-row re-executed subquery. Pin the build side as the scalar
    # aggregate so a regression into a genuine quadratic NLJ (build side
    # = a table) fails here.
    plan = _executed_plan(
        queries["tpch_q22_global_sales_opportunity"](spark, sf_dir)
    )
    assert "BroadcastNestedLoopJoin BuildRight" in plan
    # the broadcast operand is the global-average HashAggregate, not a scan
    bnlj_tail = plan.split("BroadcastNestedLoopJoin", 1)[1]
    assert "HashAggregate(keys=[]" in bnlj_tail
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    ["correlated_agg_subquery", "tpch_q17_small_quantity_revenue"],
)
def test_aggregate_then_join_shape(queries, spark, sf_dir, name):
    # Decorrelation = the per-partkey average is computed ONCE by an
    # aggregate below the join, then hash-joined back — the plan must
    # contain a HashAggregate feeding a join, not a subquery node.
    plan = _executed_plan(queries[name](spark, sf_dir))
    assert "HashAggregate" in plan, name
    assert "Join" in plan or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, name
    assert "Subquery" not in plan, name


def test_q20_persisted_fact_scan_reused(queries, spark, sf_dir):
    # q20's (partkey, suppkey) rollup feeds BOTH the per-part total and
    # the dominance join; the persist must surface as InMemoryTableScan
    # so the part-pruned lineitem scan runs once, not twice.
    plan = _executed_plan(queries["tpch_q20_excess_supplier"](spark, sf_dir))
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan
