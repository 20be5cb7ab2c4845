"""Shared candidate-mass fail-fast (operators/guards.py — r12 verdict
item 1): unit contract of the helper, plus both-sides-of-the-budget
coverage for the two call sites it newly protects (``chunk_ann_topk``
and ``cosine_topk``). The pre-existing family members keep their own
both-sides tests (test_operators.py, test_retrieval.py,
test_round12_queries.py) — those now also exercise the shared helper
through the refactored raise path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chapterhouseqe_spark.operators.guards import (
    CANDIDATE_MASS_BUDGET,
    check_candidate_mass,
)


def test_helper_waives_on_none_budget():
    check_candidate_mass(
        "op", 1e30, None, knob="k", law="l", remediations="r"
    )


def test_helper_passes_at_and_under_budget():
    check_candidate_mass("op", 99.0, 100, knob="k", law="l", remediations="r")
    check_candidate_mass("op", 100.0, 100, knob="k", law="l", remediations="r")
    # None mass = empty frame's SUM aggregate -> treated as 0
    check_candidate_mass("op", None, 100, knob="k", law="l", remediations="r")


def test_helper_message_names_op_knob_law_remediations():
    with pytest.raises(ValueError) as ei:
        check_candidate_mass(
            "my_operator",
            1e12,
            CANDIDATE_MASS_BUDGET,
            knob="max_widget_rows",
            law="sum of widgets squared",
            remediations="lower widgets",
        )
    msg = str(ei.value)
    assert "my_operator" in msg
    assert "max_widget_rows" in msg  # the knob, twice: budget + waiver
    assert "sum of widgets squared" in msg
    assert "lower widgets" in msg
    assert f"{CANDIDATE_MASS_BUDGET:,}" in msg


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_chunk_ann_guard_trips_over_budget(docs):
    from chapterhouseqe_spark.operators.corpus import chunk_ann_topk

    # probe_mod=1 makes every doc a probe; any shared bucket pushes the
    # mass over a 1-row budget
    with pytest.raises(ValueError, match="max_candidate_rows"):
        chunk_ann_topk(
            docs, probe_mod=1, probe_rem=0, max_candidate_rows=1
        ).collect()


def test_chunk_ann_guard_results_neutral(docs):
    from chapterhouseqe_spark.operators.corpus import chunk_ann_topk

    small = docs.filter(F.col("doc_id") < 400)
    with_guard = sorted(
        (r["probe_id"], r["doc_id"], r["chunk_idx"], r["rank"])
        for r in chunk_ann_topk(small).collect()
    )
    waived = sorted(
        (r["probe_id"], r["doc_id"], r["chunk_idx"], r["rank"])
        for r in chunk_ann_topk(small, max_candidate_rows=None).collect()
    )
    assert with_guard == waived
    assert with_guard  # non-vacuous: the sf0.001 corpus yields rows


def test_cosine_topk_guard_trips_over_budget(emb):
    from chapterhouseqe_spark.operators.similarity import cosine_topk

    with pytest.raises(ValueError, match="max_candidate_rows"):
        cosine_topk(
            emb, F.col("vec_id") % 2 == 0, k=3, max_candidate_rows=1
        ).collect()


def test_cosine_topk_guard_results_neutral(emb):
    from chapterhouseqe_spark.operators.similarity import cosine_topk

    probe = F.col("vec_id") % 97 == 3
    with_guard = sorted(
        (r["probe_id"], r["id_b"], r["sim"])
        for r in cosine_topk(emb, probe, k=3).collect()
    )
    waived = sorted(
        (r["probe_id"], r["id_b"], r["sim"])
        for r in cosine_topk(
            emb, probe, k=3, max_candidate_rows=None
        ).collect()
    )
    assert with_guard == waived
    assert with_guard
