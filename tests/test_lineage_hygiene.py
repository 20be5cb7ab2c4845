"""Multi-reference-lineage hygiene (r12 verdict item 5).

The r12 latency sweep found one root cause behind four slow operators
(MMR, connected-components, k-core, RM3): an EXPENSIVE frame referenced
by more than one broadcast/union/iteration branch re-evaluates its
whole lineage per reference — broadcast exchanges and union branches do
not share plans, and a lazily-persisted frame only dedupes at the
InMemoryRelation read, not the derivation above it. The fix is an
eager ``localCheckpoint`` at each seam. This test makes the property
a regression gate instead of a remembered lesson:

- a CENSUS walks a returned frame's optimized logical plan,
  fingerprints every subtree by ``semanticHash``, truncates cost at
  materialization boundaries (``LogicalRDD`` — checkpoints,
  ``InMemoryRelation`` — caches, ``LocalRelation``), and flags any
  subtree that (a) repeats, (b) carries >= 2 expensive operators
  (Join/Aggregate/Window/Generate/Expand) ABOVE the nearest boundary;
- the SEEDED-RED fixture is the reverted MMR loop (the exact r12
  regression shape: per-round pick feeding both the next round's
  join and the remaining anti-join without a checkpoint) — the
  detector must flag it;
- the GREEN set is the swept iterative operator family on HEAD.

Threshold rationale: cost >= 2 skips the benign single repeated
aggregate over a cached frame (e.g. bm25's dl read twice — in-job
ReusedExchange dedupes those), while an unchecked iteration nests
joins+windows per round and blows past it immediately.

Scope: the iterative/union-building operators, where multi-JOB
re-evaluation is structurally possible. One-shot relational queries
can legitimately repeat subtrees that physical-plan exchange reuse
dedupes within the single job, so a library-wide sweep would
over-flag; the fixture proves the detector red on the real
regression shape instead.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from chapterhouseqe_spark.queries.registry import get_queries


@pytest.fixture(scope="module")
def queries():
    return get_queries()

# leaves that END lineage: re-referencing these is the FIX, not the bug
BOUNDARIES = {
    "LogicalRDD",        # localCheckpoint / checkpoint
    "InMemoryRelation",  # persist (dedupes at the relation read)
    "LocalRelation",     # literal data
    "OneRowRelation",
    "Range",
}
EXPENSIVE = {"Join", "Aggregate", "Window", "Generate", "Expand"}


def _walk(node, counts: Counter, cost_of: dict) -> int:
    cls = node.getClass().getSimpleName()
    if cls in BOUNDARIES:
        return 0
    cost = 1 if cls in EXPENSIVE else 0
    children = node.children()
    for i in range(children.size()):
        cost += _walk(children.apply(i), counts, cost_of)
    key = (cls, node.semanticHash())
    counts[key] += 1
    cost_of[key] = cost
    return cost


def reeval_violations(df, min_cost: int = 2) -> list[tuple[str, int, int]]:
    """(node class, occurrence count, boundary-truncated cost) for every
    expensive subtree the optimized plan evaluates more than once."""
    counts: Counter = Counter()
    cost_of: dict = {}
    _walk(df._jdf.queryExecution().optimizedPlan(), counts, cost_of)
    return [
        (cls, n, cost_of[(cls, h)])
        for (cls, h), n in counts.items()
        if n > 1 and cls in EXPENSIVE and cost_of[(cls, h)] >= min_cost
    ]


def _reverted_mmr(spark, k: int = 3):
    """The r12 regression shape, reconstructed: greedy selection where
    round r's pick feeds BOTH the next round's max-sim join and the
    remaining-pool anti-join with NO checkpoint at the seam."""
    base = (
        spark.range(0, 100)
        .select(
            (F.col("id") % 10).alias("probe_id"),
            F.col("id").alias("id_b"),
            ((F.col("id") * 7 % 13)).cast("double").alias("simq"),
        )
        .persist()  # lazy persist — exactly what the sweep showed is NOT enough
    )
    sel = None
    remaining = base
    for r in range(1, k + 1):
        if sel is None:
            scored = remaining.withColumn("mmr", F.col("simq"))
        else:
            mx = (
                base.join(
                    sel.select("probe_id", F.col("id_b").alias("cb")),
                    "probe_id",
                )
                .groupBy("probe_id", "id_b")
                .agg(F.max("simq").alias("maxsel"))
            )
            scored = remaining.join(mx, ["probe_id", "id_b"], "left").withColumn(
                "mmr", F.col("simq") - F.coalesce(F.col("maxsel"), F.lit(0.0))
            )
        w = Window.partitionBy("probe_id").orderBy(F.desc("mmr"), "id_b")
        pick = (
            scored.withColumn("rr", F.row_number().over(w))
            .filter(F.col("rr") == 1)
            .select("probe_id", "id_b", "simq")
            .withColumn("rank", F.lit(r))
            # NO localCheckpoint here — the seeded regression
        )
        sel = pick if sel is None else sel.unionByName(pick)
        remaining = remaining.select("probe_id", "id_b", "simq").join(
            pick.select("probe_id", "id_b"), ["probe_id", "id_b"], "left_anti"
        )
    base.unpersist()
    return sel


def test_detector_red_on_reverted_mmr(spark):
    out = reeval_violations(_reverted_mmr(spark))
    assert out, (
        "the seeded reverted-MMR regression must trip the detector — "
        "if this fails the census went vacuous and the green tests "
        "below prove nothing"
    )
    # the blowup repeats whole join/window rounds, not one stray node
    assert max(n for _, n, _ in out) >= 2
    assert max(c for _, _, c in out) >= 2


# The swept family (r12): every operator whose fix was an eager
# checkpoint at an iteration/union/broadcast seam. Their RETURNED
# frames must evaluate each expensive subtree at most once.
ITERATIVE_QUERIES = [
    "embedding_mmr_topk",        # greedy MMR (33.9s -> 4.4s in r12)
    "embedding_mmr_ann_topk",    # ANN-tier MMR (25.4s -> 6.9s)
    "graph_kcore_dup_families",  # peel loop + CC (49.5s -> 13.7s)
    "pagerank_supplier_graph",   # fixed-point iteration
    "docs_rm3_expansion_retrieval",  # two-pass BM25 (18s -> 7s)
    "dedup_semantic_semdedup",   # CC over similarity pairs
    "dedup_incremental_batch",   # batch-over-batch union
]


@pytest.mark.parametrize("name", ITERATIVE_QUERIES)
def test_iterative_operators_no_multireference_reeval(
    queries, spark, sf_dir, name
):
    df = queries[name](spark, sf_dir)
    out = reeval_violations(df)
    assert not out, (
        f"{name}: expensive subtree evaluated more than once in the "
        f"returned plan — re-checkpoint the seam (r12 sweep): {out}"
    )
