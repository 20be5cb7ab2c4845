"""Operator-level tests for the round-13 additions (the registry-level
oracle replica in test_queries_oracle.py covers the graded queries;
these pin the operator contracts and edge cases)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_winnow_contamination_guarantee_and_threshold(spark):
    """Winnowing's >= k+w-1-word guarantee must carry through the
    contamination screen: a train doc sharing an 8-word passage with a
    benchmark doc is flagged (>= 1 shared fingerprint); a disjoint doc
    is not; min_shared filters weak evidence."""
    from chapterhouseqe_spark.operators.dedup import winnow_contamination

    passage = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    bench = spark.createDataFrame(
        [(0, f"benchmark intro {passage} benchmark outro words")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (10, f"leading text {passage} trailing text here"),  # contains it
            (11, "совершенно other vocabulary entirely disjoint doc "
                 "nothing shared at all in any window"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.n_shared_fp
        for r in winnow_contamination(
            train, bench, "text", "doc_id", k=5, w=4, min_shared=1
        ).collect()
    }
    assert 10 in got and got[10] >= 1  # the guarantee
    assert 11 not in got  # disjoint doc unflagged
    # a threshold above the evidence count drops the match
    high = winnow_contamination(
        train, bench, "text", "doc_id", k=5, w=4,
        min_shared=got[10] + 1,
    ).collect()
    assert all(r.doc_id != 10 for r in high)


def test_winnow_contamination_empty_benchmark(spark):
    from chapterhouseqe_spark.operators.dedup import winnow_contamination

    bench = spark.createDataFrame([], "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, "some ordinary training document with plenty of words")],
        "doc_id long, text string",
    )
    assert (
        winnow_contamination(train, bench, "text", "doc_id").count() == 0
    )


def test_minhash_signatures_merge_by_componentwise_min(spark):
    """The mergeable-sketch contract: the signature of a group's FULL
    element set equals the componentwise min of the signatures of any
    sharding of that set — what makes one map-side-combinable pass
    correct at 100 TB."""
    from chapterhouseqe_spark.operators.sketches import (
        minhash_group_signatures,
    )

    rows = [("g", f"elem{i}") for i in range(40)]
    full = spark.createDataFrame(rows, "grp string, s string")
    shard_a = spark.createDataFrame(rows[:17], "grp string, s string")
    shard_b = spark.createDataFrame(rows[17:], "grp string, s string")

    def sig_of(df):
        [r] = minhash_group_signatures(
            df, "s", "grp", num_hashes=16, seed=13
        ).collect()
        return r["sig"]

    merged = [min(a, b) for a, b in zip(sig_of(shard_a), sig_of(shard_b))]
    assert merged == sig_of(full)


def test_source_similarity_identical_and_disjoint(spark):
    """Identical corpora estimate Jaccard exactly 1.0 (every signature
    component matches); disjoint-vocabulary corpora estimate near 0."""
    from chapterhouseqe_spark.operators.sketches import (
        source_similarity_minhash,
    )

    same = "one two three four five six seven eight nine ten"
    rows = (
        [(f"doc a {i}", "srcA", same) for i in range(3)]
        + [(f"doc b {i}", "srcB", same) for i in range(3)]
        + [(f"doc c {i}", "srcC",
            "entirely different vocabulary nothing overlapping here "
            "with unique terms only") for i in range(3)]
    )
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    got = {
        (r.src_a, r.src_b): r.est_jaccard
        for r in source_similarity_minhash(
            df, "text", "source", k=3, num_hashes=64, seed=13
        ).collect()
    }
    assert got[("srcA", "srcB")] == 1.0
    assert got[("srcA", "srcC")] < 0.2
    assert got[("srcB", "srcC")] < 0.2


def test_chunk_screen_covers_exactly_the_doc_screen(spark):
    """The size-stride coverage claim, proven on real data: with
    size - stride = 8 = the gram width, every 8-gram lies fully inside
    at least one window, so the SET OF FLAGGED DOCUMENTS from the
    chunk-level screen equals the doc-level screen's — no overlap can
    hide in a window boundary, and chunks can't flag grams the doc
    doesn't have."""
    from chapterhouseqe_spark.queries.registry import get_queries

    q = get_queries()
    sf = "/root/testdata/sf0.001"
    doc_level = {
        r.doc_id
        for r in q["pipeline_decontaminate_benchmark"](spark, sf).collect()
    }
    chunk_level = {
        r.doc_id
        for r in q["pipeline_decontaminate_chunks"](spark, sf).collect()
    }
    assert doc_level == chunk_level
    assert doc_level  # non-vacuous: the corpus has planted overlaps
