"""Unit semantics for operators/retrieval.py — BM25 top-k.

The oracle query (docs_bm25_topk) gates engine parity; these pin the
ranking semantics on hand-checkable corpora.
"""

import pytest

from chapterhouseqe_spark.operators.retrieval import bm25_topk


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "spark spark spark join"),        # tf(spark)=3, short
        (1, "spark join filter scan merge"),  # tf(spark)=1
        (2, "filter scan merge sort window"), # no query terms
        (3, "spark spark join join"),         # high tf both terms
        (4, "spark " + "pad " * 40),          # tf=1 but very long
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _q(spark, *terms, qid=1):
    return spark.createDataFrame([(qid, t) for t in terms], ["query_id", "term"])


def test_bm25_ranks_tf_and_coverage(spark, corpus):
    out = bm25_topk(corpus, _q(spark, "spark", "join"), k=10).collect()
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    # doc 2 has no query term -> absent; doc 3 covers both terms with
    # high tf -> top; doc 4 (one hit, longest) -> last
    assert 2 not in ranked
    assert ranked[0] == 3
    assert ranked[-1] == 4
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3, 4]


def test_bm25_length_normalization(spark, corpus):
    # same tf=1 for 'spark': the much longer doc 4 must score below doc 1
    scores = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(corpus, _q(spark, "spark"), k=10).collect()
    }
    assert scores[1] > scores[4] > 0.0


def test_bm25_k_truncates_per_query(spark, corpus):
    q = spark.createDataFrame(
        [(1, "spark"), (2, "filter")], ["query_id", "term"]
    )
    out = bm25_topk(corpus, q, k=2).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 2
               for v in per_q.values())
    assert set(per_q) == {1, 2}


def test_bm25_unknown_term_contributes_nothing(spark, corpus):
    with_unknown = bm25_topk(
        corpus, _q(spark, "spark", "zzz_not_in_corpus"), k=10
    ).collect()
    only_known = bm25_topk(corpus, _q(spark, "spark"), k=10).collect()
    key = lambda rows: sorted((r["doc_id"], r["rank"], r["score"]) for r in rows)
    assert key(with_unknown) == key(only_known)


def test_self_retrieval_unique_content_ranks_first(spark):
    from chapterhouseqe_spark.operators.retrieval import bm25_self_retrieval

    # probe doc (id 7 = 0 % 173 shifted): give it globally unique salient
    # terms -> it must retrieve itself at rank 1 (rr == 1.0)
    rows = [(i, "common words shared by every document here") for i in range(20)]
    rows[7] = (7, "zebra quark xylophone zebra quark xylophone common words")
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bm25_self_retrieval(docs, probe_mod=173, probe_rem=7, n_terms=3).collect()
    assert len(out) == 1
    assert out[0]["probe_id"] == 7 and out[0]["rank"] == 1 and out[0]["rr"] == 1.0


def test_self_retrieval_duplicate_content_shares_rank_by_id(spark):
    from chapterhouseqe_spark.operators.retrieval import bm25_self_retrieval

    # probe doc 7 is an exact duplicate of doc 3: identical scores, and
    # the (score DESC, doc_id ASC) tiebreak puts doc 3 first -> rank 2
    rows = [(i, f"filler{i} filler{i} noise") for i in range(20)]
    rows[3] = (3, "zebra quark xylophone salient")
    rows[7] = (7, "zebra quark xylophone salient")
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bm25_self_retrieval(docs, probe_mod=173, probe_rem=7, n_terms=3).collect()
    assert len(out) == 1 and out[0]["rank"] == 2 and out[0]["rr"] == 0.5


def test_hybrid_rrf_both_systems_beats_single_system(spark):
    from chapterhouseqe_spark.operators.retrieval import hybrid_rrf_retrieval

    # probe doc 7: doc 3 matches BOTH systems (shares all probe terms,
    # nearest embedding), doc 5 is lexical-only (one term, orthogonal
    # vector), doc 4 is dense-only (2nd-nearest vector, no terms).
    docs = [(i, f"noise filler{i}") for i in range(8)]
    docs[7] = (7, "zebra quark xylophone")
    docs[3] = (3, "zebra quark xylophone")
    docs[5] = (5, "zebra blah")
    ddf = spark.createDataFrame(docs, ["doc_id", "text"])
    vecs = [
        (0, [0.3, 0.7]), (1, [0.2, 0.8]), (2, [0.1, 0.9]),
        (3, [0.9, 0.1]), (4, [0.4, 0.6]), (5, [0.0, 1.0]),
        (6, [0.25, 0.75]), (7, [1.0, 0.0]),
    ]
    edf = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = hybrid_rrf_retrieval(ddf, edf, probe_mod=173, probe_rem=7).collect()
    assert {r["probe_id"] for r in out} == {7}
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["fused_rank"])]
    # the probe never retrieves itself; both-systems doc 3 wins; the
    # lexical-only doc 5 (rrf 1/62 + 1/67 via dense rank 7) still beats
    # the best dense-only doc 4 (1/62): two mid ranks > one good rank
    assert 7 not in ranked
    assert ranked[0] == 3 and ranked[1] == 5 and ranked[2] == 4
    assert [r["fused_rank"] for r in sorted(out, key=lambda r: r["fused_rank"])] == list(
        range(1, len(out) + 1)
    )
    by_doc = {r["doc_id"]: r for r in out}
    # missing-system ranks surface as nulls, not zeros
    assert by_doc[4]["lex_rank"] is None and by_doc[4]["dense_rank"] == 2
    assert by_doc[5]["lex_rank"] == 2 and by_doc[5]["dense_rank"] == 7
    assert by_doc[3]["rrf"] == pytest.approx(2.0 / 61.0)


def test_hybrid_rrf_k_out_truncates(spark):
    from chapterhouseqe_spark.operators.retrieval import hybrid_rrf_retrieval

    docs = [(i, f"noise filler{i}") for i in range(8)]
    docs[7] = (7, "zebra quark xylophone")
    ddf = spark.createDataFrame(docs, ["doc_id", "text"])
    vecs = [(i, [float(i + 1), 1.0]) for i in range(8)]
    edf = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = hybrid_rrf_retrieval(ddf, edf, probe_mod=173, probe_rem=7, k_out=3).collect()
    assert len(out) == 3
    assert sorted(r["fused_rank"] for r in out) == [1, 2, 3]

def test_candidate_mass_guard_raises_over_budget(spark, corpus):
    # sum_t df(t)*qcount(t) for this query is small but positive;
    # a budget of 1 row must trip the fail-fast BEFORE any scoring
    from chapterhouseqe_spark.operators.retrieval import (
        bm25_self_retrieval,
        rm3_expansion_retrieval,
    )

    with pytest.raises(ValueError, match="max_candidate_rows"):
        bm25_topk(
            corpus, _q(spark, "spark", "join"), k=10, max_candidate_rows=1
        )
    # the shared-probe family trips on the same seam (probe_mod=1
    # makes every doc a probe -> candidate mass well over 1)
    with pytest.raises(ValueError, match="probe_mod"):
        bm25_self_retrieval(
            corpus, probe_mod=1, probe_rem=0, max_candidate_rows=1
        )
    with pytest.raises(ValueError, match="probe_mod"):
        rm3_expansion_retrieval(
            corpus, probe_mod=1, probe_rem=0, max_candidate_rows=1
        )


def test_candidate_mass_guard_results_neutral_under_budget(spark, corpus):
    # guard on (default budget) vs guard waived (None): identical
    # rankings — the pre-count only counts, never filters
    q = _q(spark, "spark", "join")
    with_guard = sorted(
        (r["query_id"], r["doc_id"], r["score"], r["rank"])
        for r in bm25_topk(corpus, q, k=10).collect()
    )
    waived = sorted(
        (r["query_id"], r["doc_id"], r["score"], r["rank"])
        for r in bm25_topk(corpus, q, k=10, max_candidate_rows=None).collect()
    )
    assert with_guard == waived
