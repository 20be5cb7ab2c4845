"""Round-12 additions: chunk-level ANN retrieval (the chunker-to-ANN
RAG-serving composition) and the filter funnel's benchmark-
contamination stage.

The graded queries (`docs_chunk_ann_topk`,
`pipeline_filter_funnel_contam`) are replayed against their DuckDB
oracles by tests/test_queries_oracle.py like every registry entry;
these tests pin the operator-level semantics the oracle can't see
failing in isolation.
"""

import pytest
from pyspark.sql import functions as F


def test_hashed_bow_embedding_is_a_token_histogram(spark):
    """The pooled vector is the per-bucket token count: components sum
    to the token count, repeated tokens stack in one bucket, and the
    same text always produces the same vector."""
    from chapterhouseqe_spark.operators.corpus import hashed_bow_embedding

    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "alpha beta alpha"), (3, "gamma")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["v"]
        for r in df.select(
            "doc_id", hashed_bow_embedding(F.col("text"), 8).alias("v")
        ).collect()
    }
    assert len(rows[1]) == 8
    assert sum(rows[1]) == 3.0  # three tokens
    assert sum(rows[3]) == 1.0
    assert rows[1] == rows[2]  # deterministic
    # 'alpha' twice -> its bucket holds >= 2 (== 3 if 'beta' collides)
    assert max(rows[1]) >= 2.0


def test_chunk_ann_topk_finds_copied_chunk_first(spark):
    """A probe doc whose text is copied verbatim into a chunk of
    another document must retrieve that chunk at rank 1 with sim == 1.0
    (identical count vectors), never retrieve its own chunks, and rank
    unrelated chunks (if bucketed together) below."""
    from chapterhouseqe_spark.operators.corpus import chunk_ann_topk

    probe_text = "spark shuffle broadcast join window agg"  # 6 tokens
    rows = [
        # doc 7 is the probe (7 % 7 == 0 with probe_mod=7, rem=0)
        (7, probe_text),
        # doc 1 embeds the probe text verbatim as its SECOND window
        # (size=6, stride=6 -> window 1 is exactly these 6 tokens)
        (1, "x1 x2 x3 x4 x5 x6 " + probe_text),
        # unrelated doc
        (2, "entirely different tokens here nothing shared at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_ann_topk(
        df,
        size=6,
        stride=6,
        dim=16,
        n_planes=2,  # 4 buckets: keep candidates together
        probe_mod=7,
        probe_rem=0,
        k=5,
    ).collect()
    assert out, "probe must retrieve at least the copied chunk"
    assert all(r["probe_id"] == 7 for r in out)
    assert all(r["doc_id"] != 7 for r in out)  # own chunks excluded
    best = min(out, key=lambda r: r["rank"])
    assert best["doc_id"] == 1 and best["sim"] == pytest.approx(1.0)
    ranks = sorted(r["rank"] for r in out)
    assert ranks == list(range(1, len(ranks) + 1))


def test_chunk_ann_topk_k_truncates(spark):
    """rank never exceeds k even when a bucket holds more candidates."""
    from chapterhouseqe_spark.operators.corpus import chunk_ann_topk

    base = "common shared tokens across documents every one "
    rows = [(i, base * 3) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_ann_topk(
        df, size=8, stride=8, n_planes=1, probe_mod=5, probe_rem=0, k=2
    ).collect()
    per_probe = {}
    for r in out:
        per_probe.setdefault(r["probe_id"], []).append(r["rank"])
    assert per_probe, "identical docs share buckets; candidates exist"
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= 2
               for v in per_probe.values())


def test_hashed_linear_score_semantics(spark):
    """score = bias + ordered dot of hashed counts with the weight
    vector; user-passed weights override the seeded stand-ins, and
    is_quality is the sign thresholding of score."""
    from chapterhouseqe_spark.operators.corpus import (
        hashed_bow_embedding,
        hashed_linear_score,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "gamma")], "doc_id long, text string"
    )
    # all-ones weights: score == token count + bias
    out = {
        r["doc_id"]: (r["score"], r["is_quality"])
        for r in hashed_linear_score(
            df, dim=8, weights=[1.0] * 8, bias=-2.0
        ).collect()
    }
    assert out[1] == (1.0, True)   # 3 tokens - 2
    assert out[2] == (-1.0, False)  # 1 token - 2

    with pytest.raises(ValueError, match="weights"):
        hashed_linear_score(df, dim=8, weights=[1.0] * 4)

    # seeded weights are deterministic across calls
    a = hashed_linear_score(df, dim=16, seed=7).collect()
    b = hashed_linear_score(df, dim=16, seed=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_winnowing_guarantee_and_short_doc_conventions(spark):
    """Winnowing's contract: any shared substring of >= k + w - 1
    words yields at least one shared fingerprint; docs under k words
    produce no rows; docs under k+w-1 words fingerprint as the min
    over all their gram hashes (one row)."""
    from chapterhouseqe_spark.operators.dedup import winnow_fingerprints

    shared = "one two three four five six seven eight"  # 8 = k+w-1 words
    rows = [
        (1, "prefix words here " + shared + " and a tail"),
        (2, shared + " totally different continuation text now"),
        (3, "short doc"),                      # < k words -> no rows
        (4, "exactly five word gram here"),    # 5 words -> 1 gram -> 1 fp
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_fingerprints(df, k=5, w=4).collect()
    fps = {}
    for r in out:
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[1] & fps[2], "shared 8-word substring must share a fp"
    assert 3 not in fps
    assert len(fps[4]) == 1

    with pytest.raises(ValueError, match="k >= 1"):
        winnow_fingerprints(df, k=0)


def test_winnowing_overlap_pairs_and_guards(spark):
    from chapterhouseqe_spark.operators.dedup import winnow_overlap_pairs

    passage = ("alpha beta gamma delta epsilon zeta eta theta iota "
               "kappa lambda mu")  # 12 words: several shared windows
    rows = [
        (1, "intro text here " + passage + " closing remarks one"),
        (2, passage + " unrelated continuation words follow here"),
        (3, "completely different content with no shared passages at "
            "all in this document body"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = winnow_overlap_pairs(df, k=5, w=4, min_shared=2).collect()
    pairs = {(r["id_a"], r["id_b"]): r["n_shared"] for r in out}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert not any(3 in p for p in pairs)

    # pair-mass fail-fast trips on a tiny budget
    with pytest.raises(ValueError, match="max_pair_rows"):
        winnow_overlap_pairs(df, min_shared=1, max_pair_rows=1)

    # hot-fp cap: a fingerprint shared by all 3 docs is dropped at
    # max_fp_freq=2, so the boilerplate-only pair disappears
    boiler = "common license header block for every single document here"
    rows2 = [(i, boiler + f" unique tail {i} {i} {i}") for i in range(1, 4)]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    with_cap = winnow_overlap_pairs(df2, k=5, w=4, min_shared=1,
                                    max_fp_freq=2).collect()
    without = winnow_overlap_pairs(df2, k=5, w=4, min_shared=1,
                                   max_fp_freq=None).collect()
    assert len(without) > len(with_cap)
