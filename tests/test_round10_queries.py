"""Round-10 additions: DSIR importance resampling.

The graded query (`pipeline_dsir_resample`) is replayed against its
DuckDB oracle by tests/test_queries_oracle.py like every registry
entry; these tests pin the operator-level semantics the oracle can't
see failing in isolation.
"""

from pyspark.sql import functions as F


def test_dsir_features_unigrams_plus_bigrams(spark):
    """n tokens yield n unigram + (n-1) bigram feature rows, buckets
    in [0, 4096), and the passthrough column survives the explode."""
    from chapterhouseqe_spark.operators.corpus import dsir_hashed_features

    df = spark.createDataFrame(
        [(1, "a b c", True), (2, "solo", False), (3, "  x   y  ", False)],
        "doc_id long, text string, t boolean",
    )
    rows = dsir_hashed_features(
        df, "text", "doc_id", passthrough=("t",)
    ).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["id"], []).append(r)
        assert 0 <= r["b"] < 4096
    assert len(per_doc[1]) == 3 + 2  # a,b,c + "a b","b c"
    assert len(per_doc[2]) == 1  # one token, no bigram
    assert len(per_doc[3]) == 2 + 1  # multi-space split stays clean
    assert all(r["t"] for r in per_doc[1])
    assert not any(r["t"] for r in per_doc[2])


def test_dsir_resample_prefers_target_like_docs(spark):
    """DSIR semantics on a corpus with two disjoint vocabularies:
    docs written in the target vocabulary score a strictly higher
    quantized log-likelihood ratio than docs written in the other,
    weight is exactly 2^s_quant, and the selection is deterministic."""
    from chapterhouseqe_spark.operators.corpus import (
        dsir_importance_resample,
    )

    a_words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    b_words = ["omega", "sigma", "kappa", "lambda", "theta"]

    def doc(words, i):
        return " ".join(words[(i + j) % len(words)] for j in range(12))

    rows = []
    for i in range(10):  # target sample: vocabulary A
        rows.append((i, doc(a_words, i), True))
    for i in range(10, 20):  # raw A-like docs, not marked target
        rows.append((i, doc(a_words, i), False))
    for i in range(20, 30):  # raw off-target docs, vocabulary B
        rows.append((i, doc(b_words, i), False))
    df = spark.createDataFrame(rows, "doc_id long, text string, t boolean")

    out = dsir_importance_resample(df, "text", "doc_id", "t", k=30)
    got = {r["doc_id"]: r for r in out.collect()}
    assert len(got) == 30  # k >= n keeps every doc, scored

    a_scores = [got[i]["s_quant"] for i in range(20)]
    b_scores = [got[i]["s_quant"] for i in range(20, 30)]
    assert min(a_scores) > max(b_scores)

    for r in got.values():
        s = r["s_quant"]
        assert -30 <= s <= 30
        expect = float(2**s) if s >= 0 else 1.0 / float(2**-s)
        assert r["weight"] == expect  # exact power of two, no rounding

    again = {r["doc_id"]: r for r in out.collect()}
    assert {k: (v["s_quant"], v["priority"]) for k, v in got.items()} == {
        k: (v["s_quant"], v["priority"]) for k, v in again.items()
    }


def test_dsir_selection_skews_toward_target(spark):
    """With k < n, the resampled set over-represents target-like docs
    relative to their share of the corpus (the whole point of DSIR):
    A-like docs are 1/3 of the pool but dominate the selection."""
    from chapterhouseqe_spark.operators.corpus import (
        dsir_importance_resample,
    )

    a_words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    b_words = ["omega", "sigma", "kappa", "lambda", "theta"]
    rows = []
    for i in range(10):
        rows.append((i, " ".join(a_words * 3), True))
    for i in range(10, 20):
        rows.append((i, " ".join(a_words * 3), False))
    for i in range(20, 60):
        rows.append((i, " ".join(b_words * 3), False))
    df = spark.createDataFrame(rows, "doc_id long, text string, t boolean")

    picked = {
        r["doc_id"]
        for r in dsir_importance_resample(
            df, "text", "doc_id", "t", k=12
        ).collect()
    }
    assert len(picked) == 12
    n_a = sum(1 for d in picked if d < 20)
    assert n_a >= 10  # 20/60 of the pool, but nearly all of the pick


def test_source_divergence_known_values(spark):
    """TV distance pins: identical per-source distributions -> 0,
    disjoint vocabularies -> 1, and a mixed pair matches a Python
    brute force over the same md5 bucketization."""
    import hashlib

    from chapterhouseqe_spark.operators.corpus import (
        source_divergence_matrix,
    )

    rows = [
        (0, "alpha beta gamma", "s_id1"),
        (1, "alpha beta gamma", "s_id2"),  # identical multiset to s_id1
        (2, "omega sigma kappa", "s_dis"),  # disjoint from s_id1
        (3, "alpha beta omega", "s_mix"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r["src_a"], r["src_b"]): r
        for r in source_divergence_matrix(
            df, "text", "doc_id", "source"
        ).collect()
    }

    assert out[("s_id1", "s_id2")]["tv"] == 0.0
    assert out[("s_dis", "s_id1")]["tv"] == 1.0

    def bucket(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % 4096

    def feats(text):
        ts = text.split()
        return [bucket(w) for w in ts] + [
            bucket(f"{a} {b}") for a, b in zip(ts, ts[1:])
        ]

    from collections import Counter

    ca, cb = Counter(feats(rows[0][1])), Counter(feats(rows[3][1]))
    ta, tb = sum(ca.values()), sum(cb.values())
    l1 = sum(
        abs(ca.get(b, 0) * tb - cb.get(b, 0) * ta)
        for b in set(ca) | set(cb)
    )
    got = out[("s_id1", "s_mix")]
    assert got["l1_scaled"] == l1
    assert got["tv"] == l1 / (2 * ta * tb)
    for r in out.values():
        assert 0.0 <= r["tv"] <= 1.0


def test_filter_funnel_accounting(spark):
    """The funnel is a partition of the scored docs: every doc lands
    in exactly one bucket, dedup only sees stage-1-3 survivors, and a
    crafted corpus hits every bucket with known counts."""
    from chapterhouseqe_spark.queries.pipeline_queries import (
        pipeline_filter_funnel,
    )
    import os
    import tempfile

    rows = [
        # 12 good en words, unique -> kept
        (0, " ".join(f"k{j}" for j in range(12)), "en"),
        # short (9 words) -> failed_length even though lang != en
        (1, " ".join(f"s{j}" for j in range(9)), "de"),
        # 12 words, de -> failed_lang
        (2, " ".join(f"d{j}" for j in range(12)), "de"),
        # 15 words but one word 3x (5*3 >= 15) -> failed_repetition
        (3, "rep rep rep " + " ".join(f"r{j}" for j in range(12)), "en"),
        # exact copy of doc 0 -> failed_dup (keep-first keeps 0)
        (4, " ".join(f"k{j}" for j in range(12)), "en"),
        # dup of doc 2's text but en: text fp matches doc 2, yet doc 2
        # failed lang so never reached dedup -> this one is kept
        (5, " ".join(f"d{j}" for j in range(12)), "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    d = tempfile.mkdtemp()
    df.write.parquet(os.path.join(d, "documents.parquet"))
    r = pipeline_filter_funnel(spark, d).collect()[0]
    assert r["n_scored"] == 6
    assert r["failed_length"] == 1
    assert r["failed_lang"] == 1
    assert r["failed_repetition"] == 1
    assert r["failed_dup"] == 1
    assert r["kept"] == 2
    assert (
        r["failed_length"]
        + r["failed_lang"]
        + r["failed_repetition"]
        + r["failed_dup"]
        + r["kept"]
        == r["n_scored"]
    )


def test_filter_funnel_degenerate_inputs(spark):
    """r10 ADVICE: when zero docs survive stages 1-3 the late frame is
    empty and Spark's SUM yields NULL while the oracle's COUNT(*)
    subqueries yield 0 — both the all-filtered and the zero-doc corpus
    must report integer zeros, not NULLs."""
    from chapterhouseqe_spark.queries.pipeline_queries import (
        pipeline_filter_funnel,
    )
    import os
    import tempfile

    # every doc fails an early stage -> late frame empty
    rows = [
        (0, "too short", "en"),
        (1, " ".join(f"d{j}" for j in range(12)), "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    d = tempfile.mkdtemp()
    df.write.parquet(os.path.join(d, "documents.parquet"))
    r = pipeline_filter_funnel(spark, d).collect()[0]
    assert r["failed_dup"] == 0 and r["kept"] == 0
    assert r["n_scored"] == 2 and r["failed_length"] == 1

    # zero-doc corpus -> every counter is 0, none NULL
    d2 = tempfile.mkdtemp()
    df.limit(0).write.parquet(os.path.join(d2, "documents.parquet"))
    r0 = pipeline_filter_funnel(spark, d2).collect()[0]
    assert all(
        r0[c] == 0
        for c in (
            "n_scored",
            "failed_length",
            "failed_lang",
            "failed_repetition",
            "failed_dup",
            "kept",
        )
    ), r0.asDict()


def test_source_divergence_overflow_guard():
    """r10 ADVICE: l1_scaled ≤ 2·Ta·Tb exceeds int64 once both sources
    pass ~2.1e9 hashed tokens; the guard must fail loudly at the
    documented bound instead of letting the long SUM wrap silently."""
    import pytest

    from chapterhouseqe_spark.operators.corpus import _check_l1_bound

    _check_l1_bound(0)
    _check_l1_bound(2**31)  # 2.1e9: (2^31)^2 == 2^62 is exactly legal
    with pytest.raises(ValueError, match="overflow BIGINT"):
        _check_l1_bound(2**31 + 1)
