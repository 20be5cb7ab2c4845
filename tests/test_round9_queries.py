"""Model-based checks for the round-9 query additions.

Each new registry query grades against its DuckDB oracle at three
scales plus sf1 (tests/test_queries_oracle.py + check_correctness);
these tests pin the SEMANTICS against independent models — pure-Python
folds and brute-force greedy — and the conservation laws the oracles
can't express.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


# --------------------------------------------------------- pack_nosplit


def test_pack_nosplit_matches_python_fold(spark):
    """The distributed per-key fold equals the sequential next-fit
    reference, including the over-capacity-doc-alone rule and the
    leftover reset at every overflow."""
    from chapterhouseqe_spark.operators.corpus import pack_sequences_nosplit

    rows = [
        # (source, doc_id, n): crafted to hit every branch
        ("a", 1, 900),
        ("a", 2, 900),   # fits: 1800
        ("a", 3, 300),   # overflow -> seq 1
        ("a", 4, 5000),  # over-capacity -> its own seq 2
        ("a", 5, 10),    # seq 3 (4's fill is 5000 > cap)
        ("b", 6, 2048),  # exactly capacity fills seq 0
        ("b", 7, 1),     # 2048+1 > 2048 -> seq 1
    ]
    df = spark.createDataFrame(rows, "source string, doc_id long, n long")
    out = {
        r["doc_id"]: (r["seq_idx"], r["offset"], r["n_tokens"])
        for r in pack_sequences_nosplit(
            df, "source", "n", id_col="doc_id", capacity=2048
        ).collect()
    }

    def reference(sizes, cap=2048):
        fill, seq, res, first = 0, 0, [], True
        for n in sizes:
            if not first and fill + n > cap:
                seq, fill = seq + 1, 0
            first = False
            res.append((seq, fill, n))
            fill += n
        return res

    for src, ids in (("a", [1, 2, 3, 4, 5]), ("b", [6, 7])):
        sizes = [n for (s, i, n) in rows if s == src]
        for doc_id, expect in zip(ids, reference(sizes)):
            assert out[doc_id] == expect, (src, doc_id)


def test_pack_nosplit_generic_key_id_types(spark):
    """r9 ADVICE: the output schema derives key/id dtypes from the
    input instead of hardcoding string/long — an int key and a string
    id must round-trip through the Arrow seam unchanged."""
    from chapterhouseqe_spark.operators.corpus import pack_sequences_nosplit

    df = spark.createDataFrame(
        [(7, "d1", 900), (7, "d2", 1500), (8, "d3", 100)],
        "bucket int, doc string, n long",
    )
    out = pack_sequences_nosplit(
        df, "bucket", "n", id_col="doc", capacity=2048
    )
    assert dict(out.dtypes)["bucket"] == "int"
    assert dict(out.dtypes)["doc"] == "string"
    got = {r["doc"]: (r["bucket"], r["seq_idx"]) for r in out.collect()}
    assert got == {"d1": (7, 0), "d2": (7, 1), "d3": (8, 0)}


def test_pack_nosplit_capacity_invariant(spark):
    """Conservation law over real data: within every (source, seq),
    offsets are consistent cumulative fills, and no sequence exceeds
    capacity unless it holds exactly one over-capacity doc."""
    from chapterhouseqe_spark.operators.corpus import pack_sequences_nosplit
    from chapterhouseqe_spark.functions.text import token_count

    cap = 512  # small capacity -> many sequences on sf0.001
    d = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("source", "doc_id", token_count(F.col("text")).alias("tok"))
    )
    packed = pack_sequences_nosplit(
        d, "source", "tok", id_col="doc_id", capacity=cap
    )
    seqs = (
        packed.groupBy("source", "seq_idx")
        .agg(
            F.sum("n_tokens").alias("total"),
            F.count(F.lit(1)).alias("n_docs"),
            F.max(F.col("offset") + F.col("n_tokens")).alias("max_end"),
        )
        .collect()
    )
    assert seqs
    for r in seqs:
        assert r["total"] == r["max_end"]  # offsets are exact cumsums
        if r["total"] > cap:
            assert r["n_docs"] == 1  # only a lone over-cap doc may exceed
    # every doc appears exactly once
    assert packed.count() == d.count()
    assert packed.select("doc_id").distinct().count() == d.count()


# -------------------------------------------------- dup-ngram fraction


def test_dup_ngram_fraction_corners(spark, tmp_path):
    """Planted corners: a fully-repetitive doc (dup_frac 1.0, dropped),
    an all-distinct doc (dup_frac 0.0, kept), a single-token doc
    (no bigrams -> absent), and a half-repeated doc with the exact
    integer ratio."""
    from chapterhouseqe_spark.queries.registry import get_queries

    rows = [
        (1, "spam spam spam spam spam", "x", "en"),
        (2, "alpha beta gamma delta epsilon", "x", "en"),
        (3, "lonely", "x", "en"),
        # bigrams: "a b","b a","a b","b c" -> "a b" twice of 4 -> 2/4
        (4, "a b a b c", "x", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string, lang string")
    df.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in get_queries()["text_dup_ngram_fraction"](
            spark, str(tmp_path)
        ).collect()
    }
    assert 3 not in out  # single token: no bigrams, row absent
    assert out[1]["dup_frac"] == 1.0 and not out[1]["keep"]
    assert out[1]["top_bigram_count"] == 4
    assert out[2]["dup_frac"] == 0.0 and out[2]["keep"]
    assert out[4]["n_bigrams"] == 4 and out[4]["dup_occurrences"] == 2
    assert out[4]["dup_frac"] == 0.5 and not out[4]["keep"]


# ----------------------------------------------------------- mmr + ann


def test_mmr_ann_matches_python_greedy_over_lsh_candidates(spark):
    """embedding_mmr_ann_topk == a pure-Python MMR greedy run over the
    EXACT candidate set lsh_multiprobe_topk returns — pins the
    composition seam end-to-end (candidate tier swap changes the pool,
    never the selection rule)."""
    from chapterhouseqe_spark.operators.similarity import lsh_multiprobe_topk
    from chapterhouseqe_spark.queries.registry import get_queries

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.collect()
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(x * x for x in b) ** 0.5
        return dot / (na * nb)

    cand_rows = lsh_multiprobe_topk(emb, n_probe_ids=4, k=10).collect()
    pools: dict[int, list[tuple[int, float]]] = {}
    for r in cand_rows:
        pools.setdefault(r["probe_id"], []).append((r["id_b"], r["sim"]))

    expected = {}
    for probe, pool in pools.items():
        selected: list[int] = []
        remaining = dict(pool)
        for rank in range(1, 6):
            if not remaining:
                break
            best = None
            for cid, simq in sorted(remaining.items()):
                pen = max(
                    (cos(vecs[cid], vecs[s]) for s in selected), default=0.0
                )
                score = 0.75 * simq - 0.25 * pen
                if best is None or score > best[1] + 1e-12 or (
                    abs(score - best[1]) <= 1e-12 and cid < best[0]
                ):
                    best = (cid, score)
            selected.append(best[0])
            expected[(probe, rank)] = best[0]
            del remaining[best[0]]

    got = {
        (r["probe_id"], r["rank"]): r["id_b"]
        for r in get_queries()["embedding_mmr_ann_topk"](spark, sf).collect()
    }
    assert got == expected


# ------------------------------------------------------ streaming ewma


def test_stream_ewma_replay_equals_batch_fold(spark):
    """The graded streaming query's 120 rows equal the pure-Python
    per-label EWMA fold over the synthetic source's deterministic row
    function — state demonstrably survives micro-batch boundaries
    (batch 30 < per-label series length spread over 4 batches)."""
    from chapterhouseqe_spark.queries.registry import get_queries

    out = get_queries()["stream_ewma_replay"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    got = {(r["event_type"], r["event_id"]): r["ewma"] for r in out}
    assert len(got) == 120

    level: dict[str, float] = {}
    for i in range(120):
        lab = f"l{i % 5}"
        x = (i * 37 % 1000) / 10.0
        level[lab] = x if lab not in level else 0.25 * x + 0.75 * level[lab]
        assert got[(lab, i)] == level[lab], i
