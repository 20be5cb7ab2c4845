"""Corpus-prep operators: chunking, sequence packing, sampling, PII."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from chapterhouseqe_spark.functions.text import pii_count, pii_redact
from chapterhouseqe_spark.operators.corpus import (
    chunk_documents,
    pack_sequences,
    sample_per_key,
)


def test_chunk_documents_boundaries(spark):
    text = "abcdefghij"  # 10 chars
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    out = chunk_documents(df, "text", "doc_id", size=4, overlap=1).collect()
    # step=3: starts 0,3,6 cover through char 10; ceil((10-1)/3)=3 chunks
    got = [(r.chunk_id, r.chunk_start, r.chunk_text) for r in out]
    assert got == [(0, 0, "abcd"), (1, 3, "defg"), (2, 6, "ghij")]


def test_chunk_documents_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    out = chunk_documents(df, "text", "doc_id", size=100, overlap=10).collect()
    assert len(out) == 1 and out[0].chunk_text == "ab"


def test_chunk_documents_rejects_bad_sizes(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="exceed overlap"):
        chunk_documents(df, size=10, overlap=10)


def test_pack_sequences_matches_global_window(spark):
    rows = [(i, 10 + (i * 37) % 50) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, tok long")
    got = {
        r.doc_id: (r.seq_id, r.tokens_before)
        for r in pack_sequences(df, "tok", "doc_id", budget=100).collect()
    }
    # naive single-window reference (fine at test scale)
    k = F.concat(F.md5(F.col("doc_id").cast("string")), F.col("doc_id").cast("string"))
    w = Window.orderBy(k.alias("k")).rowsBetween(Window.unboundedPreceding, -1)
    ref = {
        r.doc_id: (r.before // 100, r.before)
        for r in df.withColumn(
            "before", F.coalesce(F.sum("tok").over(Window.orderBy(k).rowsBetween(Window.unboundedPreceding, -1)), F.lit(0))
        ).collect()
    }
    assert got == ref


def test_pack_sequences_budget_monotone(spark):
    df = spark.createDataFrame([(i, 30) for i in range(50)], "doc_id long, tok long")
    out = pack_sequences(df, "tok", "doc_id", budget=90).collect()
    # 30-token docs, budget 90: seq_id = tokens_before//90, max 3 docs start
    # per sequence; the assignment is a non-decreasing step function of
    # tokens_before.
    by_before = sorted((r.tokens_before, r.seq_id) for r in out)
    seqs = [s for _, s in by_before]
    assert seqs == sorted(seqs)
    from collections import Counter

    assert max(Counter(seqs).values()) == 3


def test_sample_per_key_deterministic_and_bounded(spark):
    rows = [(i, "k%d" % (i % 3)) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, key string")
    a = sample_per_key(df, ["key"], 4, "id").collect()
    b = sample_per_key(df, ["key"], 4, "id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    from collections import Counter

    counts = Counter(r.key for r in a)
    assert all(v == 4 for v in counts.values()) and len(counts) == 3


def test_sample_per_key_small_group_returns_all(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "id long, key string")
    out = sample_per_key(df, ["key"], 10, "id")
    assert out.count() == 3


def test_pii_redact_and_count(spark):
    s = "mail bob.smith+x@corp.example.org call +1 555 123 4567 host 192.168.0.1 done"
    df = spark.createDataFrame([(s,)], "s string")
    row = df.select(
        pii_redact(F.col("s")).alias("red"),
        pii_count(F.col("s"), "email").alias("ne"),
        pii_count(F.col("s"), "phone").alias("np"),
        pii_count(F.col("s"), "ipv4").alias("ni"),
    ).collect()[0]
    assert row.red == "mail [EMAIL] call [PHONE] host [IP] done"
    assert (row.ne, row.np, row.ni) == (1, 1, 1)


def test_pii_redact_clean_text_unchanged(spark):
    df = spark.createDataFrame([("no pii here at all",)], "s string")
    assert df.select(pii_redact(F.col("s")).alias("r")).collect()[0].r == (
        "no pii here at all"
    )


def test_segment_dedup_keeps_first_occurrence(spark):
    from chapterhouseqe_spark.operators.dedup import segment_dedup

    docs = spark.createDataFrame(
        [
            (1, "intro\n\nbody one\n\nfooter"),
            (2, "intro\n\nbody two\n\nfooter"),   # intro+footer are boilerplate
            (3, "footer\n\nbody three"),
            (4, "intro\n\nfooter"),               # fully boilerplate -> empty
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["text_dedup"], r["n_kept"])
        for r in segment_dedup(docs, "text", "doc_id").collect()
    }
    assert out[1] == ("intro\n\nbody one\n\nfooter", 3)
    assert out[2] == ("body two", 1)
    assert out[3] == ("body three", 1)
    assert out[4] == ("", 0)


def test_segment_dedup_within_doc_repeats(spark):
    from chapterhouseqe_spark.operators.dedup import segment_dedup

    docs = spark.createDataFrame(
        [(7, "a b a b c")], "doc_id long, text string"
    )
    out = segment_dedup(docs, "text", "doc_id", delim=" ").collect()[0]
    # repeated words inside ONE doc also collapse to first occurrence
    assert out["text_dedup"] == "a b c"
    assert out["n_kept"] == 3


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from pyspark.sql import functions as F

    from chapterhouseqe_spark.operators.corpus import weighted_priority_sample

    df = spark.createDataFrame(
        [(1, 10), (2, 0), (3, None), (4, 5)], "doc_id long, w int"
    )
    got = {r.doc_id for r in weighted_priority_sample(df, "w", "doc_id", k=10).collect()}
    # zero/NULL weight rows are excluded outright (their priority is
    # NULL and engines disagree on NULL ordering)
    assert got == {1, 4}


def test_segment_dedup_null_doc_id_raises(spark):
    import pytest as _pytest

    from chapterhouseqe_spark.operators.dedup import segment_dedup

    df = spark.createDataFrame(
        [(None, "a\nb"), (1, "c\nd")], "doc_id long, text string"
    )
    with _pytest.raises(Exception, match="packing bounds"):
        segment_dedup(df, "text", "doc_id").collect()


def test_epoch_shuffle_reproducible_and_decorrelated(spark, sf_dir):
    """Same epoch twice -> byte-identical (shard, pos); different
    epochs -> a different permutation; every doc appears exactly once
    with contiguous 1..n positions per shard."""
    from chapterhouseqe_spark.operators.corpus import epoch_shuffle

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a1 = {r.doc_id: (r.shard, r.pos) for r in epoch_shuffle(docs, "doc_id", 1, 8).collect()}
    a2 = {r.doc_id: (r.shard, r.pos) for r in epoch_shuffle(docs, "doc_id", 1, 8).collect()}
    b = {r.doc_id: (r.shard, r.pos) for r in epoch_shuffle(docs, "doc_id", 2, 8).collect()}
    assert a1 == a2  # restart-identical
    assert a1 != b  # epochs decorrelate
    assert len(a1) == docs.count()  # every doc exactly once
    # per-shard positions are contiguous 1..n
    by_shard: dict = {}
    for shard, pos in a1.values():
        by_shard.setdefault(shard, []).append(pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard


def test_write_training_shards_round_trip(spark, sf_dir, tmp_path):
    """The written artifact reproduces epoch_shuffle's permutation: each
    shard directory holds exactly its docs, readable in pos order, and
    nothing is lost or duplicated."""
    from chapterhouseqe_spark.operators.corpus import (
        epoch_shuffle,
        write_training_shards,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang"
    )
    path = str(tmp_path / "shards")
    assert write_training_shards(docs, path, "doc_id", epoch=3, n_shards=8) == 8

    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    expected = {
        r.doc_id: (r.shard, r.pos)
        for r in epoch_shuffle(docs, "doc_id", 3, 8).collect()
    }
    got = {r.doc_id: (r.shard, r.pos) for r in back.collect()}
    assert got == expected
    # within one shard's files, row order follows pos (read one shard
    # serially with a single-threaded frame)
    one = back.filter("shard = 0").coalesce(1).collect()
    ps = [r.pos for r in sorted(one, key=lambda r: r.pos)]
    assert ps == list(range(1, len(ps) + 1))


def test_perceptron_train_converges_and_matches_hand_math(spark):
    """Separable fixture: 'alpha'(slot 11) x4 tokens labeled +1, one
    'delta'(slot 1) token labeled -1. Epoch 1 from w=0 updates on every
    doc (y*0 <= 0): w[11] = +4*n_pos, w[1] = -n_neg; epoch 2 classifies
    everything correctly -> the loop must early-break with
    n_mis_last = 0 and leave the epoch-1 weights untouched."""
    from pyspark.sql import functions as F

    from chapterhouseqe_spark.operators.corpus import perceptron_train

    rows = [(i, "alpha alpha alpha alpha") for i in range(3)] + [
        (i, "delta") for i in range(3, 8)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    label = F.when(F.col("doc_id") < 3, 1).otherwise(-1)
    got = {
        r.j: (r.weight, r.n_mis_last)
        for r in perceptron_train(
            docs, label, "text", "doc_id", dim=16, epochs=5
        ).collect()
    }
    assert len(got) == 16
    assert all(n == 0 for _, n in got.values())  # converged, early break
    expected = {j: 0 for j in range(16)}
    expected[11] = 4 * 3  # 4 'alpha' tokens x 3 positive docs
    expected[1] = -5  # 1 'delta' token x 5 negative docs
    assert {j: w for j, (w, _) in got.items()} == expected


def test_perceptron_train_validates_params(spark):
    import pytest
    from pyspark.sql import functions as F

    from chapterhouseqe_spark.operators.corpus import perceptron_train

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        perceptron_train(docs, F.lit(1), dim=0)
    with pytest.raises(ValueError):
        perceptron_train(docs, F.lit(1), epochs=0)
