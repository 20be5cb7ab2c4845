"""Unit tests for the bloom-filter sketch, SQ quantization, and BPE
pair counting — edge semantics the registry oracles don't isolate."""

from __future__ import annotations

from pyspark.sql import functions as F

from chapterhouseqe_spark.operators.sketches import (
    bloom_bits,
    bloom_filter_keys,
    bloom_positions,
)
from chapterhouseqe_spark.operators.similarity import sq_quantize, sq_topk


def test_bloom_no_false_negatives(spark):
    """Every true key must pass — bloom filters can only over-admit."""
    keys = spark.range(0, 50).withColumnRenamed("id", "k")
    cand = spark.range(0, 500).withColumnRenamed("id", "k")
    bits = bloom_bits(keys, "k", m_bits=512, n_hashes=3)
    passed = {
        r.k for r in bloom_filter_keys(cand, "k", bits, 512, 3).collect()
    }
    assert set(range(50)) <= passed
    # an undersized filter (512 bits, 150 set) must still reject most
    # of the 450 non-members
    assert len(passed) < 500


def test_bloom_positions_deterministic(spark):
    """Positions are a pure function of the key — two evaluations and
    a literal recomputation agree (the property the DuckDB oracle
    relies on)."""
    df = spark.createDataFrame([(42,)], "k long").select(
        bloom_positions(F.col("k"), 3, 4096).alias("p")
    )
    a = df.collect()[0].p
    b = df.collect()[0].p
    assert a == b and len(a) == 3
    assert all(0 <= x < 4096 for x in a)


def test_sq_quantize_bounds_and_constant_dim(spark):
    """min -> 0, max -> 255 (clamped), constant dimension -> 0."""
    rows = [([0.0, 5.0, 7.0],), ([10.0, 5.0, 3.0],), ([5.0, 5.0, 5.0],)]
    df = spark.createDataFrame(rows, "v array<float>")
    lo, hi = [0.0, 5.0, 3.0], [10.0, 5.0, 7.0]
    out = [r.q for r in df.select(sq_quantize(F.col("v"), lo, hi).alias("q")).collect()]
    # dim0: 0.0 -> 0, 10.0 -> 255; dim1 constant -> 0; dim2: 7.0 -> 255, 3.0 -> 0
    assert out[0][0] == 0 and out[1][0] == 255
    assert all(r[1] == 0 for r in out)
    assert out[0][2] == 255 and out[1][2] == 0
    # interior point quantizes inside the range
    assert 0 < out[2][0] < 255


def test_sq_topk_self_excluded_and_ranked(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.1]),
        (2, [0.0, 1.0]),
        (3, [0.9, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sq_topk(df, F.col("vec_id") == 0, k=2, dim=2).collect()
    assert [r.id_b for r in out] == [1, 3]  # nearest in code space, no self
    assert [r.rnk for r in out] == [1, 2]
    assert out[0].score_q >= out[1].score_q


def test_bpe_pair_counts_hand_checked(spark):
    from chapterhouseqe_spark.functions.text import bpe_pair_counts

    docs = spark.createDataFrame(
        [("ab ab b",), ("AB",)], "text string"
    )
    got = {r.pair: r.cnt for r in bpe_pair_counts(docs, "text", k=10).collect()}
    # 'ab' appears 3x (case-folded), 'b' once
    assert got == {"a b": 3, "b </w>": 4}


def test_cms_overestimates_only_and_is_tight_when_wide(spark):
    from chapterhouseqe_spark.operators.sketches import (
        cms_counters,
        cms_estimate,
    )

    # 100 keys with multiplicity (k % 7) + 1
    src = (
        spark.range(0, 100)
        .selectExpr("id as k", "cast(id % 7 + 1 as int) as m")
        .selectExpr("k", "explode(array_repeat(1, m)) as one")
        .select("k")
    )
    exact = {r.k: r.c for r in src.groupBy("k").count().withColumnRenamed("count", "c").collect()}

    # narrow sketch: estimates never BELOW exact
    counters = cms_counters(src, "k", depth=3, width=16)
    est = {
        r.k: r.cms_est
        for r in cms_estimate(
            src.select("k").distinct(), "k", counters, 3, 16
        ).collect()
    }
    assert all(est[k] >= exact[k] for k in exact)
    # at least one collision at width 16 with 100 keys
    assert any(est[k] > exact[k] for k in exact)

    # wide sketch: exact for every key (no collisions forced)
    counters_w = cms_counters(src, "k", depth=3, width=4096)
    est_w = {
        r.k: r.cms_est
        for r in cms_estimate(
            src.select("k").distinct(), "k", counters_w, 3, 4096
        ).collect()
    }
    assert est_w == exact


def test_linear_counting_bits_bounded_and_exact_when_sparse(spark):
    from chapterhouseqe_spark.operators.sketches import linear_counting

    src = spark.range(0, 300).withColumnRenamed("id", "k")
    r = linear_counting(src, "k", m_bits=4096).collect()[0]
    assert r.n_exact == 300
    # bits_set <= n_exact always; at 300 keys / 4096 bits nearly no
    # collisions, so the bitmap population sits close to the truth
    assert 280 <= r.bits_set <= 300
    # tiny bitmap: population capped by m
    r2 = linear_counting(src, "k", m_bits=64).collect()[0]
    assert r2.bits_set <= 64


def test_weighted_priority_sample_favors_heavy_and_is_deterministic(spark):
    from chapterhouseqe_spark.operators.corpus import weighted_priority_sample

    from pyspark.sql import functions as F

    # ids 0..199 light (w=1), 200..219 heavy (w=1000)
    df = spark.range(0, 220).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") >= 200, F.lit(1000)).otherwise(F.lit(1)).alias("w"),
    )
    s1 = [r.doc_id for r in weighted_priority_sample(df, "w", "doc_id", k=20).collect()]
    s2 = [r.doc_id for r in weighted_priority_sample(df, "w", "doc_id", k=20).collect()]
    assert s1 == s2  # exact replay
    heavy = sum(1 for i in s1 if i >= 200)
    # 20 heavy docs at 1000x weight should dominate a k=20 sample
    assert heavy >= 15


def test_hll_registers_match_python_model(spark):
    """Spark HLL registers equal a pure-Python md5 bit-arithmetic model
    (the same independence the DuckDB oracle replay relies on)."""
    import hashlib

    from chapterhouseqe_spark.operators.sketches import hll_registers

    m = 64
    keys = [str(i * 7) for i in range(200)]
    model: dict[int, int] = {}
    for k in keys:
        h = int(hashlib.md5(k.encode()).hexdigest()[:15], 16)
        bucket, rem = h % m, h // m
        rho = 55 if rem == 0 else 55 - rem.bit_length()
        model[bucket] = max(model.get(bucket, 0), rho)

    df = spark.createDataFrame([(int(k),) for k in keys], "k long")
    got = {r.bucket: r.M for r in hll_registers(df, "k", m=m).collect()}
    assert got == model


def test_hll_estimate_within_bound(spark):
    """m=64 gives ~13% standard error; require the estimate inside 3σ
    for a 2000-key stream, and the integer sketch state consistent."""
    from chapterhouseqe_spark.operators.sketches import hll_estimate

    df = spark.range(0, 6000).select((F.col("id") % 2000).alias("k"))
    row = hll_estimate(df, "k", m=64).collect()[0]
    assert row.n_exact == 2000
    assert abs(row.hll_est - 2000) / 2000 < 3 * 1.04 / (64**0.5)
    # s_scaled consistency: all 64 registers accounted for
    assert row.n_filled <= 64 and row.s_scaled > 0


def test_bpe_apply_merge_adjacent_sites_both_collapse(spark):
    """'x y x y' has two adjacent merge sites sharing a delimiter; the
    doubled-space encoding must collapse BOTH in one replace pass
    (single-space encoding would miss the second)."""
    from chapterhouseqe_spark.functions.text import bpe_apply_top_merge

    # corpus chosen so the top-1 merge is 'x y' (freq 8 > any other)
    df = spark.createDataFrame(
        [(1, "xyxy xyxy xyxy xyxy")], "doc_id long, text string"
    )
    got = {r.pair: r.cnt for r in bpe_apply_top_merge(df, "text", k=50).collect()}
    # after merging 'x y' everywhere: symbols per word = [xy, xy, </w>]
    assert got == {"xy xy": 4, "xy </w>": 4}


def test_bpe_apply_merge_leftmost_first(spark):
    """'y y y' merges leftmost-first: one 'yy' + a bare 'y' survive."""
    from chapterhouseqe_spark.functions.text import bpe_apply_top_merge

    df = spark.createDataFrame([(1, "yyy yyy")], "doc_id long, text string")
    got = {r.pair: r.cnt for r in bpe_apply_top_merge(df, "text", k=50).collect()}
    assert got == {"yy y": 2, "y </w>": 2}


def test_mixing_weights_recover_target_shares(spark):
    """sample_weight * n_docs / total must equal the target share."""
    from chapterhouseqe_spark.queries.registry import get_queries

    df_build = get_queries()["pipeline_mixing_weights"]
    rows = df_build(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 5
    total = sum(r.n_docs for r in rows)
    for r in rows:
        assert abs(r.sample_weight * r.n_docs / total - r.target_share) < 1e-12
        assert abs(r.actual_share - r.n_docs / total) < 1e-15


def test_histogram_quantiles_match_python_model(spark):
    """Bin counts, cumulative ranks, and estimates equal a pure-Python
    model of the same fixed-grid arithmetic."""
    import math

    from chapterhouseqe_spark.operators.sketches import histogram_quantiles

    vals = [float(v) for v in (1, 5, 5, 7, 12, 23, 23, 23, 40, 99)]
    lo, width, nbins = 0.0, 10.0, 8
    qs = (0.5, 0.9)
    hist: dict[int, int] = {}
    for x in vals:
        b = min(max(int(math.floor((x - lo) / width)), 0), nbins - 1)
        hist[b] = hist.get(b, 0) + 1
    total = len(vals)
    expect = {}
    for q in qs:
        target = max(1, int(math.floor(q * total)))
        cum = 0
        for b in sorted(hist):
            cum += hist[b]
            if cum >= target:
                expect[q] = (target, b, hist[b], cum, lo + (b + 0.5) * width)
                break
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {
        r.q: (r.target_rank, r.bin, r.bin_count, r.cum, r.est)
        for r in histogram_quantiles(df, "x", lo, width, nbins, qs).collect()
    }
    assert got == expect


def test_pagerank_matches_python_model(spark):
    """3 fixed-point iterations on a small cyclic digraph equal a pure-
    Python integer replay; total rank is conserved on a graph with no
    dangling nodes."""
    from chapterhouseqe_spark.operators.graph import pagerank_fixed_point

    edges = [(1, 2), (2, 3), (3, 1), (1, 3)]
    nodes = {1, 2, 3}
    deg = {1: 2, 2: 1, 3: 1}
    ranks = {n: 1_000_000 for n in nodes}
    for _ in range(3):
        contrib = {n: 0 for n in nodes}
        for s, d in edges:
            contrib[d] += ranks[s] // deg[s]
        ranks = {n: 150_000 + (85 * contrib[n]) // 100 for n in nodes}

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.rank for r in pagerank_fixed_point(df, n_iter=3).collect()}
    assert got == ranks


def test_bpe_encode_stats_merge_monotonicity(spark):
    """Encoding invariants: at 0 merges every token is a char or </w>
    (total_tokens = total_chars + n_words); each merge never increases
    the token count; words/chars are merge-invariant."""
    from chapterhouseqe_spark.functions.text import bpe_encode_stats

    df = spark.createDataFrame(
        [(0, "aa ab aa ab aa"), (1, "ab aa ba ba")],
        "doc_id long, text string",
    )
    rows = {
        n: bpe_encode_stats(df, "text", n_merges=n).collect()[0]
        for n in (0, 1, 2)
    }
    r0 = rows[0]
    assert r0.total_tokens == r0.total_chars + r0.n_words
    for a, b in ((0, 1), (1, 2)):
        assert rows[a].n_words == rows[b].n_words
        assert rows[a].total_chars == rows[b].total_chars
        assert rows[b].total_tokens <= rows[a].total_tokens
    # each merge saves exactly the merged pair's weighted count:
    # corpus is aa x4, ab x3, ba x2 -> t0 = 9 words x 3 symbols = 27;
    # merge1 = 'a </w>' (count 6) -> 21; merge2 = 'a a</w>' (4) -> 17
    assert (r0.total_tokens, rows[1].total_tokens, rows[2].total_tokens) == (
        27,
        21,
        17,
    )


def test_bigram_prob_scores_hand_checked(spark):
    """Tiny corpus with hand-computed joint/prefix sums: doc0 'a b a b'
    (bigrams ab,ba,ab), doc1 'a b c' (ab,bc). Corpus joint counts
    ab=3, ba=1, bc=1; prefix counts a=3, b=2."""
    from chapterhouseqe_spark.functions.text import bigram_prob_scores

    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c"), (2, "solo")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_bigrams, r.joint_sum, r.prefix_sum, r.bigram_score)
        for r in bigram_prob_scores(df, "text", "doc_id").collect()
    }
    assert got[0] == (3, 3 + 1 + 3, 3 + 2 + 3, 7 / 8)
    assert got[1] == (2, 3 + 1, 3 + 2, 4 / 5)
    assert 2 not in got  # single-token doc has no bigram


def test_gopher_rules_hand_checked(spark):
    """Synthetic docs hitting each rule: a passing doc, a
    symbol-heavy doc, a numeric doc (low alpha fraction), and a
    duplicate-line doc."""
    from chapterhouseqe_spark.functions.text import gopher_quality_rules

    good = " ".join(["word"] * 60)
    symbols = " ".join(["word"] * 60) + " " + " ".join(["#"] * 10)
    numeric = " ".join(["123"] * 60)
    dup_lines = "\n".join(["same line of text"] * 8 + ["unique tail here"])
    df = spark.createDataFrame(
        [(0, good), (1, symbols), (2, numeric), (3, dup_lines)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in gopher_quality_rules(df, "text", "doc_id").collect()}
    assert got[0].passes
    assert got[0].n_words == 60 and got[0].mean_word_len == 4.0
    assert not got[1].passes and got[1].symbol_word_ratio >= 0.1
    assert not got[2].passes and got[2].alpha_word_frac == 0.0
    # 9 lines, 2 distinct -> dup frac 7/9 > 0.3
    assert not got[3].passes and abs(got[3].dup_line_frac - 7 / 9) < 1e-12


def test_hll_merge_equals_sketch_of_union(spark):
    """The merged sketch (cellwise MAX) must have IDENTICAL registers
    to a sketch built over the concatenated streams — the mergeability
    law itself, independent of any estimate."""
    from chapterhouseqe_spark.operators.sketches import (
        hll_registers,
        hll_set_estimates,
    )

    a = spark.range(0, 500).withColumnRenamed("id", "k")
    b = spark.range(300, 900).withColumnRenamed("id", "k")
    ra = hll_registers(a, "k", 64)
    rb = hll_registers(b, "k", 64)
    from pyspark.sql import functions as F

    merged = {
        r.bucket: r.M
        for r in ra.select("bucket", F.col("M").alias("Ma"))
        .join(rb.select("bucket", F.col("M").alias("Mb")), "bucket", "full")
        .select(
            "bucket",
            F.greatest(
                F.coalesce(F.col("Ma"), F.lit(0)),
                F.coalesce(F.col("Mb"), F.lit(0)),
            ).alias("M"),
        )
        .collect()
    }
    direct = {
        r.bucket: r.M
        for r in hll_registers(a.unionAll(b), "k", 64).collect()
    }
    assert merged == direct

    row = hll_set_estimates(a, b, "k", m=64).collect()[0]
    assert row.n_exact_a == 500 and row.n_exact_b == 600
    assert row.n_exact_union == 900 and row.n_exact_intersection == 200
    # m=64 -> ~13% standard error; union within 3 sigma
    assert abs(row.est_union - 900) / 900 < 3 * 1.04 / 8
    # inclusion-exclusion consistency by construction
    assert abs(row.est_a + row.est_b - row.est_union - row.est_intersection) < 1e-9


def test_triangle_count_hand_checked(spark):
    """K4 has 4 triangles; adding a pendant edge adds none; duplicate
    and reversed edges collapse."""
    from chapterhouseqe_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = k4 + [(3, 9), (1, 0), (2, 1)]  # pendant + dup/reversed
    df = spark.createDataFrame(edges, "src long, dst long")
    row = triangle_count(df).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (5, 7, 4)

    # triangle-free graph (a path) counts zero
    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    assert triangle_count(path).collect()[0].n_triangles == 0
