"""Property-based tests: operators vs pure-Python reference models.

Randomized small inputs (hypothesis) catch the edge shapes example
tests miss — empty groups, all-duplicate feeds, single-element
partitions, version ties. Example counts are kept small because every
example runs real Spark jobs; the properties, not the volume, carry
the weight.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings, strategies as st

SMALL = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def merge_case(draw):
    keys = st.integers(0, 5)
    base = draw(
        st.lists(
            st.tuples(keys, st.text("ab", max_size=3)),
            max_size=8,
            unique_by=lambda t: t[0],
        )
    )
    changes = draw(
        st.lists(
            st.tuples(
                keys,
                st.text("cd", max_size=3),
                st.integers(1, 3),
                st.booleans(),
            ),
            max_size=8,
        )
    )
    return base, changes


@given(merge_case())
@settings(**SMALL)
def test_merge_upsert_matches_replay_model(spark, case):
    from chapterhouseqe_spark.operators.maintenance import merge_upsert

    base, changes = case
    bdf = spark.createDataFrame(
        [(k, v, 0) for k, v in base] or [(99, "x", 0)],
        "id long, val string, ver long",
    )
    if not base:
        bdf = bdf.filter("id < 0")
    cdf = spark.createDataFrame(
        changes or [(99, "x", 1, False)],
        "id long, val string, ver long, is_del boolean",
    )
    if not changes:
        cdf = cdf.filter("id < 0")

    got = sorted(
        (r["id"], r["val"])
        for r in merge_upsert(
            bdf, cdf, ["id"], version_col="ver", delete_col="is_del"
        ).collect()
    )

    # model: per key, max-version change wins (ties -> any change beats
    # base); tombstone at the winning version suppresses the key
    model = {k: (0, v, False, 0) for k, v in base}  # ver, val, del, src
    for k, v, ver, is_del in changes:
        cur = model.get(k)
        cand = (ver, v, is_del, 1)
        if cur is None or (cand[0], cand[3]) > (cur[0], cur[3]):
            # strictly-greater (version, src) wins; equal-version change
            # rows tie-break arbitrarily, so skip ambiguous cases
            model[k] = cand
    ambiguous = {
        k
        for k in model
        if sum(
            1
            for kk, _, ver, _ in changes
            if kk == k and ver == model[k][0]
        )
        > 1
    }
    expect = sorted(
        (k, val)
        for k, (ver, val, is_del, src) in model.items()
        if not is_del and k not in ambiguous
    )
    got_unambiguous = [t for t in got if t[0] not in ambiguous]
    assert got_unambiguous == expect


@given(
    st.lists(
        st.tuples(st.integers(0, 50), st.integers(1, 20)),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    st.integers(4, 32),
)
@settings(**SMALL)
def test_pack_sequences_matches_sequential_cumsum(spark, rows, budget):
    from chapterhouseqe_spark.operators.corpus import pack_sequences

    df = spark.createDataFrame(rows, "doc_id long, toks long")
    got = {
        r["doc_id"]: (r["seq_id"], r["tokens_before"])
        for r in pack_sequences(df, "toks", "doc_id", budget=budget).collect()
    }

    # model: md5-keyed total order, sequential exclusive cumsum
    order = sorted(
        rows,
        key=lambda t: hashlib.md5(str(t[0]).encode()).hexdigest() + str(t[0]),
    )
    acc = 0
    for doc_id, toks in order:
        assert got[doc_id] == (acc // budget, acc)
        acc += toks


@given(
    st.lists(
        st.lists(st.sampled_from("abcd"), min_size=1, max_size=6),
        min_size=1,
        max_size=8,
    )
)
@settings(**SMALL)
def test_segment_dedup_matches_keep_first_model(spark, docs):
    from chapterhouseqe_spark.operators.dedup import segment_dedup

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["text_dedup"], r["n_kept"])
        for r in segment_dedup(df, "text", "doc_id", delim=" ").collect()
    }

    seen: set[str] = set()
    for i, words in enumerate(docs):
        kept = []
        for w in words:
            if w not in seen:
                seen.add(w)
                kept.append(w)
        assert got[i] == (" ".join(kept), len(kept))


@given(
    keys=st.lists(st.integers(0, 200), min_size=1, max_size=30, unique=True),
    cands=st.lists(st.integers(0, 400), min_size=1, max_size=40, unique=True),
)
@settings(**SMALL)
def test_bloom_never_false_negative_model(spark, keys, cands):
    """For ANY key/candidate sets: every candidate that IS a key passes
    the filter (bloom's one-sided guarantee), and membership matches a
    pure-Python replay of the md5 bit arithmetic exactly."""
    from chapterhouseqe_spark.operators.sketches import (
        bloom_bits,
        bloom_filter_keys,
    )

    m, nh = 256, 3

    def positions(k):
        return {
            int(hashlib.md5(f"{j}:{k}".encode()).hexdigest()[:15], 16) % m
            for j in range(nh)
        }

    bits_model = set().union(*(positions(k) for k in keys))
    expect = {c for c in cands if positions(c) <= bits_model}

    kdf = spark.createDataFrame([(k,) for k in keys], "k long")
    cdf = spark.createDataFrame([(c,) for c in cands], "k long")
    got = {
        r.k
        for r in bloom_filter_keys(
            cdf, "k", bloom_bits(kdf, "k", m, nh), m, nh
        ).collect()
    }
    assert got == expect
    assert set(keys) & set(cands) <= got  # no false negatives, ever


@given(
    stream=st.lists(st.integers(0, 20), min_size=1, max_size=60),
)
@settings(**SMALL)
def test_cms_matches_model_and_overestimates(spark, stream):
    """CMS estimates equal the pure-Python min-over-rows replay and
    never under-count any key in the stream."""
    from collections import Counter

    from chapterhouseqe_spark.operators.sketches import (
        cms_counters,
        cms_estimate,
    )

    d, w = 3, 16

    def pos(k, j):
        return int(hashlib.md5(f"{j}:{k}".encode()).hexdigest()[:15], 16) % w

    counters = Counter((j, pos(k, j)) for k in stream for j in range(d))
    exact = Counter(stream)
    model = {
        k: min(counters[(j, pos(k, j))] for j in range(d)) for k in exact
    }

    df = spark.createDataFrame([(k,) for k in stream], "k long")
    got = {
        r.k: r.cms_est
        for r in cms_estimate(
            df.select("k").distinct(), "k", cms_counters(df, "k", d, w), d, w
        ).collect()
    }
    assert got == model
    assert all(got[k] >= exact[k] for k in exact)


def _bpe_reference(words: dict, n_merges: int):
    """Independent pure-Python Sennrich BPE trainer (NOT the SQL
    unroll the oracle uses): per-word symbol tuples, dict-based pair
    counting, leftmost-first non-overlapping merge. Ties break on the
    lexicographically smallest pair — the engine's convention."""
    vocab = {tuple(w) + ("</w>",): f for w, f in words.items()}
    merges = []
    for _ in range(n_merges):
        counts: dict = {}
        for sym, f in vocab.items():
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        pair = min(counts, key=lambda p: (-counts[p], f"{p[0]} {p[1]}"))
        merges.append((f"{pair[0]} {pair[1]}", counts[pair]))
        new_vocab = {}
        for sym, f in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


@given(
    st.lists(
        st.text(alphabet="abcde", min_size=1, max_size=6),
        min_size=1,
        max_size=12,
    ),
    st.integers(1, 4),
)
@settings(**SMALL)
def test_bpe_train_merges_matches_reference(spark, word_lists, n_merges):
    """bpe_train_merges (doubled-space replace over the word-frequency
    table) against an independent per-word symbol-loop trainer —
    different algorithmic realization, same merge sequence required."""
    from chapterhouseqe_spark.functions.text import bpe_train_merges

    docs = spark.createDataFrame(
        [(0, " ".join(word_lists))], "doc_id long, text string"
    )
    words: dict = {}
    for w in word_lists:
        words[w] = words.get(w, 0) + 1
    expected = _bpe_reference(words, n_merges)
    got = [
        (r.pair, r.cnt)
        for r in bpe_train_merges(docs, "text", n_merges=n_merges)
        .orderBy("step")
        .collect()
    ]
    assert got == expected


def test_substring_dup_stats_matches_bruteforce(spark):
    """substring_dup_stats vs a brute-force Python n-gram counter on a
    corpus with a shared boilerplate passage, a self-repeating doc, and
    a short out-of-scope doc."""
    from chapterhouseqe_spark.operators.dedup import substring_dup_stats

    docs = [
        (0, "the quick brown fox jumps over the lazy dog today ok"),
        (1, "intro text the quick brown fox jumps over the lazy dog"),
        (2, "a b c d a b c d a b c d"),  # self-repetition counts
        (3, "too short to have a gram"),  # 6 tokens < window=8 -> absent
    ]
    w = 8
    grams: dict = {}
    per_doc: dict = {}
    for did, txt in docs:
        tk = txt.split()
        if len(tk) < w:
            continue
        gs = [" ".join(tk[i : i + w]) for i in range(len(tk) - w + 1)]
        per_doc[did] = gs
        for g in gs:
            grams[g] = grams.get(g, 0) + 1
    expected = {
        did: (
            len(gs),
            sum(1 for g in gs if grams[g] > 1),
        )
        for did, gs in per_doc.items()
    }
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = substring_dup_stats(df, "text", "doc_id", window=w).collect()
    got = {r.doc_id: (r.n_grams, r.n_dup_grams) for r in rows}
    assert got == expected
    assert 3 not in got  # short doc has no length-8 passage
    for r in rows:
        assert abs(r.dup_frac - r.n_dup_grams / r.n_grams) < 1e-12


def test_substring_rewrite_matches_bruteforce(spark):
    """Removal semantics vs a brute-force Python model: tokens covered
    by ANY corpus-repeated window-gram are deleted; survivors rebuild
    in order."""
    from chapterhouseqe_spark.operators.dedup import substring_dedup_rewrite

    docs = [
        (0, "the quick brown fox jumps over the lazy dog unique tail one"),
        (1, "prefix text the quick brown fox jumps over the lazy dog"),
        (2, "a b c d a b c d a b c d"),  # self-repeat: fully covered
    ]
    w = 8
    toks = {d: t.split() for d, t in docs}
    grams: dict = {}
    for d, tk in toks.items():
        for i in range(len(tk) - w + 1):
            g = " ".join(tk[i : i + w])
            grams[g] = grams.get(g, 0) + 1
    expected = {}
    for d, tk in toks.items():
        covered = set()
        for i in range(len(tk) - w + 1):
            if grams[" ".join(tk[i : i + w])] > 1:
                covered.update(range(i, i + w))
        kept = [t for j, t in enumerate(tk) if j not in covered]
        expected[d] = (len(tk), len(kept), " ".join(kept))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_kept, r.text_dedup)
        for r in substring_dedup_rewrite(df, "text", "doc_id", window=w).collect()
    }
    assert got == expected
    assert got[2][1] == 0 and got[2][2] == ""  # fully-covered doc


def test_sparse_tf_cosine_finds_clones_and_caps_stop_terms(spark):
    """On a corpus with rare + stop terms: clone pairs surface at
    cos=1.0 through their rare terms, stop-term-only overlap produces
    NO pair (the cap removed those postings), and the fractional cap
    reproduces the absolute cap's subspace at any corpus multiple.
    (The registry query's sf0.1 result is legitimately empty — the
    synthetic table's 31-term vocabulary saturates every cap — so this
    test carries the behavioral evidence.)"""
    from chapterhouseqe_spark.operators.dedup import sparse_tf_cosine_pairs

    stop = "the and of to in"  # appears in every doc -> capped away
    docs = [
        (0, f"{stop} zebra quark nimbus"),
        (1, f"{stop} zebra quark nimbus"),  # clone of 0 (rare terms)
        (2, f"{stop} completely different rare words"),
        (3, f"{stop} completely different rare words"),  # clone of 2
        (4, f"{stop} unrelated solitary content"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {
        (r.id_a, r.id_b): r.cos_sim
        for r in sparse_tf_cosine_pairs(
            df, "text", "doc_id", threshold=0.8, max_df=3
        ).collect()
    }
    assert set(pairs) == {(0, 1), (2, 3)}
    assert all(abs(v - 1.0) < 1e-12 for v in pairs.values())

    # fractional cap: 3/5 docs = 0.6 -> same subspace, same pairs
    frac_pairs = {
        (r.id_a, r.id_b)
        for r in sparse_tf_cosine_pairs(
            df, "text", "doc_id", threshold=0.8, max_df_frac=0.6
        ).collect()
    }
    assert frac_pairs == {(0, 1), (2, 3)}


@st.composite
def source_corpus(draw):
    n = draw(st.integers(2, 14))
    vocab = ["aa", "bb", "cc", "dd"]
    docs = []
    for i in range(n):
        toks = draw(
            st.lists(st.sampled_from(vocab), min_size=1, max_size=6)
        )
        src = f"s{draw(st.integers(0, 2))}"
        docs.append((src, " ".join(toks)))
    return docs


@given(source_corpus())
@settings(**SMALL)
def test_token_budget_plan_matches_integer_model(spark, docs):
    """Full-table replay against a pure-Python big-int model: the
    div-mod split must equal floor(B*w/W) exactly, and every derived
    column follows from the same integer arithmetic."""
    import math

    from chapterhouseqe_spark.operators.corpus import token_budget_plan

    df = spark.createDataFrame(docs, "source string, text string")
    got = {r["source"]: r for r in token_budget_plan(df).collect()}

    avail: dict[str, int] = {}
    for src, text in docs:
        avail[src] = avail.get(src, 0) + len(text.split())
    sq = {s: int(math.floor(math.sqrt(float(a)))) for s, a in avail.items()}
    den = sum(sq.values())
    budget = 2 * sum(avail.values())
    assert set(got) == set(avail)
    for s_ in avail:
        target = (budget * sq[s_]) // den  # exact big-int floor
        actual = min(target, 4 * avail[s_])
        r = got[s_]
        assert r["avail_tokens"] == avail[s_]
        assert r["weight_num"] == sq[s_]
        assert r["target_tokens"] == target
        assert r["actual_tokens"] == actual
        assert r["deficit_tokens"] == target - actual
        assert r["mix_weight"] == sq[s_] / den
        assert r["epochs_needed"] == target / avail[s_]


@st.composite
def rm3_corpus(draw):
    n = draw(st.integers(4, 10))
    vocab = ["red", "green", "blue", "gold", "gray"]
    return [
        (
            i,
            " ".join(
                draw(st.lists(st.sampled_from(vocab), min_size=1, max_size=7))
            ),
        )
        for i in range(n)
    ]


@given(rm3_corpus())
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_rm3_matches_float_replay_model(spark, docs):
    """Exact-equality replay of the full RM3 stack in pure Python —
    same IEEE op sequence, same ordered folds, same tie-breaks — so
    any accumulation-order drift in the Spark plan fails loudly."""
    from chapterhouseqe_spark.operators.retrieval import (
        RM3_LAM_EXP,
        RM3_LAM_ORIG,
        RRF_K,
        rm3_expansion_retrieval,
    )

    MOD, REM, NT, KFB, NEXP, KOUT = 3, 1, 3, 2, 2, 4
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (
            (r["probe_id"], r["doc_id"], r["score"], r["rank"])
            for r in rm3_expansion_retrieval(
                df, probe_mod=MOD, probe_rem=REM, n_terms=NT,
                k_fb=KFB, n_exp=NEXP, k_out=KOUT,
            ).collect()
        )
    )

    # ---- pure-Python model (same op order) ----
    tf: dict[tuple[int, str], int] = {}
    for i, text in docs:
        for w in text.lower().strip().split():
            tf[(i, w)] = tf.get((i, w), 0) + 1
    dl: dict[int, int] = {}
    dfreq: dict[str, int] = {}
    for (i, w), c in tf.items():
        dl[i] = dl.get(i, 0) + c
        dfreq[w] = dfreq.get(w, 0) + 1
    n_docs = len(dl)
    avgdl = float(sum(dl.values())) / n_docs

    def term_score(t, d):
        c = tf[(d, t)]
        idf = float(2 * n_docs - 2 * dfreq[t] + 1) / (2 * dfreq[t] + 1)
        return idf * ((c * 2.2) / (c + 1.2 * (0.25 + 0.75 * (dl[d] / avgdl))))

    def scores(qterms):  # qterms: {qid: {term: qw or None}}
        out = {}
        for qid, terms in qterms.items():
            cand: dict[int, list] = {}
            for t, qw in terms.items():
                for d in dl:
                    if (d, t) in tf:
                        sc = term_score(t, d)
                        if qw is not None:
                            sc = qw * sc
                        cand.setdefault(d, []).append((t, sc))
            for d, pairs in cand.items():
                if d == qid:
                    continue
                acc = 0.0
                for _, sc in sorted(pairs):
                    acc = acc + sc
                out[(qid, d)] = acc
        return out

    probes = {}
    for d in dl:
        if d % MOD == REM:
            tops = sorted(
                ((w, c) for (i, w), c in tf.items() if i == d),
                key=lambda x: (-x[1], x[0]),
            )[:NT]
            probes[d] = {w: None for w, _ in tops}
    first = scores(probes)
    exp_terms: dict[int, dict[str, float]] = {}
    for qid in probes:
        fb = sorted(
            ((d, s) for (q, d), s in first.items() if q == qid),
            key=lambda x: (-x[1], x[0]),
        )[:KFB]
        w: dict[str, list] = {}
        for rank, (d, _) in enumerate(fb, start=1):
            for (i, t), c in tf.items():
                if i == d:
                    contrib = (c / dl[d]) * (1.0 / (RRF_K + rank))
                    w.setdefault(t, []).append((d, contrib))
        wagg = {}
        for t, pairs in w.items():
            acc = 0.0
            for _, c in sorted(pairs):
                acc = acc + c
            wagg[t] = acc
        top = sorted(wagg.items(), key=lambda x: (-x[1], x[0]))[:NEXP]
        exp_terms[qid] = {t: RM3_LAM_EXP * v for t, v in top}
    qterms = {}
    for qid in probes:
        merged = {}
        for t in set(probes[qid]) | set(exp_terms[qid]):
            merged[t] = (RM3_LAM_ORIG if t in probes[qid] else 0.0) + (
                exp_terms[qid].get(t, 0.0)
            )
        qterms[qid] = merged
    second = scores(qterms)
    want = []
    for qid in probes:
        ranked = sorted(
            ((d, s) for (q, d), s in second.items() if q == qid),
            key=lambda x: (-x[1], x[0]),
        )[:KOUT]
        for rank, (d, s) in enumerate(ranked, start=1):
            want.append((qid, d, s, rank))
    assert got == sorted(want)


@st.composite
def jaccard_corpus(draw):
    """Small corpora mixing shared boilerplate with per-doc tokens, so
    pair similarities land above, below, and AT the threshold — the
    shapes that stress the prefix guarantee, the positional filter's
    bound, and the epsilon-ceil discipline."""
    n_docs = draw(st.integers(2, 8))
    header_len = draw(st.integers(0, 6))
    header = [f"h{j}" for j in range(header_len)]
    docs = []
    for i in range(n_docs):
        kind = draw(st.integers(0, 2))
        if kind == 0 and docs:
            # near/exact copy of an earlier doc (ties, J=1.0 pairs)
            docs.append(list(draw(st.sampled_from(docs))))
        else:
            n_own = draw(st.integers(3, 8))
            own = [f"t{i}_{j}" for j in range(n_own)]
            docs.append(header + own)
    threshold = draw(st.sampled_from([0.3, 0.5, 0.75]))
    return docs, threshold


@given(jaccard_corpus())
@settings(**SMALL)
def test_prefix_positional_filter_is_lossless(spark, case):
    """The PPJoin positional filter (round 12) must never change the
    pair set: prefix path == direct path, pairwise-identical jaccard,
    on corpora with boilerplate skew, exact copies, and at-threshold
    ties."""
    from chapterhouseqe_spark.operators.dedup import ngram_jaccard_pairs

    docs, threshold = case
    df = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        "doc_id long, text string",
    )

    def pairset(prefix_filter):
        out = ngram_jaccard_pairs(
            df,
            "text",
            "doc_id",
            threshold=threshold,
            prefix_filter=prefix_filter,
            max_shingle_freq=None,
        )
        return sorted(
            (r.id_a, r.id_b, round(r.jaccard, 12)) for r in out.collect()
        )

    assert pairset(True) == pairset(False)
