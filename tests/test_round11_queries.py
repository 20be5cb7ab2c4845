"""Round-11 additions: token-window chunking, URL canonical dedup,
vocab coverage curve, context-overflow report, token-budget epoch
planner, RM3 query-expansion retrieval.

The graded queries (`pipeline_chunk_token_windows`,
`dedup_url_canonical`, `text_vocab_coverage_curve`,
`pipeline_context_overflow`, `pipeline_token_budget_plan`,
`docs_rm3_expansion_retrieval`) are replayed against their DuckDB
oracles by tests/test_queries_oracle.py like every registry entry;
these tests pin the operator-level semantics the oracle can't see
failing in isolation.
"""

import pytest
from pyspark.sql import functions as F


def test_chunk_token_windows_coverage_and_offsets(spark):
    """Windows of `size` tokens every `stride` tokens: the union of
    windows covers every token exactly, the final window may be
    partial but always reaches the end, and char_start indexes the
    single-space-normalized text."""
    from chapterhouseqe_spark.operators.corpus import chunk_token_windows

    text = "a bb ccc dddd e ff ggg hh i jj kk"  # 11 tokens
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    rows = sorted(
        chunk_token_windows(df, size=4, stride=3).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # nc = 1 + ceil((11-4)/3) = 1 + 3 = 4
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2, 3]
    assert [r["tok_start"] for r in rows] == [0, 3, 6, 9]
    assert [r["n_tokens"] for r in rows] == [4, 4, 4, 2]
    toks = text.split()
    norm = " ".join(toks)
    for r in rows:
        expected = " ".join(toks[r["tok_start"] : r["tok_start"] + 4])
        assert r["chunk_text"] == expected
        # char_start points at the chunk inside the normalized text
        assert norm[r["char_start"] : r["char_start"] + len(expected)] == (
            expected
        )
    # last window reaches the document end
    assert rows[-1]["tok_start"] + rows[-1]["n_tokens"] == len(toks)


def test_chunk_token_windows_edge_cases(spark):
    from chapterhouseqe_spark.operators.corpus import chunk_token_windows

    df = spark.createDataFrame(
        [(0, "one two"), (1, ""), (2, "  x   y  ")],
        "doc_id long, text string",
    )
    rows = chunk_token_windows(df, size=4, stride=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # short doc: one whole-doc chunk
    assert len(by_doc[0]) == 1 and by_doc[0][0]["n_tokens"] == 2
    # empty text tokenizes to [''] (the engine-wide split discipline)
    assert len(by_doc[1]) == 1 and by_doc[1][0]["chunk_text"] == ""
    # run-length whitespace normalizes away
    assert by_doc[2][0]["chunk_text"] == "x y"

    with pytest.raises(ValueError, match="stride"):
        chunk_token_windows(df, size=4, stride=5)
    with pytest.raises(ValueError, match="stride"):
        chunk_token_windows(df, size=4, stride=0)


def test_canonicalize_url_cases(spark):
    """The shared regex set: lowercase scheme+host, default ports only
    under their own scheme, fragments gone, tracking params stripped
    wherever they sit in the query string, survivors intact."""
    from chapterhouseqe_spark.functions.text import canonicalize_url

    cases = {
        "HTTPS://Docs.Example.COM:443/Path?utm_source=a&utm_medium=b#f":
            "https://docs.example.com/Path",
        "http://site.org:80/a?ref=hp&q=1&utm_campaign=x":
            "http://site.org/a?q=1",
        # :443 is NOT the default port for http — it survives
        "http://site.org:443/a": "http://site.org:443/a",
        "https://x.y/?fbclid=abc": "https://x.y/",
        "https://x.y/p?gclid=1&keep=2&utm_a=3": "https://x.y/p?keep=2",
        "ftp://Weird.Host:21/file": "ftp://weird.host:21/file",
        "https://a.b/p?keep=1#frag": "https://a.b/p?keep=1",
    }
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(cases)], "i long, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select(
            "i", canonicalize_url(F.col("url")).alias("c")
        ).collect()
    }
    for i, (u, want) in enumerate(cases.items()):
        assert got[i] == want, f"{u}: {got[i]} != {want}"


def test_url_canonical_dedup_keeps_best(spark):
    """Keep-best per canonical key: highest quality wins, id breaks
    ties, n_variants counts the collapsed group."""
    from chapterhouseqe_spark.operators.dedup import url_canonical_dedup

    rows = [
        (1, "https://A.b/p?utm_x=1", 10),
        (2, "HTTPS://a.B/p#frag", 30),  # same canonical, best quality
        (3, "https://a.b/p", 30),  # quality tie -> smaller id wins
        (4, "https://a.b/q", 5),  # its own group
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, q long")
    out = {
        r["doc_id"]: r
        for r in url_canonical_dedup(
            df, "url", "doc_id", quality=F.col("q")
        ).collect()
    }
    assert set(out) == {2, 4}
    assert out[2]["n_variants"] == 3
    assert out[2]["canonical_url"] == "https://a.b/p"
    assert out[4]["n_variants"] == 1
    # no-quality form: smallest id per canonical key
    out2 = {
        r["doc_id"]
        for r in url_canonical_dedup(df, "url", "doc_id").collect()
    }
    assert out2 == {1, 4}


def test_token_coverage_curve_known_freqs(spark):
    """Known frequency profile: 'a'x3 'b'x2 'c'x1 — coverage must walk
    3/6, 5/6 then saturate at 1.0 once k reaches the vocab size, and
    the two-phase global rank must agree with the naive order."""
    from chapterhouseqe_spark.operators.corpus import token_coverage_curve

    df = spark.createDataFrame(
        [(0, "a a a b"), (1, "b c")], "doc_id long, text string"
    )
    rows = {
        r["k"]: r
        for r in token_coverage_curve(df, "text", ks=(1, 2, 3, 8)).collect()
    }
    assert rows[1]["covered_tokens"] == 3
    assert rows[2]["covered_tokens"] == 5
    assert rows[3]["covered_tokens"] == 6
    assert rows[8]["covered_tokens"] == 6  # k past vocab saturates
    assert all(r["total_tokens"] == 6 for r in rows.values())
    assert rows[8]["coverage"] == 1.0
    assert rows[1]["coverage"] == 0.5


def test_context_overflow_report_known_lengths(spark):
    """Doc lengths 2/20/40/200 against contexts 16/32/64/128: the
    overflow counts and truncated masses are hand-checkable."""
    from chapterhouseqe_spark.operators.corpus import (
        context_overflow_report,
    )

    def doc(n):
        return " ".join(f"w{i}" for i in range(n))

    df = spark.createDataFrame(
        [(i, doc(n)) for i, n in enumerate((2, 20, 40, 200))],
        "doc_id long, text string",
    )
    rows = {r["ctx"]: r for r in context_overflow_report(df).collect()}
    assert rows[16]["docs_over"] == 3
    assert rows[16]["truncated_tokens"] == (20 - 16) + (40 - 16) + (200 - 16)
    assert rows[32]["docs_over"] == 2
    assert rows[32]["truncated_tokens"] == 8 + 168
    assert rows[64]["docs_over"] == 1
    assert rows[64]["truncated_tokens"] == 136
    assert rows[128]["docs_over"] == 1
    assert rows[128]["truncated_tokens"] == 72
    assert all(r["total_docs"] == 4 for r in rows.values())
    assert all(r["total_tokens"] == 262 for r in rows.values())
    assert abs(rows[16]["truncated_share"] - 212 / 262) < 1e-12


def test_token_budget_plan_exact_arithmetic(spark):
    """Two sources with hand-computable masses: the div-mod split is
    the exact floor(B*sq/den), and the epoch cap produces the deficit
    on the upsampled small source only."""
    from chapterhouseqe_spark.operators.corpus import token_budget_plan

    def doc(src, i, n):
        return (src, " ".join(f"t{src}{i}x{j}" for j in range(n)))

    rows = [doc("big", i, 100) for i in range(100)]  # 10_000 tokens
    rows += [doc("small", i, 10) for i in range(10)]  # 100 tokens
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["source"]: r for r in token_budget_plan(df).collect()}
    big, small = out["big"], out["small"]
    assert big["avail_tokens"] == 10_000 and small["avail_tokens"] == 100
    assert big["weight_num"] == 100 and small["weight_num"] == 10
    den, budget = 110, 2 * 10_100
    assert big["target_tokens"] == (budget * 100) // den  # 18363
    assert small["target_tokens"] == (budget * 10) // den  # 1836
    # cap binds only on the upsampled small source (4 epochs = 400)
    assert big["actual_tokens"] == big["target_tokens"]
    assert big["deficit_tokens"] == 0
    assert small["actual_tokens"] == 400
    assert small["deficit_tokens"] == small["target_tokens"] - 400
    assert small["epochs_needed"] == small["target_tokens"] / 100
    assert abs(big["mix_weight"] - 100 / 110) < 1e-15


def test_rm3_expansion_retrieves_zero_overlap_doc(spark):
    """The signature RM3 behavior: a doc sharing NO term with the
    original query is retrieved through expansion terms mined from
    the feedback docs — first-pass BM25 structurally cannot see it."""
    from chapterhouseqe_spark.operators.retrieval import (
        bm25_topk,
        probe_term_queries,
        rm3_expansion_retrieval,
        term_frequencies,
    )

    docs = [
        # probe (7 % 173 == 7): query terms alpha/beta/gamma
        (7, "alpha alpha beta beta gamma"),
        # feedback docs: match the query AND carry 'delta'
        (1, "alpha beta delta delta"),
        (2, "alpha gamma delta delta"),
        (3, "beta gamma delta"),
        # the target: ONLY expansion-reachable
        (4, "delta delta delta delta"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    first = bm25_topk(
        df, probe_term_queries(term_frequencies(df), 173, 7, 3), k=10
    )
    first_ids = {r["doc_id"] for r in first.collect()}
    assert 4 not in first_ids  # no shared term with the raw query
    out = rm3_expansion_retrieval(df, k_fb=3, n_exp=2, k_out=10).collect()
    ids = {r["doc_id"] for r in out}
    assert 4 in ids  # reached via the mined 'delta' expansion term
    assert 7 not in ids  # probe doc excluded from its own results
    ranks = sorted(r["rank"] for r in out)
    assert ranks == list(range(1, len(ranks) + 1))


def test_token_budget_overflow_guard():
    """The guard bound is budget_multiple * (max(w) + 2) * W — one
    formula covering the budget B = m * sum(A) itself and BOTH
    div-mod intermediates (ADVICE r11: the original max(w) * W bound
    ignored the first term and the multiplier). It must fail loudly
    at 2^62 instead of letting Spark's non-ANSI long arithmetic wrap
    into a silently wrong plan."""
    import pytest

    from chapterhouseqe_spark.operators.corpus import _check_budget_bound

    _check_budget_bound(0, 0, 2)
    _check_budget_bound(2**30 - 2, 2**31, 2)  # exactly 2^62 is legal
    with pytest.raises(ValueError, match="overflow int64"):
        _check_budget_bound(2**30 - 2, 2**31 + 1, 2)
    # the multiplier now tightens the bound: the same (mx, den) that
    # passes at m=2 trips at m=4
    with pytest.raises(ValueError, match="overflow int64"):
        _check_budget_bound(2**30 - 2, 2**31, 4)
