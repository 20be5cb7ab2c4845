"""Model-based checks for the round-8 query additions.

Each new registry query already grades against its DuckDB oracle at
three scales (tests/test_queries_oracle.py); these tests pin the
SEMANTICS against independent models — numpy linear algebra, brute
force pure Python — and the internal conservation laws the oracles
can't express (e.g. new + repeat == total), on both synthetic corners
and the shared sf0.001 tables.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from chapterhouseqe_spark.queries.registry import get_queries

QUERIES = get_queries()


def _run(name, spark, sf_dir):
    return QUERIES[name](spark, sf_dir)


# ------------------------------------------------------------------ gram


def test_gram_matrix_matches_numpy(spark, tmp_path):
    rng = np.random.default_rng(7)
    n, d = 23, 5
    x = rng.normal(size=(n, d)).astype(np.float32)
    rows = [(i, [float(v) for v in x[i]], int(i % 3)) for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.write.parquet(str(tmp_path / "embeddings.parquet"))

    out = {
        (r.i, r.j): (r.n_vecs, r.gram_sum)
        for r in _run("embedding_gram_matrix", spark, str(tmp_path)).collect()
    }
    gram = x.astype(np.float64).T @ x.astype(np.float64)
    assert len(out) == d * (d + 1) // 2
    for i in range(1, d + 1):
        for j in range(i, d + 1):
            n_vecs, s = out[(i, j)]
            assert n_vecs == n
            # query quantizes each product at DECIMAL(27,8)
            assert s == pytest.approx(gram[i - 1, j - 1], abs=1e-6)


# ---------------------------------------------------------------- basket


def test_basket_pairs_matches_bruteforce(spark, tmp_path):
    rng = np.random.default_rng(11)
    rows = []
    for ok in range(40):
        parts = rng.choice(12, size=rng.integers(1, 6), replace=False)
        for pk in parts:
            # duplicate lines for some parts: the DISTINCT must dedup
            for _ in range(rng.integers(1, 3)):
                rows.append((ok, int(pk)))
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))

    # brute-force model
    baskets: dict[int, set[int]] = {}
    for ok, pk in rows:
        baskets.setdefault(ok, set()).add(pk)
    from collections import Counter

    both = Counter()
    freq = Counter()
    for items in baskets.values():
        for pk in items:
            freq[pk] += 1
        for a in items:
            for b in items:
                if a < b:
                    both[(a, b)] += 1
    n_orders = len(baskets)
    expect = {
        (a, b): (c, c * n_orders / (freq[a] * freq[b]))
        for (a, b), c in both.items()
        if c >= 2
    }

    got = {
        (r.part_a, r.part_b): (r.n_both, r.lift)
        for r in _run("orders_basket_pairs", spark, str(tmp_path)).collect()
    }
    assert set(got) == set(expect)
    for k, (c, lift) in expect.items():
        assert got[k][0] == c
        assert got[k][1] == pytest.approx(lift, rel=1e-12)


# -------------------------------------------------------------- debounce


def test_debounce_matches_python_model(spark, tmp_path):
    rng = np.random.default_rng(3)
    rows = []
    eid = 0
    for uid in range(4):
        t_us = 0
        for _ in range(30):
            t_us += int(rng.integers(0, 150)) * 1_000_000
            etype = ["click", "view"][int(rng.integers(0, 2))]
            rows.append((eid, t_us * 1000, uid, etype, 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))

    # model: per (user, type) ordered by (ts, event_id), kept iff
    # >= 60s since previous RAW event
    from collections import defaultdict

    seqs = defaultdict(list)
    for e, ts_ns, u, ty, _v, _p in rows:
        seqs[(u, ty)].append((ts_ns // 1000, e))
    agg: dict[str, list[int]] = {}
    for (u, ty), es in seqs.items():
        es.sort()
        prev = None
        for ts_us, _e in es:
            k = agg.setdefault(ty, [0, 0, 0])
            k[0] += 1
            if prev is None or ts_us - prev >= 60_000_000:
                k[1] += 1
            else:
                k[2] += 1
            prev = ts_us

    got = {
        r.event_type: (r.n_events, r.n_kept, r.n_dropped)
        for r in _run("events_debounce", spark, str(tmp_path)).collect()
    }
    assert got == {ty: tuple(v) for ty, v in agg.items()}


# ------------------------------------------------- conservation laws


def test_new_vs_returning_conservation(spark, sf_dir):
    rows = _run("orders_new_vs_returning", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_new_customers + r.n_repeat_orders == r.n_orders
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r.n_new_customers for r in rows) == n_cust
    assert sum(r.n_orders for r in rows) == orders.count()


def test_zipf_coverage_shape(spark, sf_dir):
    rows = sorted(
        _run("text_zipf_coverage", spark, sf_dir).collect(),
        key=lambda r: r.rnk,
    )
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    shares = [r.cum_share for r in rows]
    assert all(b >= a for a, b in zip(shares, shares[1:]))
    assert 0 < shares[-1] <= 1.0 + 1e-12
    ns = [r.n for r in rows]
    assert all(a >= b for a, b in zip(ns, ns[1:]))


def test_ngram_diversity_bounds(spark, sf_dir):
    rows = _run("text_ngram_diversity", spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_distinct <= r.n_trigrams
        assert 0 < r.diversity <= 1.0
        assert r.diversity == pytest.approx(r.n_distinct / r.n_trigrams)


def test_power_user_share_bounds(spark, sf_dir):
    (r,) = _run("events_power_user_share", spark, sf_dir).collect()
    assert 1 <= r.n_top_users <= r.n_users
    assert 0 < r.top_events <= r.total_events
    assert r.top_share == pytest.approx(r.top_events / r.total_events)
    # top tile averages at least the overall mean events/user
    assert r.top_events * r.n_users >= r.total_events * r.n_top_users


def test_cluster_size_hist_matches_canonical_survivors(spark, sf_dir):
    hist = _run("dedup_cluster_size_hist", spark, sf_dir).collect()
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    survivors = _run("dedup_keep_canonical", spark, sf_dir).count()
    # every cluster of size s drops s-1 docs relative to the canonical
    # survivor set; singletons survive untouched
    dropped = sum((r.cluster_size - 1) * r.n_clusters for r in hist)
    assert n_docs - survivors == dropped
    assert all(r.cluster_size >= 2 and r.n_clusters >= 1 for r in hist)


def test_join_skew_census_exact(spark, sf_dir):
    rows = {r.key_col: r for r in _run("audit_join_skew", spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    r = rows["orders.o_custkey"]
    assert r.n_rows == orders.count()
    assert r.n_keys == orders.select("o_custkey").distinct().count()
    top = (
        orders.groupBy("o_custkey").count().orderBy("count", ascending=False)
    ).first()["count"]
    assert r.max_key_rows == top
    assert r.skew_ratio == pytest.approx(top * r.n_keys / r.n_rows)


# ------------------------------------------------- recurrence-family models


def test_linear_trend_matches_numpy_lstsq(spark, sf_dir):
    rows = _run("events_linear_trend", spark, sf_dir).collect()
    assert rows
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    raw = con.execute(
        "SELECT event_type, epoch_us(ts) // 3600000000 AS hidx, value FROM events"
    ).fetchall()
    by_type = {}
    for ty, hidx, v in raw:
        by_type.setdefault(ty, []).append((hidx, v))
    for r in rows:
        pts = by_type[r["event_type"]]
        x = np.array([p[0] for p in pts], dtype=np.float64)
        x -= x.min()
        y = np.array([p[1] for p in pts], dtype=np.float64)
        slope, intercept = np.polyfit(x, y, 1)
        assert r["slope"] == pytest.approx(slope, rel=1e-9)
        assert r["intercept"] == pytest.approx(intercept, rel=1e-9)
        assert 0.0 <= r["r2"] <= 1.0


def test_type_correlation_matches_numpy(spark, sf_dir):
    rows = _run("events_type_correlation", spark, sf_dir).collect()
    assert rows
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    raw = con.execute(
        "SELECT event_type, epoch_us(ts) // 3600000000 AS hidx FROM events"
    ).fetchall()
    lo = min(h for _, h in raw)
    hi = max(h for _, h in raw)
    vecs = {}
    for ty, h in raw:
        vecs.setdefault(ty, np.zeros(hi - lo + 1))
        vecs[ty][h - lo] += 1
    for r in rows:
        expect = np.corrcoef(vecs[r["type_a"]], vecs[r["type_b"]])[0, 1]
        assert r["pearson_r"] == pytest.approx(expect, abs=1e-9)
        assert -1.0 <= r["pearson_r"] <= 1.0


def test_hamming_band_pairs_matches_bruteforce(spark):
    from chapterhouseqe_spark.operators.dedup import hamming_band_pairs

    # deterministic pseudo-random 60-bit fingerprints + planted near pairs
    fps = [(i, (i * 2654435761 * 97 + 13) % (1 << 60)) for i in range(80)]
    fps += [(100 + i, fps[i][1] ^ (1 << (7 * i % 60))) for i in range(10)]
    fps += [(200 + i, fps[i][1] ^ 0b111 << (5 * i)) for i in range(5)]
    df = spark.createDataFrame(fps, "doc_id long, fingerprint long")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_band_pairs(df, bits=60, bands=4, max_dist=3).collect()
    }
    want = set()
    for (ia, fa) in fps:
        for (ib, fb) in fps:
            if ia < ib and bin(fa ^ fb).count("1") <= 3:
                want.add((ia, ib, bin(fa ^ fb).count("1")))
    assert got == want and len(want) >= 15


def test_image_ahash_invariants(spark, sf_dir):
    from chapterhouseqe_spark.sources.multimodal import (
        attach_binary_payload,
        image_ahash,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    fp = image_ahash(attach_binary_payload(docs)).collect()
    assert len(fp) == docs.count()  # one fingerprint per non-empty payload
    for r in fp:
        assert 0 <= r.fingerprint < (1 << 60)
    # identical payloads must hash identically: re-hash a copy
    again = {r.doc_id: r.fingerprint
             for r in image_ahash(attach_binary_payload(docs)).collect()}
    assert all(again[r.doc_id] == r.fingerprint for r in fp)


def test_char_diversity_matches_python_model(spark, sf_dir):
    import collections

    from chapterhouseqe_spark.functions.text import with_char_diversity

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    got = {r.doc_id: r for r in with_char_diversity(docs).collect()}
    for row in docs.collect():
        n = len(row.text)
        if n <= 1:
            continue
        cnt = collections.Counter(row.text)
        ic_num = sum(c * (c - 1) for c in cnt.values())
        g = got[row.doc_id]
        assert (g.n_chars, g.n_distinct, g.ic_num) == (n, len(cnt), ic_num)
        assert g.coincidence == ic_num / (n * (n - 1))


def test_kcore_matches_python_peel(spark):
    import collections

    from chapterhouseqe_spark.operators.graph import kcore_survivors

    # two 4-cliques bridged by a chain, plus a pendant path
    cliques = [(a, b) for grp in ([0, 1, 2, 3], [10, 11, 12, 13])
               for a in grp for b in grp if a < b]
    chain = [(3, 20), (20, 21), (21, 10), (30, 31), (31, 32)]
    edges = cliques + chain
    df = spark.createDataFrame(edges, "src long, dst long")
    for k in (2, 3):
        got = {(r.id, r.deg) for r in kcore_survivors(df, k=k, n_rounds=6).collect()}
        adj = collections.defaultdict(set)
        for u, v in edges:
            adj[u].add(v); adj[v].add(u)
        alive = set(adj)
        while True:
            drop = {n for n in alive
                    if sum(1 for m in adj[n] if m in alive) < k}
            if not drop:
                break
            alive -= drop
        want = {(n, sum(1 for m in adj[n] if m in alive)) for n in alive}
        assert got == want, (k, got, want)


def test_cluster_aware_split_zero_leakage(spark, sf_dir):
    from pyspark.sql import functions as F

    from chapterhouseqe_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )
    from chapterhouseqe_spark.queries.registry import md5_int

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", threshold=0.3, prefix_filter=True
    ).select("id_a", "id_b")
    comp = connected_components(
        pairs, docs.select(F.col("doc_id").alias("id"))
    )
    bucket = F.pmod(md5_int(F.col("component").cast("string")), F.lit(100))
    lab = comp.select(
        "id",
        F.when(bucket < 90, F.lit("train"))
        .when(bucket < 95, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
    leaked = (
        pairs.join(lab.withColumnRenamed("id", "id_a")
                      .withColumnRenamed("split", "sa"), "id_a")
        .join(lab.withColumnRenamed("id", "id_b")
                 .withColumnRenamed("split", "sb"), "id_b")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert leaked == 0  # whole-cluster assignment: zero by construction


def test_cdc_chunks_matches_python_model(spark, sf_dir):
    import collections
    import hashlib

    from chapterhouseqe_spark.operators.dedup import cdc_chunk_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    row = cdc_chunk_stats(docs, "text", "doc_id").collect()[0]
    cnt = collections.Counter()
    for r in docs.select("text").collect():
        t, n = r.text, len(r.text)
        bounds = [1] + [
            i for i in range(2, max(n - 7, 1) + 1)
            if int(hashlib.md5(t[i - 1:i + 7].encode()).hexdigest()[:15], 16)
            % 64 == 0
        ] + [n + 1]
        for j in range(len(bounds) - 1):
            cnt[t[bounds[j] - 1: bounds[j + 1] - 1]] += 1
    assert row.n_chunks == sum(cnt.values())
    assert row.n_distinct == len(cnt)
    assert row.n_dup_chunks == sum(c - 1 for c in cnt.values() if c > 1)
    assert row.dup_bytes == sum(
        (c - 1) * len(k) for k, c in cnt.items() if c > 1
    )
    # CDC shift-invariance: prepending one char must not re-align
    # distant chunks — the dup census stays within one chunk per doc
    assert row.n_dup_chunks > 0  # non-degenerate corpus


def test_multiprobe_recall_dominates_single_bucket(spark, sf_dir):
    from pyspark.sql import functions as F

    from chapterhouseqe_spark.operators.similarity import (
        _hyperplanes,
        _signature,
        cosine,
        lsh_multiprobe_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # exact top-3 ground truth for probes vec_id < 8
    probes = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("ea")
    )
    allv = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    from pyspark.sql import Window
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("sim"), F.col("id_b")
    )
    exact = {
        (r.probe_id, r.id_b)
        for r in probes.crossJoin(allv)
        .filter(F.col("id_b") != F.col("probe_id"))
        .select("probe_id", "id_b", cosine(F.col("ea"), F.col("eb")).alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .collect()
    }
    multi = {
        (r.probe_id, r.id_b)
        for r in lsh_multiprobe_topk(emb).collect()
    }
    # single-bucket variant: same rerank but candidates share the exact bucket
    planes = _hyperplanes(64, 8, 42)
    sig = _signature("embedding", planes)
    corpus = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"), sig.cast("int").alias("bucket"))
    p1 = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("ea"), sig.cast("int").alias("bucket"))
    single = {
        (r.probe_id, r.id_b)
        for r in p1.join(corpus, "bucket")
        .filter(F.col("id_b") != F.col("probe_id"))
        .select("probe_id", "id_b", cosine(F.col("ea"), F.col("eb")).alias("sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .collect()
    }
    r_multi = len(multi & exact) / len(exact)
    r_single = len(single & exact) / len(exact)
    assert r_multi >= r_single  # probing neighbor buckets never hurts
    assert len(multi) >= len(single)


def test_mmr_matches_python_greedy(spark, sf_dir):
    import math

    from chapterhouseqe_spark.operators.similarity import (
        mmr_diversified_topk,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = [
        (r.probe_id, r.rank, r.id_b)
        for r in mmr_diversified_topk(emb).collect()
    ]
    vecs = {r.vec_id: r.embedding for r in emb.collect()}

    def cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += float(x) * float(y)
        na = 0.0
        nb = 0.0
        for x in a:
            na += float(x) * float(x)
        for y in b:
            nb += float(y) * float(y)
        return dot / (math.sqrt(na) * math.sqrt(nb))

    want = []
    for p in range(4):
        sims = sorted(
            ((cos(vecs[p], v), -i) for i, v in vecs.items() if i != p),
            reverse=True,
        )
        cand = [(-ni, s) for s, ni in sims[:10]]
        selected = []
        pool = dict(cand)
        for rank in range(1, 6):
            best = None
            for cid, simq in sorted(pool.items()):
                pen = max(
                    (cos(vecs[cid], vecs[s]) for s in selected), default=0.0
                )
                mmr = simq * 0.75 - pen * 0.25
                if best is None or mmr > best[0]:
                    best = (mmr, cid)
            selected.append(best[1])
            del pool[best[1]]
            want.append((p, rank, best[1]))
    assert sorted(got) == sorted(want)
