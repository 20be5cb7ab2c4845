"""Executed-plan-shape asserts for the round-5/6 pipeline operators.

Companion to tests/test_plan_decorrelation.py: each test pins the
load-bearing physical property that makes the operator viable at 100 TB
— what must be broadcast, what must NOT be a cartesian/all-pairs join,
and where a shuffle is (or isn't) allowed. Captured from the EXECUTED
plan (post-AQE) at fixture scale so a regression fails in pytest, not
in a cluster.
"""

from __future__ import annotations

import pytest

from chapterhouseqe_spark.queries.registry import get_queries


def _executed_plan(df) -> str:
    df.collect()  # materialize so AQE finalizes the plan
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def queries():
    return get_queries()


@pytest.mark.parametrize(
    "name",
    [
        "pipeline_segment_dedup",
        "embedding_ivfpq_topk",
        "snapshot_time_travel",
        "embedding_ann_rerank",
        "kmeans_train_assign",
        "embedding_ivf_lloyd_topk",
        "pq_train_codebooks",
    ],
)
def test_no_cartesian_anywhere(queries, spark, sf_dir, name):
    # none of these operators is allowed to degrade into an unbounded
    # cartesian — the ANN/dedup families are bucketed BY DESIGN
    plan = _executed_plan(queries[name](spark, sf_dir))
    assert "CartesianProduct" not in plan, name


def test_segment_dedup_is_pure_groupby(queries, spark, sf_dir):
    # keep-first must be the map-side-combinable min-groupBy, never a
    # corpus-wide window (single-partition sort at scale)
    plan = _executed_plan(queries["pipeline_segment_dedup"](spark, sf_dir))
    assert "Window" not in plan
    assert "Exchange hashpartitioning" in plan  # the one keep-first shuffle
    assert "Exchange SinglePartition" not in plan


def test_snapshot_time_travel_is_scan_union(queries, spark, sf_dir):
    # two pinned-version reads + union: NO exchange of any kind — time
    # travel must cost exactly the scans, or the snapshot layout is wrong
    plan = _executed_plan(queries["snapshot_time_travel"](spark, sf_dir))
    assert "Exchange" not in plan


def test_ann_rerank_joins_are_broadcast_bucketed(queries, spark, sf_dir):
    # two-stage retrieval: LSH bucket join for candidates, broadcast
    # probe-side rerank — an all-pairs fallback would appear as a
    # nested-loop join over the corpus
    plan = _executed_plan(queries["embedding_ann_rerank"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_kmeans_training_shuffle_shape(queries, spark, sf_dir):
    # Lloyd iterations: centroids must BROADCAST to the corpus (they
    # are k*m rows), and since the r13 iteration-hygiene fix each
    # iteration's centroid frame is a lazy localCheckpoint — the final
    # plan reads it as an RDD scan instead of nesting every earlier
    # iteration's subtree
    plan = _executed_plan(queries["kmeans_train_assign"](spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "Exchange hashpartitioning" in plan
    assert "ExistingRDD" in plan  # checkpointed centroids, not a nested plan


def test_kmeans_update_partial_sums(spark, sf_dir):
    # the update itself must stay a hash shuffle with map-side partial
    # sums (the same exchange shape as MLlib's fit) — inspect it via
    # checkpoint_iters=False, which exposes the full training plan
    from chapterhouseqe_spark.operators.similarity import kmeans_lloyd
    from chapterhouseqe_spark.queries.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cent, _ = kmeans_lloyd(
        emb, n_centroids=8, n_iter=1, m_sub=1, dim=64, checkpoint_iters=False
    )
    plan = _executed_plan(cent)
    assert "partial_sum" in plan  # map-side combine before the exchange
    assert "Exchange hashpartitioning" in plan


def test_ivfpq_codebooks_broadcast(queries, spark, sf_dir):
    # PQ/IVF search: codebooks and probe set are KB-sized and must be
    # on the build side of broadcast joins; the only shuffled join
    # allowed is the candidate join keyed on bucket/cid
    plan = _executed_plan(queries["embedding_ivfpq_topk"](spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "embedding_sq_topk",
        "bpe_pair_counts",
        "bloom_prefilter_join",
    ],
)
def test_round6_ops_no_cartesian(queries, spark, sf_dir, name):
    # SQ probes broadcast, BPE is pure groupBy chains, bloom bits
    # broadcast — none may degrade into an unbounded cartesian
    plan = _executed_plan(queries[name](spark, sf_dir))
    assert "CartesianProduct" not in plan, name


def test_bpe_no_global_sort(queries, spark, sf_dir):
    # top-k merges must be TakeOrderedAndProject (per-partition top-k +
    # driver merge), never a single-partition global sort; and the two
    # aggregations must map-side combine before their exchanges
    plan = _executed_plan(queries["bpe_pair_counts"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan
    assert "partial_sum" in plan or "partial_count" in plan


def test_bloom_bits_broadcast(queries, spark, sf_dir):
    # the bit set must be on the build side of a broadcast join — a
    # shuffled membership join would defeat the sketch's purpose
    plan = _executed_plan(queries["bloom_prefilter_join"](spark, sf_dir))
    assert "BroadcastExchange" in plan


def test_unpivot_is_single_scan_expand(queries, spark, sf_dir):
    # the melt must be an Expand over ONE aggregated frame — the naive
    # translation (a UNION ALL arm per measure, like the oracle) would
    # scan lineitem three times
    plan = _executed_plan(queries["unpivot_measures"](spark, sf_dir))
    final = plan.split("== Initial Plan ==")[0]  # AQE prints both
    assert "Expand" in final
    assert final.count("FileScan parquet") == 1


def test_minhash_verify_join_is_size_adaptive(spark, sf_dir):
    # below BROADCAST_VERIFY_MAX_DOCS the shingle verify joins must
    # broadcast (r6 bench: forcing shuffle_hash cost 2x at sf0.1);
    # above it they must shuffle (the sf1 driver-OOM posture). Pin both
    # sides of the switch on the same tiny frame by flipping n_docs.
    from pyspark.sql import functions as F

    from chapterhouseqe_spark.operators.dedup import (
        BROADCAST_VERIFY_MAX_DOCS,
        _jaccard_on_pairs,
        with_shingles,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    sh = with_shingles(docs, "text", "doc_id", 3)
    cand = sh.select(F.col("id").alias("id_a")).crossJoin(
        sh.select(F.col("id").alias("id_b"))
    ).filter(F.col("id_a") < F.col("id_b")).limit(20)

    small = _jaccard_on_pairs(cand, sh, n_docs=50)
    small.collect()
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_small

    big = _jaccard_on_pairs(cand, sh, n_docs=BROADCAST_VERIFY_MAX_DOCS + 1)
    big.collect()
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan_big
    assert "BroadcastHashJoin" not in plan_big


def test_lateral_topn_decorrelates_to_window(queries, spark, sf_dir):
    # Catalyst must rewrite the LATERAL per-row subquery into one join
    # + ranked window — a per-row re-execution of the inner query would
    # show up as a nested-loop over orders
    plan = _executed_plan(queries["lateral_topn_per_key"](spark, sf_dir))
    assert "Window" in plan
    assert "CartesianProduct" not in plan


def test_resample_gapfill_generates_grid(queries, spark, sf_dir):
    # the dense hour grid is GENERATED (sequence+explode from the
    # bounds agg), never scanned — plan has exactly the events scans
    # and no cartesian against a calendar table
    plan = _executed_plan(queries["events_resample_gapfill"](spark, sf_dir))
    assert "Generate explode" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "hll_cardinality",
        "hll_grouped_cardinality",
        "quantile_sketch_hist",
        "events_funnel_stages",
        "snapshot_cdc_diff",
        "pagerank_supplier_graph",
        "dedup_semantic_semdedup",
        "manifest_bloom_scan",
    ],
)
def test_late_round6_ops_no_cartesian(queries, spark, sf_dir, name):
    plan = _executed_plan(queries[name](spark, sf_dir))
    assert "CartesianProduct" not in plan, name


def test_funnel_pushes_stage_filters_into_scans(queries, spark, sf_dir):
    # each funnel stage must reach its parquet scan as an equality
    # pushdown — a post-scan filter re-reads the whole events table
    # once per stage at 100 TB
    plan = _executed_plan(queries["events_funnel_stages"](spark, sf_dir))
    for stage in ("view", "click", "purchase"):
        assert f"EqualTo(event_type,{stage})" in plan, stage


def test_snapshot_cdc_diff_is_one_join_no_window(queries, spark, sf_dir):
    # the CDC contract: ONE full-outer key join, nothing else — no
    # window, no second join pass. AdaptiveSparkPlan.toString appends
    # the pre-AQE "Initial Plan" — count joins in the FINAL plan only.
    plan = _executed_plan(queries["snapshot_cdc_diff"](spark, sf_dir))
    final = plan.split("== Initial Plan ==")[0]
    assert (
        final.count("SortMergeJoin")
        + final.count("ShuffledHashJoin")
        + final.count("BroadcastHashJoin")
        == 1
    )
    assert "FullOuter" in final
    assert "Window" not in final


def test_hll_register_exchange_is_bounded(spark, sf_dir):
    # the SKETCH path (no exact-verification column) must partial-
    # aggregate the stream to <= m register rows BEFORE any exchange —
    # the raw key column never appears in an exchange's partitioning.
    # (The graded query ALSO emits countDistinct truth, which
    # legitimately shuffles keys; that column is the audit baseline,
    # not the sketch — so pin the sketch-only plan.)
    from chapterhouseqe_spark.operators.sketches import hll_estimate

    df = hll_estimate(
        spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
        "l_partkey",
        m=64,
        exact=False,
    )
    plan = _executed_plan(df)
    assert "partial_max" in plan or "partial" in plan.lower()
    assert "hashpartitioning(l_partkey" not in plan
    assert "hashpartitioning(bucket" in plan  # the bounded register shuffle


def test_bloom_scan_pushes_point_equality(queries, spark, sf_dir):
    # the residual equality must reach each bloom-selected file's scan
    plan = _executed_plan(queries["manifest_bloom_scan"](spark, sf_dir))
    assert "EqualTo(l_orderkey," in plan


def test_ivf_sq_topk_bounded_and_broadcast(queries, spark, sf_dir):
    """IVFx,SQ8 composition (r7): no cartesian against the corpus, and
    the candidate selection must be a BROADCAST equi-join on cid — the
    corpus never shuffles to find its probes (the whole point of
    composing IVF with SQ instead of SQ's full scan)."""
    plan = _executed_plan(queries["embedding_ivf_sq_topk"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # bucket-frame broadcast
    # the corpus-side candidate join must not sort-merge (that would be
    # a full corpus shuffle keyed on cid)
    assert "SortMergeJoin" not in plan


def test_bpe_train_loop_reads_iterations_from_cache(queries, spark, sf_dir):
    """The whole BPE scaling argument: 3 training iterations over the
    PERSISTED word-frequency collapse — every union branch must read
    InMemoryTableScan, so the corpus parquet materializes once (on
    first cache fill) and never again. (FileScan occurrences in the
    plan STRING can't be counted here: each InMemoryTableScan prints
    its cached lineage, so the scan text repeats without re-reading.)
    """
    plan = _executed_plan(queries["bpe_train_loop"](spark, sf_dir))
    assert plan.count("InMemoryTableScan") >= 3
    assert "CartesianProduct" not in plan
    # the merge enters each rewrite as a broadcast, never a shuffle join
    assert "SortMergeJoin" not in plan


def test_substring_dedup_single_gram_shuffle(queries, spark, sf_dir):
    """Passage dedup (r13 optimization): occurrence counts come from a
    count window over the compact md5 gram key — ONE evaluation of the
    tokenize+explode+md5 gram pipeline and ONE keyed exchange on g.
    (The old groupBy+join-back form referenced the gram pipeline on
    both join sides, evaluating it twice and shuffling the gram set
    through two exchanges.) The window partitions on g — per-gram
    groups, the same distribution the join used — never a
    single-partition corpus-wide window."""
    plan = _executed_plan(queries["dedup_substring_passages"](spark, sf_dir))
    final = plan.split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in final
    assert "Window" in final
    assert "SortMergeJoin" not in final and "ShuffledHashJoin" not in final
    assert final.count("Exchange hashpartitioning(g#") == 1
    assert final.count("FileScan parquet") == 1  # grams evaluated once
    assert "Exchange SinglePartition" not in final


def test_gopher_and_audio_chunks_are_narrow(queries, spark, sf_dir):
    """Both run entirely inside the scan stage: ZERO exchanges — any
    shuffle appearing here means the narrow-pass promise broke."""
    for name in ("text_gopher_rules", "multimodal_audio_chunks"):
        plan = _executed_plan(queries[name](spark, sf_dir))
        assert "Exchange" not in plan, name


def test_quality_lang_filter_broadcasts_thresholds(queries, spark, sf_dir):
    """The per-language p25 table must come back as a broadcast, never
    a corpus-sized shuffle join."""
    plan = _executed_plan(queries["pipeline_quality_lang_filter"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_windowed_topk_ranks_collapsed_input(queries, spark, sf_dir):
    """The rank window's input is the pre-collapsed window-by-type
    count table (map-side combinable aggregate BEFORE the window) —
    never raw events."""
    plan = _executed_plan(queries["events_windowed_topk"](spark, sf_dir))
    assert "Window" in plan and "HashAggregate" in plan
    # partial aggregation must appear below the window: the plan string
    # lists Window above the final aggregate pair
    assert plan.index("Window") < plan.index("HashAggregate")
    assert "Exchange SinglePartition" not in plan


def test_hll_set_and_triangles_plan_shape(queries, spark, sf_dir):
    """Register merge is a bounded (<=2m row) join; triangle counting
    is pure equi-joins — neither may degrade into a cartesian, and the
    sketch path must not shuffle anything corpus-sized after the
    map-side register collapse."""
    plan = _executed_plan(queries["hll_set_algebra"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    plan2 = _executed_plan(queries["graph_triangle_count"](spark, sf_dir))
    assert "CartesianProduct" not in plan2
    # the only nested-loop joins allowed are the 1-row final-assembly
    # crossJoin(broadcast(...)) pair — wedge/membership joins must be
    # hash equi-joins (a data-sized BNLJ would be the degree^2 blowup).
    # AQE prints final + initial plans; count the final section only.
    final2 = plan2.split("== Initial Plan ==")[0]
    assert final2.count("BroadcastNestedLoopJoin") <= 2


@pytest.mark.parametrize(
    "name",
    [
        "orders_basket_pairs",
        "embedding_gram_matrix",
        "pipeline_byte_balanced_shards",
        "ivm_join_delta",
        "join_fuzzy_part_names",
        "dedup_cluster_size_hist",
    ],
)
def test_round8_ops_no_cartesian(queries, spark, sf_dir, name):
    # the r8 pair-generating / delta-joining families are keyed or
    # broadcast BY DESIGN — none may degrade into a cartesian
    plan = _executed_plan(queries[name](spark, sf_dir))
    assert "CartesianProduct" not in plan, name


def test_gram_matrix_single_dimension_sized_exchange(queries, spark, sf_dir):
    # the nested-posexplode Gram matrix must stay join-free with ONE
    # keyed exchange (the (i,j) aggregation) — the self-join
    # formulation would shuffle the corpus twice and join it. A
    # round-robin repartition is allowed: ensure_parallelism splits the
    # single-file scan so the dim^2 posexplode doesn't single-thread
    # (round 12); it carries no key and cannot hide a join shuffle.
    plan = _executed_plan(queries["embedding_gram_matrix"](spark, sf_dir))
    assert "Join" not in plan
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") <= 1
    # r12 ADVICE: Spark prints round-robin as the case-class toString
    # "RoundRobinPartitioning(...)" (capitalized), unlike the
    # Expression prettyName "hashpartitioning" — a lowercase match is
    # always 0 and the cap never binds
    assert final.count("Exchange RoundRobinPartitioning") <= 1
    assert "roundrobin" not in final  # guard the guard: no lowercase form


def test_winnowing_fp_plan_shape(queries, spark, sf_dir):
    # r12 verdict item 6: pin winnowing fingerprints the way the gram
    # matrix is pinned. The whole operator is one narrow scan-stage
    # pass (gram hashes -> window minima -> distinct-unnest): zero
    # joins, zero KEYED exchanges; at most one unkeyed round-robin
    # (ensure_parallelism splitting a single-file scan — a no-op on a
    # well-split 100 TB scan). A keyed exchange or join appearing here
    # means someone turned the per-doc pass into a shuffle.
    plan = _executed_plan(queries["dedup_winnowing_fp"](spark, sf_dir))
    assert "Join" not in plan
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Exchange hashpartitioning") == 0
    assert final.count("Exchange RoundRobinPartitioning") <= 1
    assert "roundrobin" not in final
    assert "Exchange SinglePartition" not in final


def test_winnowing_overlap_plan_shape(queries, spark, sf_dir):
    # the pairing half: one broadcast anti-join (hot-fp cap), the pair
    # join, and the pair-keyed count agg — never a cartesian, never a
    # single-partition collapse of the pair set
    plan = _executed_plan(queries["dedup_winnowing_overlap"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    final = plan.split("== Initial Plan ==")[0]
    assert "Exchange SinglePartition" not in final


def test_byte_shards_no_corpus_single_partition(queries, spark, sf_dir):
    # the distributed prefix sum may single-partition ONLY the 64-row
    # bucket-offset frame: the doc-level window must stay bucket-keyed
    plan = _executed_plan(
        queries["pipeline_byte_balanced_shards"](spark, sf_dir)
    )
    # AQE prints final + "== Initial Plan ==" sections; pin the final
    final = plan.split("== Initial Plan ==")[0]
    # window over buckets is hashpartitioned; exactly one
    # SinglePartition exchange (the 64-row offset table) is allowed
    assert final.count("Exchange SinglePartition") <= 1
    assert "hashpartitioning(bucket" in final
