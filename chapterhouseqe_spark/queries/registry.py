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
# driver-oracle evidence. Round-12 window (executes the r11 verdict,
# item 2 — grade the 6 NEXT_WINDOW_PLAN queries, then the r6 cohort,
# one canary per family):
#
#   tier (a) — ALL 6 zero-driver-evidence queries (the r11
#   NEXT_WINDOW_PLAN: token-window chunking, URL-canonical dedup,
#   vocab coverage curve, context overflow, token-budget planner,
#   RM3 expansion retrieval). token_budget_plan's graded path also
#   changed this round (ADVICE item 1: the overflow pre-pass now
#   bounds the budget and BOTH div-mod intermediates), and RM3's
#   gained the candidate-mass fail-fast (r11 verdict item 3) — their
#   grades double as regrades proving both guards results-neutral.
#
#   tier (b) — the other three retrieval rows, whose shared scoring
#   core (bm25_scores) gained the candidate-mass fail-fast this
#   round: the guard only pre-counts sum_t df(t)*qcount(t) and
#   raises over budget, so these grades prove it results-neutral on
#   every entry point (docs_bm25_topk r10, docs_bm25_self_retrieval
#   r11, docs_hybrid_rrf_retrieval r9).
#
#   tier (c) — the FULL r6 cohort (32 rows, 6 rounds stale — the
#   oldest driver evidence in the registry): sketch family
#   (hll/cms/cardinality/quantile), the k-means/PQ training tier,
#   graph ops (pagerank, asof clicks), events suite, BPE rows,
#   IVM/time-travel maintenance, the r6 pipeline ops, tpch_q1 and
#   unpivot/lateral.
#
#   tier (d) — 9 fillers, stalest-first under the standing
#   one-canary-per-family rule for families (a)-(c) leave uncovered:
#   scan (json_scan, r7), sources (named_table_scan, r7), window
#   (window_lag_running, r7 — the r6 cohort has no window row), sets
#   (set_except, r7), subquery (scalar_subquery, r7), udf
#   (udf_pandas_charge, r7), multimodal (multimodal_frame_sample,
#   r7), layout (manifest_pruned_scan, r8 — the family's stalest
#   row), and streaming (stream_source_replay_agg, r8 — no r7 stream
#   row exists; maintenance is covered inside the r6 cohort by
#   snapshot_time_travel + ivm_incremental_rollup).
#
# tools/coverage_counts.py asserts tier (a) matches the live
# zero-evidence set; run it at round close and after every addition.
#
# r13 window sketch (write the final plan after the r12 artifact
# lands): tier (a) = NEXT_WINDOW_PLAN below (the r12 additions);
# then the r7 cohort remainder (~35 rows, 6 rounds stale by r13)
# under the standing family-canary rules; orc_scan + multimodal
# r8 rows fill remaining slots.
GRADE_ORDER: tuple[str, ...] = (
    # --- tier (a): the r11 additions (zero driver evidence) ---
    "pipeline_chunk_token_windows",
    "dedup_url_canonical",
    "text_vocab_coverage_curve",
    "pipeline_context_overflow",
    "pipeline_token_budget_plan",
    "docs_rm3_expansion_retrieval",
    # --- tier (b): graded path gained the candidate-mass guard ---
    "docs_bm25_topk",
    "docs_bm25_self_retrieval",
    "docs_hybrid_rrf_retrieval",
    # --- tier (c): the full r6 cohort (stalest evidence) ---
    "ann_recall_eval",
    "asof_join_clicks",
    "bloom_prefilter_join",
    "bpe_apply_merge",
    "bpe_pair_counts",
    "cardinality_sketch",
    "cms_heavy_hitters",
    "data_quality_report",
    "dedup_incremental_batch",
    "dedup_semantic_semdedup",
    "embedding_ann_rerank",
    "embedding_ivf_lloyd_topk",
    "events_cohort_retention",
    "events_funnel_stages",
    "events_resample_gapfill",
    "events_sessionization",
    "hll_cardinality",
    "hll_grouped_cardinality",
    "ivm_incremental_rollup",
    "kmeans_sampled_train_assign",
    "kmeans_train_assign",
    "lateral_topn_per_key",
    "pagerank_supplier_graph",
    "pipeline_length_buckets",
    "pipeline_mixing_weights",
    "pipeline_segment_dedup",
    "pipeline_weighted_sample",
    "pq_train_codebooks",
    "quantile_sketch_hist",
    "snapshot_time_travel",
    "tpch_q1_pricing_summary",
    "unpivot_measures",
    # --- tier (d): fillers, one canary per uncovered family ---
    "json_scan",
    "named_table_scan",
    "window_lag_running",
    "set_except",
    "scalar_subquery",
    "udf_pandas_charge",
    "multimodal_frame_sample",
    "manifest_pruned_scan",
    "stream_source_replay_agg",
)

# Explicit next-round grading tier (r8 verdict items 1 + 4): every
# registered query with zero driver evidence must appear either in
# GRADE_ORDER (graded this round) or here (first in line next round) —
# asserted by tools/coverage_counts.py and
# tests/test_queries_arrays.py, so a late-session addition can never
# silently fall out of the evidence pipeline again (the r8 plan
# comment omitted dedup_threshold_sensitivity exactly that way).
# Entering r12 this list is exactly the r12 additions (cap ~6 per the
# r11 verdict): each new query appends itself here at registration.
NEXT_WINDOW_PLAN: tuple[str, ...] = (
    # round-12 additions (zero driver evidence until the r13 window;
    # cap ~6 per the r11 verdict):
    "docs_chunk_ann_topk",
    "pipeline_filter_funnel_contam",
    "text_quality_classifier",
    "dedup_winnowing_fp",
    "dedup_winnowing_overlap",
    "stream_quality_filter_agg",
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
