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
# driver-oracle evidence. Round-11 window (executes the r10 verdict,
# item 1 — grade the 4 NEXT_WINDOW_PLAN queries, spend the rest on
# the stalest driver evidence, one canary per family):
#
#   tier (a) — ALL 4 zero-driver-evidence queries (the r10
#   NEXT_WINDOW_PLAN: DSIR, jaccard-auto, source divergence, filter
#   funnel). filter_funnel and source_divergence also changed
#   implementation this round (degenerate-input coalesce; BIGINT
#   overflow guard), so their grades double as regrades.
#
#   tier (b) — the one r10-graded query whose GRADED PATH gained code
#   this round: dedup_ngram_jaccard now computes the Σc_s²
#   pairing-row budget guard before pairing (r10 verdict item 3) —
#   the guard is results-neutral by design, and this row proves it
#   where it counts. (embedding_cosine_pairs/dedup_embedding_cosine
#   gained the analogous count()-only guard; both r10-green, both
#   replayed against their oracles every pytest run — regrading all
#   three would cost canary slots for a results-neutral pre-check.)
#
#   tier (c) — the 7 remaining r4-graded rows (7 rounds stale, the
#   oldest evidence in the registry), promised by the r10 plan:
#   date_arithmetic, array_split_ops, pivot_returnflag,
#   explode_word_count, time_rollup_multi, embedding_centroids,
#   approx_sketches_within_bounds.
#
#   tier (d) — the FULL r5 cohort (28 rows, 6 rounds stale): the 12
#   stale TPC-H shapes, the PQ/IVF ANN tier, the r5 pipeline ops,
#   array/map/struct function rows, join_full_outer +
#   bucketed_colocated_join, heavy_hitters_freq.
#
#   tier (e) — per-family canaries for families (a)-(d) leave
#   uncovered, stalest-first: sources (custom_datasource_scan, r6),
#   subquery (recursive_cte_hierarchy, r6), maintenance
#   (snapshot_cdc_diff, r6), window (window_rank_family, r6), scan
#   (csv_scan, r7), sets (set_union_all, r7), streaming
#   (stream_dedup_watermark, r7), layout (zorder_layout_scan, r7),
#   udf (udaf_grouped_median, r8), retrieval
#   (docs_bm25_self_retrieval, r9 — the family's stalest row;
#   docs_bm25_topk was the r10 standing canary).
#
# tools/coverage_counts.py asserts tier (a) matches the live
# zero-evidence set; run it at round close and after every addition.
#
# r12 window sketch (write the final plan after the r11 artifact
# lands): tier (a) = NEXT_WINDOW_PLAN below (the r11 additions);
# then the r6 cohort (36 rows minus the 4 graded here as tier-(e)
# canaries — 6 rounds stale by r12) under the standing family-canary
# rules; csv/json/orc + set/stream r7 rows fill remaining slots.
GRADE_ORDER: tuple[str, ...] = (
    # --- tier (a): the r10 additions (zero driver evidence) ---
    "pipeline_dsir_resample",
    "dedup_ngram_jaccard_auto",
    "corpus_source_divergence",
    "pipeline_filter_funnel",
    # --- tier (b): graded-path changed this round ---
    "dedup_ngram_jaccard",
    # --- tier (c): the last r4-graded rows (stalest evidence) ---
    "date_arithmetic",
    "array_split_ops",
    "pivot_returnflag",
    "explode_word_count",
    "time_rollup_multi",
    "embedding_centroids",
    "approx_sketches_within_bounds",
    # --- tier (d): the full r5 cohort ---
    "tpch_q2_min_cost_supplier",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q9_nation_year_profit",
    "tpch_q11_important_stock",
    "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_count",
    "tpch_q17_small_quantity_revenue",
    "tpch_q20_excess_supplier",
    "tpch_q21_waiting_supplier",
    "tpch_q22_global_sales_opportunity",
    "array_higher_order",
    "map_ops",
    "struct_ops",
    "join_full_outer",
    "bucketed_colocated_join",
    "heavy_hitters_freq",
    "embedding_ivf_topk_approx",
    "embedding_ivfpq_topk",
    "embedding_pq_topk",
    "text_fingerprint",
    "text_repetition_score",
    "pipeline_doc_chunks",
    "pipeline_hash_split",
    "pipeline_pii_redact",
    "pipeline_sample_per_key",
    "pipeline_stratified_sample",
    # --- tier (e): per-family canaries, stalest-first ---
    "custom_datasource_scan",
    "recursive_cte_hierarchy",
    "snapshot_cdc_diff",
    "window_rank_family",
    "csv_scan",
    "set_union_all",
    "stream_dedup_watermark",
    "zorder_layout_scan",
    "udaf_grouped_median",
    "docs_bm25_self_retrieval",
)

# Explicit next-round grading tier (r8 verdict items 1 + 4): every
# registered query with zero driver evidence must appear either in
# GRADE_ORDER (graded this round) or here (first in line next round) —
# asserted by tools/coverage_counts.py and
# tests/test_queries_arrays.py, so a late-session addition can never
# silently fall out of the evidence pipeline again (the r8 plan
# comment omitted dedup_threshold_sensitivity exactly that way).
# Entering r10 this list is exactly the r10 additions (cap ~10 per the
# r9 verdict): each new query appends itself here at registration.
NEXT_WINDOW_PLAN: tuple[str, ...] = (
    # round-11 additions (zero driver evidence until the r12 window;
    # cap ~6 per the r10 verdict):
    "pipeline_chunk_token_windows",
    "dedup_url_canonical",
    "text_vocab_coverage_curve",
    "pipeline_context_overflow",
    "pipeline_token_budget_plan",
    "docs_rm3_expansion_retrieval",
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
