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
# driver-oracle evidence. Round-13 window (executes the r12 verdict,
# item 2 — grade the 6 r12 additions, then the r7 cohort, one canary
# per family):
#
#   tier (a) — ALL 6 zero-driver-evidence queries (the r12
#   NEXT_WINDOW_PLAN: chunk-level ANN retrieval, the contamination
#   funnel stage, the hashed linear quality classifier, both
#   winnowing rows, the streaming classifier). chunk_ann_topk's
#   graded path also gained the shared candidate-mass fail-fast this
#   round (r12 verdict item 1) — its grade doubles as the
#   results-neutrality proof on the graded entry point.
#
#   tier (b) — the FULL r7 cohort (37 rows, 6 rounds stale — the
#   oldest driver evidence in the registry): the scalar-function
#   families (string/math/date/regexp/like/case/null), the join
#   suite (inner/left/right/semi/anti/multiway), agg shapes
#   (group/having, rollup, cube, count-distinct, percentiles,
#   variance), subqueries (IN/EXISTS/CTE), sets, window topn,
#   order-by/limit, the reference-parity rows (coercion, comparison,
#   int division, projection, string filter, order/limit),
#   merge-upsert maintenance, tpch q3/q5, sequence packing and
#   unigram quality.
#
#   tier (c) — 7 fillers under the standing one-canary-per-family
#   rule for families (a)+(b) leave uncovered, then stalest-first:
#   udf (udaf_grouped_median, r11 — the family's stalest row),
#   similarity (embedding_cosine_topk, r8 — ALSO regrades the
#   brute-force baseline that gained the mass guard this round),
#   layout (manifest_bloom_scan, r8), sources
#   (custom_datasource_scan, r11), then the three stalest remaining
#   r8 rows for breadth: orc_scan, multimodal_audio_chunks,
#   graph_triangle_count (hll_set_algebra and events_tumbling_window
#   are the r8 remainder, first in line for r14 — their families
#   carry fresh r12 evidence elsewhere).
#
# tools/coverage_counts.py asserts tier (a) matches the live
# zero-evidence set; run it at round close and after every addition.
#
# r14 window sketch (write the final plan after the r13 artifact
# lands): tier (a) = NEXT_WINDOW_PLAN below (the r13 additions);
# then the r8 cohort remainder (~36 rows, 6 rounds stale by r14)
# under the standing family-canary rules; hll_set_algebra +
# events_tumbling_window lead the fillers.
GRADE_ORDER: tuple[str, ...] = (
    # --- tier (a): the r12 additions (zero driver evidence) ---
    "docs_chunk_ann_topk",
    "pipeline_filter_funnel_contam",
    "text_quality_classifier",
    "dedup_winnowing_fp",
    "dedup_winnowing_overlap",
    "stream_quality_filter_agg",
    # --- tier (b): the full r7 cohort (stalest evidence) ---
    "case_when_buckets",
    "count_distinct",
    "cte_segment_totals",
    "cube_agg",
    "date_functions",
    "distinct_values",
    "exists_subquery",
    "group_having",
    "in_subquery",
    "join_anti",
    "join_inner_agg",
    "join_left_with_zeros",
    "join_multiway_star",
    "join_right",
    "join_semi",
    "like_patterns",
    "math_functions",
    "merge_upsert_orders",
    "null_handling",
    "order_by_limit_topk",
    "percentile_stats",
    "pipeline_pack_sequences",
    "ref_coercion_mixed",
    "ref_comparison_ops",
    "ref_int_division",
    "ref_order_by_limit",
    "ref_projection_unnamed",
    "ref_string_filter",
    "regexp_ops",
    "rollup_agg",
    "set_intersect",
    "string_functions",
    "text_unigram_quality",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "variance_exact",
    "window_rank_topn",
    # --- tier (c): fillers, one canary per uncovered family, then
    # --- stalest-first breadth ---
    "udaf_grouped_median",
    "embedding_cosine_topk",
    "manifest_bloom_scan",
    "custom_datasource_scan",
    "orc_scan",
    "multimodal_audio_chunks",
    "graph_triangle_count",
)

# Explicit next-round grading tier (r8 verdict items 1 + 4): every
# registered query with zero driver evidence must appear either in
# GRADE_ORDER (graded this round) or here (first in line next round) —
# asserted by tools/coverage_counts.py and
# tests/test_queries_arrays.py, so a late-session addition can never
# silently fall out of the evidence pipeline again (the r8 plan
# comment omitted dedup_threshold_sensitivity exactly that way).
# Entering r13 this list is exactly the r13 additions (cap ~6 per the
# r11 verdict): each new query appends itself here at registration.
NEXT_WINDOW_PLAN: tuple[str, ...] = (
    # round-13 additions (zero driver evidence until the r14 window;
    # cap ~6 per the standing rule):
    "pipeline_decontaminate_benchmark",
    "pipeline_decontaminate_winnow",
    "stream_decontaminate_ingest",
    "perceptron_train_weights",
    "source_similarity_minhash",
    "pipeline_decontaminate_chunks",
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
