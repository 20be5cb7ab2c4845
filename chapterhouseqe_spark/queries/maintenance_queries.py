"""Table-maintenance queries with DuckDB oracles.

Covers the mutation/layout surface a lake needs beyond the reference's
append-only materialization (ref: src/operators/materialize_files.rs):
CDC MERGE, SCD2 history compaction, hive-partitioned layout with
planning-time pruning, and the ORC interchange format.

The change feeds are DERIVED deterministically from the base tables
(modular key predicates), so the oracle can reproduce the merged state
with plain SQL instead of replaying the operator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chapterhouseqe_spark.queries.core_sql import _format_dir, _ref_engine, t
from chapterhouseqe_spark.queries.registry import (
    dsum,
    o_dsum,
    o_md5_int,
    o_ts_str,
    query,
    ts_str,
)


@query(
    "merge_upsert_orders",
    oracle=f"""
    WITH merged AS (
      SELECT o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 7 <> 0
      UNION ALL
      SELECT 'U' AS o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) + 5 AS DOUBLE)
               AS o_totalprice
      FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey % 3 <> 0
    )
    SELECT o_orderstatus, COUNT(*) AS cnt,
           {o_dsum('o_totalprice')} AS total_price
    FROM merged GROUP BY o_orderstatus
    """,
    tags=("maintenance", "merge"),
    doc="copy-on-write MERGE (upsert + tombstone deletes) of a derived "
    "change feed into orders; one hash shuffle total "
    "(operators/maintenance.py:merge_upsert)",
)
def merge_upsert_orders(spark, sf_dir):
    from chapterhouseqe_spark.operators.maintenance import merge_upsert

    orders = t(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    base = orders.withColumn("__ver", F.lit(0))
    changes = (
        orders.filter(key % 7 == 0)
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn(
            "o_totalprice",
            (
                F.col("o_totalprice").cast("decimal(12,2)")
                + F.lit(5).cast("decimal(12,2)")
            ).cast("double"),
        )
        .withColumn("__ver", F.lit(1))
        .withColumn("__is_delete", key % 3 == 0)
    )
    merged = merge_upsert(
        base, changes, ["o_orderkey"], version_col="__ver", delete_col="__is_delete"
    ).drop("__ver")
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum(F.col("o_totalprice")).alias("total_price"),
    )


@query(
    "scd2_user_event_history",
    oracle=f"""
    WITH chg AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
             row_number() OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ),
    pts AS (
      -- rn=1 OR IS DISTINCT FROM mirrors the operator's explicit
      -- first-row flag + eqNullSafe change test exactly: a non-null ->
      -- NULL transition is a change point in both engines (plain <>
      -- would drop it), and a first row whose attr is NULL still opens
      -- an interval (IS DISTINCT FROM alone would drop NULL-vs-NULL).
      SELECT * FROM chg WHERE rn = 1 OR prev IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type,
           {o_ts_str('ts')} AS valid_from_s,
           COALESCE({o_ts_str("lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)")},
                    'current') AS valid_to_s
    FROM pts
    """,
    tags=("maintenance", "scd2"),
    doc="SCD2 compaction: per-user event_type change log → half-open "
    "validity intervals, one window pass, no self-join "
    "(operators/maintenance.py:scd2_intervals)",
)
def scd2_user_event_history(spark, sf_dir):
    from chapterhouseqe_spark.operators.maintenance import scd2_intervals

    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    hist = scd2_intervals(
        ev, ["user_id"], "ts", ["event_type"], tiebreak_cols=["event_id"]
    )
    return hist.select(
        "user_id",
        "event_type",
        ts_str(F.col("valid_from")).alias("valid_from_s"),
        F.coalesce(ts_str(F.col("valid_to")), F.lit("current")).alias("valid_to_s"),
    )


@query(
    "partition_pruned_scan",
    oracle=f"""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           COUNT(*) AS cnt, {o_dsum('o_totalprice')} AS total_price
    FROM orders WHERE o_orderpriority = '1-URGENT'
    GROUP BY month
    """,
    tags=("maintenance", "layout", "pruning"),
    doc="hive-partitioned write (orders by o_orderpriority) + scan whose "
    "partition filter prunes 4/5 directories at planning time "
    "(operators/maintenance.py:write_partitioned); pruning itself is "
    "pinned by tests/test_maintenance.py",
)
def partition_pruned_scan(spark, sf_dir):
    path = _partitioned_orders_dir(spark, sf_dir)
    scan = spark.read.parquet(path).filter(F.col("o_orderpriority") == "1-URGENT")
    return scan.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum(F.col("o_totalprice")).alias("total_price"),
    )


def _partitioned_orders_dir(spark, sf_dir) -> str:
    """Deterministic one-time hive-partitioned copy of orders.

    Keyed by the source's content fingerprint (mtime+size), not just the
    path — a regenerated dataset invalidates the cached copy.
    """
    import os

    from chapterhouseqe_spark.operators.maintenance import write_partitioned
    from chapterhouseqe_spark.queries.core_sql import _source_fingerprint

    key = _source_fingerprint(sf_dir, "orders")
    out = f"/tmp/chqe_partitioned/{key}/orders_by_priority"
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        write_partitioned(t(spark, sf_dir, "orders"), out, ["o_orderpriority"])
    return out


@query(
    "orc_scan",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
    tags=("source", "orc"),
    doc="ORC source through read_files (type-preserving columnar "
    "interchange; sql/read_files.py:load_glob)",
)
def orc_scan(spark, sf_dir):
    path = _format_dir(spark, sf_dir, "orc", "supplier")
    eng = _ref_engine(spark, sf_dir)
    df = eng.dataframe_for(
        f"select * from read_files('{path}/*.orc')", mode="reference"
    )
    return df.select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")


@query(
    "ivm_incremental_rollup",
    # oracle recomputes the maintained view DIRECTLY from the final
    # table state (base minus deletes plus inserts) — the IVM result
    # must be indistinguishable from a full recompute.
    oracle=f"""
    WITH base AS (
      SELECT * FROM orders WHERE o_orderkey % 7 <> 0
    ),
    final AS (
      SELECT o_orderstatus, o_totalprice FROM base WHERE o_orderkey % 5 <> 0
      UNION ALL
      SELECT 'U' AS o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) + 5 AS DOUBLE)
        FROM orders WHERE o_orderkey % 7 = 0
    )
    SELECT o_orderstatus, COUNT(*) AS n,
           {o_dsum('o_totalprice')} AS total_price
    FROM final GROUP BY o_orderstatus
    """,
    tags=("maintenance", "ivm"),
    doc="incremental view maintenance: a SUM/COUNT rollup state is "
    "delta-maintained under signed inserts+deletes without rescanning "
    "the base (operators/maintenance.py:rollup_state/apply_rollup_delta); "
    "result must equal a full recompute over the final table state",
)
def ivm_incremental_rollup(spark, sf_dir):
    from chapterhouseqe_spark.operators.maintenance import (
        apply_rollup_delta,
        rollup_state,
    )

    orders = t(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    base = orders.filter(key % 7 != 0)
    state = rollup_state(base, ["o_orderstatus"], ["o_totalprice"])
    deletes = base.filter(key % 5 == 0).select(
        "o_orderstatus", "o_totalprice"
    ).withColumn("__sign", F.lit(-1))
    inserts = (
        orders.filter(key % 7 == 0)
        .select(
            F.lit("U").alias("o_orderstatus"),
            (
                F.col("o_totalprice").cast("decimal(12,2)")
                + F.lit(5).cast("decimal(12,2)")
            ).cast("double").alias("o_totalprice"),
        )
        .withColumn("__sign", F.lit(1))
    )
    new_state = apply_rollup_delta(
        state,
        deletes.unionByName(inserts),
        ["o_orderstatus"],
        ["o_totalprice"],
        "__sign",
    )
    return new_state.select(
        "o_orderstatus",
        F.col("n"),
        F.col("sum_o_totalprice").cast("double").alias("total_price"),
    )


@query(
    "zorder_layout_scan",
    oracle=f"""
    SELECT p_brand, COUNT(*) AS cnt,
           {o_dsum('p_retailprice')} AS total_price
    FROM part
    WHERE p_size BETWEEN 10 AND 20
      AND p_retailprice BETWEEN 910 AND 960
    GROUP BY p_brand
    """,
    tags=("maintenance", "layout", "zorder"),
    doc="Z-ordered copy of part on (p_size, p_retailprice) + a scan "
    "filtered on BOTH dimensions; the result is layout-independent (the "
    "oracle reads the raw table) while the multi-dim file-skipping "
    "property itself is pinned by tests/test_layout.py "
    "(operators/layout.py:zorder_write)",
)
def zorder_layout_scan(spark, sf_dir):
    path = _zordered_part_dir(spark, sf_dir)
    scan = spark.read.parquet(path).filter(
        F.col("p_size").between(10, 20)
        & F.col("p_retailprice").between(910, 960)
    )
    return scan.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum(F.col("p_retailprice")).alias("total_price"),
    )


def _zordered_part_dir(spark, sf_dir) -> str:
    """Deterministic one-time z-ordered copy of part (content-keyed)."""
    import os

    from chapterhouseqe_spark.operators.layout import zorder_write
    from chapterhouseqe_spark.queries.core_sql import _source_fingerprint

    key = _source_fingerprint(sf_dir, "part")
    out = f"/tmp/chqe_zorder/{key}/part_by_size_price"
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        zorder_write(
            t(spark, sf_dir, "part"), out, ["p_size", "p_retailprice"], num_files=8
        )
    return out


@query(
    "data_quality_report",
    oracle="""
    SELECT 'orderkey_positive' AS rule, COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN o_orderkey > 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_fail
    FROM orders
    UNION ALL
    SELECT 'priority_enum', COUNT(*),
           CAST(SUM(CASE WHEN o_orderpriority IN
               ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')
               THEN 0 ELSE 1 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'status_enum', COUNT(*),
           CAST(SUM(CASE WHEN o_orderstatus IN ('F','O','P') THEN 0 ELSE 1 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'totalprice_range', COUNT(*),
           CAST(SUM(CASE WHEN o_totalprice > 0 AND o_totalprice < 1000000
               THEN 0 ELSE 1 END) AS BIGINT)
    FROM orders
    """,
    tags=("maintenance", "quality"),
    doc="declarative data-quality gate: 4 constraint rules (range, enums, "
    "positivity) evaluated in ONE aggregation pass over orders — one "
    "column-pruned scan regardless of rule count "
    "(operators/checks.py:check_rules)",
)
def data_quality_report(spark, sf_dir):
    from chapterhouseqe_spark.operators.checks import check_rules

    o = t(spark, sf_dir, "orders")
    return check_rules(
        o,
        {
            "orderkey_positive": F.col("o_orderkey") > 0,
            "totalprice_range": (F.col("o_totalprice") > 0)
            & (F.col("o_totalprice") < 1_000_000),
            "status_enum": F.col("o_orderstatus").isin("F", "O", "P"),
            "priority_enum": F.col("o_orderpriority").isin(
                "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"
            ),
        },
    )


@query(
    "snapshot_time_travel",
    oracle="""
    SELECT 1 AS snap_v, n_nationkey, n_name FROM nation
    UNION ALL
    SELECT 2 AS snap_v, n_nationkey,
           CASE WHEN n_nationkey % 3 = 0 THEN n_name || '_X' ELSE n_name END
    FROM nation
    """,
    tags=("maintenance", "snapshot"),
    doc="table snapshots with time travel: two committed versions of a "
    "dimension table (v2 = deterministic update of v1) read back side by "
    "side via pinned-version reads; pointer-swap commit protocol "
    "(operators/maintenance.py:write_snapshot/read_snapshot)",
)
def snapshot_time_travel(spark, sf_dir):
    from chapterhouseqe_spark.operators.maintenance import read_snapshot

    path = _snapshot_nation_dir(spark, sf_dir)
    v1 = read_snapshot(spark, path, version=1).select(
        F.lit(1).alias("snap_v"), "n_nationkey", "n_name"
    )
    # latest (no pin) must resolve to v2 through the _LATEST pointer
    v2 = read_snapshot(spark, path).select(
        F.lit(2).alias("snap_v"), "n_nationkey", "n_name"
    )
    return v1.unionByName(v2)


def _snapshot_nation_dir(spark, sf_dir) -> str:
    """Deterministic one-time two-version snapshot table of nation."""
    import os

    from chapterhouseqe_spark.operators.maintenance import (
        _committed_latest,
        write_snapshot,
    )
    from chapterhouseqe_spark.queries.core_sql import _source_fingerprint

    key = _source_fingerprint(sf_dir, "nation")
    out = f"/tmp/chqe_snapshots/{key}/nation_versions"
    # Guard on the COMMITTED version count, not mere _LATEST existence:
    # a crash after v1's commit but before v2's leaves _LATEST=1, and
    # write_snapshot itself reclaims any uncommitted orphan dirs.
    committed = _committed_latest(out) if os.path.isdir(out) else 0
    if committed < 2:
        os.makedirs(out, exist_ok=True)
        base = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
        if committed < 1:
            write_snapshot(base, out)
        v2 = base.withColumn(
            "n_name",
            F.when(
                F.col("n_nationkey") % 3 == 0, F.concat(F.col("n_name"), F.lit("_X"))
            ).otherwise(F.col("n_name")),
        )
        write_snapshot(v2, out)
    return out


@query(
    "manifest_pruned_scan",
    oracle=f"""
    SELECT COUNT(*) AS cnt,
           {o_dsum('l_extendedprice')} AS total_price,
           {o_dsum('l_quantity')} AS total_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l_shipdate <= TIMESTAMP '1997-03-31 23:59:59'
    """,
    tags=("maintenance", "layout", "pruning", "manifest"),
    doc="manifest-based file skipping (the Iceberg/Delta manifest core "
    "from vanilla parquet): lineitem is cluster-written on l_shipdate "
    "into 8 disjoint-range files, a footer-derived _MANIFEST.json "
    "indexes per-file min/max, and a one-month range query reads ONLY "
    "the intersecting files — the planner consults one small JSON "
    "instead of LISTing the table (the operation object stores "
    "throttle at 100 TB). Residual filter keeps results exact; "
    "pruning effectiveness pinned in tests/test_layout.py "
    "(operators/layout.py:write_manifest/manifest_scan)",
)
def manifest_pruned_scan(spark, sf_dir):
    from datetime import datetime

    from chapterhouseqe_spark.operators.layout import manifest_scan

    path = _manifest_lineitem_dir(spark, sf_dir)
    df, _n_read, _n_total = manifest_scan(
        spark,
        path,
        "l_shipdate",
        datetime(1997, 3, 1),
        datetime(1997, 3, 31, 23, 59, 59),
    )
    return df.agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum(F.col("l_extendedprice")).alias("total_price"),
        dsum(F.col("l_quantity")).alias("total_qty"),
    )


def _manifest_lineitem_dir(spark, sf_dir) -> str:
    """One-time shipdate-clustered lineitem copy + manifest, cached by
    the source's content fingerprint (same idempotency convention as
    _partitioned_orders_dir)."""
    import os

    from chapterhouseqe_spark.operators.layout import (
        cluster_write,
        write_manifest,
    )
    from chapterhouseqe_spark.queries.core_sql import _source_fingerprint

    key = _source_fingerprint(sf_dir, "lineitem")
    out = f"/tmp/chqe_manifest/{key}/lineitem_by_shipdate"
    if not os.path.exists(os.path.join(out, "_MANIFEST.json")):
        cluster_write(
            t(spark, sf_dir, "lineitem"), out, ["l_shipdate"], num_files=8
        )
        write_manifest(out, ["l_shipdate"], spark=spark)
    return out


@query(
    "snapshot_cdc_diff",
    oracle="""
    WITH v1 AS (SELECT n_nationkey, n_name FROM nation),
    v2 AS (
      SELECT n_nationkey,
             CASE WHEN n_nationkey % 4 = 0 THEN n_name || '_U'
                  ELSE n_name END AS n_name
      FROM nation WHERE n_nationkey <> 3
      UNION ALL
      SELECT n_nationkey + 100, 'NEW_' || CAST(n_nationkey AS VARCHAR)
      FROM nation WHERE n_nationkey < 3
    ),
    j AS (
      SELECT COALESCE(v1.n_nationkey, v2.n_nationkey) AS n_nationkey,
             v1.n_name AS old_n_name, v2.n_name AS new_n_name,
             v1.n_nationkey IS NULL AS ins, v2.n_nationkey IS NULL AS del
      FROM v1 FULL OUTER JOIN v2 ON v1.n_nationkey = v2.n_nationkey
    )
    SELECT n_nationkey,
           CASE WHEN ins THEN 'insert'
                WHEN del THEN 'delete'
                ELSE 'update' END AS change_type,
           old_n_name, new_n_name
    FROM j
    WHERE ins OR del OR old_n_name IS DISTINCT FROM new_n_name
    """,
    tags=("maintenance", "snapshot", "cdc"),
    doc="change-data feed between two committed snapshot versions "
    "(Delta CDF analog from plain versioned parquet): v2 deletes key "
    "3, updates every %4==0 name, inserts keys 100-102; the diff is "
    "ONE key-partitioned full-outer join emitting insert/delete/"
    "update rows with old/new values — no log replay, no window "
    "(operators/maintenance.py:snapshot_diff)",
)
def snapshot_cdc_diff(spark, sf_dir):
    from chapterhouseqe_spark.operators.maintenance import snapshot_diff

    path = _snapshot_cdc_dir(spark, sf_dir)
    return snapshot_diff(spark, path, 1, 2, ["n_nationkey"])


def _snapshot_cdc_dir(spark, sf_dir) -> str:
    """Deterministic two-version nation table with inserts, updates,
    AND deletes (richer than _snapshot_nation_dir, whose v2 only
    updates — kept separate so snapshot_time_travel's oracle stays
    stable)."""
    import os

    from chapterhouseqe_spark.operators.maintenance import (
        _committed_latest,
        write_snapshot,
    )
    from chapterhouseqe_spark.queries.core_sql import _source_fingerprint

    key = _source_fingerprint(sf_dir, "nation")
    out = f"/tmp/chqe_snapshots/{key}/nation_cdc_versions"
    committed = _committed_latest(out) if os.path.isdir(out) else 0
    if committed < 2:
        os.makedirs(out, exist_ok=True)
        base = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
        if committed < 1:
            write_snapshot(base, out)
        updated = base.filter(F.col("n_nationkey") != 3).select(
            "n_nationkey",
            F.when(
                F.col("n_nationkey") % 4 == 0, F.concat(F.col("n_name"), F.lit("_U"))
            )
            .otherwise(F.col("n_name"))
            .alias("n_name"),
        )
        inserts = base.filter(F.col("n_nationkey") < 3).select(
            (F.col("n_nationkey") + 100).alias("n_nationkey"),
            F.concat(F.lit("NEW_"), F.col("n_nationkey").cast("string")).alias(
                "n_name"
            ),
        )
        write_snapshot(updated.unionByName(inserts), out)
    return out


@query(
    "manifest_bloom_scan",
    oracle=f"""
    SELECT l_orderkey, COUNT(*) AS cnt,
           {o_dsum('l_extendedprice')} AS total_price
    FROM lineitem
    WHERE l_orderkey IN (1, 1000, 5999)
    GROUP BY l_orderkey
    """,
    tags=("maintenance", "layout", "pruning", "manifest"),
    doc="bloom-index file skipping for POINT lookups on a column the "
    "layout is NOT sorted by (the Delta bloom-filter-index idea on "
    "the same _MANIFEST.json): per-file blooms over l_orderkey's "
    "distinct values (shared replayable md5 family) admit only files "
    "that might contain the key; min/max zone maps are useless here "
    "because orderkeys scatter across every shipdate-clustered file. "
    "Residual equality filter keeps results exact — blooms only "
    "over-admit (operators/layout.py:write_manifest_blooms/"
    "manifest_point_scan)",
)
def manifest_bloom_scan(spark, sf_dir):
    from chapterhouseqe_spark.operators.layout import manifest_point_scan

    path = _manifest_bloom_dir(spark, sf_dir)
    parts = []
    for key in (1, 1000, 5999):
        df, _r, _t = manifest_point_scan(spark, path, "l_orderkey", key)
        parts.append(df.select("l_orderkey", "l_extendedprice"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum(F.col("l_extendedprice")).alias("total_price"),
    )


def _manifest_bloom_dir(spark, sf_dir) -> str:
    """The shipdate-clustered lineitem dir with l_orderkey blooms added
    to its manifest (idempotent: keyed on bloom_params presence)."""
    import json
    import os

    from chapterhouseqe_spark.operators.layout import write_manifest_blooms

    out = _manifest_lineitem_dir(spark, sf_dir)
    with open(os.path.join(out, "_MANIFEST.json")) as fh:
        man = json.load(fh)
    if "bloom_params" not in man:
        write_manifest_blooms(
            out, ["l_orderkey"], m_bits=1 << 18, n_hashes=3, spark=spark
        )
    return out


def _hll_num() -> str:
    from chapterhouseqe_spark.operators.sketches import _HLL_ALPHA_64

    return repr(_HLL_ALPHA_64 * 64 * 64 * float(1 << 56))


@query(
    "analyze_table_stats",
    oracle=f"""
    WITH melted AS (
      SELECT col, val FROM (
        SELECT 'o_custkey' AS col, CAST(o_custkey AS VARCHAR) AS val FROM orders
        UNION ALL
        SELECT 'o_orderstatus', o_orderstatus FROM orders
        UNION ALL
        SELECT 'o_orderpriority', o_orderpriority FROM orders
        UNION ALL
        SELECT 'o_orderdate', strftime(o_orderdate, '%Y-%m-%d') FROM orders
      )
    ),
    h AS (
      SELECT col, {o_md5_int('val')} AS h
      FROM melted WHERE val IS NOT NULL
    ),
    regs AS (
      SELECT col, h % 64 AS bucket,
             MAX(CASE WHEN h // 64 = 0 THEN 55
                      ELSE 55 - length(bin(h // 64)) END) AS M
      FROM h GROUP BY col, h % 64
    ),
    est AS (
      SELECT col,
             {_hll_num()} /
             CAST(COALESCE(SUM((CAST(1 AS BIGINT) << (56 - M))), CAST(0 AS BIGINT))
                  + (64 - COUNT(*)) * (CAST(1 AS BIGINT) << 56) AS DOUBLE) AS ndv_est
      FROM regs GROUP BY col
    ),
    base AS (
      SELECT col,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_nulls
      FROM melted GROUP BY col
    )
    SELECT b.col, b.n_rows, b.n_nulls, e.ndv_est
    FROM base b JOIN est e USING (col)
    """,
    tags=("maintenance", "sketch", "quality"),
    doc="ANALYZE-style per-column statistics in ONE table pass (the "
    "inputs a cost-based optimizer wants: row count, null count, HLL "
    "NDV estimate per column): columns melt to (col, value) rows "
    "inside the scan stage, the register table is |cols| x 64 rows "
    "however wide/long the table, and the NDV estimate reuses the "
    "integer-exact HLL arithmetic so it value-hashes. Stringification "
    "is restricted to int/string/date columns (double rendering is "
    "not engine-portable) — the production recipe normalizes each "
    "type explicitly, exactly as here. KNOWN small-range bias: raw "
    "HLL overestimates NDV below ~2.5m distincts (o_orderstatus: 3 "
    "exact -> ~47 estimated); real HLLs switch to linear counting "
    "there, but ln() is not bit-portable so the graded form stays "
    "raw and DETERMINISTIC — route small-NDV columns through the "
    "linear_counting operator instead",
)
def analyze_table_stats(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    melted = None
    for col, expr in (
        ("o_custkey", F.col("o_custkey").cast("string")),
        ("o_orderstatus", F.col("o_orderstatus")),
        ("o_orderpriority", F.col("o_orderpriority")),
        ("o_orderdate", F.date_format(F.col("o_orderdate"), "yyyy-MM-dd")),
    ):
        part = o.select(F.lit(col).alias("col"), expr.alias("val"))
        melted = part if melted is None else melted.unionAll(part)

    from chapterhouseqe_spark.operators.sketches import _HLL_ALPHA_64

    # per-column registers need the col in the GROUP key — same
    # arithmetic as operators/sketches.py:hll_registers with (col,
    # bucket) grouping
    h = (
        F.conv(F.substring(F.md5(F.col("val")), 1, 15), 16, 10).cast("long")
    )
    rem = F.call_function("div", h, F.lit(64))
    rho = F.when(rem == 0, F.lit(55)).otherwise(F.lit(55) - F.length(F.bin(rem)))
    reg = (
        melted.filter(F.col("val").isNotNull())
        .select("col", (h % 64).alias("bucket"), rho.alias("rho"))
        .groupBy("col", "bucket")
        .agg(F.max("rho").alias("M"))
    )
    numerator = _HLL_ALPHA_64 * 64 * 64 * float(1 << 56)
    est = reg.groupBy("col").agg(
        F.count(F.lit(1)).alias("n_filled"),
        F.coalesce(
            F.sum(F.expr("CAST(1 AS BIGINT) << (56 - M)")),
            F.lit(0).cast("long"),
        ).alias("s_filled"),
    ).select(
        "col",
        (
            F.lit(numerator)
            / (
                F.col("s_filled")
                + (F.lit(64).cast("long") - F.col("n_filled"))
                * F.lit(1 << 56).cast("long")
            ).cast("double")
        ).alias("ndv_est"),
    )
    base = melted.groupBy("col").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("val").isNull().cast("bigint")).alias("n_nulls"),
    )
    return base.join(est, "col").select("col", "n_rows", "n_nulls", "ndv_est")


@query(
    "audit_referential_integrity",
    oracle="""
    SELECT 'lineitem->orders' AS fk, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_orphans
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'orders->customer', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM orders ord LEFT JOIN customer c ON ord.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'customer->nation', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM customer cu LEFT JOIN nation n ON cu.c_nationkey = n.n_nationkey
    """,
    tags=("maintenance", "quality", "join"),
    doc="referential-integrity audit across the star schema: per FK "
    "edge, total child rows and orphans (children whose parent key "
    "resolves to nothing). Each edge is one left join counted in one "
    "pass — the dimension side broadcasts, so the audit costs one "
    "scan per fact table however large the lake; a nonzero orphan "
    "count is the load-order/corruption signal a pipeline gates on",
)
def audit_referential_integrity(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_orderkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey")

    def edge(name, child, parent, ck, pk):
        j = child.join(parent, child[ck] == parent[pk], "left")
        return j.agg(
            F.lit(name).alias("fk"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(parent[pk].isNull().cast("bigint")).alias("n_orphans"),
        ).select("fk", "n_rows", "n_orphans")

    return (
        edge("lineitem->orders", li, o.select("o_orderkey"), "l_orderkey", "o_orderkey")
        .unionAll(
            edge("orders->customer", o.select("o_custkey"), c.select("c_custkey"), "o_custkey", "c_custkey")
        )
        .unionAll(
            edge("customer->nation", c.select("c_nationkey"), n, "c_nationkey", "n_nationkey")
        )
    )


@query(
    "audit_join_skew",
    oracle="""
    WITH per AS (
      SELECT 'lineitem.l_orderkey' AS key_col, l_orderkey AS k
      FROM lineitem
      UNION ALL SELECT 'lineitem.l_partkey', l_partkey FROM lineitem
      UNION ALL SELECT 'orders.o_custkey', o_custkey FROM orders
      UNION ALL SELECT 'events.user_id', user_id FROM events
    ),
    counts AS (
      SELECT key_col, k, COUNT(*) AS n FROM per GROUP BY key_col, k
    )
    SELECT key_col,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MAX(n) AS BIGINT) AS max_key_rows,
           CAST(MAX(n) * COUNT(*) AS DOUBLE) / SUM(n) AS skew_ratio
    FROM counts GROUP BY key_col
    """,
    tags=("maintenance", "skew", "stats"),
    doc="join-key skew census: for each candidate shuffle key, total "
    "rows, distinct keys, the heaviest key's row count, and "
    "skew_ratio = max/mean — the decide-before-you-shuffle "
    "diagnostic that picks between a plain keyed join, AQE skew "
    "handling, and explicit salting (operators/bucketing.py). Each "
    "key column is one keyed count that collapses to |keys| rows "
    "before the 4-row final rollup; the ratio is one division of "
    "exact BIGINTs. 100 TB: this is the cheap scan you run BEFORE "
    "committing a petabyte shuffle to a hot-keyed plan",
)
def audit_join_skew(spark, sf_dir):
    def census(df, key_col, label):
        counts = df.groupBy(F.col(key_col).alias("k")).agg(
            F.count(F.lit(1)).alias("n")
        )
        return counts.agg(
            F.lit(label).alias("key_col"),
            F.sum("n").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("n").alias("max_key_rows"),
            (
                (F.max("n") * F.count(F.lit(1))).cast("double")
                / F.sum("n")
            ).alias("skew_ratio"),
        ).select("key_col", "n_rows", "n_keys", "max_key_rows", "skew_ratio")

    li = t(spark, sf_dir, "lineitem")
    return (
        census(li, "l_orderkey", "lineitem.l_orderkey")
        .unionAll(census(li, "l_partkey", "lineitem.l_partkey"))
        .unionAll(
            census(t(spark, sf_dir, "orders"), "o_custkey", "orders.o_custkey")
        )
        .unionAll(
            census(t(spark, sf_dir, "events"), "user_id", "events.user_id")
        )
    )


@query(
    "ivm_join_delta",
    # oracle recomputes the maintained joined rollup DIRECTLY from the
    # final table states — the incremental path must be
    # indistinguishable from a full recompute.
    oracle=f"""
    WITH orders_final AS (
      SELECT * FROM orders
      WHERE (o_orderkey % 7 <> 0 AND o_orderkey % 5 <> 0)
         OR o_orderkey % 7 = 0
    )
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n,
           {o_dsum('o.o_totalprice')} AS revenue
    FROM orders_final o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("maintenance", "ivm", "join"),
    doc="incremental maintenance of an aggregate OVER A JOIN: the "
    "per-segment orders-x-customer rollup is maintained under signed "
    "changes to BOTH base tables (order deletes + inserts, late-"
    "arriving customer inserts) by composing "
    "operators/maintenance.py:join_view_delta (dV = dA*B + A*dB + "
    "dA*dB, signs multiplied — Blakeley et al. 1986) into "
    "apply_rollup_delta. Neither the join view nor the bases are "
    "recomputed: incremental cost is two change-sized broadcast "
    "joins + one delta-vs-delta join + a |delta| merge into the "
    "|segments|-row state. The A*dB term is exercised for real: base "
    "orders referencing a not-yet-arrived customer enter the view "
    "only when that customer's insert lands",
)
def ivm_join_delta(spark, sf_dir):
    from chapterhouseqe_spark.operators.maintenance import (
        apply_rollup_delta,
        join_view_delta,
        rollup_state,
    )

    orders = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_orderkey", "o_totalprice"
    )
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    ok = F.col("o_orderkey")
    base_o = orders.filter(ok % 7 != 0)
    base_c = cust.filter(F.col("custkey") % 11 != 0)
    # signed change feeds: delete every base order with key % 5 == 0,
    # insert the held-out % 7 orders, and land the held-out customers
    delta_o = base_o.filter(ok % 5 == 0).withColumn(
        "__sign", F.lit(-1)
    ).unionByName(orders.filter(ok % 7 == 0).withColumn("__sign", F.lit(1)))
    delta_c = cust.filter(F.col("custkey") % 11 == 0).withColumn(
        "__sign", F.lit(1)
    )

    state = rollup_state(
        base_o.join(base_c, "custkey"), ["c_mktsegment"], ["o_totalprice"]
    )
    dv = join_view_delta(base_o, base_c, delta_o, delta_c, ["custkey"])
    return apply_rollup_delta(
        state, dv, ["c_mktsegment"], ["o_totalprice"], "__sign"
    ).select(
        "c_mktsegment",
        F.col("n"),
        F.col("sum_o_totalprice").cast("double").alias("revenue"),
    )


def _evolved_orders_dir(spark, sf_dir) -> str:
    """Deterministic one-time two-generation copy of orders: even keys
    unpartitioned (gen0, pre-evolution), odd keys hive-partitioned by
    o_orderpriority (gen1, the evolved spec). Fingerprint-keyed like
    _partitioned_orders_dir."""
    import os

    from chapterhouseqe_spark.operators.maintenance import (
        write_partition_evolution,
    )
    from chapterhouseqe_spark.queries.core_sql import _source_fingerprint

    key = _source_fingerprint(sf_dir, "orders")
    out = f"/tmp/chqe_partitioned/{key}/orders_evolution"
    if not os.path.exists(os.path.join(out, "_LAYOUTS.json")):
        write_partition_evolution(
            t(spark, sf_dir, "orders"),
            out,
            ["o_orderpriority"],
            F.col("o_orderkey") % 2 == 1,
        )
    return out


@query(
    "partition_evolution_scan",
    oracle=f"""
    SELECT CAST(o_orderkey % 2 AS BIGINT) AS generation,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           {o_dsum('o_totalprice')} AS total_price
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY 1
    """,
    tags=("maintenance", "layout"),
    doc="PARTITION EVOLUTION scan (Iceberg spec-change contract): one "
    "logical table whose gen0 files predate partitioning and whose "
    "gen1 files are hive-partitioned by o_orderpriority; a filter on "
    "the evolved column prunes gen1 DIRECTORIES at planning time "
    "(pinned: PartitionFilters on the gen1 scan) and degrades to a "
    "row filter on gen0 — the best each layout permits, with neither "
    "generation rewritten "
    "(operators/maintenance.py:write_partition_evolution/"
    "read_partition_evolution)",
)
def partition_evolution_scan(spark, sf_dir):
    from chapterhouseqe_spark.operators.maintenance import (
        read_partition_evolution,
    )

    path = _evolved_orders_dir(spark, sf_dir)
    scan = read_partition_evolution(spark, path).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return scan.groupBy((F.col("o_orderkey") % 2).alias("generation")).agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum(F.col("o_totalprice")).alias("total_price"),
    )


def _mor_orders_dir(spark, sf_dir) -> str:
    """Deterministic one-time merge-on-read orders table: full base +
    two accumulated delete files (o_orderkey % 97 == 0, then % 89 == 0)
    — two files so the reader provably unions delete generations."""
    import os

    from chapterhouseqe_spark.operators.maintenance import add_delete_file
    from chapterhouseqe_spark.queries.core_sql import _source_fingerprint

    key = _source_fingerprint(sf_dir, "orders")
    out = f"/tmp/chqe_partitioned/{key}/orders_mor"
    if not os.path.exists(os.path.join(out, "base", "_SUCCESS")):
        orders = t(spark, sf_dir, "orders")
        orders.write.mode("overwrite").parquet(os.path.join(out, "base"))
        for mod in (97, 89):
            add_delete_file(
                orders.filter(F.col("o_orderkey") % mod == 0).select(
                    "o_orderkey"
                ),
                out,
            )
    return out


@query(
    "merge_on_read_deletes",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           {o_dsum('o_totalprice')} AS total_price
    FROM orders
    WHERE o_orderkey % 97 != 0 AND o_orderkey % 89 != 0
    GROUP BY o_orderstatus
    """,
    tags=("maintenance",),
    doc="MERGE-ON-READ deletes (Iceberg v2 / Delta deletion-vector "
    "pattern, key-based): deletes land as O(k) files under _DELETES/ "
    "— no data file rewritten — and the scan anti-joins the union of "
    "accumulated delete generations (two here, %97 then %89, proving "
    "generations compose). compact_deletes materializes them when the "
    "read-side cost outgrows one rewrite; read-equivalence before/"
    "after compaction is pinned in tests "
    "(operators/maintenance.py:add_delete_file/read_with_deletes/"
    "compact_deletes)",
)
def merge_on_read_deletes(spark, sf_dir):
    from chapterhouseqe_spark.operators.maintenance import read_with_deletes

    path = _mor_orders_dir(spark, sf_dir)
    return (
        read_with_deletes(spark, path, "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum(F.col("o_totalprice")).alias("total_price"),
        )
    )


@query(
    "write_audit_publish_gates",
    oracle="""
    SELECT 'row_count' AS gate, CAST(COUNT(*) AS DOUBLE) AS value,
           COUNT(*) >= 1 AS passed, TRUE AS published FROM orders
    UNION ALL
    SELECT 'null_custkey',
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS DOUBLE),
           SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0, TRUE
    FROM orders
    UNION ALL
    SELECT 'negative_total',
           CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS DOUBLE),
           SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) = 0, TRUE
    FROM orders
    """,
    tags=("maintenance",),
    doc="WRITE-AUDIT-PUBLISH (Iceberg WAP workflow): the candidate "
    "table is MATERIALIZED first, audit gates run against the staged "
    "bytes a reader would actually see, and only a fully-green report "
    "publishes via the snapshot pointer swap — a failing gate aborts "
    "with the committed table untouched and the staged copy preserved "
    "under _audit_failed-* for debugging (abort path + pointer "
    "immutability pinned in tests). Graded result is the gate report "
    "for a clean publish of orders "
    "(operators/maintenance.py:write_audit_publish)",
)
def write_audit_publish_gates(spark, sf_dir):
    import tempfile

    from chapterhouseqe_spark.operators.maintenance import (
        write_audit_publish,
    )

    orders = t(spark, sf_dir, "orders")
    gates = [
        (
            "row_count",
            lambda d: (d.count(), ">= 1", d.count() >= 1),
        ),
        (
            "null_custkey",
            lambda d: (
                d.filter(F.col("o_custkey").isNull()).count(),
                "== 0",
                d.filter(F.col("o_custkey").isNull()).count() == 0,
            ),
        ),
        (
            "negative_total",
            lambda d: (
                d.filter(F.col("o_totalprice") < 0).count(),
                "== 0",
                d.filter(F.col("o_totalprice") < 0).count() == 0,
            ),
        ),
    ]
    table = tempfile.mkdtemp(prefix="chqe_wap_")
    try:
        report, version = write_audit_publish(spark, orders, table, gates)
    finally:
        # the report is plain local data — the published copy is only
        # needed by real consumers, not by this graded result
        import shutil

        shutil.rmtree(table, ignore_errors=True)
    published = version is not None
    return spark.createDataFrame(
        [(g, v, ok, published) for (g, v, _thr, ok) in report],
        "gate string, value double, passed boolean, published boolean",
    )


@query(
    "audit_replica_merkle_diff",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k,
             CAST(o_totalprice * 100 AS BIGINT) AS cents
      FROM orders
    ),
    replica AS (
      SELECT k,
             CASE WHEN k % 301 = 0 THEN cents + 1 ELSE cents END AS cents
      FROM base
    ),
    ha AS (
      SELECT ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15))::BIGINT % 256
               AS bucket,
             COUNT(*) AS cnt,
             bit_xor(('0x' || substr(md5(CAST(k AS VARCHAR) || '|' ||
               CAST(cents AS VARCHAR)), 1, 15))::BIGINT) AS xh
      FROM base GROUP BY 1
    ),
    hb AS (
      SELECT ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15))::BIGINT % 256
               AS bucket,
             COUNT(*) AS cnt,
             bit_xor(('0x' || substr(md5(CAST(k AS VARCHAR) || '|' ||
               CAST(cents AS VARCHAR)), 1, 15))::BIGINT) AS xh
      FROM replica GROUP BY 1
    )
    SELECT CAST(a.bucket AS BIGINT) AS bucket,
           CAST(a.cnt AS BIGINT) AS cnt_base,
           CAST(b.cnt AS BIGINT) AS cnt_replica
    FROM ha a JOIN hb b ON a.bucket = b.bucket
    WHERE a.xh != b.xh OR a.cnt != b.cnt
    """,
    tags=("maintenance", "audit"),
    doc="Merkle-style replica ANTI-ENTROPY diff (the Cassandra/Dynamo "
    "repair primitive): each replica collapses to 256 key-hash "
    "buckets of (count, XOR-fold of row hashes) — commutative, "
    "order-insensitive, overflow-free under ANSI mode — and only "
    "divergent buckets need row-level comparison, so repairing a "
    "100 TB replica pair costs two scans + a 256-row exchange, never "
    "a full-table join. The replica carries a deterministic "
    "perturbation (cents+1 where key%301==0); exactly those keys' "
    "buckets surface. Row hash covers key and cents as canonical "
    "strings (decimals -> integer cents to dodge decimal-formatting "
    "divergence)",
)
def audit_replica_merkle_diff(spark, sf_dir):
    from chapterhouseqe_spark.queries.registry import md5_int

    base = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    replica = base.select(
        "k",
        F.when(F.col("k") % 301 == 0, F.col("cents") + 1)
        .otherwise(F.col("cents"))
        .alias("cents"),
    )

    def digest(df):
        bucket = F.pmod(md5_int(F.col("k").cast("string")), F.lit(256))
        rowh = md5_int(
            F.concat_ws(
                "|", F.col("k").cast("string"), F.col("cents").cast("string")
            )
        )
        return (
            df.select(bucket.alias("bucket"), rowh.alias("rh"))
            .groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.expr("bit_xor(rh)").alias("xh"),
            )
        )

    a = digest(base)
    b = digest(replica)
    return (
        a.alias("a")
        .join(b.alias("b"), "bucket")
        .filter(
            (F.col("a.xh") != F.col("b.xh")) | (F.col("a.cnt") != F.col("b.cnt"))
        )
        .select(
            "bucket",
            F.col("a.cnt").alias("cnt_base"),
            F.col("b.cnt").alias("cnt_replica"),
        )
    )
