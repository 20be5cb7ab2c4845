"""Unit semantics for operators/temporal.py: as-of join and range join.

The oracle queries (asof_join_clicks, range_join_windows) gate the
DuckDB-parity path; these tests pin the operator semantics directly —
direction, tie inclusivity, tolerance, left-join nulls, half-open
interval bounds, and the no-duplicate guarantee of bucketization.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chapterhouseqe_spark.operators.temporal import asof_join, range_join


def _left(spark):
    return spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 7, "d")],
        "k int, ts int, name string",
    )


def _right(spark):
    return spark.createDataFrame(
        [(1, 8, 100.0), (1, 20, 200.0), (3, 1, 999.0)],
        "k int, ts int, px double",
    )


def test_asof_backward_inclusive_ties(spark):
    out = {
        r["name"]: (r["ts_r"], r["px_r"])
        for r in asof_join(_left(spark), _right(spark), ["k"], "ts").collect()
    }
    assert out["c"] == (None, None)  # nothing at or before ts=5
    assert out["a"] == (8, 100.0)  # latest <= 10
    assert out["b"] == (20, 200.0)  # tie at 20 is inclusive
    assert out["d"] == (None, None)  # key 2 has no right rows


def test_asof_forward(spark):
    out = {
        r["name"]: (r["ts_r"], r["px_r"])
        for r in asof_join(
            _left(spark), _right(spark), ["k"], "ts", direction="forward"
        ).collect()
    }
    assert out["c"] == (8, 100.0)  # earliest >= 5
    assert out["a"] == (20, 200.0)
    assert out["b"] == (20, 200.0)  # inclusive tie
    assert out["d"] == (None, None)


def test_asof_tolerance_nulls_far_matches(spark):
    out = {
        r["name"]: r["ts_r"]
        for r in asof_join(
            _left(spark), _right(spark), ["k"], "ts", tolerance=F.lit(3)
        ).collect()
    }
    # match at 8 for left ts=10 is within 3; nothing within 3 of ts=5
    assert out["a"] == 8 and out["c"] is None
    # left rows are never dropped by tolerance (left-join semantics)
    assert set(out) == {"a", "b", "c", "d"}


def test_asof_preserves_left_rowcount(spark):
    left, right = _left(spark), _right(spark)
    assert asof_join(left, right, ["k"], "ts").count() == left.count()


def test_range_join_half_open_and_no_dups(spark):
    pts = spark.createDataFrame(
        [(1, 5.0), (2, 6.0), (3, 0.0), (4, 19.999), (5, 20.0)],
        "pid int, x double",
    )
    iv = spark.createDataFrame(
        [(100, 0.0, 6.0), (200, 5.0, 20.0)], "iid int, s double, e double"
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(pts, iv, "x", "s", "e", bucket_width=4.0).collect()
    )
    # x=5 in both; x=6 excluded from [0,6) but in [5,20); x=0 start-
    # inclusive; x=19.999 in; x=20 end-exclusive → no match
    assert got == [(1, 100), (1, 200), (2, 200), (3, 100), (4, 200)]


def test_range_join_left_preserves_points(spark):
    """how='left' null-extends unmatched points instead of silently
    degrading to inner (round-6 verdict: a containment post-filter
    dropped the null-extended rows)."""
    pts = spark.createDataFrame(
        # pid=3 shares a bucket with an interval but is outside it;
        # pid=4 shares no bucket at all — both must survive with nulls
        [(1, 5.0), (2, 6.0), (3, 21.0), (4, 100.0)],
        "pid int, x double",
    )
    iv = spark.createDataFrame(
        [(100, 0.0, 6.0), (200, 5.0, 20.0)], "iid int, s double, e double"
    )
    rows = range_join(pts, iv, "x", "s", "e", bucket_width=4.0, how="left").collect()
    got = sorted((r["pid"], r["iid"]) for r in rows)
    assert got == [(1, 100), (1, 200), (2, 200), (3, None), (4, None)]
    # and every point appears (left-join row preservation)
    assert sorted({r["pid"] for r in rows}) == [1, 2, 3, 4]


def test_range_join_rejects_outer_interval_side(spark):
    pts = spark.createDataFrame([(1, 5.0)], "pid int, x double")
    iv = spark.createDataFrame([(9, 0.0, 6.0)], "iid int, s double, e double")
    import pytest

    for bad in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="range_join supports"):
            range_join(pts, iv, "x", "s", "e", bucket_width=4.0, how=bad)


def test_range_join_timestamps(spark):
    pts = spark.createDataFrame(
        [(1, "2024-01-01 08:30:00"), (2, "2024-01-01 11:00:00")],
        "pid int, s string",
    ).select("pid", F.col("s").cast("timestamp").alias("ts"))
    iv = spark.createDataFrame(
        [(7, "2024-01-01 08:00:00", "2024-01-01 10:00:00")],
        "iid int, a string, b string",
    ).select(
        "iid",
        F.col("a").cast("timestamp").alias("w_start"),
        F.col("b").cast("timestamp").alias("w_end"),
    )
    got = [
        (r["pid"], r["iid"])
        for r in range_join(
            pts, iv, "ts", "w_start", "w_end", bucket_width=3600.0
        ).collect()
    ]
    assert got == [(1, 7)]


def test_asof_nearest_picks_closer_side_and_ties_backward(spark):
    """direction='nearest': closer side wins, exact ties go backward
    (merge_asof convention), tolerance nulls far matches, and a key
    with only one-sided candidates still matches."""
    from pyspark.sql import functions as F

    from chapterhouseqe_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 50), (3, 10)], "k int, ts int"
    )
    right = spark.createDataFrame(
        [(1, 90, "b90"), (1, 205, "f205"), (1, 300, "f300"),
         (2, 400, "far"), (3, 10, "exact")],
        "k int, ts int, tag string",
    )
    out = {
        (r["k"], r["ts"]): (r["tag_r"], r["ts_r"])
        for r in asof_join(
            left, right, ["k"], "ts", direction="nearest"
        ).collect()
    }
    assert out[(1, 100)] == ("b90", 90)      # 10 back vs 105 fwd
    assert out[(1, 200)] == ("f205", 205)    # 5 fwd vs 110 back
    assert out[(2, 50)] == ("far", 400)      # only forward exists
    assert out[(3, 10)] == ("exact", 10)     # distance 0

    # equidistant: backward wins
    left2 = spark.createDataFrame([(9, 100)], "k int, ts int")
    right2 = spark.createDataFrame(
        [(9, 90, "back"), (9, 110, "fwd")], "k int, ts int, tag string"
    )
    r2 = asof_join(left2, right2, ["k"], "ts", direction="nearest").collect()
    assert r2[0]["tag_r"] == "back"

    # tolerance: the only candidate is 350 away, cap at 100 → null
    out3 = asof_join(
        left.filter("k = 2"), right, ["k"], "ts",
        direction="nearest", tolerance=F.lit(100),
    ).collect()
    assert out3[0]["tag_r"] is None and out3[0]["ts_r"] is None


def test_ewma_series_matches_hand_fold(spark):
    from chapterhouseqe_spark.operators.temporal import ewma_series

    rows = [("a", f"t{i}", float(v)) for i, v in enumerate([4.0, 8.0, 8.0, 0.0])]
    rows += [("b", "t0", 10.0)]
    df = spark.createDataFrame(rows, ["k", "o", "x"])
    got = {
        (r["k"], r["o"]): r["ewma"]
        for r in ewma_series(df, ["k"], "o", "x", alpha=0.25).collect()
    }
    # hand fold, alpha=0.25: s1=4, s2=.25*8+.75*4=5, s3=.25*8+.75*5=5.75,
    # s4=.25*0+.75*5.75=4.3125 — all exact binary fractions
    assert got == {
        ("a", "t0"): 4.0,
        ("a", "t1"): 5.0,
        ("a", "t2"): 5.75,
        ("a", "t3"): 4.3125,
        ("b", "t0"): 10.0,
    }


def test_ewma_anomaly_flags_spike_after_warmup(spark):
    from chapterhouseqe_spark.operators.temporal import ewma_anomaly_series

    # flat series with one big spike after warmup and one before it:
    # only the post-warmup spike is flagged, with pre-update expected/band
    vals = [5.0] * 3 + [50.0] + [5.0] * 10 + [90.0] + [5.0] * 3
    df = spark.createDataFrame(
        [("a", f"t{i:02d}", v) for i, v in enumerate(vals)], ["k", "o", "x"]
    )
    out = ewma_anomaly_series(df, ["k"], "o", "x", alpha=0.25, k=3.0, warmup=12).collect()
    assert [r["o"] for r in out] == ["t14"]
    r = out[0]
    assert r["x"] == 90.0 and r["deviation"] == abs(90.0 - r["expected"])
    assert r["deviation"] > r["band"] > 0.0


def test_ewma_anomaly_never_flags_inside_warmup(spark):
    from chapterhouseqe_spark.operators.temporal import ewma_anomaly_series

    vals = [5.0, 5.0, 500.0, 5.0, 5.0]
    df = spark.createDataFrame(
        [("a", f"t{i}", v) for i, v in enumerate(vals)], ["k", "o", "x"]
    )
    assert ewma_anomaly_series(df, ["k"], "o", "x", warmup=12).count() == 0


def test_holt_forecast_linear_series_converges_to_slope(spark):
    from chapterhouseqe_spark.operators.temporal import holt_forecast

    # a long exactly-linear series: level tracks the line, trend
    # converges to the slope, so forecasts continue the line closely
    n, slope = 200, 2.0
    df = spark.createDataFrame(
        [("a", f"t{i:04d}", slope * i) for i in range(n)], ["k", "o", "x"]
    )
    out = {r["h"]: r for r in holt_forecast(df, ["k"], "o", "x").collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6}
    last = slope * (n - 1)
    r1 = out[1]
    assert abs(r1["trend"] - slope) < 1e-6
    assert abs(r1["level"] - last) < 1e-3
    for h, r in out.items():
        assert r["forecast"] == r["level"] + h * r["trend"]
        assert abs(r["forecast"] - (last + slope * h)) < 1e-2


def test_holt_forecast_constant_series_flat(spark):
    from chapterhouseqe_spark.operators.temporal import holt_forecast

    df = spark.createDataFrame(
        [("a", f"t{i}", 7.0) for i in range(9)], ["k", "o", "x"]
    )
    for r in holt_forecast(df, ["k"], "o", "x", horizon=3).collect():
        assert r["forecast"] == 7.0 and r["trend"] == 0.0


def test_cusum_flags_sustained_shift_not_noise(spark):
    from chapterhouseqe_spark.operators.temporal import cusum_changepoints

    # in-control at 10, sustained shift to 16 at t=20: CUSUM (mu=10,
    # kappa=2, h=8) accumulates (16-10-2)=4/step and fires ~2 steps in;
    # an isolated single spike of the same size never reaches h
    vals = [10.0] * 20 + [16.0] * 10
    rows = [("a", f"t{i:02d}", v, 10.0, 2.0, 8.0) for i, v in enumerate(vals)]
    rows += [("b", f"t{i:02d}", 16.0 if i == 5 else 10.0, 10.0, 2.0, 8.0)
             for i in range(30)]
    df = spark.createDataFrame(
        rows, ["k", "o", "x", "mu", "kappa", "h"]
    )
    out = cusum_changepoints(
        df, ["k"], "o", "x", target_col="mu", slack_col="kappa", threshold_col="h"
    ).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    assert "b" not in by_key  # lone spike: 4 < h, decays next step
    hits = sorted(by_key["a"], key=lambda r: r["o"])
    # fires at t=22 (3 steps x 4 = 12 > 8), resets, fires again at t=25...
    assert hits[0]["o"] == "t22" and hits[0]["direction"] == "up"
    assert hits[0]["cusum"] == 12.0
    # after reset the statistic re-accumulates from zero
    assert hits[1]["o"] == "t25"


def test_cusum_detects_downward_drift(spark):
    from chapterhouseqe_spark.operators.temporal import cusum_changepoints

    vals = [10.0] * 5 + [4.0] * 5
    df = spark.createDataFrame(
        [("a", f"t{i}", v, 10.0, 2.0, 8.0) for i, v in enumerate(vals)],
        ["k", "o", "x", "mu", "kappa", "h"],
    )
    out = cusum_changepoints(
        df, ["k"], "o", "x", target_col="mu", slack_col="kappa", threshold_col="h"
    ).collect()
    assert out and all(r["direction"] == "down" for r in out)
