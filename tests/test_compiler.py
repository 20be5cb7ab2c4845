"""Expression-semantics tests ported case-for-case from the reference's
``test_compute_value.rs:11-272`` (plus the coercion lattice of
``compute_value.rs:350-431`` and the literal typing of ``:220-250``),
re-expressed against Spark DataFrames.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chapterhouseqe_spark.sql.compiler import (
    CoercionError,
    build_schema_map,
    common_type,
    compile_expression,
    project,
)
from chapterhouseqe_spark.sql.parser import parse_expression, parse_select


def _vals(df, col, dtype):
    out = df.select(col.alias("v"))
    assert out.schema["v"].dataType == dtype
    return [r["v"] for r in out.collect()]


# ---------------------------------------------------------------- lattice
# common_type mirrors get_common_type (compute_value.rs:350-431)


@pytest.mark.parametrize(
    ("left", "right", "expect"),
    [
        (T.IntegerType(), T.IntegerType(), T.IntegerType()),
        (T.ByteType(), T.ShortType(), T.ShortType()),
        (T.IntegerType(), T.LongType(), T.LongType()),
        (T.IntegerType(), T.FloatType(), T.FloatType()),  # NOT double
        (T.FloatType(), T.LongType(), T.FloatType()),
        (T.FloatType(), T.DoubleType(), T.DoubleType()),
        (T.StringType(), T.StringType(), T.StringType()),
    ],
)
def test_common_type_lattice(left, right, expect):
    assert common_type(left, right, "+") == expect


def test_common_type_errors_on_cross_family():
    with pytest.raises(CoercionError):
        common_type(T.StringType(), T.IntegerType(), "+")


# ------------------------------------------------- test_compute_value.rs


def test_int_plus_scalar(spark):
    # test_compute_value.rs:12-36 — Int32 column + integer literal
    df = spark.createDataFrame([(1,), (2,), (3,)], "a int")
    col, dtype = compile_expression("a + 1", df)
    assert _vals(df, col, T.IntegerType()) == [2, 3, 4]
    assert dtype == T.IntegerType()


def test_eq_scalar(spark):
    # test_compute_value.rs:39-63 — a = 2
    df = spark.createDataFrame([(1,), (2,), (3,)], "a int")
    col, dtype = compile_expression("a = 2", df)
    assert dtype == T.BooleanType()
    assert _vals(df, col, T.BooleanType()) == [False, True, False]


def test_bool_eq(spark):
    # test_compute_value.rs:66-89 — boolean column = TRUE
    df = spark.createDataFrame([(True,), (False,), (True,)], "f boolean")
    col, _ = compile_expression("f = TRUE", df)
    assert _vals(df, col, T.BooleanType()) == [True, False, True]


def test_array_eq_array(spark):
    # test_compute_value.rs:92-124 — column = column
    df = spark.createDataFrame([(1, 1), (2, 3), (4, 4)], "a int, b int")
    col, _ = compile_expression("a = b", df)
    assert _vals(df, col, T.BooleanType()) == [True, False, True]


def test_parsed_complex_expression(spark):
    # test_compute_value.rs:127-175 — a + 1.0 / (2.0 + c) * b on floats,
    # with float32 literal typing (compute_value.rs:236-250).
    rows = [(1.5, 2.0, 0.5), (3.25, -1.0, 2.0), (0.0, 10.0, 6.0)]
    df = spark.createDataFrame(rows, "a float, b float, c float")
    col, dtype = compile_expression("a + 1.0 / (2.0 + c) * b", df)
    assert dtype == T.FloatType()
    got = _vals(df, col, T.FloatType())
    f32 = np.float32
    for g, (a, b, c) in zip(got, rows):
        expect = f32(a) + f32(1.0) / (f32(2.0) + f32(c)) * f32(b)
        assert g == pytest.approx(float(expect), abs=0.0)


def test_string_eq_neq(spark):
    # test_compute_value.rs:178-227
    df = spark.createDataFrame([("small",), ("big",), ("small",)], "size string")
    eq, _ = compile_expression("size = 'small'", df)
    ne, _ = compile_expression("size != 'small'", df)
    assert _vals(df, eq, T.BooleanType()) == [True, False, True]
    assert _vals(df, ne, T.BooleanType()) == [False, True, False]


def test_string_int_comparison_errors(spark):
    # cross-family comparison is a coercion error (compute_value.rs:423-429)
    df = spark.createDataFrame([("x", 1)], "s string, a int")
    with pytest.raises(CoercionError):
        compile_expression("s = 1", df)


def test_two_part_alias_resolution_duplicate_columns(spark):
    # test_compute_value.rs:230-272 — a batch carrying duplicate column
    # names, disambiguated by table alias. Spark equivalent: two aliased
    # sources joined; qualified refs resolve per-source.
    left = spark.createDataFrame([(1, 10), (2, 20)], "id int, a int").alias("t1")
    right = spark.createDataFrame([(1, 100), (2, 200)], "id int, a int").alias("t2")
    joined = left.join(right, F.col("t1.id") == F.col("t2.id"))
    schema = build_schema_map(("t1", left), ("t2", right))
    col, dtype = compile_expression("t1.a + t2.a", schema=schema)
    got = sorted(r["v"] for r in joined.select(col.alias("v")).collect())
    assert got == [110, 220]
    assert dtype == T.IntegerType()
    # bare duplicate name resolves to FIRST source (compute_value.rs:266-274)
    _, bare_t = compile_expression("a", schema=schema)
    assert bare_t == T.IntegerType()


# ------------------------------------------------------- division & typing


def test_int_division_is_integral(spark):
    # compute_value.rs:126-134 — '/' keeps the common int type
    df = spark.createDataFrame([(7, 2), (9, 4), (-7, 2)], "a int, b int")
    col, dtype = compile_expression("a / b", df)
    assert dtype == T.IntegerType()
    assert _vals(df, col, T.IntegerType()) == [3, 2, -3]  # trunc toward zero


def test_int_division_above_2_53(spark):
    # VERDICT r1 #3: a double intermediate loses precision above 2^53
    big = 2**60 + 7
    df = spark.createDataFrame([(big, 3)], "a long, b long")
    col, dtype = compile_expression("a / b", df)
    assert dtype == T.LongType()
    assert _vals(df, col, T.LongType()) == [big // 3]


def test_float_division_stays_float(spark):
    df = spark.createDataFrame([(1.0, 4.0)], "a float, b float")
    col, dtype = compile_expression("a / b", df)
    assert dtype == T.FloatType()
    assert _vals(df, col, T.FloatType()) == [0.25]


def test_literal_typing(spark):
    # compute_value.rs:220-250: small int → Int32, big → Int64,
    # decimal-pointed → Float32 (never Decimal).
    df = spark.createDataFrame([(1,)], "a int")
    _, t1 = compile_expression("2147483647", df)
    assert t1 == T.IntegerType()
    _, t2 = compile_expression("2147483648", df)
    assert t2 == T.LongType()
    _, t3 = compile_expression("1.5", df)
    assert t3 == T.FloatType()


def test_int_float32_promotes_to_float32_not_double(spark):
    # compute_value.rs:393-404 — divergence risk vs Spark defaults
    df = spark.createDataFrame([(3, 0.5)], "a int, b float")
    col, dtype = compile_expression("a + b", df)
    assert dtype == T.FloatType()
    assert _vals(df, col, T.FloatType()) == [3.5]


def test_unary_minus(spark):
    df = spark.createDataFrame([(5,)], "a int")
    col, dtype = compile_expression("-a", df)
    assert dtype == T.IntegerType()
    assert _vals(df, col, T.IntegerType()) == [-5]


def test_modulo(spark):
    df = spark.createDataFrame([(7, 3), (10, 4)], "a int, b int")
    col, _ = compile_expression("a % b", df)
    assert _vals(df, col, T.IntegerType()) == [1, 2]


def test_and_or_cast_inputs_to_boolean(spark):
    # compute_value.rs:71-116 — AND/OR cast inputs to boolean first
    df = spark.createDataFrame([(True, False)], "p boolean, q boolean")
    col_and, _ = compile_expression("p AND q", df)
    col_or, _ = compile_expression("p OR q", df)
    assert _vals(df, col_and, T.BooleanType()) == [False]
    assert _vals(df, col_or, T.BooleanType()) == [True]


def test_unknown_column_errors(spark):
    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(CoercionError):
        compile_expression("nope + 1", df)


# ------------------------------------------------------ filter & project


def test_filter_record(spark):
    # test_filter_record.rs:11-39 — cost < 30
    df = spark.createDataFrame([(10.0,), (35.0,), (20.0,)], "cost float")
    col, _ = compile_expression("cost < 30", df)
    assert [r["cost"] for r in df.filter(col).collect()] == [10.0, 20.0]


def test_empty_filter_result_flows_through(spark):
    # filter_record.rs:17-39 — empty batches still flow through
    df = spark.createDataFrame([(1,), (2,)], "a int")
    col, _ = compile_expression("a > 100", df)
    out = df.filter(col)
    assert out.count() == 0
    assert out.schema == df.schema  # schema survives an empty result


def test_projection_naming(spark):
    # record_projection.rs:16-76 — bare ident keeps name, AS alias,
    # other exprs named unnamed_<i> by position
    df = spark.createDataFrame([(1, 2.0)], "id int, v float")
    stmt = parse_select("select id, id + 1 as nxt, id * 2, v from t")
    out = project(df, stmt.items)
    assert out.columns == ["id", "nxt", "unnamed_2", "v"]


def test_projection_wildcard(spark):
    df = spark.createDataFrame([(1, 2.0)], "id int, v float")
    stmt = parse_select("select * from t")
    out = project(df, stmt.items)
    assert out.columns == ["id", "v"]


def test_projection_scalar_broadcast(spark):
    # scalar literals broadcast across rows (ArrayDatum semantics,
    # compute_value.rs:43-48, test_arrow_compute_behavior.rs:48-64)
    df = spark.createDataFrame([(1,), (2,)], "a int")
    stmt = parse_select("select a, 10 as ten, a + 10 as a10 from t")
    out = project(df, stmt.items).collect()
    assert [(r["a"], r["ten"], r["a10"]) for r in out] == [(1, 10, 11), (2, 10, 12)]


def test_projection_qualified_wildcard(spark):
    # t.* expands to the aliased source's columns; unknown qualifier errors
    import pytest

    df = spark.createDataFrame([(1, 2.0)], "id int, v float")
    stmt = parse_select("select t.*, id + 1 as nxt from src t")
    out = project(df, stmt.items, alias="t")
    assert out.columns == ["id", "v", "nxt"]
    with pytest.raises(ValueError, match="unknown table qualifier"):
        project(df, parse_select("select zz.* from src t").items, alias="t")
