"""Parser plan-shape tests mirroring the reference's
``test_logical_planner.rs:9-169`` (SQL → expected structure) and the
multi-statement splitting of ``test_sqlparser_behavior.rs:6-28``.
"""

from __future__ import annotations

import pytest

from chapterhouseqe_spark.sql.parser import (
    BinaryOp,
    Identifier,
    Literal,
    ReadFilesSource,
    SqlSyntaxError,
    TableSource,
    parse_expression,
    parse_select,
    split_statements,
)


def test_select_star_from_table():
    # test_logical_planner.rs: `select * from bikes`
    stmt = parse_select("select * from bikes")
    assert stmt.items[0].wildcard
    assert isinstance(stmt.source, TableSource)
    assert stmt.source.name == "bikes"
    assert stmt.where is None


def test_select_with_filter():
    # test_logical_planner.rs: `select id from bikes where size='small'`
    stmt = parse_select("select id from bikes where size = 'small'")
    assert isinstance(stmt.where, BinaryOp)
    assert stmt.where.op == "="
    assert stmt.where.left == Identifier(("size",))
    assert stmt.where.right == Literal("small", "string")


def test_read_files_with_connection_and_alias():
    # test_logical_planner.rs: read_files(..., connection=>'big_s3') files
    stmt = parse_select(
        "select * from read_files('data/*.parquet', connection=>'big_s3') files"
    )
    src = stmt.source
    assert isinstance(src, ReadFilesSource)
    assert src.path_glob == "data/*.parquet"
    assert src.connection == "big_s3"
    assert src.alias == "files"


def test_read_files_default_connection():
    stmt = parse_select("select * from read_files('x.parquet')")
    assert stmt.source.connection == "default"
    assert stmt.source.alias is None


def test_unknown_read_files_argument_errors():
    # read_files_task.rs:64-105 validates arg names
    with pytest.raises(SqlSyntaxError):
        parse_select("select * from read_files('x.parquet', frobnicate=>'y')")


def test_alias_with_and_without_as():
    stmt = parse_select("select a as x, b y from t")
    assert stmt.items[0].alias == "x"
    assert stmt.items[1].alias == "y"


def test_three_part_identifier_rejected():
    # compute_value.rs:275-337 supports 1- and 2-part identifiers only
    with pytest.raises(SqlSyntaxError):
        parse_expression("a.b.c")


def test_precedence():
    node = parse_expression("a + 1.0 / (2.0 + c) * b")
    # + at the top; 1.0/(2.0+c) then * b on the right
    assert node.op == "+"
    assert node.right.op == "*"
    assert node.right.left.op == "/"


def test_quoted_string_escapes():
    node = parse_expression("s = 'it''s'")
    assert node.right == Literal("it's", "string")


def test_split_statements_respects_quotes():
    # test_sqlparser_behavior.rs:6-28 — quoted ';' does not split
    sql = "select * from t where s = 'a;b'; select 1 from u;"
    parts = split_statements(sql)
    assert len(parts) == 2
    assert parts[0] == "select * from t where s = 'a;b'"
    assert parts[1] == "select 1 from u"


def test_split_statements_drops_empty():
    assert split_statements(";;  ;") == []


def test_qualified_wildcard_parses():
    # t.* — the reference errors here (record_projection.rs:33-38);
    # we parse it as a qualified wildcard instead
    stmt = parse_select("select t.*, id from read_files('x.parquet') t")
    assert stmt.items[0].wildcard and stmt.items[0].qualifier == "t"
    assert not stmt.items[1].wildcard
