"""The local replica of the driver's correctness gate, as a test.

Runs every registered query against its DuckDB oracle at sf0.001
(row count + sorted columns + order-insensitive values — the driver's
methodology via tools/check_correctness.py). One red row here means a
red CORRECTNESS row in the next driver round.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tools.check_correctness import TABLES, compare


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for name in TABLES:
        path = f"{sf_dir}/{name}.parquet"
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def test_all_queries_match_oracles(spark, sf_dir, duck):
    from chapterhouseqe_spark.queries.registry import get_oracles, get_queries

    queries = get_queries()
    oracles = get_oracles()
    assert len(queries) >= 50, "registry lost queries"
    failures = []
    for name in sorted(queries):
        if name not in oracles:
            # rows-only contract: must at least build and return rows
            assert queries[name](spark, sf_dir).count() >= 0
            continue
        problems, _, _ = compare(name, queries[name](spark, sf_dir), oracles[name], duck)
        if problems:
            failures.append((name, problems[:3]))
    assert not failures, f"oracle mismatches: {failures}"


def test_entry_contract(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.count() > 0
    names = set(entrymod.queries())
    oracle_names = set(entrymod.oracle_sql())
    assert oracle_names <= names
    assert len(oracle_names) >= 50
