"""Blind-spot regression tests for tools/check.py, the local mirror of the
driver's correctness gate.

Round 7's two driver fails (bpe_encode, compaction_plan) were both uncast
DuckDB HUGEINTs: ``SUM(BIGINT)`` returns HUGEINT, ``fetchall()`` launders it
into a plain Python int, and the mirror's hash passed while the driver's
type-aware renderer failed.  The mirror now audits the *declared* DuckDB
output types; these tests plant the exact bug class and assert it is caught.
"""

import os
import sys

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import check  # noqa: E402  (tools/check.py)


def _decl(sql):
    rel = duckdb.sql(sql)
    return list(rel.columns), [str(t).upper() for t in rel.types]


def test_planted_uncast_sum_is_flagged():
    cols, types = _decl("SELECT SUM(x) AS s FROM (SELECT CAST(1 AS BIGINT) AS x)")
    problems = list(check.declared_type_problems(cols, types))
    assert problems, "uncast SUM(BIGINT) -> HUGEINT must be flagged"
    assert "HUGEINT" in problems[0] and "s" in problems[0]


def test_planted_uncast_window_sum_is_flagged():
    cols, types = _decl(
        "SELECT (SUM(x) OVER ()) // 4096 AS bucket FROM (SELECT CAST(9000 AS BIGINT) AS x)"
    )
    assert list(check.declared_type_problems(cols, types))


def test_planted_decimal_is_flagged():
    cols, types = _decl("SELECT CAST(1.5 AS DECIMAL(10,2)) AS d")
    problems = list(check.declared_type_problems(cols, types))
    assert problems and "DECIMAL" in problems[0]


def test_cast_sum_passes():
    cols, types = _decl(
        "SELECT CAST(SUM(x) AS BIGINT) AS s, CAST(SUM(y) AS DOUBLE) AS m "
        "FROM (SELECT CAST(1 AS BIGINT) AS x, 2.0 AS y)"
    )
    assert not list(check.declared_type_problems(cols, types))


def test_every_registered_oracle_has_clean_declared_types():
    """Sweep the full oracle registry: no oracle may declare a HUGEINT or
    DECIMAL output column.  Declared types come from DuckDB's planner, so
    this runs on empty views — no data, no Spark, fast."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = {}
    for name, sql in entrymod.oracle_sql().items():
        rel = con.sql(sql)
        problems = list(
            check.declared_type_problems(
                list(rel.columns), [str(t).upper() for t in rel.types]
            )
        )
        if problems:
            bad[name] = problems
    assert not bad, f"oracles with driver-hostile declared types: {bad}"
