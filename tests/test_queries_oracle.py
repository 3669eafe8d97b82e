"""Mirror of the driver's correctness gate at smoke scale (sf0.001).

Every registered query runs on Spark and, when an oracle exists, on
DuckDB; row count, column names, and an order-insensitive multiset of
normalized values must match (same comparison as tools/check_oracle).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from lakehouse_test_spark.queries import REGISTRY
from lakehouse_test_spark.session import TABLE_NAMES

from .conftest import SMOKE_SF_DIR


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SMOKE_SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_against_oracle(spark, sf_dir, oracle_con, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    if q.oracle is None:
        # rows-only contract: runs and yields a stable schema
        assert sdf.columns
        return
    cur = oracle_con.execute(q.oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert len(srows) == len(orows), f"rowcount spark={len(srows)} duckdb={len(orows)}"
    assert sorted(sdf.columns) == sorted(ocols)
    sm, om = _multiset(sdf.columns, srows), _multiset(ocols, orows)
    assert sm == om, f"value mismatch, first diffs: {[(a, b) for a, b in zip(sm, om) if a != b][:3]}"
