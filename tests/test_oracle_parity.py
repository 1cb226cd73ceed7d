"""Spark-vs-DuckDB parity for every driver query (mimics the driver gate).

For each registry entry: run the Spark callable and the DuckDB oracle SQL on
the same sf0.001 parquet, then compare column names, row counts and the full
sorted value multiset (columns sorted by name, exactly like the driver's
order-insensitive value hash).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from ocrd_odem_spark.plans.queries import TABLES, registry, retired_relational

SF_DIR = "/root/testdata/sf0.001"


def _duck(sql: str):
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )
    rel = con.sql(sql)
    return rel.columns, rel.fetchall()


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm_cell(row[i]) for i in order) for row in rows),
        key=lambda t: tuple((v is None, str(v)) for v in t),
    )


_REG = registry()
_REG.update(retired_relational())  # folded-out singles stay oracle-verified


@pytest.mark.parametrize("name", sorted(_REG))
def test_query_matches_oracle(spark, name):
    fn, oracle_sql = _REG[name]
    sdf = fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if oracle_sql is None:
        assert len(srows) >= 0
        return
    dcols, drows = _duck(oracle_sql)
    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    snorm = _normalize(scols, srows)
    dnorm = _normalize(dcols, drows)
    if snorm != dnorm:
        diff = [(a, b) for a, b in zip(snorm, dnorm) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")
