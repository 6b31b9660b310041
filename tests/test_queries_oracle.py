"""Mini oracle gate: every registered query vs DuckDB at sf0.001.

The same comparison the external driver runs at sf0.01 (row count +
name-sorted schema + order-insensitive exact values), kept in pytest so a
regression is caught before the round gate.
"""

from __future__ import annotations

import os
from pathlib import Path

import duckdb
import pytest

from bigdata_scala_offline_data_clean_spark.queries import all_queries

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

pytestmark = pytest.mark.skipif(
    not Path(SF_DIR).is_dir(), reason=f"testdata {SF_DIR} not present"
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


@pytest.mark.parametrize("name", sorted(all_queries()))
def test_query_matches_oracle(spark, duck, name):
    spec = all_queries()[name]
    sdf = spec.spark(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        assert isinstance(srows, list)  # rows-only: runs and returns
        return
    cur = duck.execute(spec.oracle)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    assert len(srows) == len(drows), f"rowcount {len(srows)} != {len(drows)}"
    assert sorted(scols) == sorted(dcols)
    assert _norm(scols, srows) == _norm(dcols, drows)
