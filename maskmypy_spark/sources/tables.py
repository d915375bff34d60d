"""Deterministic point layers derived from the driver's star schema.

The driver contract (/root/repo/__spark_entry__.py) compares Spark results
against DuckDB over the same parquet tables, so spatial inputs are derived
from numeric key columns with the engine's SQL-expressible hash — both
engines compute bit-identical coordinates (FIXTURES.md §6).

Extent mirrors the reference's Vancouver test box (~20 km × 10 km, planar
meters, tests/conftest.py:31-33).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.rng import flit, u_sql

BOX_W = 20000.0
BOX_H = 10000.0
COORD_SEED = 1234
TAG_X = 101
TAG_Y = 102

# (table, key column) per derived layer; sizes scale with sf.
SENSITIVE = ("customer", "c_custkey")     # masking input ("image points")
ADDRESS = ("orders", "o_orderkey")        # address/population points
NODES = ("part", "p_partkey")             # road-node stand-in for snapping
BIG = ("lineitem", "l_orderkey * 8 + l_linenumber")  # bench-scale points


def xy_sql(key: str) -> tuple[str, str]:
    x = f"({u_sql(key, TAG_X, COORD_SEED)}) * {flit(BOX_W)}"
    y = f"({u_sql(key, TAG_Y, COORD_SEED)}) * {flit(BOX_H)}"
    return x, y


def points_select(table: str, key: str, out_key: str = "pid") -> str:
    """ANSI SQL (Spark + DuckDB) projecting (out_key, x, y) from a table."""
    x, y = xy_sql(key)
    return (
        f"SELECT CAST({key} AS BIGINT) AS {out_key}, {x} AS x, {y} AS y FROM {table}"
    )


def address_select(table: str = "orders", key: str = "o_orderkey") -> str:
    x, y = xy_sql(key)
    return f"SELECT CAST({key} AS BIGINT) AS aid, {x} AS ax, {y} AS ay FROM {table}"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def points_df(
    spark: SparkSession, sf_dir: str, table: str, key: str, out_key: str = "pid"
) -> DataFrame:
    """DataFrame twin of ``points_select`` (column pruning: only the key
    column is read from parquet)."""
    x, y = xy_sql(key)
    return load(spark, sf_dir, table).select(
        F.expr(f"CAST({key} AS BIGINT)").alias(out_key),
        F.expr(x).alias("x"),
        F.expr(y).alias("y"),
    )


def sensitive_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return points_df(spark, sf_dir, *SENSITIVE)


def address_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    t, k = ADDRESS
    x, y = xy_sql(k)
    return load(spark, sf_dir, t).select(
        F.expr(f"CAST({k} AS BIGINT)").alias("aid"),
        F.expr(x).alias("ax"),
        F.expr(y).alias("ay"),
    )


def nodes_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    t, k = NODES
    x, y = xy_sql(k)
    return load(spark, sf_dir, t).select(
        F.expr(f"CAST({k} AS BIGINT)").alias("node_id"),
        F.expr(x).alias("nx"),
        F.expr(y).alias("ny"),
    )


def nodes_select() -> str:
    t, k = NODES
    x, y = xy_sql(k)
    return f"SELECT CAST({k} AS BIGINT) AS node_id, {x} AS nx, {y} AS ny FROM {t}"


def big_points_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bench-scale point table with a UNIQUE pid — the engine's row-identity
    contract (SURVEY §1.2). The driver's synthetic lineitem contains
    duplicate (l_orderkey, l_linenumber) pairs (~24% at sf0.1), so the
    derived key must be de-duplicated: duplicate pids would otherwise fan
    out every key-equi-join (voronoi's neighbor join-back emitted 1.38x
    rows) and make per-key semantics ill-defined."""
    t, k = BIG
    x, y = xy_sql("pid")
    return (
        load(spark, sf_dir, t)
        .select(F.expr(f"CAST({k} AS BIGINT)").alias("pid"))
        .distinct()
        .select("pid", F.expr(x).alias("x"), F.expr(y).alias("y"))
    )
