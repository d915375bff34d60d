"""Bucketed parquet tables — co-located joins without a shuffle.

At 100 TB the dominant recurring cost of the k-verification / swap / dedup
pipelines is re-shuffling the same fact table on the same key every run.
Bucketing persists that shuffle ONCE at write time: both sides of a
key-equi-join written with the same bucket count on the join key scan
straight into a SortMergeJoin with NO Exchange on either side (gated in
tests/test_plans.py) — on a 1000-executor cluster that is the difference
between re-moving 100 TB per query and reading co-located splits.

Usage shape (same API on a cluster; the table path is any shared
filesystem):

    write_bucketed(points, "pts_b", tmp + "/pts_b", "pid", 64)
    write_bucketed(kcounts, "k_b", tmp + "/k_b", "pid", 64)
    spark.table("pts_b").join(spark.table("k_b"), "pid")   # no Exchange

Buckets must match on both sides (Spark does not rebucket); pick the
bucket count once per subject area (e.g. 4x target cluster cores) and
reuse it everywhere that key is joined.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    by: str,
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external bucketed parquet table registered as
    ``table``: hash-bucketed (and by default sorted) on ``by``, so every
    later self/dimension join on that key is exchange-free. Sorting within
    buckets additionally removes the SortMergeJoin's per-task sort."""
    w = df.write.format("parquet").mode(mode).option("path", path).bucketBy(
        buckets, by
    )
    if sort:
        w = w.sortBy(by)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket spec (``spark.table`` —
    a plain ``spark.read.parquet(path)`` would lose the bucketing metadata
    and reintroduce the shuffle)."""
    return spark.table(table)
