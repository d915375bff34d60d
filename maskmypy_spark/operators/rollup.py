"""Hierarchical cell rollup — multi-resolution point-density pyramid.

The tiling analogue of a hypertable rollup: counts at the finest cell
resolution, then each coarser level aggregates its children (factor-2
coarsening via pure integer arithmetic on the cell id —
functions/cells.py:parent_sql). Only the FINEST level touches the fact
table; every coarser level re-aggregates the (tiny) previous level, so a
full L-level pyramid over 100 TB costs one scan + one shuffle + L-1
aggregations over count tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import cells


def cell_pyramid(
    df: DataFrame,
    cs: float = 500.0,
    levels: int = 4,
    x: str = "x",
    y: str = "y",
    value: str | None = None,
) -> DataFrame:
    """(level, cell, n[, value_sum]) for levels 0..levels-1; level L cells
    have size cs * 2^L. ``value`` optionally sums a measure alongside the
    count (the rollup is additive, so parents aggregate children exactly).
    """
    aggs = [F.count(F.lit(1)).alias("n")]
    if value is not None:
        aggs.append(F.sum(value).alias("value_sum"))
    cur = (
        df.select(
            F.expr(cells.cell_sql(x, y, cs)).alias("cell"),
            *([F.col(value)] if value is not None else []),
        )
        .groupBy("cell")
        .agg(*aggs)
    )
    out = cur.withColumn("level", F.lit(0))
    for lvl in range(1, levels):
        roll = [F.sum("n").alias("n")]
        if value is not None:
            roll.append(F.sum("value_sum").alias("value_sum"))
        cur = (
            cur.select(F.expr(cells.parent_sql("cell", 2)).alias("cell"), *[
                c for c in (["n"] + (["value_sum"] if value is not None else []))
            ])
            .groupBy("cell")
            .agg(*roll)
        )
        out = out.unionByName(cur.withColumn("level", F.lit(lvl)))
    front = ["level", "cell", "n"] + (["value_sum"] if value is not None else [])
    return out.select(*front)
