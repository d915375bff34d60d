"""Suppression — displace low-k points to the mean center of the pattern.

Reference: /root/reference/maskmypy/tools.py:16-43. The reference's
``dissolve().centroid`` of a point layer is the mean center => a global
avg(x), avg(y) aggregate broadcast back (one tiny cross join, no shuffle of
the fact table). SUPPRESSED label is the *string* "TRUE"/"FALSE"
(tools.py:41-42), preserved verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def suppress(
    df: DataFrame,
    min_k: int,
    col: str = "k_anonymity",
    x: str = "x",
    y: str = "y",
    label: bool = True,
) -> DataFrame:
    cent = df.agg(F.avg(x).alias("_cx"), F.avg(y).alias("_cy"))
    out = df.crossJoin(F.broadcast(cent))
    low = F.col(col) < min_k
    out = (
        out.withColumn(x, F.when(low, F.col("_cx")).otherwise(F.col(x)))
        .withColumn(y, F.when(low, F.col("_cy")).otherwise(F.col(y)))
        .drop("_cx", "_cy")
    )
    if label:
        out = out.withColumn("SUPPRESSED", F.when(low, "TRUE").otherwise("FALSE"))
    return out
