"""Structured Streaming masking.

The reference has NO streaming surface (SURVEY §2.10) — this is engine-only
capability: because every random mask is a stateless per-row projection
driven by the keyed hash-RNG (no sequential RNG state, no shuffle), the
SAME operator code runs unchanged on a streaming DataFrame. A point that
arrives twice (at-least-once sources) masks to the identical location, so
the sink stays idempotent.

Joins against static dimensions (addresses, containers, road nodes) are
stream-static joins — supported by Structured Streaming out of the box;
the donut mask below needs no join at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import rng
from ..operators.donut import donut


def mask_stream(
    stream: DataFrame,
    low: float,
    high: float,
    seed: int,
    distribution: str = "uniform",
    key: str = "pid",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Apply the donut mask to a streaming DataFrame (stateless projection;
    container retries need driver iteration and are batch-only)."""
    return donut(stream, low, high, seed, distribution, key=key, x=x, y=y)


def demo_stream(spark: SparkSession, low: float = 100.0, high: float = 500.0, seed: int = 42):
    """Rate-source demo: synthesize geotagged rows, mask them, return the
    streaming DataFrame (caller picks the sink)."""
    src = spark.readStream.format("rate").option("rowsPerSecond", 1000).load()
    pts = src.select(
        F.col("value").alias("pid"),
        F.expr(f"({rng.u_sql('value', 101, 1234)}) * 2.0e4").alias("x"),
        F.expr(f"({rng.u_sql('value', 102, 1234)}) * 1.0e4").alias("y"),
        "timestamp",
    )
    return mask_stream(pts, low, high, seed)
