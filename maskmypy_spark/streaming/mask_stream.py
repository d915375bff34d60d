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


def k_verify_stream(
    stream: DataFrame,
    address: DataFrame,
    low: float,
    high: float,
    seed: int,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    key: str = "pid",
    x: str = "x",
    y: str = "y",
    ts: str = "timestamp",
) -> DataFrame:
    """Streaming privacy verification: donut-mask arriving points, then
    count addresses within each point's displacement disk via a
    STREAM-STATIC cell join (static address side broadcast per micro-batch),
    aggregated per event-time window with a watermark for late data. ONE
    streaming aggregation (window + point) keeps the plan in append mode;
    window-level k-satisfaction is a trivial batch query over the sink.

    The join is LEFT OUTER so points with ZERO addresses in their disk —
    the least-private, k = 1 rows — still emit a row (k = 1 + count of
    non-null address keys); an inner join would silently drop exactly the
    points a k-satisfaction monitor most needs to see.

    The stream side explodes an ADAPTIVE cell ring sized to each row's own
    displacement (distance_join's left_radius_col pattern): small
    displacements probe one cell, and a gaussian displacement exceeding
    ``high`` still probes far enough — no under-count (a point exploded
    into n cells still aggregates correctly: non-matching exploded rows
    contribute NULL aid, and a pair meets in exactly one cell).

    Returns (window, pid, k_anonymity)."""
    from ..functions import cells
    from ..functions.rng import flit
    from ..operators.distance_join import dist_sql

    # keep originals as payload columns so the displacement radius is a
    # stateless projection (no stream-stream join anywhere)
    pts = stream.select(key, x, y, ts).withColumn("_orig_x", F.col(x)).withColumn(
        "_orig_y", F.col(y)
    )
    masked = donut(pts, low, high, seed, key=key, x=x, y=y)
    masked = masked.withColumn("_radius", F.expr(dist_sql(x, y, "_orig_x", "_orig_y")))
    cs = float(high) / 2.0
    base = cells.cell_sql(x, y, cs)
    ring_n = f"CAST(ceil(_radius / {flit(cs)}) AS BIGINT)"
    ringlist = (
        f"flatten(transform(sequence(-{ring_n}, {ring_n}), dx -> "
        f"transform(sequence(-{ring_n}, {ring_n}), dy -> "
        f"({base}) + dx * {cells.CELL_K} + dy)))"
    )
    lt = masked.withWatermark(ts, watermark).withColumn(
        "_cell", F.explode(F.expr(ringlist))
    )
    rt = F.broadcast(
        address.withColumn("_cell", F.expr(cells.cell_sql("ax", "ay", cs)))
    )
    d = F.expr(dist_sql(x, y, "ax", "ay"))
    pairs = lt.join(
        rt, (lt["_cell"] == rt["_cell"]) & (d <= F.col("_radius")), "left"
    )
    return (
        pairs.groupBy(F.window(F.col(ts), window).alias("window"), F.col(key))
        .agg((F.count("aid") + F.lit(1)).alias("k_anonymity"))
    )


def hot_cell_monitor(
    stream: DataFrame,
    cell_size: float = 500.0,
    x: str = "x",
    y: str = "y",
    ts: str = "timestamp",
    timeout_ms: int = 60_000,
) -> DataFrame:
    """Custom STATEFUL streaming operator (applyInPandasWithState): running
    per-cell point totals — the skew monitor that feeds hot-cell salting
    decisions. State = one int per cell; emits (cell, total, batch_rows) on
    every update; state expires after ``timeout_ms`` idle."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..functions import cells

    binned = stream.withColumn("_cell", F.expr(cells.cell_sql(x, y, cell_size)))

    def update(key_tuple, pdfs, state: GroupState):
        n_new = 0
        for pdf in pdfs:
            n_new += len(pdf)
        if state.exists:
            (total,) = state.get
        else:
            total = 0
        total += n_new
        state.update((total,))
        state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {"cell": [key_tuple[0]], "total": [total], "batch_rows": [n_new]}
        )

    return binned.groupBy("_cell").applyInPandasWithState(
        update,
        outputStructType="cell long, total long, batch_rows long",
        stateStructType="total long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def dedup_stream(
    stream: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    ts: str = "timestamp",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming EXACT content dedup — the streaming twin of
    ``operators/dedup.py:dedup_exact`` for an arriving document stream:
    keep the FIRST arrival of each content digest, drop every later
    duplicate (including at-least-once re-deliveries, which makes the sink
    exactly-once per content).

    State is one md5 digest per distinct content, expired once the
    watermark passes its arrival (``dropDuplicatesWithinWatermark``), so
    state size is bounded by the distinct-content arrival rate times the
    watermark horizon — not by stream lifetime. Semantic note vs batch:
    batch dedup_exact elects min(doc_id) per digest (order-free); the
    stream elects the first ARRIVAL — the only well-defined choice when
    the corpus is unbounded. Returns the surviving rows with their
    ``_digest`` column (callers drop it or keep it as lineage)."""
    digest = F.md5(F.coalesce(F.col(text), F.lit("")))
    return (
        stream.withColumn("_digest", digest)
        .withWatermark(ts, watermark)
        .dropDuplicatesWithinWatermark(["_digest"])
    )


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
