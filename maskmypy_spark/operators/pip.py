"""Point-in-polygon join (broadcast ray-cast, pure column expressions).

Replaces ``container.intersects(point)`` (reference ``masks/donut.py:153,165``)
and the sjoin prefilter of polygon k-anonymity (``analysis.py:527``).

Polygons arrive as ``(poly_id: long, ring: array<struct<x:double,y:double>>)``
(+ any payload). The plan: explode rings to edges ONCE, broadcast the edge
table (containers/census layers are small dimensions vs the point fact
table), bbox-prefilter the join, then count ray crossings per (point,
polygon) with an aggregate — everything stays in whole-stage codegen; no
Python, no shuffle of the big side beyond the final groupBy, which is
partial-aggregated map-side.

The crossing test is division-free (cross-multiplied) so it cannot hit
ANSI-mode divide-by-zero on horizontal edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.rng import flit

EDGE_EXPR = """
explode(transform(sequence(0, size(ring) - 1), i -> struct(
    ring[i].x AS x1, ring[i].y AS y1,
    ring[(i + 1) % size(ring)].x AS x2, ring[(i + 1) % size(ring)].y AS y2
)))
"""


def polygon_edges(polygons: DataFrame, poly_id: str = "poly_id") -> DataFrame:
    """(poly_id, x1, y1, x2, y2, xmin, ymin, xmax, ymax) — one row per edge."""
    return (
        polygons.select(
            poly_id,
            F.expr("array_min(transform(ring, p -> p.x))").alias("xmin"),
            F.expr("array_min(transform(ring, p -> p.y))").alias("ymin"),
            F.expr("array_max(transform(ring, p -> p.x))").alias("xmax"),
            F.expr("array_max(transform(ring, p -> p.y))").alias("ymax"),
            F.expr(EDGE_EXPR).alias("_e"),
        )
        .select(poly_id, "xmin", "ymin", "xmax", "ymax", "_e.*")
    )


def pip_join(
    points: DataFrame,
    polygons: DataFrame,
    key: str = "pid",
    x: str = "x",
    y: str = "y",
    poly_id: str = "poly_id",
    cell_size: float | None = None,
) -> DataFrame:
    """Inner join: one row (key, x, y, poly_id) per point-polygon containment.

    Points in no polygon are absent (caller left-joins to detect them);
    points in several polygons produce several rows (the donut container
    contract forbids overlap — the caller raises, donut.py:158-161).

    Two physical plans (value-identical; mirrors k_anonymity_polygon):
      * ``cell_size=None`` (default): broadcast the exploded edge table and
        bbox-range-join — right for the reference's container layers (tens
        of polygons).
      * ``cell_size=<meters>``: cell-indexed EQUI-join — each polygon row
        (carrying its ring) explodes into the grid cells covering its bbox,
        each point carries its single cell; both sides shuffle on the cell
        key (no broadcast), then the ring explodes into edges ON THE JOINED
        ROW. This is the national-census-layer scale path: polygon bytes
        shuffle once per covered cell instead of residing whole on every
        executor, and AQE skew-splits hot cells.
    """
    px, py = F.col(x), F.col(y)
    if cell_size is None:
        cand = points.select(key, x, y).join(
            F.broadcast(polygon_edges(polygons, poly_id)),
            (px >= F.col("xmin")) & (px <= F.col("xmax"))
            & (py >= F.col("ymin")) & (py <= F.col("ymax")),
        )
    else:
        from ..functions import cells as _cells

        cs = float(cell_size)
        cell_list = (
            "flatten(transform("
            f"sequence(CAST(floor(xmin / {flit(cs)}) AS BIGINT), "
            f"CAST(floor(xmax / {flit(cs)}) AS BIGINT)), ix -> "
            f"transform(sequence(CAST(floor(ymin / {flit(cs)}) AS BIGINT), "
            f"CAST(floor(ymax / {flit(cs)}) AS BIGINT)), iy -> "
            f"(ix + {_cells.CELL_OFF}) * {_cells.CELL_K} + iy + {_cells.CELL_OFF})))"
        )
        pg = (
            polygons.select(
                poly_id,
                "ring",
                F.expr("array_min(transform(ring, p -> p.x))").alias("xmin"),
                F.expr("array_min(transform(ring, p -> p.y))").alias("ymin"),
                F.expr("array_max(transform(ring, p -> p.x))").alias("xmax"),
                F.expr("array_max(transform(ring, p -> p.y))").alias("ymax"),
            )
            .withColumn("_cell", F.explode(F.expr(cell_list)))
        )
        pt = points.select(key, x, y).withColumn(
            "_cell", F.expr(_cells.cell_sql(x, y, cs))
        )
        cand = (
            pt.join(pg, "_cell")
            .where(
                (px >= F.col("xmin")) & (px <= F.col("xmax"))
                & (py >= F.col("ymin")) & (py <= F.col("ymax"))
            )
            .select(key, x, y, poly_id, F.expr(EDGE_EXPR).alias("_e"))
            .select(key, x, y, poly_id, "_e.*")
        )
    straddle = (F.col("y1") > py) != (F.col("y2") > py)
    lhs = (px - F.col("x1")) * (F.col("y2") - F.col("y1"))
    rhs = (F.col("x2") - F.col("x1")) * (py - F.col("y1"))
    crossing = straddle & (
        ((F.col("y2") > F.col("y1")) & (lhs < rhs))
        | ((F.col("y2") < F.col("y1")) & (lhs > rhs))
    )
    return (
        cand.groupBy(key, x, y, poly_id)
        .agg(F.sum(crossing.cast("int")).alias("_crossings"))
        .where(F.col("_crossings") % 2 == 1)
        .select(key, x, y, poly_id)
    )
