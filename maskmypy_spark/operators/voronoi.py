"""Voronoi mask — move each point to the nearest point of the Voronoi
diagram of the full point set.

Reference: /root/reference/maskmypy/masks/voronoi.py:10-76 (shapely
``voronoi_polygons(only_edges=True)`` + ``nearest_points``). Deterministic,
no seed (tests/test_atlas.py:206-210).

Engine closed form (SURVEY §2.1 M5): the nearest diagram point to site p is
the midpoint of p and its nearest neighbor q — for any site r and diagram
point v in cell(r), |pv| >= |pr|/2 >= |pq|/2, with equality attained at the
p–q bisector midpoint, which always lies on the diagram (no site can be
closer than |pq|/2 to it). So the O(n·polygon) shapely construction becomes
one exact kNN self-join — no global geometry object, fully distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .knn import nearest_neighbor


def voronoi(
    df: DataFrame,
    key: str = "pid",
    x: str = "x",
    y: str = "y",
    cs: float | None = None,
    snap_to_streets: bool = False,
    street_nodes: DataFrame | None = None,
) -> DataFrame:
    if snap_to_streets and street_nodes is None:
        raise ValueError("snap_to_streets=True requires street_nodes (node_id, nx, ny).")
    others = df.select(
        F.col(key).alias("_vkey"), F.col(x).alias("_vx"), F.col(y).alias("_vy")
    )
    nn = nearest_neighbor(
        df, others, key=key, x=x, y=y, okey="_vkey", ox="_vx", oy="_vy",
        cs=cs, exclude_self=True,
    )
    out = (
        nn.withColumn(x, F.expr(f"({x} + _vx) / 2.0"))
        .withColumn(y, F.expr(f"({y} + _vy) / 2.0"))
        .drop("_vkey", "_vx", "_vy", "nn_dist")
    )
    if snap_to_streets:  # reference masks/voronoi.py:21-24, 49-50
        from .snap import snap_to_nodes

        out = snap_to_nodes(out, street_nodes, key=key, x=x, y=y)
    return out
