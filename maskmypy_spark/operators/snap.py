"""Snap-to-streets — move each point to the nearest road-network node.

Reference: /root/reference/maskmypy/tools.py:98-133 (OSM drive network via
osmnx; offline here, so nodes come from the deterministic synthetic road
tables, sources/fixtures.py). Post-processing option of donut/locationswap/
voronoi (``snap_to_streets=True``, e.g. masks/donut.py:82-83).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .knn import nearest_neighbor


def snap_to_nodes(
    df: DataFrame,
    nodes: DataFrame,
    key: str = "pid",
    x: str = "x",
    y: str = "y",
    node_key: str = "node_id",
    nx: str = "nx",
    ny: str = "ny",
    cs: float | None = None,
    broadcast_nodes: bool = False,
) -> DataFrame:
    from ..functions import meta

    meta.validate_point_layer(df, key, x, y)  # reference tools.py:165-169
    meta.validate_crs((df, x), (nodes, nx))   # reference tools.py:172-180
    nn = nearest_neighbor(
        df, nodes, key=key, x=x, y=y, okey=node_key, ox=nx, oy=ny,
        cs=cs, broadcast_others=broadcast_nodes,
    )
    return (
        nn.withColumn(x, F.col(nx))
        .withColumn(y, F.col(ny))
        .drop(node_key, nx, ny, "nn_dist")
    )
