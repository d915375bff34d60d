"""Exact nearest-neighbor (kNN, k=1) join with ring escalation.

Replaces ``osmnx.nearest_nodes`` (reference ``tools.py:130``,
``masks/street.py:239``) and backs the Voronoi mask's closed form and the
NND statistics (``analysis.py:222-237``).

Algorithm: join probe points to candidates sharing a 3x3 cell neighborhood
at cell size ``cs``; a point's argmin is PROVEN exact when its best distance
is <= cs (everything within cs was examined). Unconverged points escalate to
3x coarser cells — a driver loop over a geometrically shrinking subset, each
round one Spark job. Deterministic ties: lexicographic (dist, neighbor key).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions import cells
from .distance_join import dist_sql


def _argmin(cand: DataFrame, d, key: str, okey: str, ox: str, oy: str) -> DataFrame:
    """Exact per-key argmin over candidate pairs that plans as HashAggregate.

    ``min(struct(_d, okey, ...))`` forces a SortAggregate over the ENTIRE
    exploded candidate set (struct buffers are not hash-aggregable) — the
    same anti-pattern that made round-1 locationswap 87x slower. Here the
    winner's payload (ox, oy) is a double, so the locationswap packed-BIGINT
    trick doesn't apply directly; instead: (1) hash-aggregate ``min(_d)``
    per key (map-side partials), (2) equi-join back on (key, _d) — the
    distance expression is evaluated identically on both sides, so the
    doubles are bit-equal and the join is exact; Spark's ReuseExchange
    dedupes the underlying cell-join shuffle between the two branches —
    then (3) break the (rare, e.g. grid-symmetric) ties deterministically
    by min okey with a row_number over the tiny tied set (~1 row/key),
    never over the 9x candidate volume.
    """
    cand_d = cand.withColumn("_d", d).select(key, okey, ox, oy, "_d")
    mind = cand_d.groupBy(key).agg(F.min("_d").alias("_d"))
    tied = cand_d.join(mind, [key, "_d"])
    w = Window.partitionBy(key).orderBy(okey)
    return (
        tied.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(key, okey, ox, oy, F.col("_d").alias("nn_dist"))
    )


def _salt_cell_join(lt, rt, x, y, salt, broadcast_others):
    """Join the cell-tagged sides, optionally scattering hot cells: the
    probe side hashes into ``salt`` sub-keys, the build side replicates
    once per sub-key — one dense cluster (a city) then spreads over
    ``salt`` reducers instead of one (north rule; same machinery as
    distance_join.py). AQE skew-join remains the adaptive backstop."""
    if salt > 1:
        lt = lt.withColumn("_sk", (F.xxhash64(x, y) % salt + salt) % salt)
        rt = rt.withColumn(
            "_sk", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
        )
        on = ["_cell", "_sk"]
    else:
        on = ["_cell"]
    if broadcast_others:
        rt = F.broadcast(rt)
    return lt.join(rt, on).drop(*on)


def estimate_cell_size(df: DataFrame, x: str = "x", y: str = "y") -> float:
    """~1x the expected NN spacing from GLOBAL density. Real point sets are
    clustered, so the global estimate overstates local spacing in the dense
    regions that dominate candidate volume — starting at 1x (instead of 2x)
    cut the voronoi kNN self-join ~20% at bench scale; sparse-region points
    simply escalate one extra round (the loop guarantees exactness either
    way)."""
    r = df.agg(
        F.min(x).alias("x0"), F.max(x).alias("x1"),
        F.min(y).alias("y0"), F.max(y).alias("y1"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    area = max((r.x1 - r.x0) * (r.y1 - r.y0), 1e-9)
    return math.sqrt(area / max(r.n, 1))


def knn_join(
    points: DataFrame,
    others: DataFrame,
    k: int,
    key: str = "pid",
    x: str = "x",
    y: str = "y",
    okey: str = "nn_id",
    ox: str = "nn_x",
    oy: str = "nn_y",
    cs: float | None = None,
    exclude_self: bool = False,
    broadcast_others: bool = False,
    max_rounds: int = 12,
    salt: int = 0,
) -> DataFrame:
    """Exact k-nearest-neighbors join (k rows per point, rank 1..k) by the
    same ring-escalation proof as ``nearest_neighbor``: a point's top-k is
    exact once its k-th best distance is <= the cell size (everything
    within cs was examined — so all k are confirmed at once). Deterministic
    ties by (dist, okey). Per-round top-k is a Window row_number bounded to
    the 3x3 candidate neighborhood, never a global sort. ``salt`` scatters
    hot cells across reducers (see ``_salt_cell_join``)."""
    if cs is None:
        cs = estimate_cell_size(others, ox, oy)

    d = F.expr(dist_sql(x, y, ox, oy))
    parts: list[DataFrame] = []
    remaining = points
    for rnd in range(max_rounds + 1):
        final_round = rnd == max_rounds
        if final_round:
            # brute-force the (tiny) unconverged residue
            cand = remaining.crossJoin(
                F.broadcast(others) if broadcast_others else others
            )
        else:
            lcell = F.expr(cells.cell_sql(x, y, cs))
            rcell = F.expr(cells.cell_sql(ox, oy, cs))
            lt = remaining.withColumn(
                "_cell",
                F.explode(F.array(*[lcell + F.lit(o) for o in cells.ring_offsets(1)])),
            )
            rt = others.withColumn("_cell", rcell)
            cand = _salt_cell_join(lt, rt, x, y, salt, broadcast_others)
        if exclude_self:
            cand = cand.where(F.col(okey) != F.col(key))
        w = Window.partitionBy(key).orderBy("_d", okey)
        topk = (
            cand.withColumn("_d", d)
            .withColumn("_rank", F.row_number().over(w))
            .where(F.col("_rank") <= k)
        )
        if final_round:
            parts.append(topk.select(
                key, F.col(okey), F.col(ox), F.col(oy),
                F.col("_d").alias("nn_dist"), F.col("_rank").alias("rank"),
            ))
            break
        # converged iff the point HAS k candidates and its k-th dist <= cs
        kth = topk.groupBy(key).agg(
            F.max("_d").alias("_kd"), F.count(F.lit(1)).alias("_kn")
        )
        done_keys = kth.where(
            (F.col("_kn") == k) & (F.col("_kd") <= F.lit(float(cs)))
        ).select(key)
        resolved = topk.join(done_keys, key, "left_semi").select(
            key, F.col(okey), F.col(ox), F.col(oy),
            F.col("_d").alias("nn_dist"), F.col("_rank").alias("rank"),
        )
        parts.append(resolved.localCheckpoint(eager=True))
        remaining = remaining.join(done_keys, key, "left_anti").localCheckpoint(
            eager=True
        )
        if remaining.isEmpty():
            break
        cs *= 3.0

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def nearest_neighbor(
    points: DataFrame,
    others: DataFrame,
    key: str = "pid",
    x: str = "x",
    y: str = "y",
    okey: str = "nn_id",
    ox: str = "nn_x",
    oy: str = "nn_y",
    cs: float | None = None,
    exclude_self: bool = False,
    broadcast_others: bool = False,
    max_rounds: int = 12,
    salt: int = 0,
) -> DataFrame:
    """points + (okey, ox, oy, nn_dist) of each point's exact nearest other.

    ``others`` must already carry columns (okey, ox, oy) disjoint from the
    point columns. ``exclude_self`` skips okey == key pairs (self-join mode).
    ``salt`` scatters hot cells across reducers (see ``_salt_cell_join``).
    """
    if cs is None:
        cs = estimate_cell_size(others, ox, oy)

    d = F.expr(dist_sql(x, y, ox, oy))
    parts: list[DataFrame] = []
    remaining = points
    for _ in range(max_rounds):
        lcell = F.expr(cells.cell_sql(x, y, cs))
        rcell = F.expr(cells.cell_sql(ox, oy, cs))
        lt = remaining.withColumn(
            "_cell", F.explode(F.array(*[lcell + F.lit(o) for o in cells.ring_offsets(1)]))
        )
        rt = others.withColumn("_cell", rcell)
        cand = _salt_cell_join(lt, rt, x, y, salt, broadcast_others)
        if exclude_self:
            cand = cand.where(F.col(okey) != F.col(key))
        best = _argmin(cand, d, key, okey, ox, oy)
        done = best.where(F.col("nn_dist") <= F.lit(float(cs)))
        # ONE join + ONE checkpoint per round: left-join the convergence
        # marker, materialize, then split by filter on the materialized
        # result (the earlier inner-join + anti-join formulation ran the
        # same join twice and checkpointed twice).
        marked = remaining.join(done, key, "left").localCheckpoint(eager=True)
        parts.append(marked.where(F.col("nn_dist").isNotNull()))
        remaining = marked.where(F.col("nn_dist").isNull()).select(*remaining.columns)
        if remaining.isEmpty():
            break
        cs *= 3.0
    else:
        # Termination fallback: brute-force the (tiny) residue.
        cand = remaining.crossJoin(F.broadcast(others) if broadcast_others else others)
        if exclude_self:
            cand = cand.where(F.col(okey) != F.col(key))
        best = _argmin(cand, d, key, okey, ox, oy)
        parts.append(remaining.join(best, key, "inner"))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
