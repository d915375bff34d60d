"""Street mask — displace each point to a road node whose network distance
from the snapped node is closest to the mean distance of its K nearest
network neighbors (K random per point).

Reference: /root/reference/maskmypy/masks/street.py:202-293.
 - :236-249 snap to nearest node having >=1 neighbor within max_length;
   the reference DELETES failing nodes from a temp graph while scanning, so
   its result depends on point iteration order — no distributed analogue.
   Engine divergence (SURVEY §7 hard-part 3): node validity is a GLOBAL
   precomputed property (>=1 incident edge <= max_length), order-free.
 - :253 target_node_count = rng.integers(low, high, endpoint=False)
   => engine: low + floor(u * (high - low)), u from the per-row hash-RNG.
 - :257-262 Dijkstra with cutoff doubling until >= target nodes reached.
 - :264-283 take the target_node_count nearest nodes by network distance
   (dict insertion order == heap pop order == nondecreasing distance),
   target_distance = their mean, move to the node minimizing
   |dist - target_distance|. Engine tie-breaks by (distance, node_id) —
   deterministic under any partitioning (networkx's heap order is not).

Execution: roads are a broadcast CSR (numpy int/float arrays — the graph is
a small dimension vs the point fact table); snapping is the exact kNN join;
Dijkstras run ONCE PER DISTINCT (snapped node, target) pair via
applyInPandas, then equi-join back to points — at scale, millions of points
collapse onto the (bounded) set of road nodes, so Dijkstra work is O(nodes),
not O(points).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions import rng
from .knn import nearest_neighbor


def build_csr(nodes_pdf: pd.DataFrame, edges_pdf: pd.DataFrame, max_length: float):
    """Dense-index CSR adjacency + node coordinate arrays (driver-side;
    broadcast to executors via task closure / sc.broadcast)."""
    ids = nodes_pdf["node_id"].to_numpy(np.int64)
    order = np.argsort(ids)
    ids = ids[order]
    xs = nodes_pdf["nx"].to_numpy(np.float64)[order]
    ys = nodes_pdf["ny"].to_numpy(np.float64)[order]
    remap = {int(v): i for i, v in enumerate(ids)}
    src = edges_pdf["src"].map(remap).to_numpy()
    dst = edges_pdf["dst"].map(remap).to_numpy()
    w = edges_pdf["length"].to_numpy(np.float64)
    s = np.argsort(src, kind="stable")
    src, dst, w = src[s], dst[s], w[s]
    indptr = np.searchsorted(src, np.arange(len(ids) + 1))
    # global node validity: >=1 incident edge with length <= max_length
    valid = np.zeros(len(ids), dtype=bool)
    ok = w <= max_length
    valid[src[ok]] = True
    valid[dst[ok]] = True
    return {
        "ids": ids, "xs": xs, "ys": ys,
        "indptr": indptr, "indices": dst, "weights": w, "valid": valid,
    }


def _dijkstra_pick(csr, start_dense: int, target: int, max_length: float):
    """First `target` nodes by network distance (cutoff-doubling), then the
    node minimizing (|d - mean|, node_id). Returns (dense node index,
    final cutoff) — the cutoff bounds the explored ball, which
    street_by_region uses to certify boundary-independence.

    Termination: if the reachable set stops growing between doublings (the
    snapped node's connected component has fewer than `target` nodes), fall
    back to the mean over what exists — the reference's identical loop
    (masks/street.py:257-262) would spin forever on such a component; here
    it would hang a distributed task, so the guard is mandatory."""
    indptr, indices, weights = csr["indptr"], csr["indices"], csr["weights"]
    cutoff = max_length
    prev_reached = -1
    while True:
        dist: dict[int, float] = {}
        heap = [(0.0, start_dense)]
        while heap:
            d, u = heapq.heappop(heap)
            if u in dist:
                continue
            if d > cutoff:
                continue
            dist[u] = d
            for e in range(indptr[u], indptr[u + 1]):
                v = indices[e]
                nd = d + weights[e]
                if nd <= cutoff and v not in dist:
                    heapq.heappush(heap, (nd, v))
        if len(dist) >= target:
            break
        if len(dist) == prev_reached:
            break  # exhausted the connected component; use all reachable
        prev_reached = len(dist)
        cutoff *= 2.0
    n_take = min(target, len(dist))
    items = sorted(dist.items(), key=lambda kv: (kv[1], csr["ids"][kv[0]]))[:n_take]
    mean_d = sum(d for _, d in items) / n_take
    best = min(items, key=lambda kv: (abs(kv[1] - mean_d), csr["ids"][kv[0]]))
    return best[0], cutoff


def street(
    df: DataFrame,
    low: int,
    high: int,
    nodes: DataFrame,
    edges: DataFrame,
    max_length: float = 1000.0,
    seed: int | None = None,
    key: str = "pid",
    x: str = "x",
    y: str = "y",
    max_graph_nodes: int = 20_000_000,
) -> DataFrame:
    """Mask points onto the road network (all payload columns preserved).

    The road graph is a driver-materialized broadcast dimension — fine for
    city/region graphs, a hard wall for continent-scale networks.
    ``max_graph_nodes`` makes that assumption explicit: exceeding it raises
    instead of silently OOMing the driver (at the default bound the CSR is
    ~1 GB of numpy arrays)."""
    if low >= high:
        raise ValueError("Minimum target node count must be below maximum.")
    seed = rng.gen_seed() if not seed else seed

    spark = df.sparkSession
    n_nodes = nodes.count()
    if n_nodes > max_graph_nodes:
        raise ValueError(
            f"Road graph has {n_nodes} nodes > max_graph_nodes={max_graph_nodes}; "
            "the street mask materializes the graph on the driver. Use "
            "street_by_region(...) (fully distributed, per-region subgraphs) "
            "or raise the bound explicitly."
        )
    nodes_pdf = nodes.toPandas()
    edges_pdf = edges.toPandas()
    csr = build_csr(nodes_pdf, edges_pdf, max_length)
    bc = spark.sparkContext.broadcast(csr)

    valid_nodes = spark.createDataFrame(
        pd.DataFrame(
            {
                "_sn_id": csr["ids"][csr["valid"]],
                "_sn_x": csr["xs"][csr["valid"]],
                "_sn_y": csr["ys"][csr["valid"]],
            }
        )
    )
    snapped = nearest_neighbor(
        df, valid_nodes, key=key, x=x, y=y,
        okey="_sn_id", ox="_sn_x", oy="_sn_y", broadcast_others=True,
    ).drop("_sn_x", "_sn_y", "nn_dist")

    # per-row target node count from the hash-RNG: low + floor(u*(high-low))
    snapped = snapped.withColumn(
        "_target",
        (
            F.lit(int(low))
            + F.floor(
                F.expr(rng.u_sql(key, rng.TAG_STREET_N, seed)) * F.lit(int(high - low))
            )
        ).cast("int"),
    )

    configs = snapped.select("_sn_id", "_target").distinct()

    def run_configs(it):
        csr_l = bc.value
        remap = {int(v): i for i, v in enumerate(csr_l["ids"])}
        for pdf in it:
            outs = []
            for nid, tgt in zip(pdf["_sn_id"], pdf["_target"]):
                dense, _ = _dijkstra_pick(csr_l, remap[int(nid)], int(tgt), max_length)
                outs.append(
                    (int(nid), int(tgt), float(csr_l["xs"][dense]), float(csr_l["ys"][dense]))
                )
            yield pd.DataFrame(
                outs, columns=["_sn_id", "_target", "_mx", "_my"]
            )

    resolved = configs.repartition(max(8, spark.sparkContext.defaultParallelism)).mapInPandas(
        run_configs, schema="_sn_id long, _target int, _mx double, _my double"
    )

    out = snapped.join(resolved, ["_sn_id", "_target"])
    return (
        out.withColumn(x, F.col("_mx"))
        .withColumn(y, F.col("_my"))
        .drop("_sn_id", "_target", "_mx", "_my")
    )


def street_by_region(
    df: DataFrame,
    low: int,
    high: int,
    nodes: DataFrame,
    edges: DataFrame,
    region_size: float,
    margin: float | None = None,
    max_length: float = 1000.0,
    seed: int | None = None,
    key: str = "pid",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Street mask WITHOUT the driver-materialized graph bound — the
    continent-scale path ``street`` points to at street.py:132-137.

    Fully distributed: points hash into coarse grid regions
    (``region_size``); every road node replicates to the regions within
    ``margin`` of it (cell-ring explode); edges follow when BOTH endpoints
    are present; one ``cogroup().applyInPandas`` then snaps + Dijkstra-picks
    each region against its LOCAL subgraph — no driver collect, no
    broadcast, graph memory per task = one region's margin-expanded
    subgraph.

    Node snap-validity is computed GLOBALLY first (one distributed
    semi-join: >=1 incident edge <= max_length) and shipped as a flag, so
    boundary truncation cannot flip it.

    Semantics vs :func:`street`: identical whenever a point's snap distance
    plus its final Dijkstra cutoff fits inside ``margin`` (everything the
    global algorithm would explore is present in the local subgraph). The
    output column ``region_exact`` certifies that bound PER ROW — rows
    where it is False (points near a region border with an unusually deep
    exploration) may differ from the global mask; re-run those few through
    ``street`` or enlarge ``margin``. Default margin = 8 * max_length
    (three cutoff doublings beyond the snap ball).
    """
    import math as _math

    if low >= high:
        raise ValueError("Minimum target node count must be below maximum.")
    seed = rng.gen_seed() if not seed else seed
    margin = float(margin if margin is not None else 8.0 * max_length)

    from ..functions import cells

    ok = edges.where(F.col("length") <= float(max_length))
    valid_ids = (
        ok.select(F.col("src").alias("node_id"))
        .unionByName(ok.select(F.col("dst").alias("node_id")))
        .distinct()
        .withColumn("_valid", F.lit(1))
    )
    nodes_v = nodes.join(valid_ids, "node_id", "left").withColumn(
        "_valid", F.coalesce("_valid", F.lit(0))
    )

    ring = max(1, int(_math.ceil(margin / float(region_size))))
    ncell = F.expr(cells.cell_sql("nx", "ny", float(region_size)))
    repn = nodes_v.withColumn(
        "_region",
        F.explode(F.array(*[ncell + F.lit(o) for o in cells.ring_offsets(ring)])),
    )
    rep_src = repn.select(F.col("node_id").alias("src"), "_region")
    rep_dst = repn.select(F.col("node_id").alias("dst"), "_region")
    repe = edges.join(rep_src, "src").join(rep_dst, ["dst", "_region"])

    # nodes + edges as ONE discriminated frame (cogroup takes two sides)
    graph = repn.select(
        "_region",
        F.lit(0).alias("_kind"),
        F.col("node_id").alias("_a"),
        F.col("nx").alias("_u"),
        F.col("ny").alias("_v"),
        F.col("_valid").cast("double").alias("_w"),
    ).unionByName(
        repe.select(
            "_region",
            F.lit(1).alias("_kind"),
            F.col("src").alias("_a"),
            F.col("dst").cast("double").alias("_u"),
            F.col("length").alias("_v"),
            F.lit(0.0).alias("_w"),
        )
    )

    pts = df.withColumn("_region", F.expr(cells.cell_sql(x, y, float(region_size))))
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", region_exact boolean"
    cols = list(df.columns)
    xi, yi = cols.index(x), cols.index(y)
    span = int(high - low)

    def mask_region(_k, pts_pdf, graph_pdf):
        if len(pts_pdf) == 0:
            return pts_pdf[cols].assign(region_exact=np.zeros(0, dtype=bool))
        nmask = graph_pdf["_kind"].to_numpy() == 0
        npdf = pd.DataFrame(
            {
                "node_id": graph_pdf.loc[nmask, "_a"].to_numpy(np.int64),
                "nx": graph_pdf.loc[nmask, "_u"].to_numpy(np.float64),
                "ny": graph_pdf.loc[nmask, "_v"].to_numpy(np.float64),
            }
        )
        valid = graph_pdf.loc[nmask, "_w"].to_numpy(np.float64) > 0.5
        epdf = pd.DataFrame(
            {
                "src": graph_pdf.loc[~nmask, "_a"].to_numpy(np.int64),
                "dst": graph_pdf.loc[~nmask, "_u"].to_numpy(np.int64),
                "length": graph_pdf.loc[~nmask, "_v"].to_numpy(np.float64),
            }
        )
        if not valid.any():
            raise ValueError(
                "street_by_region: a region has points but no snap-valid "
                "node within margin — enlarge margin or region_size."
            )
        csr = build_csr(npdf, epdf, max_length)
        # build_csr recomputes validity from the TRUNCATED subgraph; ship
        # the global flag instead (aligned to build_csr's id sort)
        order = np.argsort(npdf["node_id"].to_numpy(np.int64))
        csr["valid"] = valid[order]
        remap = {int(v): i for i, v in enumerate(csr["ids"])}

        vxs = csr["xs"][csr["valid"]]
        vys = csr["ys"][csr["valid"]]
        vids = csr["ids"][csr["valid"]]
        pids = pts_pdf[key].to_numpy(np.int64)
        pxs = pts_pdf[x].to_numpy(np.float64)
        pys = pts_pdf[y].to_numpy(np.float64)
        us = rng.u_np(pids, rng.TAG_STREET_N, seed)
        targets = (low + np.floor(us * span)).astype(np.int64)

        out = pts_pdf[cols].copy()
        exact = np.zeros(len(pts_pdf), dtype=bool)
        mxs = np.empty(len(pts_pdf))
        mys = np.empty(len(pts_pdf))
        for i in range(len(pts_pdf)):
            d2 = (vxs - pxs[i]) ** 2 + (vys - pys[i]) ** 2
            # deterministic (dist, node_id) argmin over the local candidates
            j = np.lexsort((vids, d2))[0]
            snap_d = float(np.sqrt(d2[j]))
            dense, cutoff = _dijkstra_pick(
                csr, remap[int(vids[j])], int(targets[i]), max_length
            )
            mxs[i] = csr["xs"][dense]
            mys[i] = csr["ys"][dense]
            exact[i] = snap_d + cutoff <= margin
        out.iloc[:, xi] = mxs
        out.iloc[:, yi] = mys
        out["region_exact"] = exact
        return out

    return (
        pts.groupBy("_region")
        .cogroup(graph.groupBy("_region"))
        .applyInPandas(mask_region, schema=out_schema)
    )


def street_k(
    df: DataFrame,
    address: DataFrame,
    min_k: int = 30,
    start: int = 10,
    stop: int = 60,
    spread: int = 2,
    increment: int = 2,
    suppression: float = 0.99,
    max_length: float = 1000.0,
    seed: int | None = None,
    nodes: DataFrame | None = None,
    edges: DataFrame | None = None,
    key: str = "pid",
    x: str = "x",
    y: str = "y",
    on_iteration=None,
    region_size: float | None = None,
    margin: float | None = None,
) -> DataFrame:
    """Adaptive privacy loop (reference masks/street.py:82-192): escalate
    (low, high) until k-satisfaction(min_k) >= suppression, then suppress
    sub-min_k points. Each iteration is one Spark job chain; per-iteration
    metrics go to ``on_iteration`` (the lineage manifest hooks in here,
    making the loop resumable at iteration granularity).

    ``region_size`` routes every iteration through :func:`street_by_region`
    instead of the driver-bounded :func:`street` — the continent-scale loop
    (no ``max_graph_nodes`` wall). Each iteration's mask is checkpointed
    once (certificate aggregate + k-join read the same materialization, so
    the cogrouped Dijkstra never re-runs), the per-row ``region_exact``
    certificate is aggregated into the iteration metrics as
    ``region_exact_frac``, and the column is dropped before k-verification
    so both paths feed identical schemas downstream. ``margin`` passes
    through (default 8 * max_length — see street_by_region's bound)."""
    from .. import analysis
    from .suppress import suppress as suppress_op

    seed = rng.gen_seed() if not seed else seed
    low = start
    while True:
        extra = {}
        if region_size is not None:
            # one materialization per iteration: certificate aggregate (when
            # requested) + k-join read the checkpoint, the cogrouped
            # Dijkstra never re-runs; the previous iteration's checkpoint
            # blocks free via the ContextCleaner once its reference drops
            mr = street_by_region(
                df, low, low + spread, nodes, edges, region_size,
                margin=margin, max_length=max_length, seed=seed,
                key=key, x=x, y=y,
            ).localCheckpoint(eager=True)
            if on_iteration is not None:
                # the certificate aggregate is an extra job — only pay it
                # when someone consumes the metrics
                # avg over zero rows is NULL — coalesce so an empty masked
                # frame reports 0.0 instead of float(None) raising TypeError
                extra["region_exact_frac"] = float(
                    mr.agg(
                        F.coalesce(
                            F.avg(F.col("region_exact").cast("double")),
                            F.lit(0.0),
                        )
                    ).collect()[0][0]
                )
            masked = mr.drop("region_exact")
        else:
            masked = street(
                df, low, low + spread, nodes, edges,
                max_length=max_length, seed=seed, key=key, x=x, y=y,
            )
        kdf = analysis.k_anonymity_address(df, masked, address, key=key, x=x, y=y)
        sat = analysis.k_satisfaction_value(kdf, min_k)
        if on_iteration is not None:
            on_iteration(
                {"low": low, "high": low + spread, "k_satisfaction": sat, **extra}
            )
        if sat >= suppression:
            return suppress_op(kdf, min_k, x=x, y=y)
        low += increment
        if low > stop:
            raise RuntimeError(
                f"street_k reached stop={stop} without satisfying k={min_k} "
                f"at suppression={suppression}"
            )
