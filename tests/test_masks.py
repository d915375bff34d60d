"""Behavioral mask tests — the reference's test idioms (SURVEY §5) ported
to the engine: statistical bounds, seed determinism, input immutability,
containment invariants, street-node coincidence.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from maskmypy_spark import analysis
from maskmypy_spark.operators.donut import donut
from maskmypy_spark.operators.locationswap import locationswap
from maskmypy_spark.operators.street import street
from maskmypy_spark.operators.voronoi import voronoi
from maskmypy_spark.sources import fixtures


@pytest.fixture(scope="module")
def points(spark):
    return spark.createDataFrame(fixtures.sensitive_points_pdf(400, seed=42)).cache()


@pytest.fixture(scope="module")
def addresses(spark):
    return spark.createDataFrame(fixtures.addresses_pdf(4000, seed=43)).cache()


@pytest.fixture(scope="module")
def roads(spark):
    nodes = fixtures.road_nodes_pdf(spacing=300.0)
    edges = fixtures.road_edges_pdf(nodes, spacing=300.0)
    return spark.createDataFrame(nodes).cache(), spark.createDataFrame(edges).cache()


def _disp(points, masked):
    return (
        analysis.displacement(points, masked)
        .select("_distance")
        .toPandas()["_distance"]
        .to_numpy()
    )


def test_donut_uniform_bounds_and_mean(points):
    """reference tests/masks/test_donut.py:10-25"""
    d = _disp(points, donut(points, 50.0, 500.0, seed=123))
    assert d.min() >= 50.0 and d.max() <= 500.0
    mid = (500.0 - 50.0) / 2 + 50.0
    assert abs(d.mean() - mid) < 0.2 * mid  # uniform mean ~ midpoint


def test_donut_gaussian_mean(points):
    d = _disp(points, donut(points, 50.0, 500.0, seed=123, distribution="gaussian"))
    mid = (500.0 - 50.0) / 2 + 50.0
    assert abs(d.mean() - mid) < 0.1 * mid


def test_donut_areal_skews_far(points):
    du = _disp(points, donut(points, 50.0, 500.0, seed=9))
    da = _disp(points, donut(points, 50.0, 500.0, seed=9, distribution="areal"))
    assert da.mean() > du.mean()  # max-of-two-uniforms stochastically larger


def test_donut_seed_determinism(points):
    """reference tests/masks/test_donut.py:34-38"""
    a = analysis.checksum(donut(points, 50.0, 500.0, seed=77))
    b = analysis.checksum(donut(points, 50.0, 500.0, seed=77))
    c = analysis.checksum(donut(points, 50.0, 500.0, seed=78))
    assert a == b and a != c


def test_donut_input_immutable(points):
    before = analysis.checksum(points)
    donut(points, 50.0, 500.0, seed=5).count()
    assert analysis.checksum(points) == before


def test_donut_validation(points):
    with pytest.raises(ValueError):
        donut(points, 500.0, 50.0, seed=1)


def test_donut_containment(spark, points):
    """reference tests/masks/test_donut.py:41-47: masked points stay in
    their original container polygon."""
    rect = 2000.0
    rows = []
    for ix in range(10):
        for iy in range(5):
            x0, y0 = ix * rect, iy * rect
            ring = [
                {"x": x0, "y": y0}, {"x": x0 + rect, "y": y0},
                {"x": x0 + rect, "y": y0 + rect}, {"x": x0, "y": y0 + rect},
            ]
            rows.append((ix * 10 + iy, ring))
    cont = spark.createDataFrame(rows, "poly_id long, ring array<struct<x:double,y:double>>")
    m = donut(points, 50.0, 800.0, seed=31, container=cont, max_attempts=100)
    pdf = m.join(points.select("pid", F.col("x").alias("ox"), F.col("y").alias("oy")), "pid").toPandas()
    assert len(pdf) == points.count()
    home = (pdf["ox"] // rect).astype(int) * 10 + (pdf["oy"] // rect).astype(int)
    landed = (pdf["x"] // rect).astype(int) * 10 + (pdf["y"] // rect).astype(int)
    assert (home == landed).all()
    d = np.hypot(pdf["x"] - pdf["ox"], pdf["y"] - pdf["oy"])
    assert d.min() >= 50.0 and d.max() <= 800.0


def test_donut_containment_partial_block(spark, points):
    """Attempt budgets that are NOT multiples of the internal batch size
    must preserve first-success semantics (regression: the last round used
    to explode attempt indices past max_attempts, colliding composite keys
    across points). If every point converges within the smaller budget, the
    result must be bit-identical to a larger budget's."""
    rect = 2000.0
    rows = []
    for ix in range(10):
        for iy in range(5):
            x0, y0 = ix * rect, iy * rect
            ring = [
                {"x": x0, "y": y0}, {"x": x0 + rect, "y": y0},
                {"x": x0 + rect, "y": y0 + rect}, {"x": x0, "y": y0 + rect},
            ]
            rows.append((ix * 10 + iy, ring))
    cont = spark.createDataFrame(rows, "poly_id long, ring array<struct<x:double,y:double>>")
    m12 = donut(points, 50.0, 800.0, seed=31, container=cont, max_attempts=12)
    m100 = donut(points, 50.0, 800.0, seed=31, container=cont, max_attempts=100)
    assert analysis.checksum(m12) == analysis.checksum(m100)


def test_locationswap_annulus(points, addresses):
    """reference tests/masks/test_locationswap.py:8-36"""
    m = locationswap(points, 100.0, 600.0, addresses, seed=11)
    pdf = analysis.displacement(points, m).toPandas()
    swapped = pdf[pdf["UNMASKED"] == 0]
    unmasked = pdf[pdf["UNMASKED"] == 1]
    assert len(swapped) > 0
    assert (swapped["_distance"] > 100.0).all()
    assert (swapped["_distance"] <= 600.0).all()
    assert (unmasked["_distance"] == 0.0).all()
    # swap targets are actual address points (cast np.float64 -> float first:
    # np.float64.__round__ scales-and-rints, Python round is correctly
    # rounded — they disagree on decimal half-cases)
    addr = {(float(r["ax"]), float(r["ay"])) for r in addresses.collect()}
    got = {(float(r["x"]), float(r["y"])) for _, r in swapped.iterrows()}
    assert got <= addr
    # determinism
    assert analysis.checksum(locationswap(points, 100.0, 600.0, addresses, seed=11)) == analysis.checksum(m)
    assert analysis.checksum(locationswap(points, 100.0, 600.0, addresses, seed=12)) != analysis.checksum(m)


def test_distance_join_salting_exact(points, addresses):
    """Explicit hot-cell salting (the north rule's skew handling) must not
    change results: salt=4 pair set == unsalted pair set."""
    from maskmypy_spark.operators.distance_join import distance_join

    def pairs(salt):
        j = distance_join(
            points.select("pid", "x", "y"), addresses.select("aid", "ax", "ay"),
            radius=400.0, salt=salt,
        )
        return {(r["pid"], r["aid"]) for r in j.select("pid", "aid").collect()}

    assert pairs(4) == pairs(0) and len(pairs(0)) > 0


def test_displacement_joinfree_equals_join(points):
    """The pipeline-shape (payload originals, zero-shuffle) displacement is
    value-identical to the general join-based displacement."""
    m = donut(analysis.with_original(points), 50.0, 300.0, seed=4)
    a = {
        r["pid"]: r["_distance"]
        for r in analysis.displacement_from_payload(m).select("pid", "_distance").collect()
    }
    b = {
        r["pid"]: r["_distance"]
        for r in analysis.displacement(
            points, m.drop("_orig_x", "_orig_y")
        ).select("pid", "_distance").collect()
    }
    assert a == b


def test_snap_to_streets_kwarg(points, roads):
    """Reference one-call ergonomics (masks/donut.py:82-83, voronoi.py:21):
    snap_to_streets=True lands every masked point exactly on a node."""
    nodes, _ = roads
    node_set = {(round(r["nx"], 9), round(r["ny"], 9)) for r in nodes.collect()}
    for masked in (
        donut(points, 50.0, 300.0, seed=3, snap_to_streets=True, street_nodes=nodes),
        voronoi(points, snap_to_streets=True, street_nodes=nodes),
    ):
        got = {(round(r["x"], 9), round(r["y"], 9)) for r in masked.collect()}
        assert got <= node_set
    with pytest.raises(ValueError):
        donut(points, 50.0, 300.0, seed=3, snap_to_streets=True)


def test_voronoi_midpoint_and_determinism(points):
    """Voronoi = bisector midpoint of nearest neighbor (SURVEY M5); fully
    deterministic without a seed (reference tests/test_atlas.py:206-210)."""
    m = voronoi(points)
    assert analysis.checksum(m) == analysis.checksum(voronoi(points))
    pdf = points.toPandas().set_index("pid")
    mm = m.toPandas().set_index("pid")
    xs = pdf["x"].to_numpy()
    ys = pdf["y"].to_numpy()
    ids = pdf.index.to_numpy()
    for pid in ids[:25]:
        px, py = pdf.at[pid, "x"], pdf.at[pid, "y"]
        d = np.hypot(xs - px, ys - py)
        d[ids == pid] = np.inf
        q = d.argmin()
        assert mm.at[pid, "x"] == pytest.approx((px + xs[q]) / 2, abs=1e-9)
        assert mm.at[pid, "y"] == pytest.approx((py + ys[q]) / 2, abs=1e-9)


def test_street_independent_oracle(spark, roads):
    """End-to-end street-mask oracle: an INDEPENDENT pure-Python
    re-derivation (brute-force NN snap, dict-based Dijkstra with cutoff
    doubling, mean-distance pick, same documented tie-breaks) must produce
    the exact coordinates the distributed operator emits."""
    import heapq

    from maskmypy_spark.functions import rng as _rng
    from maskmypy_spark.sources import fixtures as _fx

    nodes, edges = roads
    npdf = nodes.toPandas()
    epdf = edges.toPandas()
    pts_pdf = _fx.sensitive_points_pdf(60, seed=42)
    pts = spark.createDataFrame(pts_pdf)
    LOW_N, HIGH_N, MAXLEN, SEED_S = 8, 14, 400.0, 77

    masked = {
        r["pid"]: (r["x"], r["y"])
        for r in street(pts, LOW_N, HIGH_N, nodes, edges,
                        max_length=MAXLEN, seed=SEED_S).collect()
    }

    # --- independent re-derivation (plain dicts, no CSR, no Spark) ---
    coord = {int(r.node_id): (float(r.nx), float(r.ny)) for r in npdf.itertuples()}
    adj: dict[int, list[tuple[int, float]]] = {}
    valid = set()
    for r in epdf.itertuples():
        adj.setdefault(int(r.src), []).append((int(r.dst), float(r.length)))
        if r.length <= MAXLEN:
            valid.add(int(r.src)); valid.add(int(r.dst))

    def dijkstra_pick(start: int, target: int) -> int:
        cutoff, prev = MAXLEN, -1
        while True:
            dist: dict[int, float] = {}
            heap = [(0.0, start)]
            while heap:
                d, u = heapq.heappop(heap)
                if u in dist or d > cutoff:
                    continue
                dist[u] = d
                for v, wgt in adj.get(u, []):
                    if v not in dist and d + wgt <= cutoff:
                        heapq.heappush(heap, (d + wgt, v))
            if len(dist) >= target or len(dist) == prev:
                break
            prev = len(dist)
            cutoff *= 2.0
        take = min(target, len(dist))
        items = sorted(dist.items(), key=lambda kv: (kv[1], kv[0]))[:take]
        mean_d = sum(d for _, d in items) / take
        return min(items, key=lambda kv: (abs(kv[1] - mean_d), kv[0]))[0]

    import numpy as np2

    for r in pts_pdf.itertuples():
        # snap: nearest VALID node, ties by (distance, node_id)
        best = min(
            ((np2.hypot(coord[n][0] - r.x, coord[n][1] - r.y), n) for n in valid),
        )
        u = _rng.u_np(np2.array([int(r.pid)]), _rng.TAG_STREET_N, SEED_S)[0]
        target = LOW_N + int(np2.floor(u * (HIGH_N - LOW_N)))
        picked = dijkstra_pick(best[1], int(target))
        assert masked[r.pid] == coord[picked], f"pid {r.pid}"


def test_street_k_adaptive_loop(points, roads, addresses):
    """M4 (reference masks/street.py:82-192): escalating loop reaches a
    satisfying configuration, logs iterations, suppresses sub-k points."""
    from maskmypy_spark.operators.street import street_k

    nodes, edges = roads
    iters = []
    out = street_k(
        points, addresses, min_k=3, start=8, stop=60, spread=4,
        suppression=0.6, max_length=400.0, seed=21,
        nodes=nodes, edges=edges, on_iteration=iters.append,
    )
    pdf = out.toPandas()
    assert len(pdf) == points.count()
    assert len(iters) >= 1
    assert iters[-1]["k_satisfaction"] >= 0.6
    assert set(pdf["SUPPRESSED"].unique()) <= {"TRUE", "FALSE"}
    # suppressed points sit at the mean center of the masked pattern
    sup = pdf[pdf["SUPPRESSED"] == "TRUE"]
    if len(sup):
        assert sup["x"].nunique() == 1 and sup["y"].nunique() == 1


def test_street_k_region_path(points, roads, addresses, monkeypatch):
    """VERDICT r03 'What's missing' #3: street_k(region_size=) routes every
    iteration through the cogrouped street_by_region path — no driver graph
    bound (street() provably never called), region_exact_frac in the
    iteration metrics, and parity with the global loop (margin covers the
    whole fixture box, so every row is certificate-exact)."""
    import importlib

    street_mod = importlib.import_module("maskmypy_spark.operators.street")

    nodes, edges = roads
    kw = dict(
        min_k=3, start=8, stop=60, spread=4, suppression=0.6,
        max_length=400.0, seed=21, nodes=nodes, edges=edges,
    )
    g = street_mod.street_k(points, addresses, **kw).toPandas()

    def _no_driver_street(*a, **k):
        raise AssertionError(
            "street_k(region_size=) must not call the driver-bounded street()"
        )

    monkeypatch.setattr(street_mod, "street", _no_driver_street)
    iters = []
    r = street_mod.street_k(
        points, addresses, on_iteration=iters.append,
        region_size=3000.0, margin=25000.0, **kw,
    ).toPandas()
    assert iters and all(it["region_exact_frac"] == 1.0 for it in iters)
    gs = g.sort_values("pid").reset_index(drop=True)
    rs = r.sort_values("pid").reset_index(drop=True)
    assert list(gs.columns) == list(rs.columns)
    for c in ("pid", "x", "y", "SUPPRESSED"):
        assert gs[c].tolist() == rs[c].tolist(), c


def test_street_masks_to_nodes(points, roads, addresses):
    """Engine contract for M3 (reference masks/street.py semantics with the
    documented order-free substitution): output coincides with road nodes,
    displacement grows with the node-count range, seeded determinism."""
    nodes, edges = roads
    m1 = street(points, 5, 10, nodes, edges, max_length=400.0, seed=3)
    out = m1.toPandas()
    assert len(out) == points.count()
    node_set = {(round(r["nx"], 9), round(r["ny"], 9)) for r in nodes.collect()}
    got = {(round(v["x"], 9), round(v["y"], 9)) for _, v in out.iterrows()}
    assert got <= node_set
    # larger target counts => farther displacement on average
    d1 = _disp(points, m1)
    d2 = _disp(points, street(points, 40, 50, nodes, edges, max_length=400.0, seed=3))
    assert d2.mean() > d1.mean()
    # determinism
    assert analysis.checksum(street(points, 5, 10, nodes, edges, max_length=400.0, seed=3)) == analysis.checksum(m1)


def test_street_by_region_matches_global(points, roads):
    """street_by_region (the beyond-driver-bound path street.py:132-137
    points to): identical coordinates to the global street mask wherever
    the per-row region_exact certificate holds, near-total coverage at a
    sane margin, and it works where street()'s driver bound refuses."""
    from maskmypy_spark.operators.street import street_by_region

    nodes, edges = roads
    g = {
        r["pid"]: (r["x"], r["y"])
        for r in street(points, 10, 20, nodes, edges, max_length=500.0, seed=7).collect()
    }
    rows = street_by_region(
        points, 10, 20, nodes, edges, region_size=3000.0,
        max_length=500.0, seed=7,
    ).collect()
    assert len(rows) == len(g)
    exact = [r for r in rows if r["region_exact"]]
    assert len(exact) / len(rows) > 0.9  # interior points dominate
    for r in exact:
        assert (r["x"], r["y"]) == g[r["pid"]]

    # the driver-materialized path refuses a graph over its bound; the
    # region path is the documented escape hatch
    with pytest.raises(ValueError, match="max_graph_nodes"):
        street(points, 10, 20, nodes, edges, max_length=500.0, seed=7,
               max_graph_nodes=100)


def test_mark_unmasked_idiom(spark, points):
    """reference tests/test_tools.py:25-35: translated points -> UNMASKED=0,
    untouched points -> UNMASKED=1 (our 1 means 'kept original')."""
    moved = points.withColumn(
        "x", F.when(F.col("pid") >= 5, F.col("x") + 1.0).otherwise(F.col("x"))
    )
    marked = analysis.mark_unmasked(points, moved)
    got = {r["pid"]: r["UNMASKED"] for r in marked.collect()}
    n = points.count()
    assert all(got[p] == 0 for p in got if p >= 5)
    assert all(got[p] == 1 for p in got if p < 5)
    assert sum(got.values()) == 5


def test_crs_validation_analogue(spark, points, addresses):
    """A18 (reference tools.py:165-180): tagged layers with mismatched CRS
    raise; matching or untagged layers pass; non-numeric geometry columns
    raise the geometry-kind error."""
    from maskmypy_spark.functions import meta
    from maskmypy_spark.operators.locationswap import locationswap

    p = meta.with_crs(points, "EPSG:26910")
    a_ok = meta.with_crs(addresses, "EPSG:26910", x="ax")
    a_bad = meta.with_crs(addresses, "EPSG:4326", x="ax")
    assert meta.crs_of(p) == "EPSG:26910"
    locationswap(p, 50.0, 300.0, a_ok, seed=1)          # matching: fine
    locationswap(points, 50.0, 300.0, a_bad, seed=1)    # one untagged: exempt
    with pytest.raises(ValueError, match="matching CRS"):
        locationswap(p, 50.0, 300.0, a_bad, seed=1)

    bad = points.withColumn("x", F.col("x").cast("string"))
    with pytest.raises(ValueError, match="Unexpected geometry type"):
        locationswap(bad, 50.0, 300.0, addresses, seed=1)


def test_adaptive_radius_join_salted_and_plain_equal(points, addresses):
    """The adaptive per-row-ring join (left_radius_col) must return exactly
    the closed-disk pairs, with and without hot-cell salting."""
    from maskmypy_spark.operators.distance_join import distance_join

    cand = points.withColumn("_radius", 150.0 + (F.col("pid") % 4) * 100.0)

    def pairs(salt):
        j = distance_join(
            cand.select("pid", "x", "y", "_radius"),
            addresses.select("aid", "ax", "ay"),
            radius=450.0, left_radius_col="_radius", salt=salt,
        )
        return {(r["pid"], r["aid"]) for r in j.select("pid", "aid").collect()}

    a = pairs(0)
    assert pairs(4) == a and len(a) > 0
    # ground truth: brute-force closed disk at each row's own radius
    import numpy as np

    P = points.join(cand.select("pid", "_radius"), "pid").collect()
    A = addresses.collect()
    ax = np.array([r["ax"] for r in A]); ay = np.array([r["ay"] for r in A])
    aid = np.array([r["aid"] for r in A])
    want = set()
    for r in P:
        d = np.hypot(ax - r["x"], ay - r["y"])
        for i in np.where(d <= r["_radius"])[0]:
            want.add((r["pid"], int(aid[i])))
    assert a == want
