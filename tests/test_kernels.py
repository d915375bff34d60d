"""Kernel unit tests: hash-RNG three-renderer parity, cell index, geometry.

No Spark needed except for the SQL-parity checks (duckdb carries the pure-SQL
side; the Spark side is covered again end-to-end in test_operators.py).
"""

import math

import duckdb
import numpy as np
import pytest

from maskmypy_spark.functions import cells, geometry, rng


def test_u_np_range_and_determinism():
    keys = np.arange(1, 20001)
    u = rng.u_np(keys, rng.TAG_DONUT_R, seed=42)
    assert u.min() >= 0.0 and u.max() < 1.0
    again = rng.u_np(keys, rng.TAG_DONUT_R, seed=42)
    assert np.array_equal(u, again)
    other_seed = rng.u_np(keys, rng.TAG_DONUT_R, seed=43)
    assert not np.array_equal(u, other_seed)
    other_tag = rng.u_np(keys, rng.TAG_DONUT_X, seed=42)
    assert not np.array_equal(u, other_tag)


def test_u_np_wide_key_fold():
    """Keys differing by 2^31 (BIGINT keys at the 100 TB target) must NOT
    share streams — the two-prime fold mixes the high bits (regression for
    the single `% 2^31` fold, whose streams had period 2^31 in the key)."""
    base = np.arange(1, 2001, dtype=np.int64)
    for delta in (1 << 31, 1 << 32, (1 << 31) - 1, 7 << 40):
        a = rng.u_np(base, rng.TAG_DONUT_R, seed=42)
        b = rng.u_np(base + delta, rng.TAG_DONUT_R, seed=42)
        assert (a != b).mean() > 0.999, f"stream collision at key delta {delta}"


def test_u_np_uniformity():
    """Mean/variance/histogram sanity — matches the reference's statistical
    test tolerances (tests/masks/test_donut.py:10-25 uses ±10% of midpoint)."""
    u = rng.u_np(np.arange(1, 100001), rng.TAG_DONUT_R, seed=7)
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.var() - 1.0 / 12.0) < 0.005
    hist, _ = np.histogram(u, bins=10, range=(0, 1))
    assert hist.min() > 100000 / 10 * 0.9


def test_u_sql_matches_numpy_bit_exact():
    keys = np.arange(1, 5001)
    for tag, seed, draw in [(rng.TAG_DONUT_R, 42, 0), (rng.TAG_SWAP, 987654321, 3)]:
        expr = rng.u_sql("k", tag, seed, draw)
        got = (
            duckdb.sql(f"SELECT {expr} AS u FROM (SELECT unnest(range(1, 5001)) AS k)")
            .fetchnumpy()["u"]
        )
        want = rng.u_np(keys, tag, seed, draw)
        assert np.array_equal(got, want)


def test_cell_sql_matches_numpy():
    x = np.linspace(-1000, 21000, 777)
    y = np.linspace(-500, 11000, 777)
    want = cells.cell_np(x, y, 500.0)
    con = duckdb.connect()
    con.execute("CREATE TABLE pts AS SELECT unnest($1::DOUBLE[]) AS x, unnest($2::DOUBLE[]) AS y", [list(x), list(y)])
    got = con.sql(f"SELECT {cells.cell_sql('x', 'y', 500.0)} AS c FROM pts").fetchnumpy()["c"]
    assert np.array_equal(got, want)


def test_cell_neighbors_cover_radius():
    """Pairs within radius always share a cell after ring expansion."""
    rs = np.random.RandomState(0)
    px, py = rs.uniform(0, 5000, 500), rs.uniform(0, 5000, 500)
    qx, qy = px + rs.uniform(-400, 400, 500), py + rs.uniform(-400, 400, 500)
    cs, radius = 500.0, 400.0
    r = cells.ring_for_radius(radius, cs)
    pc = cells.cell_np(px, py, cs)
    qc = cells.cell_np(qx, qy, cs)
    offs = np.array(cells.ring_offsets(r))
    dist = np.hypot(px - qx, py - qy)
    near = dist <= radius
    covered = (qc[:, None] == (pc[:, None] + offs[None, :])).any(axis=1)
    assert covered[near].all()


def test_ring_area_and_pip():
    sq_x = np.array([0.0, 2.0, 2.0, 0.0])
    sq_y = np.array([0.0, 0.0, 2.0, 2.0])
    assert geometry.ring_area(sq_x, sq_y) == pytest.approx(4.0)
    px = np.array([1.0, 3.0, -0.5, 1.999])
    py = np.array([1.0, 1.0, 1.0, 0.001])
    inside = geometry.points_in_ring(px, py, sq_x, sq_y)
    assert inside.tolist() == [True, False, False, True]


def test_circle_ring_area_closed_forms():
    # unit square fully containing a small circle
    sq_x = np.array([-5.0, 5.0, 5.0, -5.0])
    sq_y = np.array([-5.0, -5.0, 5.0, 5.0])
    assert geometry.circle_ring_area(0, 0, 1.0, sq_x, sq_y) == pytest.approx(math.pi, rel=1e-9)
    # circle centered at square corner -> quarter coverage (reference golden
    # geometry, /root/reference/tests/test_analysis.py:104-126, exact circle
    # instead of the reference's 32-gon buffer approximation)
    q_x = np.array([0.0, 1.0, 1.0, 0.0])
    q_y = np.array([0.0, 0.0, 1.0, 1.0])
    assert geometry.circle_ring_area(0, 0, 1.0, q_x, q_y) == pytest.approx(math.pi / 4, rel=1e-9)
    # circle fully containing the polygon -> polygon area
    assert geometry.circle_ring_area(0.5, 0.5, 10.0, q_x, q_y) == pytest.approx(1.0, rel=1e-9)
    # half coverage: circle centered on an edge midpoint
    assert geometry.circle_ring_area(0.5, 0.0, 0.4, q_x, q_y) == pytest.approx(
        math.pi * 0.16 / 2, rel=1e-9
    )


def test_circle_ring_area_montecarlo():
    rs = np.random.RandomState(3)
    ring_x = np.array([0.0, 3.0, 4.0, 2.0, -1.0])
    ring_y = np.array([0.0, -1.0, 2.0, 4.0, 2.0])
    for cx, cy, r in [(1.0, 1.0, 1.5), (5.0, 5.0, 3.0), (-2.0, 0.0, 2.5), (2.0, 1.0, 10.0)]:
        got = geometry.circle_ring_area(cx, cy, r, ring_x, ring_y)
        n = 400000
        sx = rs.uniform(cx - r, cx + r, n)
        sy = rs.uniform(cy - r, cy + r, n)
        in_circle = (sx - cx) ** 2 + (sy - cy) ** 2 <= r * r
        in_poly = geometry.points_in_ring(sx, sy, ring_x, ring_y)
        mc = (in_circle & in_poly).mean() * (2 * r) ** 2
        assert got == pytest.approx(mc, abs=max(0.05 * mc, 0.05))
