"""Vectorized planar geometry kernels (pure numpy — shapely/GEOS are not
available in this environment, and these run inside Arrow UDF batches).

Implements exactly what the reference consumes from shapely/geopandas:
 - point-in-polygon (``container.intersects(point)``, donut.py:153,165)
 - polygon area (``gdf.geometry.area``, analysis.py:526,532)
 - circle ∩ polygon intersection area (buffer+intersection, analysis.py:
   563-579) — exact closed form, NOT the reference's 32-gon buffer
   approximation; divergence documented in tests/test_geometry.py.

All kernels are vectorized over flat (pair, edge) arrays so Arrow batches of
thousands of candidate pairs cost one numpy pass, never a Python loop per row.
"""

from __future__ import annotations

import numpy as np


def ring_area(xs: np.ndarray, ys: np.ndarray) -> float:
    """Signed shoelace area of a closed ring (first vertex not repeated)."""
    x2 = np.roll(xs, -1)
    y2 = np.roll(ys, -1)
    return 0.5 * float(np.sum(xs * y2 - x2 * ys))


def points_in_ring(px: np.ndarray, py: np.ndarray, rx: np.ndarray, ry: np.ndarray) -> np.ndarray:
    """Ray-cast containment of many points against one ring. Returns bool[n].

    Even-odd rule; boundary behavior is half-open (standard crossing rule),
    matching the de-facto reference contract that containers tile the plane
    without overlap (donut.py:158-161).
    """
    px = np.asarray(px, dtype=np.float64)[:, None]
    py = np.asarray(py, dtype=np.float64)[:, None]
    x1 = np.asarray(rx, dtype=np.float64)[None, :]
    y1 = np.asarray(ry, dtype=np.float64)[None, :]
    x2 = np.roll(rx, -1)[None, :]
    y2 = np.roll(ry, -1)[None, :]
    straddle = (y1 > py) != (y2 > py)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = (x2 - x1) * (py - y1) / (y2 - y1) + x1
    crossing = straddle & (px < xint)
    return (np.count_nonzero(crossing, axis=1) % 2).astype(bool)


def _sector(ux, uy, vx, vy, r2):
    """Signed circular-sector area from U to V (short way), radius² = r2."""
    cross = ux * vy - uy * vx
    dot = ux * vx + uy * vy
    return 0.5 * r2 * np.arctan2(cross, dot)


def circle_poly_edge_area(ax, ay, bx, by, r) -> np.ndarray:
    """Per-edge signed contribution to area(disk(origin, r) ∩ polygon).

    Inputs are flat arrays of edge endpoints in circle-centered coordinates
    (one row per (pair, edge)); sum rows per pair to get the signed
    intersection area (positive for CCW rings). Classic triangle-fan
    decomposition: each edge contributes area(disk ∩ triangle(O, A, B)),
    split into triangle / sector parts depending on where the edge crosses
    the circle.
    """
    ax = np.asarray(ax, dtype=np.float64)
    ay = np.asarray(ay, dtype=np.float64)
    bx = np.asarray(bx, dtype=np.float64)
    by = np.asarray(by, dtype=np.float64)
    r = np.asarray(r, dtype=np.float64)
    r2 = r * r

    dA2 = ax * ax + ay * ay
    dB2 = bx * bx + by * by
    inA = dA2 <= r2
    inB = dB2 <= r2

    dx = bx - ax
    dy = by - ay
    a = dx * dx + dy * dy
    b = 2.0 * (ax * dx + ay * dy)
    c = dA2 - r2
    disc = b * b - 4.0 * a * c
    sq = np.sqrt(np.maximum(disc, 0.0))
    with np.errstate(divide="ignore", invalid="ignore"):
        t1 = np.where(a > 0, (-b - sq) / (2.0 * a), 0.0)
        t2 = np.where(a > 0, (-b + sq) / (2.0 * a), 0.0)

    p1x = ax + t1 * dx
    p1y = ay + t1 * dy
    p2x = ax + t2 * dx
    p2y = ay + t2 * dy

    tri = lambda ux, uy, vx, vy: 0.5 * (ux * vy - uy * vx)  # noqa: E731

    f_in_in = tri(ax, ay, bx, by)
    f_in_out = tri(ax, ay, p2x, p2y) + _sector(p2x, p2y, bx, by, r2)
    f_out_in = _sector(ax, ay, p1x, p1y, r2) + tri(p1x, p1y, bx, by)
    f_cross = (
        _sector(ax, ay, p1x, p1y, r2)
        + tri(p1x, p1y, p2x, p2y)
        + _sector(p2x, p2y, bx, by, r2)
    )
    f_out_out = _sector(ax, ay, bx, by, r2)

    crossing = (~inA) & (~inB) & (disc > 0) & (t1 > 0.0) & (t1 < 1.0) & (t2 > 0.0) & (t2 < 1.0)
    out = np.where(
        inA & inB,
        f_in_in,
        np.where(
            inA & ~inB,
            f_in_out,
            np.where(~inA & inB, f_out_in, np.where(crossing, f_cross, f_out_out)),
        ),
    )
    return np.where(a > 0, out, 0.0)


def circle_ring_area(cx: float, cy: float, r: float, rx: np.ndarray, ry: np.ndarray) -> float:
    """area(disk((cx,cy), r) ∩ polygon(ring)) for one pair (test helper)."""
    rx = np.asarray(rx, dtype=np.float64) - cx
    ry = np.asarray(ry, dtype=np.float64) - cy
    ax, ay = rx, ry
    bx, by = np.roll(rx, -1), np.roll(ry, -1)
    contrib = circle_poly_edge_area(ax, ay, bx, by, np.full_like(ax, r))
    return abs(float(np.sum(contrib)))
