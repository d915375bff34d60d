"""Hierarchical planar cell index (Z-style grid, int64 ids).

Plays the role of geopandas' R-tree (reference ``analysis.py:527,590``) in a
distributed setting: every spatial join becomes an equi-join on cell id, with
neighbor-cell expansion on ONE side providing the radius guarantee. H3/S2
would slot in here if the libs were present (they are not in this sandbox);
the API mirrors theirs: ``cell_of``, ``neighbors``, ``parent``.

Encoding: cell = (ix + OFF) * 2^21 + (iy + OFF), ix = floor(x / cs). Valid
for |ix|,|iy| < 2^20 — a 20,000 km extent at 20 m cells; plenty. Neighbor
cells differ by ``dx * 2^21 + dy``, so ring expansion is pure int arithmetic
(no re-encode), which keeps the exploded join key JVM-side and cheap.

Join contract: if the build side is keyed on ``cell_of(p)`` and the probe
side explodes ``ring(cell_of(q), r)`` with ``r = ceil(radius / cs)``, every
pair within ``radius`` meets in some cell (grid-distance bound), and the
exact distance predicate filters false positives.
"""

from __future__ import annotations

import numpy as np

from .rng import flit

CELL_OFF = 1 << 20
CELL_K = 1 << 21


def cell_sql(x: str, y: str, cs: float) -> str:
    """Cell id as a SQL expression (Spark SQL + DuckDB compatible)."""
    cs = float(cs)
    return (
        f"((CAST(floor(({x}) / {flit(cs)}) AS BIGINT) + {CELL_OFF}) * {CELL_K}"
        f" + CAST(floor(({y}) / {flit(cs)}) AS BIGINT) + {CELL_OFF})"
    )


def cell_np(x, y, cs: float) -> np.ndarray:
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    ix = np.floor(x / cs).astype(np.int64)
    iy = np.floor(y / cs).astype(np.int64)
    return (ix + CELL_OFF) * CELL_K + (iy + CELL_OFF)


def ring_offsets(r: int) -> list[int]:
    """Additive cell-id offsets for the (2r+1)² neighborhood."""
    return [dx * CELL_K + dy for dx in range(-r, r + 1) for dy in range(-r, r + 1)]


def ring_for_radius(radius: float, cs: float) -> int:
    """Smallest ring count guaranteeing all pairs within ``radius`` meet."""
    import math

    return max(1, int(math.ceil(radius / cs)))


def parent_sql(cell: str, factor: int) -> str:
    """Coarsen a cell id by an integer factor (hierarchical rollup)."""
    return (
        f"((CAST(floor((({cell}) DIV {CELL_K} - {CELL_OFF}) / {factor}) AS BIGINT) + {CELL_OFF})"
        f" * {CELL_K}"
        f" + CAST(floor((({cell}) % {CELL_K} - {CELL_OFF}) / {factor}) AS BIGINT) + {CELL_OFF})"
    )
