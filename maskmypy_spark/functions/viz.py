"""Dependency-free SVG renderers for the reference's three graphics
(matplotlib is not available in this environment, so the engine emits
standalone SVG text instead of Figure objects — same information, no deps):

 - map_displacement (reference analysis.py:468-521): original -> masked
   segments over the two point layers
 - graph_ripleyresult / graph_ripleyresults (:371-465): K(d) curve(s) with
   the CSR simulation envelope

Inputs are the engine's own result tables (collected — these are
driver-side report artifacts over bounded rows, not distributed ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _svg(width: int, height: int, body: list[str]) -> str:
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height}" viewBox="0 0 {width} {height}">\n'
        f'<rect width="{width}" height="{height}" fill="white"/>\n'
        + "\n".join(body)
        + "\n</svg>\n"
    )


def render_displacement_svg(
    segments: DataFrame,
    path: str | None = None,
    width: int = 800,
    max_rows: int = 20000,
    key: str = "pid",
) -> str:
    """Displacement map from a displacement-segments table (columns
    x, y = masked via _orig or the contract's mx/my + originals absent —
    accepts the displacement() output: x, y masked + _s_-prefixed or the
    displacement_segments contract shape). Lines original->masked, dots at
    the masked end. Returns (and optionally writes) SVG text."""
    cols = set(segments.columns)
    if {"mx", "my"} <= cols:
        mx, my = "mx", "my"
        ox, oy = "x", "y"
    else:
        mx, my = "x", "y"
        ox, oy = "_s_x", "_s_y"
        if ox not in cols:
            raise ValueError("segments must carry original + masked coordinates")
    rows = segments.limit(max_rows).collect()
    if not rows:
        return _svg(width, width // 2, [])
    xs = [v for r in rows for v in (r[ox], r[mx])]
    ys = [v for r in rows for v in (r[oy], r[my])]
    x0, x1, y0, y1 = min(xs), max(xs), min(ys), max(ys)
    spanx, spany = max(x1 - x0, 1e-9), max(y1 - y0, 1e-9)
    height = max(int(width * spany / spanx), 64)
    pad = 10

    def sx(v):
        return pad + (v - x0) / spanx * (width - 2 * pad)

    def sy(v):
        return height - pad - (v - y0) / spany * (height - 2 * pad)  # y up

    body = []
    for r in rows:
        body.append(
            f'<line x1="{sx(r[ox]):.1f}" y1="{sy(r[oy]):.1f}" '
            f'x2="{sx(r[mx]):.1f}" y2="{sy(r[my]):.1f}" '
            'stroke="#888" stroke-width="0.5"/>'
        )
        body.append(
            f'<circle cx="{sx(r[mx]):.1f}" cy="{sy(r[my]):.1f}" r="1.2" fill="#d33"/>'
        )
    out = _svg(width, height, body)
    if path:
        with open(path, "w") as f:
            f.write(out)
    return out


def render_scatter_svg(
    points: DataFrame,
    path: str | None = None,
    width: int = 800,
    max_rows: int = 50000,
    x: str = "x",
    y: str = "y",
    color: str = "#36c",
) -> str:
    """Point scatter (reference Atlas.scatter, atlas.py:374-393)."""
    rows = points.select(x, y).limit(max_rows).collect()
    if not rows:
        return _svg(width, width // 2, [])
    xs = [r[x] for r in rows]
    ys = [r[y] for r in rows]
    x0, x1, y0, y1 = min(xs), max(xs), min(ys), max(ys)
    spanx, spany = max(x1 - x0, 1e-9), max(y1 - y0, 1e-9)
    height = max(int(width * spany / spanx), 64)
    pad = 10
    body = [
        f'<circle cx="{pad + (r[x] - x0) / spanx * (width - 2 * pad):.1f}" '
        f'cy="{height - pad - (r[y] - y0) / spany * (height - 2 * pad):.1f}" '
        f'r="1.2" fill="{color}" opacity="0.7"/>'
        for r in rows
    ]
    out = _svg(width, height, body)
    if path:
        with open(path, "w") as f:
            f.write(out)
    return out


def render_ripley_svg(
    result: DataFrame,
    path: str | None = None,
    width: int = 640,
    height: int = 420,
) -> str:
    """K(d) curve from a ripleys_k result table (band, support, statistic
    [, sim_low, sim_high]); the simulation envelope renders as a shaded
    band when present (reference graph_ripleyresult)."""
    rows = sorted(result.collect(), key=lambda r: r["band"])
    if not rows:
        return _svg(width, height, [])
    has_env = "sim_low" in result.columns
    ys = [r["statistic"] for r in rows]
    if has_env:
        ys += [r["sim_low"] for r in rows] + [r["sim_high"] for r in rows]
    xs = [r["support"] for r in rows]
    x0, x1 = 0.0, max(xs)
    y0, y1 = min(0.0, min(ys)), max(ys) * 1.05 + 1e-9
    pad = 36

    def sx(v):
        return pad + (v - x0) / (x1 - x0 + 1e-12) * (width - 2 * pad)

    def sy(v):
        return height - pad - (v - y0) / (y1 - y0 + 1e-12) * (height - 2 * pad)

    body = [
        f'<line x1="{pad}" y1="{height - pad}" x2="{width - pad}" y2="{height - pad}" stroke="black"/>',
        f'<line x1="{pad}" y1="{pad}" x2="{pad}" y2="{height - pad}" stroke="black"/>',
    ]
    if has_env:
        up = " ".join(f"{sx(r['support']):.1f},{sy(r['sim_high']):.1f}" for r in rows)
        dn = " ".join(
            f"{sx(r['support']):.1f},{sy(r['sim_low']):.1f}" for r in reversed(rows)
        )
        body.append(f'<polygon points="{up} {dn}" fill="#ccd" opacity="0.7"/>')
    pts = " ".join(f"{sx(r['support']):.1f},{sy(r['statistic']):.1f}" for r in rows)
    body.append(f'<polyline points="{pts}" fill="none" stroke="#d33" stroke-width="1.5"/>')
    out = _svg(width, height, body)
    if path:
        with open(path, "w") as f:
            f.write(out)
    return out
