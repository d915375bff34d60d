"""Layer metadata: the engine's analogue of the reference's CRS / geometry
validators (/root/reference/maskmypy/tools.py:165-180).

The reference attaches a pyproj CRS to every GeoDataFrame and raises when
two layers disagree (``tools.py:172-180``) or when a layer's geometry kind
is unexpected (``:165-169``). The engine's layers are plain DataFrames
whose geometry is (x, y) double columns, so:

* the CRS rides as COLUMN METADATA on the x column (``with_crs`` /
  ``crs_of``) — schema-level, free at plan time, survives column-preserving
  selects, and serialized with any table write;
* geometry "kind" is structural: a point layer must expose numeric (x, y)
  (``validate_point_layer``), a polygon layer a ``ring`` array column.

Validation is OPT-IN by construction: layers that never call ``with_crs``
carry no tag and are exempt (the documented single-CRS-per-run contract);
as soon as both sides of an operation carry tags they must agree, which
catches the classic silent meters-vs-degrees join the reference guards
against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CRS_KEY = "crs"


def with_crs(df: DataFrame, crs: str, x: str = "x") -> DataFrame:
    """Tag the layer's CRS (e.g. 'EPSG:26910') as metadata on ``x``."""
    meta = dict(df.schema[x].metadata or {})
    meta[CRS_KEY] = str(crs)
    return df.withMetadata(x, meta)


def crs_of(df: DataFrame, x: str = "x") -> str | None:
    try:
        return (df.schema[x].metadata or {}).get(CRS_KEY)
    except KeyError:
        return None


def validate_crs(*layers: tuple[DataFrame, str]) -> str | None:
    """Raise if two tagged layers disagree (reference tools.py:172-180);
    untagged layers are exempt. Each arg is (df, x_column). Returns the
    agreed CRS (or None when nothing is tagged)."""
    seen: str | None = None
    for df, x in layers:
        c = crs_of(df, x)
        if c is None:
            continue
        if seen is None:
            seen = c
        elif c != seen:
            raise ValueError(
                f"Layers must have matching CRS to do this operation "
                f"(got {seen!r} and {c!r})."
            )
    return seen


def validate_point_layer(df: DataFrame, key: str, x: str, y: str) -> None:
    """Structural geometry-kind check (reference tools.py:165-169): a point
    layer must expose the key and NUMERIC coordinate columns."""
    names = set(df.columns)
    for c in (key, x, y):
        if c not in names:
            raise ValueError(f"Unexpected point-layer schema: missing column {c!r}.")
    for c in (x, y):
        kind = df.schema[c].dataType.typeName()
        if kind not in ("double", "float", "integer", "long", "decimal"):
            raise ValueError(
                f"Unexpected geometry type: column {c!r} is {kind}, expected numeric."
            )
