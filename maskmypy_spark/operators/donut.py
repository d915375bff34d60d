"""Donut mask — random radial displacement within [low, high).

Reference semantics: /root/reference/maskmypy/masks/donut.py:11-180
(distributions :113-145, containment retry :152-168, validation :88-98).

Execution: pure JVM column expressions built from functions/masksql.py —
the per-row hash-RNG makes the mask deterministic under any partitioning
(the distributed replacement for the reference's sequential RNG, SURVEY §7
hard-part 1) and gives it an exact DuckDB oracle twin. No UDF, no shuffle:
the whole mask is one whole-stage-codegen projection over the scan.

Containment (``container=``) runs the reference's retry loop as driver-side
rounds over the unconverged subset: attempt ``a`` uses draw index ``a``, so
the result is "first attempt that lands in the home polygon" — order-free,
partition-independent, and replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import masksql, rng
from .pip import pip_join


def _apply_stages(df: DataFrame, stages: list[tuple[str, str]]) -> DataFrame:
    for name, expr in stages:
        df = df.withColumn(name, F.expr(expr))
    return df


def _offsets(df, key, low, high, seed, distribution, attempt, x, y) -> DataFrame:
    stages = masksql.donut_stages(key, low, high, seed, distribution, attempt)
    out = _apply_stages(df, stages)
    out = out.withColumn(x, F.expr(f"{x} + _offx")).withColumn(y, F.expr(f"{y} + _offy"))
    return out.drop(*masksql.donut_temp_cols(stages))


def donut(
    df: DataFrame,
    low: float,
    high: float,
    seed: int | None = None,
    distribution: str = "uniform",
    key: str = "pid",
    x: str = "x",
    y: str = "y",
    container: DataFrame | None = None,
    max_attempts: int = 200,
) -> DataFrame:
    """Return ``df`` with (x, y) displaced; all payload columns (image
    bytes, captions, ...) pass through untouched — the per-row fidelity
    invariant holds by construction."""
    if low >= high:
        # reference masks/donut.py:91-92
        raise ValueError("Minimum displacement distance is greater than or equal to maximum.")
    seed = rng.gen_seed() if not seed else seed  # falsy-seed quirk preserved (donut.py:74)

    if container is None:
        return _offsets(df, key, low, high, seed, distribution, 0, x, y)

    # --- containment variant (reference donut.py:152-168) ---
    home = pip_join(df, container, key=key, x=x, y=y).select(
        key, F.col("poly_id").alias("_home")
    )
    dup = home.groupBy(key).count().where("count > 1")
    if not dup.isEmpty():
        raise ValueError(
            "Points intersect multiple container polygons. Container polygons must not overlap."
        )
    pts = df.join(home, key, "left")
    orphans = pts.where(F.col("_home").isNull())
    if not orphans.isEmpty():
        # The reference crashes on container-less points (donut.py:157-158);
        # we raise an explicit error with the same de-facto contract.
        raise ValueError("Every point must intersect exactly one container polygon.")

    parts: list[DataFrame] = []
    remaining = pts.localCheckpoint(eager=True)
    for attempt in range(max_attempts):
        masked = _offsets(remaining, key, low, high, seed, distribution, attempt, x, y)
        landed = pip_join(masked, container, key=key, x=x, y=y).select(
            key, F.col("poly_id").alias("_landed")
        )
        masked = masked.join(landed, key, "left")
        ok = masked.where(F.col("_landed") == F.col("_home"))
        parts.append(ok.drop("_landed", "_home").localCheckpoint(eager=True))
        bad_keys = masked.where(
            F.col("_landed").isNull() | (F.col("_landed") != F.col("_home"))
        ).select(key)
        remaining = remaining.join(bad_keys, key, "inner").localCheckpoint(eager=True)
        if remaining.isEmpty():
            break
    else:
        raise RuntimeError(f"Containment retry did not converge in {max_attempts} attempts.")

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
