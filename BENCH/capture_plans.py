"""Capture .explain("formatted") for every bench query -> plans/r06/.

Usage: python BENCH/capture_plans.py <suffix>    (suffix = before|after)

Mirrors bench.py's job construction exactly (same tables, same operators,
same repartition/cache setup) so the captured plans are the plans the
frozen bench times. Run SOLO (one JVM); does not time anything.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    from maskmypy_spark import analysis
    from maskmypy_spark.operators.donut import donut
    from maskmypy_spark.operators.locationswap import locationswap
    from maskmypy_spark.operators.voronoi import voronoi
    from maskmypy_spark.session import get_spark
    from maskmypy_spark.sources import tables

    spark = get_spark(app="maskmypy-capture-plans", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    par = spark.sparkContext.defaultParallelism
    pts = tables.big_points_df(spark, sf_dir).repartition(2 * par).cache()
    pts.count()
    addr = tables.address_df(spark, sf_dir).repartition(par).cache()
    addr.count()

    def _forced(df):
        return df.select(
            F.xxhash64(*[F.col(c) for c in df.columns]).alias("h")
        ).agg(F.expr("bit_xor(h)"))

    def _k_joinfree():
        m = donut(analysis.with_original(pts), 100.0, 500.0, seed=42)
        disp = analysis.displacement_from_payload(m)
        return analysis.k_anonymity_address(
            pts, m.drop("_orig_x", "_orig_y"), addr, max_radius=500.0,
            disp=disp, slim=True,
        )

    from maskmypy_spark.functions import rng as _rng

    big = spark.range(1, 20_000_001, 1, 4 * par).selectExpr(
        "id AS pid",
        f"({_rng.u_sql('id', 101, 1234)}) * 2.0e4 AS x",
        f"({_rng.u_sql('id', 102, 1234)}) * 1.0e4 AS y",
    )

    dfs = {
        "q_donut_mask": _forced(donut(pts, 100.0, 500.0, seed=42).select("pid", "x", "y")),
        "q_k_verify": _forced(_k_joinfree().select("pid", "x", "y", "k_anonymity")),
        "q_locationswap": _forced(locationswap(pts, 100.0, 500.0, addr, seed=42)),
        "q_voronoi_nn": _forced(voronoi(pts)),
        "q_mask_20m": _forced(donut(big, 100.0, 500.0, seed=42).select("pid", "x", "y")),
    }
    for name, df in dfs.items():
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            ))
        print(f"wrote {path}")
    # q_pipeline shares the _k_joinfree plan; its extra k_satisfaction agg is
    # a one-row aggregate — capture it too for completeness.
    ksat = analysis.k_satisfaction(_k_joinfree(), 10)
    with open(os.path.join(out_dir, f"q_pipeline_{suffix}.txt"), "w") as f:
        f.write(ksat._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        ))
    print("done")


if __name__ == "__main__":
    main()
