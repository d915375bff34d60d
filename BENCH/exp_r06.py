"""Round-6 optimization experiments: per-query variant sweeps, one fresh
JVM per variant (the only protocol that gives comparable numbers on this
box — see BENCH/NOTES.md), 1 warmup + EXP_RUNS timed runs, published = min.

Usage:  python BENCH/exp_r06.py kv_cs250 kv_cs167 ...   (or "all")
Each variant name maps to (env, jobname); the child process runs the job
via the same table setup as bench.py and prints VARIANT_RESULT json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNS = int(os.environ.get("EXP_RUNS", "3"))

# variant -> (extra env, job key, kwargs-json)
VARIANTS: dict[str, tuple[dict, str, dict]] = {
    # --- k_verify: candidate-volume and aggregate-shape sweep ---
    "kv_base": ({}, "kv", {}),
    "kv_noprune": ({"SPARK_GRAFT_RING_PRUNE": "0"}, "kv", {}),
    "kv_cs167": ({}, "kv", {"cs": 500.0 / 3}),
    "kv_cs125": ({}, "kv", {"cs": 125.0}),
    "kv_cs333": ({}, "kv", {"cs": 1000.0 / 3}),
    "kv_cs500": ({}, "kv", {"cs": 500.0}),
    # --- locationswap: cs sweep on the probe-side explode ---
    "ls_base": ({}, "ls", {}),  # cs = high/2 = 250 (current default)
    "ls_noprune": ({"SPARK_GRAFT_RING_PRUNE": "0"}, "ls", {}),
    "ls_cs500": ({}, "ls", {"cs": 500.0}),
    "ls_cs167": ({}, "ls", {"cs": 500.0 / 3}),
    # --- voronoi: starting-cell-size factor sweep ---
    "vor_base": ({}, "vor", {}),       # cs = 3.0 * spacing estimate
    "vor_f2": ({}, "vor", {"f": 2.0}),
    "vor_f15": ({}, "vor", {"f": 1.5}),
    "vor_f45": ({}, "vor", {"f": 4.5}),
}


def _child(job: str, kwargs: dict) -> None:
    from pyspark.sql import functions as F

    from maskmypy_spark import analysis
    from maskmypy_spark.operators.donut import donut
    from maskmypy_spark.operators.locationswap import locationswap
    from maskmypy_spark.operators.voronoi import voronoi
    from maskmypy_spark.session import get_spark
    from maskmypy_spark.sources import tables

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="maskmypy-exp-r06", cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism
    pts = tables.big_points_df(spark, sf_dir).repartition(2 * par).cache()
    pts.count()
    addr = tables.address_df(spark, sf_dir).repartition(par).cache()
    addr.count()

    def _force(df):
        return (
            df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("h"))
            .agg(F.expr("bit_xor(h)"))
            .collect()[0][0]
        )

    if job == "kv":
        def run():
            m = donut(analysis.with_original(pts), 100.0, 500.0, seed=42)
            disp = analysis.displacement_from_payload(m)
            k = analysis.k_anonymity_address(
                pts, m.drop("_orig_x", "_orig_y"), addr, max_radius=500.0,
                disp=disp, slim=True, cs=kwargs.get("cs"),
            )
            return _force(k.select("pid", "k_anonymity"))
    elif job == "ls":
        cs = kwargs.get("cs")
        if cs is not None:
            # reach under the operator: call distance_join shape via kwarg-
            # free locationswap is fixed at high/2; emulate by monkeypatch
            import maskmypy_spark.operators.locationswap as lsmod
            from maskmypy_spark.operators.distance_join import distance_join as dj

            def dj_cs(left, right, radius, **kw):
                kw["cs"] = cs
                return dj(left, right, radius, **kw)

            lsmod.distance_join = dj_cs

        def run():
            return _force(locationswap(pts, 100.0, 500.0, addr, seed=42))
    elif job == "vor":
        f = kwargs.get("f")
        cs = None
        if f is not None:
            from maskmypy_spark.operators.knn import estimate_cell_size
            others = pts.select(
                F.col("pid").alias("_vkey"), F.col("x").alias("_vx"),
                F.col("y").alias("_vy"),
            )
            cs = estimate_cell_size(others, "_vx", "_vy") / 3.0 * f

        def run():
            return _force(voronoi(pts, cs=cs))
    else:
        raise SystemExit(f"unknown job {job}")

    run()  # warmup
    ts, hashes = [], set()
    for _ in range(RUNS):
        t0 = time.perf_counter()
        h = run()
        ts.append(round(time.perf_counter() - t0, 3))
        hashes.add(h)
    print("VARIANT_RESULT " + json.dumps({"times": ts, "hashes": sorted(hashes)}))


def main() -> None:
    if os.environ.get("_EXP_CHILD"):
        name = os.environ["_EXP_CHILD"]
        env, job, kwargs = VARIANTS[name]
        _child(job, kwargs)
        return
    names = sys.argv[1:] or ["all"]
    if names == ["all"]:
        names = list(VARIANTS)
    results = {}
    for name in names:
        env_extra, _job, _kw = VARIANTS[name]
        env = dict(os.environ, _EXP_CHILD=name, **env_extra)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True, text=True, env=env, timeout=1800,
        )
        got = None
        for line in proc.stdout.splitlines():
            if line.startswith("VARIANT_RESULT "):
                got = json.loads(line[len("VARIANT_RESULT "):])
        if got is None:
            print(f"{name}: FAILED\n{proc.stdout[-1500:]}\n{proc.stderr[-3000:]}")
            continue
        results[name] = got
        print(f"{name}: min={min(got['times'])} times={got['times']} "
              f"hash={got['hashes']}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
