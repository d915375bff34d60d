"""Data-size growth curve for the headline joins (VERDICT r02 item 6).

No sf1 parquet exists in the sandbox, so (per the verdict's alternative)
the curve runs the SAME k-verify / locationswap / mask jobs over
JVM-generated point tables at 600k -> 2M -> 6M -> 20M rows on local[32]
(the 20M decade added per VERDICT r04 next #7).

The box AREA scales with the row count (constant point/address density) —
the honest 100 TB analogy: a growing corpus covers more geography at
roughly constant urban density. With density fixed, per-point candidate
volume is constant and the ideal curve is LINEAR wall-time in rows
(constant rows/sec); sublinear rows/sec reveals shuffle/agg overheads that
would compound at 1000x. (Fixed-box growth instead multiplies density —
candidate pairs grow quadratically — a different, adversarial workload; the
skew/salting tests cover that axis.)

Usage:  python BENCH/run_scale_curve.py            (~10 min, run SOLO)
Writes: BENCH/scale_curve.json  (fully generated — do not hand-edit)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

BASE_ROWS = 600_000          # sf0.1's lineitem-derived point count
BASE_W, BASE_H = 2.0e4, 1.0e4
SCALES = [600_000, 2_000_000, 6_000_000, 20_000_000]


def main() -> None:
    from pyspark.sql import functions as F

    from maskmypy_spark import analysis
    from maskmypy_spark.functions import rng as _rng
    from maskmypy_spark.operators.donut import donut
    from maskmypy_spark.operators.locationswap import locationswap
    from maskmypy_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("CURVE_RUNS", "2"))
    spark = get_spark(app="scale-curve", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    def pts_df(n, w, h, tag_salt=0):
        df = spark.range(1, n + 1, 1, max(cores * 4, 8)).withColumnRenamed("id", "pid")
        x = f"({_rng.u_sql('pid', 101 + tag_salt, 1234)}) * {_rng.flit(w)}"
        y = f"({_rng.u_sql('pid', 102 + tag_salt, 1234)}) * {_rng.flit(h)}"
        return df.select("pid", F.expr(x).alias("x"), F.expr(y).alias("y"))

    def force(df):
        (df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("h"))
           .agg(F.expr("bit_xor(h)")).collect())

    def run_timed(fn, warmup=1):
        for _ in range(warmup):
            fn()
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    results = []
    for n in SCALES:
        s = math.sqrt(n / BASE_ROWS)
        w, h = BASE_W * s, BASE_H * s
        pts = pts_df(n, w, h).cache()
        pts.count()
        addr = (
            pts_df(max(n // 20, 1), w, h, tag_salt=50)
            .withColumnsRenamed({"pid": "aid", "x": "ax", "y": "ay"})
        ).cache()
        addr.count()

        def k_joinfree():
            m = donut(analysis.with_original(pts), 100.0, 500.0, seed=42)
            disp = analysis.displacement_from_payload(m)
            return analysis.k_anonymity_address(
                pts, m.drop("_orig_x", "_orig_y"), addr,
                max_radius=500.0, disp=disp,
            )

        timings = {
            "donut_mask": run_timed(lambda: force(donut(pts, 100.0, 500.0, seed=42))),
            "k_verify": run_timed(lambda: force(k_joinfree())),
            "locationswap": run_timed(
                lambda: force(locationswap(pts, 100.0, 500.0, addr, seed=42))
            ),
        }
        results.append({
            "rows": n,
            "box_km": [round(w / 1000, 3), round(h / 1000, 3)],
            "timings_sec": {k: round(v, 3) for k, v in timings.items()},
            "rows_per_sec": {k: round(n / v, 1) for k, v in timings.items()},
        })
        pts.unpersist()
        addr.unpersist()

    base = results[0]
    for r in results:
        r["rows_per_sec_vs_600k"] = {
            k: round(r["rows_per_sec"][k] / base["rows_per_sec"][k], 3)
            for k in r["rows_per_sec"]
        }
    out = {
        "protocol": {
            "cores": cores, "runs": runs, "warmups": 1,
            "density": "constant (box area scales with rows)",
        },
        "scales": results,
    }
    with open(os.path.join(HERE, "scale_curve.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
