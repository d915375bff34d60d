"""One-off experiment: chase the saturated local[8] -> local[32] leg
(VERDICT r03 next #7). k_verify read 0.53 efficiency there while
locationswap read 0.79, suggesting headroom beyond pure memory-bandwidth
saturation. This harness measures the SAME 4M-row k_verify + locationswap
jobs as BENCH/run_scaling.py at local[8] and local[32] under a matrix of
runtime configs (shuffle compression, off-heap, AQE advisory partition
size, shuffle partition count), each in its own subprocess via the
SPARK_GRAFT_EXTRA_CONF hook (session.py).

Usage:  SCALING_RUNS=2 python BENCH/exp_832.py [n_rows]
Prints a markdown table; results are COPIED into BENCH/NOTES.md by hand
(this file is an experiment, not a generator — BASELINE.md stays owned by
run_scaling.py).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

WORKER = r"""
import json, os, sys, time, math
sys.path.insert(0, %(repo)r)
os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
from pyspark.sql import functions as F
from maskmypy_spark.session import get_spark
from maskmypy_spark import analysis
from maskmypy_spark.operators.donut import donut
from maskmypy_spark.operators.locationswap import locationswap
from maskmypy_spark.functions import rng as _rng

cores = int(sys.argv[1]); n = int(sys.argv[2])
spark = get_spark(app=f"exp832-{cores}", cores=cores)
spark.sparkContext.setLogLevel("ERROR")
_BS = math.sqrt(n / 1_000_000.0)

def pts_df(n, tag_salt=0):
    df = spark.range(1, n + 1, 1, max(cores * 4, 8)).withColumnRenamed("id", "pid")
    x = f"({_rng.u_sql('pid', 101 + tag_salt, 1234)}) * {2.0e4 * _BS:.10e}"
    y = f"({_rng.u_sql('pid', 102 + tag_salt, 1234)}) * {1.0e4 * _BS:.10e}"
    return df.select("pid", F.expr(x).alias("x"), F.expr(y).alias("y"))

pts = pts_df(n).cache(); pts.count()
addr = (pts_df(max(n // 20, 1), tag_salt=50)
        .withColumnsRenamed({"pid": "aid", "x": "ax", "y": "ay"})).cache(); addr.count()

RUNS = int(os.environ.get("SCALING_RUNS", "2"))

def run_timed(fn):
    fn()
    ts = []
    for _ in range(RUNS):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    ts.sort(); return ts[len(ts) // 2]

def force(df):
    (df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("h"))
       .agg(F.expr("bit_xor(h)")).collect())

def k_joinfree():
    m = donut(analysis.with_original(pts), 100.0, 500.0, seed=42)
    disp = analysis.displacement_from_payload(m)
    return analysis.k_anonymity_address(
        pts, m.drop("_orig_x", "_orig_y"), addr, max_radius=500.0, disp=disp
    )

out = {"cores": cores, "rows": n, "timings": {}}
out["timings"]["k_verify"] = run_timed(lambda: force(k_joinfree()))
out["timings"]["locationswap"] = run_timed(
    lambda: force(locationswap(pts, 100.0, 500.0, addr, seed=42)))
print("RESULT " + json.dumps(out))
"""

CONFIGS: dict[str, str] = {
    "base": "",
    "zstd": "spark.io.compression.codec=zstd",
    "offheap16g": (
        "spark.memory.offHeap.enabled=true;spark.memory.offHeap.size=16g"
    ),
    "advisory16m": "spark.sql.adaptive.advisoryPartitionSizeInBytes=16m",
    "advisory256m": "spark.sql.adaptive.advisoryPartitionSizeInBytes=256m",
    "parts4x": "",  # shuffle partitions = 4*cores via env below
}


def run(cores: int, n: int, conf: str, parts_mult: int | None = None) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_EXTRA_CONF"] = conf
    if parts_mult:
        env["SPARK_GRAFT_EXTRA_CONF"] = (
            conf + (";" if conf else "")
            + f"spark.sql.shuffle.partitions={parts_mult * cores}"
        )
    proc = subprocess.run(
        [sys.executable, "-c", WORKER % {"repo": REPO}, str(cores), str(n)],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"worker failed (cores={cores} conf={conf!r}):\n"
        f"{proc.stdout[-1500:]}\n{proc.stderr[-3000:]}"
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    rows = []
    for name, conf in CONFIGS.items():
        pm = 4 if name == "parts4x" else None
        r8 = run(8, n, conf, pm)
        r32 = run(32, n, conf, pm)
        for job in ("k_verify", "locationswap"):
            t8, t32 = r8["timings"][job], r32["timings"][job]
            eff = (t8 / t32) / 4.0
            rows.append((name, job, t8, t32, round(eff, 2)))
        print(f"# done {name}: {rows[-2:]}", flush=True)

    print("\n| config | job | local[8] s | local[32] s | eff 8->32 |")
    print("|---|---|---|---|---|")
    for name, job, t8, t32, eff in rows:
        print(f"| {name} | {job} | {t8:.2f} | {t32:.2f} | {eff} |")


if __name__ == "__main__":
    main()
