"""Bucketed-dimension experiment (VERDICT r04 next #5): does persisting the
k-verification build side's cell index (sources/bucketed.py +
distance_join(right_cell_col=)) move the needle at sf0.1 — in particular on
the saturated local[8] -> local[32] leg, where less shuffle volume is the
one lever the round-4 knob matrix did not test?

Three plans per parallelism level, same input, same results (hash-checked):

  bcast     the DEFAULT bench plan — the address side fits the 64 MB
            threshold at this scale and broadcasts (no addr shuffle at all);
            the reference point the production config actually runs.
  shuffle   auto-broadcast OFF, cell computed in the join — the at-scale
            plan once the dimension outgrows broadcastability: BOTH sides
            of the annulus join shuffle on the cell key.
  bucketed  auto-broadcast OFF, address read from a cell-bucketed parquet
            table with its stored cell index — the build side scans
            exchange-free (plan-gated in tests/test_plans.py); only the
            exploded probe side still shuffles.

Protocol: per level one subprocess (one JVM = one local[N] master), untimed
setup (cache + bucketed write), 1 warmup + SCALING_RUNS (default 3) timed
runs, median. Run SOLO (no concurrent Spark work). Results go to stdout as
one JSON line; conclusions belong in BENCH/NOTES.md.

Usage:  python BENCH/exp_bucketed.py [level ...]     (default: 8 32)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

BUCKETS = 64  # fixed per subject area, independent of the level under test
CS = 250.0  # donut max displacement 500 / 2 — the stored cell index's cs

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
os.environ.setdefault("SPARK_DRIVER_MEM", "48g")
from pyspark.sql import functions as F
from maskmypy_spark.session import get_spark
from maskmypy_spark import analysis
from maskmypy_spark.operators.donut import donut
from maskmypy_spark.functions import cells
from maskmypy_spark.sources import bucketed, tables

cores = int(sys.argv[1]); sf = sys.argv[2]; tmp = sys.argv[3]
CS = float(sys.argv[4]); BUCKETS = int(sys.argv[5])
spark = get_spark(app=f"exp-bucketed-{cores}", cores=cores)
spark.sparkContext.setLogLevel("ERROR")

# ---- untimed setup: cached frames + the bucketed address table
par = spark.sparkContext.defaultParallelism
pts = tables.big_points_df(spark, sf).repartition(2 * par).cache(); pts.count()
addr = tables.address_df(spark, sf).repartition(par).cache(); addr.count()
addr_cell = addr.withColumn("cell", F.expr(cells.cell_sql("ax", "ay", CS)))
tbl = f"exp_addr_b{cores}"
bucketed.write_bucketed(addr_cell, tbl, os.path.join(tmp, tbl), "cell", BUCKETS)
addr_b = bucketed.read_bucketed(spark, tbl)

def force(df):
    return (df.select(F.xxhash64(*[F.col(c) for c in df.columns]).alias("h"))
              .agg(F.expr("bit_xor(h)")).collect()[0][0])

def kv(address, **kw):
    m = donut(analysis.with_original(pts), 100.0, 500.0, seed=42)
    disp = analysis.displacement_from_payload(m)
    k = analysis.k_anonymity_address(
        pts, m.drop("_orig_x", "_orig_y"), address, max_radius=500.0,
        disp=disp, slim=True, cs=CS, **kw)
    return force(k.select("pid", "k_anonymity"))

def with_thresh(value, fn):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", value)
    try:
        return fn()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

jobs = {
    "k_verify_bcast":    lambda: kv(addr),
    "k_verify_shuffle":  lambda: with_thresh("-1", lambda: kv(addr)),
    "k_verify_bucketed": lambda: with_thresh("-1", lambda: kv(addr_b, addr_cell_col="cell")),
}

RUNS = int(os.environ.get("SCALING_RUNS", "3"))
out = {"cores": cores, "rows": pts.count(), "timings": {}, "runs_detail": {}, "hashes": {}}
for name, fn in jobs.items():
    out["hashes"][name] = fn()  # warmup doubles as the result hash
    ts = []
    for _ in range(RUNS):
        t0 = time.perf_counter(); fn(); ts.append(round(time.perf_counter() - t0, 3))
    out["runs_detail"][name] = list(ts)
    ts.sort(); out["timings"][name] = ts[len(ts) // 2]
assert len(set(out["hashes"].values())) == 1, out["hashes"]  # identical results
spark.sql(f"DROP TABLE IF EXISTS {tbl}")
print("RESULT " + json.dumps(out))
"""


def main() -> None:
    levels = [int(v) for v in sys.argv[1:]] or [8, 32]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    res = {}
    with tempfile.TemporaryDirectory(prefix="exp_bucketed_") as tmp:
        for lvl in levels:
            code = WORKER % {"repo": REPO}
            proc = subprocess.run(
                [sys.executable, "-c", code, str(lvl), sf, tmp, str(CS), str(BUCKETS)],
                capture_output=True, text=True, timeout=3600,
            )
            for line in proc.stdout.splitlines():
                if line.startswith("RESULT "):
                    res[f"local{lvl}"] = json.loads(line[len("RESULT "):])
                    break
            else:
                raise RuntimeError(
                    f"worker failed (cores={lvl}):\n{proc.stdout[-2000:]}\n"
                    f"{proc.stderr[-4000:]}"
                )
    print(json.dumps({"sf": sf, "buckets": BUCKETS, "cs": CS, **res}))


if __name__ == "__main__":
    main()
