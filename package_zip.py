"""Build maskmypy_spark.zip for cluster deploys:

    python package_zip.py [out.zip]
    spark-submit --py-files maskmypy_spark.zip your_job.py

The engine is pure-Python PySpark DataFrame code; executors only need
numpy/pandas (for the Arrow UDF paths), which ship with any standard
PySpark runtime image.
"""

from __future__ import annotations

import os
import sys
import zipfile

HERE = os.path.dirname(os.path.abspath(__file__))


def build(out: str = "maskmypy_spark.zip") -> str:
    pkg = os.path.join(HERE, "maskmypy_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, HERE))
    return out


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else "maskmypy_spark.zip")
    print(path)
