"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each of the 61
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json). As of round 4 every entry carries an
exact oracle (the former rows-only binary-codec entries are pinned by
independently-derived VALUES tables, plans/media_oracle.py).

All queries live in ``maskmypy_spark.plans.contract`` — one (Spark
DataFrame callable, DuckDB oracle SQL) pair per implemented operator from
SURVEY.md §2. The Spark side exercises the real engine operators (hash-RNG
masks as JVM column expressions, cell-indexed distance joins, exact kNN
with ring escalation, broadcast PIP); the oracle side states the same
semantics as plain ANSI SQL ground truth.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from maskmypy_spark.plans import contract  # noqa: E402

_REG = contract.build()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship pipeline on sf0.001: donut-mask the sensitive point table,
    then verify privacy via the address-based k-anonymity distance join
    (the headline mask+verify job of BASELINE.json)."""
    sf = "/root/testdata/sf0.001"
    q, _ = _REG["k_anonymity_address"]
    return q(spark, sf)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q for name, (q, _sql) in _REG.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_q, sql) in _REG.items() if sql is not None}
