"""Event-table analytics: tumbling-window aggregation, gap-based
sessionization, semi-structured (JSON) extraction.

Engine extensions over the driver's ``events`` table (event_id, ts,
user_id, event_type, value, props) — the time-series / clickstream shapes a
large-scale pipeline runs next to the spatial workload. All three are pure
DataFrame plans: one shuffle each (window+type keys, user key), window
functions for the session assignment, JVM JSON path extraction — no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    ts: str = "ts",
    etype: str = "event_type",
    value: str = "value",
) -> DataFrame:
    """Tumbling event-time window x event-type: row count + value sum.
    The same plan runs on a stream (groupBy(window(...)) is the streaming
    windowed-agg operator); batch here, so no watermark needed."""
    return (
        events.groupBy(F.window(F.col(ts), window).alias("w"), F.col(etype))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value), 6).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            etype,
            "n_events",
            "value_sum",
        )
    )


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    ts: str = "ts",
    user: str = "user_id",
) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds ``gap_minutes``. Classic lag + cumulative-sum
    window pipeline — one shuffle on the user key; both window functions
    share the same (user, ts) ordering so Spark evaluates them in a single
    Window operator. Returns per-user (n_sessions, max_session_events)."""
    w = Window.partitionBy(user).orderBy(ts, "event_id")
    # integer microseconds: exact in BIGINT on both engines (a double cast
    # of a 2024-epoch microsecond timestamp exceeds 2^53 and silently
    # rounds, which can flip gap comparisons at session boundaries)
    # TIMESTAMP_NTZ -> TIMESTAMP cast shifts by a constant (session tz),
    # which cancels in gap differences
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    gap = us - F.lag(us).over(w)
    marked = events.withColumn(
        "_new",
        F.when(gap.isNull() | (gap > int(gap_minutes * 60_000_000)), 1).otherwise(0),
    ).withColumn("_session", F.sum("_new").over(w))
    per_session = marked.groupBy(user, "_session").agg(
        F.count(F.lit(1)).alias("_n")
    )
    return per_session.groupBy(user).agg(
        F.max("_session").alias("n_sessions"),
        F.max("_n").alias("max_session_events"),
    )


def extract_props(
    events: DataFrame, path: str = "$.k", out: str = "k", props: str = "props"
) -> DataFrame:
    """JSON path extraction from the semi-structured props column
    (JVM-side get_json_object — no Python JSON parsing)."""
    return events.select(
        "event_id",
        F.get_json_object(F.col(props), path).cast("int").alias(out),
    )
