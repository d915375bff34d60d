"""Streaming mask: the stateless donut projection runs unchanged on a
stream; results equal the batch mask row-for-row (exactly-once semantics
follow from the keyed RNG)."""

import pandas as pd

from maskmypy_spark.operators.donut import donut
from maskmypy_spark.sources import fixtures
from maskmypy_spark.streaming.mask_stream import mask_stream


def test_stream_equals_batch(spark, tmp_path):
    pdf = fixtures.sensitive_points_pdf(100, seed=42)
    src_dir = str(tmp_path / "src")
    spark.createDataFrame(pdf).write.parquet(src_dir)

    batch = {
        r["pid"]: (r["x"], r["y"])
        for r in donut(spark.read.parquet(src_dir), 50.0, 300.0, seed=9).collect()
    }

    stream = spark.readStream.schema("pid long, x double, y double").parquet(src_dir)
    masked = mask_stream(stream, 50.0, 300.0, seed=9)
    q = (
        masked.writeStream.format("memory")
        .queryName("masked_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["pid"]: (r["x"], r["y"])
        for r in spark.sql("SELECT * FROM masked_stream").collect()
    }
    assert got == batch
