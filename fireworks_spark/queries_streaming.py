"""Declared query for the streaming slice: the events fixture replayed
through a real Structured Streaming query (file source -> event-time
tumbling window + watermark -> availableNow drain) must equal the batch
DATE_TRUNC aggregation — so the driver's q25 oracle checks the streaming
engine path end-to-end."""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from fireworks_spark import streaming


def q68_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay events as a stream; 1-hour tumbling windows with a 2-hour
    watermark; drain with availableNow into a memory sink and return it."""
    d = tempfile.mkdtemp(prefix="fw_stream_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{d}/part-000.parquet")
    name = f"q68_{uuid.uuid4().hex[:8]}"
    try:
        stream = streaming.read_event_stream(spark, d)
        streaming.run_to_memory(
            streaming.tumbling_agg(stream), name, "complete"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.table(name).orderBy("h", "event_type")


def q69_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour every 15 minutes) through the real streaming
    engine: each event lands in 4 overlapping windows. Oracle: replicate
    each event into its 4 slide buckets with a range cross join."""
    d = tempfile.mkdtemp(prefix="fw_stream_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{d}/part-000.parquet")
    name = f"q69_{uuid.uuid4().hex[:8]}"
    try:
        stream = streaming.read_event_stream(spark, d)
        streaming.run_to_memory(
            streaming.sliding_agg(stream), name, "complete"
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.table(name).orderBy("ws", "event_type")


STREAMING_QUERIES = {
    "q68_stream_tumbling": q68_stream_tumbling,
    "q69_stream_sliding": q69_stream_sliding,
}

STREAMING_ORACLE = {
    # identical to the batch q25 oracle: stream must equal batch
    "q68_stream_tumbling": (
        "SELECT DATE_TRUNC('hour', ts) AS h, event_type, COUNT(*) AS cnt, "
        "ROUND(SUM(value),2) AS sum_val FROM events "
        "GROUP BY 1, 2 ORDER BY h, event_type"
    ),
    "q69_stream_sliding": (
        "SELECT time_bucket(INTERVAL '15 minutes', CAST(ts AS TIMESTAMP)) "
        "- i * INTERVAL '15 minutes' AS ws, event_type, COUNT(*) AS cnt "
        "FROM events CROSS JOIN (SELECT unnest(range(4)) AS i) "
        "GROUP BY 1, 2 ORDER BY ws, event_type"
    ),
}
