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
from fireworks_spark.tables import table


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


def q150_stateful_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator batch-parity: events split into
    3 files replayed one micro-batch each through stateful_topk
    (applyInPandasWithState, bounded per-key order-statistic state); the
    final update per user — selected by the fold's monotonicity (the kept
    top-k array only ever grows elementwise, so the max (size, array)
    update IS the final state) — exploded to (user_id, rk, v) must equal
    the batch per-user top-3, which the SQL oracle derives with one
    window. Checks state carry-over ACROSS micro-batches, not just the
    fold."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    src = table(spark, sf_dir, "events").select("user_id", "value")
    d = tempfile.mkdtemp(prefix="fw_stream_")
    name = f"q150_{uuid.uuid4().hex[:8]}"
    try:
        src.repartition(3).write.mode("overwrite").parquet(d)
        stream = (
            spark.readStream.schema("user_id long, value double")
            .option("maxFilesPerTrigger", "1")
            .parquet(d)
        )
        streaming.run_to_memory(
            streaming.stateful_topk(stream, k=3), name, "update"
        )
        updates = spark.table(name)
        w = Window.partitionBy("user_id").orderBy(
            F.desc(F.size("topk")), F.desc("topk")
        )
        return (
            updates.withColumn("upd_rk", F.row_number().over(w))
            .filter(F.col("upd_rk") == 1)
            .select(
                "user_id", F.posexplode("topk").alias("pos", "v")
            )
            .select(
                "user_id", (F.col("pos") + 1).cast("long").alias("rk"), "v"
            )
            .orderBy("user_id", "rk")
            # materialize before the staging dir is removed
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q165_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming funnel (streaming.stateful_funnel): events replayed as 3
    TIME-SLICED micro-batches; the per-user (reached, last_ts) state
    carried across batches must reproduce the batch funnel reach exactly
    under event-time-ordered arrival. Output is q160's (step, step_name,
    users) shape and the oracle is q160's iterative-min SQL — the
    streaming path is held to the batch ground truth, not its own echo."""
    import os

    from pyspark.sql import functions as F

    steps = ["view", "click", "purchase"]
    src = table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    )
    qs = src.select(
        F.col("ts").cast("double").alias("tsd")
    ).approxQuantile("tsd", [0.33, 0.66], 0.001)
    d = tempfile.mkdtemp(prefix="fw_stream_")
    name = f"q165_{uuid.uuid4().hex[:8]}"
    try:
        tsd = F.col("ts").cast("double")
        slices = [
            src.filter(tsd <= qs[0]),
            src.filter((tsd > qs[0]) & (tsd <= qs[1])),
            src.filter(tsd > qs[1]),
        ]
        stage = os.path.join(d, "staged")
        os.makedirs(stage)
        # FileStreamSource orders files by modification time; copy latency
        # alone can produce EQUAL mtimes on coarse-timestamp filesystems,
        # which would batch/reorder slices and silently under-count a
        # rewind-free state. Pin strictly increasing mtimes explicitly.
        i = 0
        base_mtime = os.stat(stage).st_mtime
        for s in slices:
            sd = os.path.join(d, f"slice{i}")
            s.coalesce(1).write.parquet(sd)
            for n in sorted(os.listdir(sd)):
                if n.endswith(".parquet"):
                    dst = os.path.join(stage, f"part-{i:03d}.parquet")
                    shutil.copy(os.path.join(sd, n), dst)
                    os.utime(dst, (base_mtime + i + 1, base_mtime + i + 1))
            i += 1
        stream = (
            spark.readStream.schema(
                "user_id long, ts timestamp, event_type string"
            )
            .option("maxFilesPerTrigger", "1")
            .option("latestFirst", "false")
            .parquet(stage)
        )
        streaming.run_to_memory(
            streaming.stateful_funnel(stream, steps), name, "update"
        )
        final = (
            spark.table(name)
            .groupBy("user_id")
            .agg(F.max("reached").alias("reached"))
        )
        steps_df = spark.createDataFrame(
            [(j + 1, s) for j, s in enumerate(steps)],
            "step long, step_name string",
        )
        return (
            steps_df.join(
                final, F.col("reached") >= F.col("step"), "left"
            )
            .groupBy("step", "step_name")
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("reached").isNotNull(), 1)),
                    F.lit(0),
                ).alias("users")
            )
            .orderBy("step")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


STREAMING_QUERIES = {
    "q68_stream_tumbling": q68_stream_tumbling,
    "q69_stream_sliding": q69_stream_sliding,
    "q150_stateful_topk": q150_stateful_topk,
    "q165_stream_funnel": q165_stream_funnel,
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
    # streaming funnel must reproduce the batch reach (q160's oracle)
    "q165_stream_funnel": """
        WITH s1 AS (
          SELECT user_id, MIN(ts) AS t FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ), s2 AS (
          SELECT e.user_id, MIN(e.ts) AS t
          FROM events e JOIN s1 USING (user_id)
          WHERE e.event_type = 'click' AND e.ts > s1.t
          GROUP BY e.user_id
        ), s3 AS (
          SELECT e.user_id, MIN(e.ts) AS t
          FROM events e JOIN s2 USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > s2.t
          GROUP BY e.user_id
        )
        SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
               COUNT(*) AS users FROM s1
        UNION ALL SELECT 2, 'click', COUNT(*) FROM s2
        UNION ALL SELECT 3, 'purchase', COUNT(*) FROM s3
        ORDER BY step
    """,
    # final streaming state must equal the batch per-user top-3
    "q150_stateful_topk": (
        "SELECT user_id, rk, v FROM ("
        "  SELECT user_id, value AS v, row_number() OVER ("
        "    PARTITION BY user_id ORDER BY value DESC) AS rk"
        "  FROM events) WHERE rk <= 3 ORDER BY user_id, rk"
    ),
}
