import time, json
from fireworks_spark.session import get_spark
from fireworks_spark.tables import table
from pyspark.sql import functions as F
spark = get_spark(shuffle_partitions=32); spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
def replicate(df, id_col, k):
    r = spark.range(k).select(F.col("id").alias("_copy"))
    return (df.crossJoin(F.broadcast(r))
              .withColumn(id_col, F.col(id_col) + F.col("_copy") * F.lit(10_000_000))
              # shift each copy by its own day so time structure is preserved
              .withColumn("ts", F.col("ts") + F.make_interval(days=F.col("_copy").cast("int")))
              .drop("_copy"))
ev = table(spark, sf, "events").persist(); ev.count()
from fireworks_spark.operators.asof import asof_join
from fireworks_spark.operators.interval import interval_join
from fireworks_spark.operators.timeagg import time_rollup
from fireworks_spark.operators.toolbox import rebalance_strata

def ops(e):
    purch = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts", "value")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    signups = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("sid"), "user_id", F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("hi"))
    return {
        "asof_backward": lambda: asof_join(purch, clicks, ["user_id"], "ts", ["value"]),
        "asof_nearest": lambda: asof_join(purch, clicks, ["user_id"], "ts", ["value"], direction="nearest"),
        "interval_join": lambda: interval_join(
            e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts"),
            signups, "ts", "lo", "hi", keys=["user_id"]),
        "time_rollup": lambda: time_rollup(e, "ts", "value", keys=["event_type"]),
        "rebalance": lambda: rebalance_strata(e, "event_type", "event_id"),
    }
def run_once(fn):
    t0 = time.perf_counter()
    fn().write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    spark.catalog.clearCache(); ev.count()
    return dt
for fn in ops(ev).values():
    run_once(fn)  # warm
out = {}
for k in (1, 4, 16):
    e = replicate(ev, "event_id", k).persist(); ne = e.count()
    for op, fn in ops(e).items():
        dt = min(run_once(fn) for _ in range(2))
        out.setdefault(op, {})[k] = round(dt, 2)
        print(f"{op} x{k} ({ne} events): {dt:.2f}s", flush=True)
    e.unpersist()
print(json.dumps(out))
