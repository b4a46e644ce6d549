"""Declared query for the streaming slice: the events fixture replayed
through a real Structured Streaming query (file source -> event-time
tumbling window + watermark -> availableNow drain) must equal the batch
DATE_TRUNC aggregation — so the driver's q25 oracle checks the streaming
engine path end-to-end."""

from __future__ import annotations

import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from fireworks_spark import streaming
from fireworks_spark.tables import table


def q68_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay events as a stream; 1-hour tumbling windows with a 2-hour
    watermark; drain with availableNow into a memory sink and return it."""
    d = streaming.scratch_dir("fw_stream_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{d}/part-000.parquet")
    name = f"q68_{uuid.uuid4().hex[:8]}"
    try:
        with _stream_shuffle(spark, src=f"{sf_dir}/events.parquet"):
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
    d = streaming.scratch_dir("fw_stream_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{d}/part-000.parquet")
    name = f"q69_{uuid.uuid4().hex[:8]}"
    try:
        with _stream_shuffle(spark, src=f"{sf_dir}/events.parquet"):
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

    name = f"q150_{uuid.uuid4().hex[:8]}"
    stage = _cached_events_stage(spark, sf_dir, "rep3")
    # python_fold sizing: 32 stores x 3 triggers is pure commit
    # overhead at sf0.1 (measured r12: 4.1s@8 vs 5.5s@32) while the
    # fold wants the parallelism back as data grows — see
    # _stream_shuffle
    with _stream_shuffle(spark, src=f"{sf_dir}/events.parquet",
                         python_fold=True):
        stream = (
            spark.readStream.schema("user_id long, value double")
            .option("maxFilesPerTrigger", "1")
            .parquet(stage)
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
        .localCheckpoint(eager=True)
    )


from contextlib import contextmanager


@contextmanager
def _stream_shuffle(spark: SparkSession, n: "int | None" = None,
                    src: "str | None" = None, python_fold: bool = False):
    """Scope spark.sql.shuffle.partitions down for a stateful streaming
    replay: every shuffle partition gets its own state store instance,
    and store setup/commit per micro-batch is the dominant cost of
    small-fixture replays (measured 9.9s -> 4.9s on the stream-stream
    join at sf0.1 going 32 -> 8 in round 8; 9.6s -> 6.4s going 8 -> 4 in
    round 11) — while at larger replays the DATA term dominates and
    wants the parallelism back (q167 at sf3: 46.5s@8 vs 67.5s@4 vs
    44.6s@12). With ``n=None`` the partition count is sized to the
    replayed source: one base of 4 plus one per 6 MB of source parquet,
    clamped to [4, 24] — landing on the measured optimum at both ends
    (sf0.01/sf0.1 -> 4, sf1 -> 6, sf3 -> 12). ``python_fold`` switches
    to the applyInPandasWithState curve — floor 8, 1 partition per 2 MB,
    cap 32: their per-trigger cost is the PYTHON fold, whose workers are
    per-shuffle-partition, so the count must grow with DATA much faster
    than the SQL-state curve (store commit is the small-fixture term,
    fold throughput the large-fixture term). Measured r12 at sf0.1:
    q174 4.9s@8 vs 5.5s@4 vs 8.5s@32, q150/q165/q172/q176 all fastest
    at 8; at sf3 the same queries flip — q176 14.3s@32 vs 22.7s@12,
    q174 13.4s@32 vs 20.3s@12 — which is what the steeper slope
    (sf0.1 -> 8, sf3 -> 28) tracks. A production deployment sizes this
    to key volume; the operators themselves inherit the session
    setting."""
    if n is None:
        size = 0
        if src is not None:
            import os as _os

            if _os.path.isdir(src):
                size = sum(
                    _os.path.getsize(_os.path.join(src, f))
                    for f in _os.listdir(src)
                    if not f.startswith((".", "_"))
                )
            elif _os.path.exists(src):
                size = _os.path.getsize(src)
        if python_fold:
            n = max(8, min(32, 4 + int(size // (2 << 20))))
        else:
            n = max(4, min(24, 4 + int(size // (6 << 20))))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def _stage_time_slices(src: DataFrame, d: str, n: int = 3, ts_col: str = "ts") -> str:
    """Write ``src`` as ``n`` event-time-ordered single-file parquet slices
    under ``d``/staged with STRICTLY INCREASING mtimes (FileStreamSource
    replays by mtime; copy latency alone can tie on coarse-timestamp
    filesystems). Returns the staged directory; replay it with
    maxFilesPerTrigger=1 for one micro-batch per slice."""
    import os

    from pyspark.sql import functions as F

    qs = (
        src.select(F.col(ts_col).cast("double").alias("_tsd"))
        .approxQuantile("_tsd", [i / n for i in range(1, n)], 0.001)
    )
    stage = os.path.join(d, "staged")
    os.makedirs(stage)
    tsd = F.col(ts_col).cast("double")
    base_mtime = os.stat(stage).st_mtime
    for i in range(n):
        s = src
        if i > 0:
            s = s.filter(tsd > qs[i - 1])
        if i < n - 1:
            s = s.filter(tsd <= qs[i])
        sd = os.path.join(d, f"slice{i}")
        s.coalesce(1).write.parquet(sd)
        for nm in sorted(os.listdir(sd)):
            if nm.endswith(".parquet"):
                dst = os.path.join(stage, f"part-{i:03d}.parquet")
                shutil.copy(os.path.join(sd, nm), dst)
                os.utime(dst, (base_mtime + i + 1, base_mtime + i + 1))
    return stage


# ---------------------------------------------------------------------------
# Session-scoped staged-input cache (r12 verdict #6): every replay query used
# to re-stage its own slice files per CALL — at sf0.1 that is ~1s of
# approxQuantile + coalesce(1) writes per query, ~25% of each replay's cost
# and pure harness overhead (the operator under test starts at the first
# micro-batch). The staged artifact is a pure function of (sf_dir, scheme),
# so the harness now stages the FULL events table once per scheme per
# session and lets each stream declare its column subset (parquet projects
# by name; read_event_stream's normalize applies unchanged). Cache dirs are
# read-only inputs owned by the module and removed at interpreter exit;
# per-run artifacts (checkpoints, foreachBatch sinks, memory tables) stay
# per-query. Micro-batch counts and state assertions are UNTOUCHED — only
# the redundant staging work is shared.
_STAGE_CACHE: "dict[tuple, str]" = {}
_STAGE_CACHE_ROOTS: "list[str]" = []


def _cleanup_stage_cache() -> None:
    for root in _STAGE_CACHE_ROOTS:
        shutil.rmtree(root, ignore_errors=True)
    _STAGE_CACHE_ROOTS.clear()
    _STAGE_CACHE.clear()


import atexit as _atexit  # noqa: E402  (module-scoped cleanup hook)

_atexit.register(_cleanup_stage_cache)


def _cached_events_stage(spark: SparkSession, sf_dir: str, kind: str) -> str:
    """Staged FULL-events directory for replay scheme ``kind``:
    'slices3'/'slices2' = n event-time-ordered single-file slices
    (_stage_time_slices); 'rep3' = 3 unordered part files
    (repartition(3)). Returns the staged directory — treat as
    READ-ONLY.

    The cache key folds in the source parquet's (mtime, size) fingerprint
    (ADVICE r13): regenerating the fixture mid-session invalidates the
    staged copies instead of silently replaying stale rows. Disk cost:
    up to three schemes of the props-dropped events table live in /tmp
    until interpreter exit (~half the events.parquet bytes per scheme —
    at sf3 roughly 3 x ~0.5 GB); the ~1s/query staging win is worth it
    on the test rig, but long sessions at larger SFs should expect that
    footprint or call _cleanup_stage_cache() between phases."""
    import os

    src_path = os.path.join(os.path.abspath(sf_dir), "events.parquet")
    try:
        st = os.stat(src_path)
        if os.path.isdir(src_path):
            # directory-style parquet: the dir's own mtime misses in-place
            # part-file rewrites that keep filenames — fingerprint every
            # FILE recursively (a partitioned layout nests part files in
            # key= subdirs whose entry row wouldn't change either),
            # order-stable via sorted walk
            ents = []
            for root, dirs, files in os.walk(src_path):
                dirs.sort()
                for nm in sorted(files):
                    s = os.stat(os.path.join(root, nm))
                    ents.append(
                        (
                            os.path.relpath(
                                os.path.join(root, nm), src_path
                            ),
                            int(s.st_mtime_ns),
                            s.st_size,
                        )
                    )
            fp = tuple(ents)
        else:
            fp = (int(st.st_mtime_ns), st.st_size)
    except OSError:  # exotic/remote source: fall back to path-only keying
        fp = ()      # rather than refuse to cache
    key = (os.path.abspath(sf_dir), kind, fp)
    hit = _STAGE_CACHE.get(key)
    if hit is not None and os.path.isdir(hit):
        return hit
    # props (free-form JSON string, the widest column) is used by NO
    # replay query — dropping it roughly halves the staged bytes and the
    # coalesce(1) write cost; every stream declares a column subset of
    # what remains
    src = table(spark, sf_dir, "events").drop("props")
    root = streaming.scratch_dir("fw_stagecache_")
    _STAGE_CACHE_ROOTS.append(root)
    if kind == "rep3":
        stage = root + "/staged"
        src.repartition(3).write.parquet(stage)
    elif kind in ("slices3", "slices2"):
        stage = _stage_time_slices(src, root, n=3 if kind == "slices3" else 2)
    else:
        raise ValueError(f"unknown stage kind {kind!r}")
    _STAGE_CACHE[key] = stage
    return stage


def q165_stream_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming funnel (streaming.stateful_funnel): events replayed as 3
    TIME-SLICED micro-batches; the per-user (reached, last_ts) state
    carried across batches must reproduce the batch funnel reach exactly
    under event-time-ordered arrival. Output is q160's (step, step_name,
    users) shape and the oracle is q160's iterative-min SQL — the
    streaming path is held to the batch ground truth, not its own echo."""
    from pyspark.sql import functions as F

    steps = ["view", "click", "purchase"]
    name = f"q165_{uuid.uuid4().hex[:8]}"
    stage = _cached_events_stage(spark, sf_dir, "slices3")
    with _stream_shuffle(spark, src=f"{sf_dir}/events.parquet",
                         python_fold=True):
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


def q166_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup == batch identity: the events file staged
    TWICE (the at-least-once re-delivery case) as two micro-batches;
    dedup_stream (dropDuplicatesWithinWatermark on event_id, horizon
    covering the fixture) must emit every event exactly once — the
    second delivery of each id is inside the watermark and is dropped
    from state carried ACROSS batches, so the output equals the batch
    table."""
    import os

    d = streaming.scratch_dir("fw_stream_")
    name = f"q166_{uuid.uuid4().hex[:8]}"
    try:
        stage = os.path.join(d, "staged")
        os.makedirs(stage)
        base_mtime = os.stat(stage).st_mtime
        for i in range(2):
            dst = os.path.join(stage, f"part-{i:03d}.parquet")
            shutil.copy(f"{sf_dir}/events.parquet", dst)
            os.utime(dst, (base_mtime + i + 1, base_mtime + i + 1))
        with _stream_shuffle(spark, src=f"{sf_dir}/events.parquet"):
            stream = streaming.read_event_stream(
                spark, stage, max_files_per_trigger=1
            )
            streaming.run_to_memory(
                streaming.dedup_stream(stream, watermark="365 days"),
                name,
                "append",
            )
        return (
            spark.table(name)
            .select("event_id", "event_type", "value")
            .orderBy("event_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q167_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval self-join == batch range join: events
    replayed as two time-sliced micro-batches on BOTH sides; pairs that
    straddle the slice boundary only exist if batch-1 rows are still in
    the join state when batch 2 arrives, so the batch-SQL equality checks
    cross-batch state retention, not just the per-batch join.

    Scale note: the 365-day watermark over a 30-day span means NO state
    is ever purged — deliberate, the value oracle needs every cross-batch
    pair — so this harness's cost grows with total rows by design. The
    operator's production state is bounded by trigger size + watermark
    horizon: measured flat across batches and exactly proportional to
    density at 1M and 10M events (tools/scaling_probe_q167.py, SCALE.md
    round 11)."""
    name = f"q167_{uuid.uuid4().hex[:8]}"
    stage = _cached_events_stage(spark, sf_dir, "slices2")
    with _stream_shuffle(spark, src=f"{sf_dir}/events.parquet"):
        left = streaming.read_event_stream(
            spark, stage, max_files_per_trigger=1
        )
        right = streaming.read_event_stream(
            spark, stage, max_files_per_trigger=1
        )
        streaming.run_to_memory(
            streaming.interval_join_stream(
                left, right, "user_id", watermark="365 days"
            ),
            name,
            "append",
        )
    return (
        spark.table(name)
        .orderBy("k", "l_event", "r_event")
        .localCheckpoint(eager=True)
    )


def q168_stream_dedup_against(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dedup against a static corpus (dedup_stream_against):
    odd-doc_id documents stream in two micro-batches against the even-id
    corpus; survivors (appended to parquet by foreachBatch) must equal
    the batch answer — odd docs with no >= 0.8 exact word-3-gram Jaccard
    partner among even docs. Same 16x2-band recall argument as q135: at
    J >= 0.8 a band collision is ~certain, and the verify step is exact
    Jaccard, so the exact cross-Jaccard SQL is the value oracle."""
    import os

    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    d = streaming.scratch_dir("fw_stream_")
    try:
        staged = os.path.join(d, "staged")
        docs.filter(F.col("doc_id") % 2 == 1).repartition(2).write.parquet(
            staged
        )
        stream = spark.readStream.schema(
            spark.read.parquet(staged).schema
        ).option("maxFilesPerTrigger", "1").parquet(staged)
        out = os.path.join(d, "out")
        streaming.dedup_stream_against(
            stream, corpus, out, threshold=0.8
        )
        if not os.path.exists(out):
            # dedup_stream_against appends only batches with survivors;
            # if every streamed doc was a near-dup the sink dir is never
            # created — that is the legal empty answer, not an IO error
            return spark.createDataFrame([], "doc_id long")
        return (
            spark.read.parquet(out)
            .select("doc_id")
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q169_stream_rollup_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate maintenance == batch rollup: events replayed
    as three time-sliced micro-batches through maintain_rollup_table
    (update-mode windowed agg -> foreachBatch upsert into a parquet
    table); the final table must equal the one-shot batch hour rollup.
    Windows split by a slice cut are upserted twice — the equality
    proves the merge keeps the LATEST running total per (bucket, key)."""
    import os

    d = streaming.scratch_dir("fw_stream_")  # per-run rollup table only
    try:
        stage = _cached_events_stage(spark, sf_dir, "slices3")
        tbl = os.path.join(d, "rollup")
        with _stream_shuffle(spark, src=f"{sf_dir}/events.parquet"):
            stream = streaming.read_event_stream(
                spark, stage, max_files_per_trigger=1
            )
            streaming.maintain_rollup_table(
                stream, tbl, window="1 hour", watermark="365 days"
            )
        return (
            spark.read.parquet(tbl)
            .orderBy("bucket", "event_type")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q170_stream_normalizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StreamingNormalizer (the reference's signature streaming op,
    Normalizer.update per batch) == batch standardize: per-batch
    (n, sum, sumsq) folded from three micro-batches via foreachBatch,
    then forward() standardizes the batch table with the compiled stats
    — z-scores must equal the one-pass SQL population z-score."""
    import os

    from pyspark.sql import functions as F

    src = table(spark, sf_dir, "events").select("event_id", "value")
    staged = _cached_events_stage(spark, sf_dir, "rep3")
    stream = spark.readStream.schema("event_id long, value double").option(
        "maxFilesPerTrigger", "1"
    ).parquet(staged)
    sn = streaming.StreamingNormalizer(["value"])
    ck = streaming.scratch_dir("fw_ck_")
    try:
        q = (
            stream.writeStream.foreachBatch(sn.foreach_batch())
            .outputMode("append")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        shutil.rmtree(ck, ignore_errors=True)
    return (
        sn.forward(src)
        .select(
            "event_id",
            (F.round(F.col("value_std"), 3) + F.lit(0.0)).alias("z"),
        )
        .orderBy("event_id")
        .localCheckpoint(eager=True)
    )


def q172_stream_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming NEAR-dedup within a stream (near_dedup_stream, portable
    signatures): documents replayed as two micro-batches; state keeps one
    doc per 8-hash MinHash signature across batches. Natural signature
    collisions make the SURVIVOR of a within-batch group arbitrary, so
    the checked output is signature-level — (sig, kept-count) — which is
    invariant to survivor choice: the oracle re-derives every signature
    from raw text with the md5-based portable hash and asserts exactly
    ONE kept row per signature."""
    import os

    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.to_timestamp(F.lit("2024-01-01")).alias("ts"),
    )
    d = streaming.scratch_dir("fw_stream_")
    name = f"q172_{uuid.uuid4().hex[:8]}"
    try:
        stage = os.path.join(d, "staged")
        os.makedirs(stage)
        base_mtime = os.stat(stage).st_mtime
        med = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
        for i, part in enumerate(
            [docs.filter(F.col("doc_id") <= med),
             docs.filter(F.col("doc_id") > med)]
        ):
            sd = os.path.join(d, f"slice{i}")
            part.coalesce(1).write.parquet(sd)
            for nm in sorted(os.listdir(sd)):
                if nm.endswith(".parquet"):
                    dst = os.path.join(stage, f"part-{i:03d}.parquet")
                    shutil.copy(os.path.join(sd, nm), dst)
                    os.utime(dst, (base_mtime + i + 1, base_mtime + i + 1))
        stream = spark.readStream.schema(
            "doc_id long, text string, ts timestamp"
        ).option("maxFilesPerTrigger", "1").parquet(stage)
        # each micro-batch is ONE file = one scan partition, and the
        # signature projection (8 md5s per gram) binds map-side —
        # repartition the raw docs first so it parallelizes. The STATE
        # side is dropDuplicatesWithinWatermark (JVM SQL state, not a
        # Python fold), so the shuffle sizes on the SQL-state curve: the
        # repartition(32) above keeps the projection parallel while the
        # state stores stay at the store-commit optimum (review r12 —
        # python_fold here put 28-32 stores per micro-batch on an
        # operator whose own curve says ~12 is the sf3 ceiling)
        with _stream_shuffle(spark, src=f"{sf_dir}/documents.parquet"):
            streaming.run_to_memory(
                streaming.near_dedup_stream(
                    stream.repartition(32), watermark="365 days",
                    portable=True, sig_col="sig"
                ),
                name,
                "append",
            )
        return (
            spark.table(name)
            .groupBy("sig")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("sig")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q173_stream_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming benchmark decontamination (decontaminate_stream, exact
    mode): docs with doc_id % 93 == 0 play the eval set; the rest stream
    through in two micro-batches and every doc sharing a word 3-gram with
    the benchmark is dropped by the stateless row-local filter. Oracle:
    q88's exact-overlap SQL at modulus 93."""
    import os

    from pyspark.sql import functions as F

    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 93 == 0)
    corpus = docs.filter(F.col("doc_id") % 93 != 0)
    d = streaming.scratch_dir("fw_stream_")
    name = f"q173_{uuid.uuid4().hex[:8]}"
    try:
        staged = os.path.join(d, "staged")
        corpus.repartition(2).write.parquet(staged)
        stream = spark.readStream.schema(
            spark.read.parquet(staged).schema
        ).option("maxFilesPerTrigger", "1").parquet(staged)
        streaming.run_to_memory(
            streaming.decontaminate_stream(stream, bench),
            name,
            "append",
        )
        return (
            spark.table(name)
            .select("doc_id", "source", "n_chars")
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q174_stream_restart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-store durability across QUERY RESTARTS (not just
    micro-batches): stateful_topk drains two slices under an explicit
    checkpointLocation, the query STOPS, a third slice lands, and a NEW
    query on the same checkpoint resumes — offsets skip the processed
    files and the per-key state is restored from the state store. The
    final answer must equal the batch per-user top-3 over ALL slices;
    if state were lost on restart, the resumed query would emit top-3
    of the last slice only, and the update-max reconstruction would
    produce a provably different array wherever the true top-3 mixes
    slices (the fixture does, pervasively)."""
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    d = streaming.scratch_dir("fw_stream_")  # per-run stage/ck/out only
    try:
        allp = _cached_events_stage(spark, sf_dir, "rep3")
        parts = sorted(
            nm for nm in os.listdir(allp) if nm.endswith(".parquet")
        )
        stage = os.path.join(d, "staged")
        os.makedirs(stage)
        ck = os.path.join(d, "ck")
        out = os.path.join(d, "out")
        base = os.stat(stage).st_mtime

        def _add(i: int, nm: str) -> None:
            dst = os.path.join(stage, f"part-{i:03d}.parquet")
            shutil.copy(os.path.join(allp, nm), dst)
            os.utime(dst, (base + i + 1, base + i + 1))

        def _drain() -> None:
            # the r11 bench record rose 4.99s -> 8.10s because this was
            # the one stateful replay left at the session's 32 shuffle
            # partitions: 32 state stores x 3 triggers x 2 query startups
            # is pure commit overhead at sf0.1 (measured r12: 4.9s@8 vs
            # 5.5s@4 vs 8.5s@32); python_fold sizing keeps the fold
            # parallel as data grows (sf3: 13.4s@32 vs 20.3s@12)
            with _stream_shuffle(spark, src=f"{sf_dir}/events.parquet",
                                 python_fold=True):
                stream = (
                    spark.readStream.schema("user_id long, value double")
                    .option("maxFilesPerTrigger", "1")
                    .parquet(stage)
                )
                q = (
                    streaming.stateful_topk(stream, k=3)
                    .writeStream.foreachBatch(
                        lambda b, _i: b.write.mode("append").parquet(out)
                    )
                    .outputMode("update")
                    .option("checkpointLocation", ck)
                    .trigger(availableNow=True)
                    .start()
                )
                q.awaitTermination()

        for i, nm in enumerate(parts[:-1]):
            _add(i, nm)
        _drain()  # first query: every slice but the last
        _add(len(parts) - 1, parts[-1])
        _drain()  # RESTART: same checkpoint, new query object
        updates = spark.read.parquet(out)
        w = Window.partitionBy("user_id").orderBy(
            F.desc(F.size("topk")), F.desc("topk")
        )
        return (
            updates.withColumn("upd_rk", F.row_number().over(w))
            .filter(F.col("upd_rk") == 1)
            .select("user_id", F.posexplode("topk").alias("pos", "v"))
            .select(
                "user_id", (F.col("pos") + 1).cast("long").alias("rk"), "v"
            )
            .orderBy("user_id", "rk")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q175_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SESSION windows across micro-batches: events replayed as
    two time-sliced batches through session_agg (complete mode) — the
    quantile cut lands mid-session for many users, so sessions OPEN in
    batch 1 must MERGE with their batch-2 continuation in the session
    state store. Oracle: q79's gap-and-islands SQL (independent strategy,
    same 30-minute gap)."""
    name = f"q175_{uuid.uuid4().hex[:8]}"
    stage = _cached_events_stage(spark, sf_dir, "slices2")
    with _stream_shuffle(spark, src=f"{sf_dir}/events.parquet"):
        stream = spark.readStream.schema(
            "user_id long, ts timestamp"
        ).option("maxFilesPerTrigger", "1").parquet(stage)
        streaming.run_to_memory(
            streaming.session_agg(
                stream, gap="30 minutes", watermark="365 days"
            ),
            name,
            "complete",
        )
    return (
        spark.table(name)
        .select("user_id", "session_start", "session_end", "n_events")
        .orderBy("user_id", "session_start")
        .localCheckpoint(eager=True)
    )


def q176_stream_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key running (count, sum) state carried across micro-batches
    (streaming.stateful_running_totals — the reference's Model.update
    per-batch accumulation hook, model.py:153-166): events replayed as 3
    micro-batches; each batch emits one UPDATED row per key present, so a
    key's final update (its max n — n strictly increases whenever the key
    appears) must equal the batch per-key COUNT/SUM. Checks that the
    applyInPandasWithState fold resumes from stored state, not just the
    within-batch accumulation."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    name = f"q176_{uuid.uuid4().hex[:8]}"
    staged = _cached_events_stage(spark, sf_dir, "rep3")
    with _stream_shuffle(spark, src=f"{sf_dir}/events.parquet",
                         python_fold=True):
        stream = (
            spark.readStream.schema("user_id long, value double")
            .option("maxFilesPerTrigger", "1")
            .parquet(staged)
        )
        streaming.run_to_memory(
            streaming.stateful_running_totals(stream), name, "update"
        )
    w = Window.partitionBy("user_id").orderBy(F.desc("n"))
    return (
        spark.table(name)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            "user_id",
            "n",
            (F.round("total", 2) + F.lit(0.0)).alias("total"),
        )
        .orderBy("user_id")
        .localCheckpoint(eager=True)
    )


def _near_dedup_sig_sql() -> str:
    """q172's oracle: per-doc 8-hash MinHash signatures re-derived from
    raw text with the portable md5 hash (seed-prefixed gram text, min per
    seed), short docs falling back to the exact-text hash; exactly one
    kept row per distinct signature."""
    mins = ", ".join(
        "MIN(('0x' || substring(md5('%d|' || g), 1, 15))::BIGINT)"
        "::VARCHAR AS m%d" % (k, k) for k in range(8)
    )
    sig_cat = " || '|' || ".join(f"m{k}" for k in range(8))
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 string_split(regexp_replace(lower(trim(text)),
                                             '\\s+', ' ', 'g'), ' ') AS w,
                 text
          FROM documents
        ),
        g AS (
          SELECT DISTINCT doc_id,
                 unnest(list_transform(range(1, array_length(w) - 1),
                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS g
          FROM toks WHERE array_length(w) >= 3
        ),
        persig AS (SELECT doc_id, {mins} FROM g GROUP BY doc_id),
        sigs AS (
          SELECT t.doc_id,
                 COALESCE({sig_cat},
                          'exact|' || ('0x' || substring(md5(t.text), 1, 15)
                          )::BIGINT::VARCHAR) AS sig
          FROM toks t LEFT JOIN persig p ON p.doc_id = t.doc_id
        )
        SELECT sig, CAST(1 AS BIGINT) AS n
        FROM (SELECT DISTINCT sig FROM sigs) ORDER BY sig
    """


STREAMING_QUERIES = {
    "q68_stream_tumbling": q68_stream_tumbling,
    "q69_stream_sliding": q69_stream_sliding,
    "q150_stateful_topk": q150_stateful_topk,
    "q165_stream_funnel": q165_stream_funnel,
    "q166_stream_dedup": q166_stream_dedup,
    "q167_stream_interval_join": q167_stream_interval_join,
    "q168_stream_dedup_against": q168_stream_dedup_against,
    "q169_stream_rollup_maintenance": q169_stream_rollup_maintenance,
    "q170_stream_normalizer": q170_stream_normalizer,
    "q172_stream_near_dedup": q172_stream_near_dedup,
    "q173_stream_decontaminate": q173_stream_decontaminate,
    "q174_stream_restart": q174_stream_restart,
    "q175_stream_session": q175_stream_session,
    "q176_stream_running_totals": q176_stream_running_totals,
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
    # double-delivered stream deduped == the batch table
    "q166_stream_dedup": (
        "SELECT event_id, event_type, value FROM events ORDER BY event_id"
    ),
    # stream-stream interval join == batch range self-join
    "q167_stream_interval_join": (
        "SELECT l.user_id AS k, l.event_id AS l_event, r.event_id AS r_event, "
        "l.ts AS l_ts, r.ts AS r_ts "
        "FROM events l JOIN events r ON l.user_id = r.user_id "
        "AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 1 HOUR "
        "AND l.event_id <> r.event_id "
        "ORDER BY k, l_event, r_event"
    ),
    # streamed odd docs surviving the corpus near-dedup == odd docs with
    # no >= 0.8 exact 3-gram Jaccard partner among even docs (q135's
    # cross-Jaccard as the taint set)
    "q168_stream_dedup_against": None,  # filled below (needs q135's CTE)
    # maintained rollup table == one-shot batch hour rollup (q25's oracle
    # with the rollup's column names)
    "q169_stream_rollup_maintenance": (
        "SELECT DATE_TRUNC('hour', ts) AS bucket, event_type, "
        "COUNT(*) AS cnt, ROUND(SUM(value),2) AS sum_val FROM events "
        "GROUP BY 1, 2 ORDER BY bucket, event_type"
    ),
    # stream-learned stats standardizing the batch == SQL population z
    "q170_stream_normalizer": (
        "WITH s AS (SELECT AVG(value) AS mu, sqrt(VAR_POP(value)) AS sd "
        "FROM events) "
        "SELECT event_id, ROUND((value - mu) / sd, 3) + 0.0 AS z "
        "FROM events, s ORDER BY event_id"
    ),
}


def _dedup_against_sql() -> str:
    """q168's oracle: odd docs minus those tainted by q135's exact
    cross-corpus Jaccard at 0.8 (imported so both queries share ONE
    definition of the shingle/Jaccard rules)."""
    from fireworks_spark.queries_pipeline import _JACCARD_JOIN_SQL_08

    inner = _JACCARD_JOIN_SQL_08.replace("ORDER BY lid, rid", "")
    return (
        "SELECT doc_id FROM documents WHERE doc_id % 2 = 1 "
        f"AND doc_id NOT IN (SELECT rid FROM ({inner})) "
        "ORDER BY doc_id"
    )


# final running-totals update per key == batch per-key COUNT/SUM
STREAMING_ORACLE["q176_stream_running_totals"] = (
    "SELECT user_id, COUNT(*) AS n, ROUND(SUM(value), 2) + 0.0 AS total "
    "FROM events GROUP BY user_id ORDER BY user_id"
)
STREAMING_ORACLE["q168_stream_dedup_against"] = _dedup_against_sql()
STREAMING_ORACLE["q172_stream_near_dedup"] = _near_dedup_sig_sql()
# streaming session merge == q79's batch gap-and-islands oracle
STREAMING_ORACLE["q175_stream_session"] = (
    "WITH d AS (SELECT user_id, ts, CASE WHEN ts - LAG(ts) OVER "
    "(PARTITION BY user_id ORDER BY ts) < INTERVAL 30 MINUTE THEN 0 "
    "ELSE 1 END AS brk FROM events), "
    "s AS (SELECT user_id, ts, SUM(brk) OVER (PARTITION BY user_id "
    "ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid FROM d) "
    "SELECT user_id, MIN(ts) AS session_start, "
    "MAX(ts) + INTERVAL 30 MINUTE AS session_end, "
    "COUNT(*) AS n_events FROM s GROUP BY user_id, sid "
    "ORDER BY user_id, session_start"
)
# restart durability: final state across two queries == batch top-3
STREAMING_ORACLE["q174_stream_restart"] = (
    "SELECT user_id, rk, v FROM ("
    "  SELECT user_id, value AS v, row_number() OVER ("
    "    PARTITION BY user_id ORDER BY value DESC) AS rk"
    "  FROM events) WHERE rk <= 3 ORDER BY user_id, rk"
)
# stateless exact decontamination == q88's exact-overlap SQL at mod 93
STREAMING_ORACLE["q173_stream_decontaminate"] = """
    WITH toks AS (
      SELECT doc_id,
             string_split(regexp_replace(lower(trim(text)),
                                         '\\s+', ' ', 'g'), ' ') AS w
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, array_length(w) - 1),
                    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                 AS shingle
      FROM toks WHERE array_length(w) >= 3
    ),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 93 = 0),
    tainted AS (
      SELECT DISTINCT doc_id FROM sh
      WHERE doc_id % 93 <> 0 AND shingle IN (SELECT shingle FROM bench)
    )
    SELECT doc_id, source, n_chars FROM documents
    WHERE doc_id % 93 <> 0
      AND doc_id NOT IN (SELECT doc_id FROM tainted)
    ORDER BY doc_id
"""
