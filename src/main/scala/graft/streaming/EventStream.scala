package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming operators mirroring the reference's stateful semantics
  * (SURVEY §2.9): incremental file ingest with checkpoints (the
  * hcOwt.py mtime-diff loop is exactly Spark's file source), gap
  * sessionization (client_session.h SESSION_TIMEOUT), windowed
  * aggregation over event time, and the 60-day inactivity
  * self-delete realized as an event-time TTL timer emitting tombstone
  * records (`self_delete.c:19-57,229-276`).
  *
  * All operators are defined on unbounded DataFrames; specs replay the
  * driver's `events` table through a file source micro-batch by
  * micro-batch and assert equality with the batch answers
  * (streaming=batch parity, SURVEY §5.2).
  */
object EventStream {

  /** A typed event row (µs timestamp, already ns-decoded upstream). */
  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  /** Tombstone emitted when a key exceeds its inactivity TTL —
    * the engine's record of `markTermination`.
    */
  case class Tombstone(user_id: Long, last_seen: Timestamp, reason: String)

  /** Incremental file-source ingest: the checkpointed directory scan
    * that replaces hcOwt's pickle-of-mtimes. `maxFilesPerTrigger=1`
    * forces one micro-batch per file so state paths actually run
    * incrementally in tests.
    */
  def fromDirectory(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType,
      maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(path)

  /** Windowed event-time aggregation with watermark: counts + exact
    * decimal sums per (window, event_type).
    */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("total"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("total"))

  /** Windowed SKETCH aggregation — the streaming twin of the
    * tx_sketch_stats family: HyperLogLog++ distinct users per
    * (6 h window, event_type). An EXACT count-distinct is not even
    * expressible in a streaming aggregation (it needs an Expand over
    * the whole input); the sketch is fixed-size mergeable partial
    * state, which is exactly why it is the 100 TB shape — and why the
    * streaming twin exists. HLL++'s merge is deterministic and
    * order-independent, so the streaming result equals the same
    * expression run in batch bit-for-bit on replay (spec-pinned).
    */
  def sketchCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.05).as("approx_users"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("approx_users"), col("n"))

  /** Gap-based sessionization (30-minute inactivity gap) using the
    * built-in session window — the streaming twin of DQ24.
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("n_events"))

  /** Inactivity TTL with tombstones: per key, an event-time timer at
    * last_seen + ttl; when the watermark passes it, the key's state is
    * dropped and a tombstone emitted. This is the self-delete
    * semantics: activity touches the timer, silence expires it.
    */
  def ttlTombstones(events: Dataset[Ev], ttlMs: Long): Dataset[Tombstone] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, Tombstone](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator(Tombstone(user, new Timestamp(last), "ttl_expired"))
          } else {
            val maxTs = rows.map(_.ts.getTime).foldLeft(
              state.getOption.getOrElse(Long.MinValue))(math.max)
            state.update(maxTs)
            // For an allowed-late event (within the watermark delay) with a
            // small TTL, maxTs + ttlMs can land below the current watermark;
            // Spark rejects such timeouts and kills the query. Clamp to just
            // past the watermark so the key expires on the next advance.
            val timeoutAt = math.max(maxTs + ttlMs, state.getCurrentWatermarkMs() + 1)
            state.setTimeoutTimestamp(timeoutAt)
            Iterator.empty
          }
      }
  }

  /** Next-beacon scheduling with jitter (`server/beacon.c:49-64,
    * 153-161`): next = ts + interval·(1 + pct·u) with u ∈ [-1, 1),
    * floored at 1 s. u derives from fnv1a64 of the seed column —
    * deterministic (safe under task retries/speculation, unlike
    * rand()) while uniform across keys. Returns epoch micros.
    */
  def nextBeaconMicros(ts: org.apache.spark.sql.Column,
      seed: org.apache.spark.sql.Column,
      intervalS: Long, jitterPct: Double): org.apache.spark.sql.Column = {
    val h = graft.functions.TextExpressions.fnv1a64(seed.cast("string"))
    // map 63 uniform bits to [-1, 1)
    val u = (pmod(h, lit(1L << 62)).cast("double") / (1L << 61).toDouble) - 1.0
    val deltaUs = (lit(intervalS * 1e6) * (lit(1.0) + lit(jitterPct) * u)).cast("bigint")
    unix_micros(ts) + greatest(lit(1000000L), deltaUs)
  }

  /** Streaming exact-dedup: drop duplicate keys with bounded state —
    * duplicates arriving within the watermark window are suppressed,
    * state for keys older than the watermark is evicted (the
    * unbounded-state trap of plain dropDuplicates on a stream).
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermarkCol: String = "ts", delay: String = "1 hour"): DataFrame =
    events
      .withWatermark(watermarkCol, delay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Drain a streaming DataFrame into an in-memory table and block
    * until every available file is processed. Returns the sink name.
    */
  def runToMemory(df: DataFrame, name: String, outputMode: String = "append"): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** One memory-sink table per replay gate, dropped and rebuilt per
    * invocation: a unique name per call would leak the full aggregated
    * result on the driver heap for the session's lifetime (bench runs
    * each gate many times; memory-sink temp views outlive
    * clearCache/releaseAll).
    */
  private def replayToTable(spark: SparkSession, agg: DataFrame,
      name: String): DataFrame = {
    spark.catalog.dropTempView(name)
    runToMemory(agg, name, outputMode = "complete")
    spark.table(name)
  }

  /** Scale-adaptive STATE partition count for a stateful replay
    * stream, derived from the source's landed byte size (AQE cannot
    * run inside a streaming query — the state-store fan-out is pinned
    * at query start from spark.sql.shuffle.partitions, so an
    * unconditioned session constant is wrong at one of the two
    * scales, exactly the anti-pattern the optimization guide's
    * partitioning rules call out). The divisor is AQE's own
    * minPartitionSize floor (default 1 MB), not the 64 MB advisory
    * target: a state partition's fixed cost is a per-batch store
    * commit, far cheaper than a task-launch-sized unit of work, and
    * the session-window merge is sort-based so starving it of
    * parallelism costs real time (measured on the 3 MB replay source:
    * 32 stores × 4 micro-batches spent more time in delta commits
    * than aggregation — window gate 4.4 → 1.7 s — while ONE partition
    * serialized the session merge, 4.4 s vs 3.0 s at the 3 the floor
    * yields). Capped by the session's shuffle-partition setting, so a
    * cluster-sized input saturates at the configured fan-out.
    */
  private[graft] def statePartitionsFor(spark: SparkSession, srcDir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(srcDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val bytes = fs.getContentSummary(p).getLength
    val minPart = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1MB"))
    // a non-integer session setting (e.g. "auto" on some platforms)
    // must degrade to a sane cap, not kill the stream at plan time
    val cap = scala.util.Try(
      spark.conf.get("spark.sql.shuffle.partitions").toInt).getOrElse(200)
    math.max(1, math.min(cap,
      math.ceil(bytes.toDouble / math.max(minPart, 1L)).toInt))
  }

  /** Run `f` (which starts and drains a streaming query over the
    * landed source at `srcDir`) under the input-derived shuffle
    * partition count, restoring the session setting afterwards (never
    * leak a gate-local override into the caller's session — the
    * setCheckpointDir lesson). Two consumers share this:
    *
    *  - STATEFUL replay gates: the state-store fan-out is pinned at
    *    query start from spark.sql.shuffle.partitions and AQE cannot
    *    run inside a streaming query, so an unconditioned session
    *    constant is wrong at one of the two scales;
    *  - foreachBatch SCREEN gates (round 22): the per-batch screen
    *    jobs plan while the stream drains, with AQE disabled on the
    *    streaming plan — every batch-sized shuffle (gram distinct/df
    *    screen, banded join, verdict rollup, catalog append) fanned
    *    out to the session's core-count setting over KB-sized batches
    *    (measured: the span screen spent 3-5 s per 125-doc batch,
    *    dominated by 32-way task launch across ~8 tiny shuffles).
    *
    * The count can only SHRINK from the session setting (capped), so
    * cluster-scale behavior is unchanged; it derives from landed
    * source bytes, not core count, so it is not a local[32] tune.
    */
  private[streaming] def withStateParts[A](spark: SparkSession, srcDir: String)(f: => A): A = {
    val key = "spark.sql.shuffle.partitions"
    val was = spark.conf.get(key)
    spark.conf.set(key, statePartitionsFor(spark, srcDir).toString)
    try f finally spark.conf.set(key, was)
  }

  /** Land the replay source once per (scale dir, content fingerprint)
    * and return its path + schema — shared by the streaming replay
    * gates, which all micro-batch over the same 8 time-range slices.
    */
  private def replaySrcDir(spark: SparkSession, dir: String):
      (String, org.apache.spark.sql.types.StructType) = {
    val src = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
    // suffix carries a source fingerprint: a driver-side testdata regen
    // invalidates the landing instead of silently serving stale rows
    val dirPart = dir.replaceAll("[^A-Za-z0-9]", "_")
    val name = s"graft_stream_src_v2_${dirPart}_${graft.Shared.srcFingerprint(spark, dir)}"
    val srcDir = s"${sys.props("java.io.tmpdir")}/$name"
    if (!new java.io.File(s"$srcDir/_SUCCESS").exists) {
      graft.Shared.pruneSiblings(spark, sys.props("java.io.tmpdir"),
        s"graft_stream_src_v2_${dirPart}_", name)
      src.repartitionByRange(8, col("ts")).write.mode("overwrite").parquet(srcDir)
    }
    (srcDir, src.schema)
  }

  /** The landed replay source opened as a file stream, two files per
    * micro-batch (8 slices → 4 batches).
    */
  private def replaySource(spark: SparkSession, dir: String): DataFrame = {
    val (srcDir, schema) = replaySrcDir(spark, dir)
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", 2)
      .parquet(srcDir)
  }

  /** Deterministic micro-batch REPLAY of the session-window stream for
    * the driver gate (ig_stream_sessions): the 30-minute session-window
    * aggregation runs over [[replaySource]] in COMPLETE output mode —
    * cross-batch session-state merging is genuinely exercised while the
    * final memory-sink table equals the batch formulation over all data
    * regardless of batch boundaries (no watermark-gated tail to make
    * emission nondeterministic). This puts stream==batch parity under
    * the driver's DuckDB oracle, not only the ScalaTest suite.
    */
  def sessionReplayGate(spark: SparkSession, dir: String): DataFrame = {
    val agg = replaySource(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("s_start"),
        unix_micros(col("session_window.end")).as("s_end"),
        col("n_events"))
    withStateParts(spark, replaySrcDir(spark, dir)._1) {
      replayToTable(spark, agg, "sess_replay_gate")
    }.orderBy("user_id", "s_start")
  }

  /** Windowed-aggregation twin of [[sessionReplayGate]]
    * (ig_stream_windows): 6-hour tumbling event-time windows with
    * count + exact decimal sum, state carried across the same
    * micro-batched replay, complete-mode sink — the streaming
    * execution of [[windowedCounts]]'s shape under the driver's batch
    * SQL oracle.
    */
  def windowReplayGate(spark: SparkSession, dir: String): DataFrame = {
    val agg = replaySource(spark, dir)
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("total_raw"))
      .select(unix_micros(col("window.start")).as("w_start"),
        col("event_type"), col("n"),
        round(col("total_raw"), 2).cast("double").as("total"))
    withStateParts(spark, replaySrcDir(spark, dir)._1) {
      replayToTable(spark, agg, "win_replay_gate")
    }.orderBy("w_start", "event_type")
  }

  /** Checkpointed-ingest parity gate (ig_stream_ingest): run
    * [[incrementalIngest]] over the micro-batched replay source into a
    * fresh parquet sink, then run it AGAIN against the same checkpoint
    * — the second pass must append NOTHING (exactly-once on replay,
    * the hcOwt mtime-diff contract). Returns per-user counts over the
    * sink plus the measured second-run delta; the oracle recomputes
    * the counts from the raw table and pins the delta at 0. Sink and
    * checkpoint are recreated per invocation, so the gate is
    * deterministic in any JVM and under bench repetition.
    */
  def ingestReplayGate(spark: SparkSession, dir: String): DataFrame = {
    val (srcDir, schema) = replaySrcDir(spark, dir)
    // sink/checkpoint keyed by (scale dir, process): a concurrent
    // driver process (bench sweep vs verify run, or another scale
    // factor) must never delete a live checkpoint mid-stream. Own key
    // is recreated per invocation; other processes' leftovers are
    // GC'd only once stale (2h past their last write).
    val dirPart = dir.replaceAll("[^A-Za-z0-9]", "_")
    val base = s"${sys.props("java.io.tmpdir")}/graft_ingest_gate_${dirPart}_" +
      ProcessHandle.current().pid()
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sessionState.newHadoopConf())
    graft.Shared.gcStaleSiblings(spark, sys.props("java.io.tmpdir"),
      "graft_ingest_gate_", new org.apache.hadoop.fs.Path(base).getName)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val sink = s"$base/sink"
    val ck = s"$base/ck"
    incrementalIngest(spark, srcDir, schema, sink, ck)
    val afterFirst = spark.read.parquet(sink).count()
    incrementalIngest(spark, srcDir, schema, sink, ck) // replay: no new files
    val sunk = spark.read.parquet(sink)
    val afterSecond = sunk.count()
    sunk.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).as("raw"))
      .select(col("user_id"), col("n_events"),
        round(col("raw"), 2).cast("double").as("total"),
        lit(afterSecond - afterFirst).as("second_run_added"))
      .orderBy("user_id")
  }

  /** Checkpointed incremental run: processes only files not yet seen by
    * this checkpoint, appending to a parquet sink — the hcOwt loop as
    * one engine call.
    */
  def incrementalIngest(spark: SparkSession, srcDir: String,
      schema: org.apache.spark.sql.types.StructType,
      sinkDir: String, checkpointDir: String): Unit = {
    val q = fromDirectory(spark, srcDir, schema, maxFilesPerTrigger = 1)
      .writeStream
      .format("parquet")
      .option("path", sinkDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
