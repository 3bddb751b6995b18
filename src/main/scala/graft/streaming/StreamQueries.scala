package graft.streaming

import graft.{OracleSafe, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, Trigger, ValueState}
import org.apache.spark.sql.types._

/** REGISTERED Structured Streaming queries — §2.10 surfaced in the driver's
  * correctness roster, not just in StreamingSpec. Each query runs a REAL
  * streaming job inside the query function: `readStream` over the fixture
  * parquet, a watermarked/stateful transform, `processAllAvailable` (the
  * AvailableNow drain — the backlog is finite), then returns the sink
  * contents as an ordered DataFrame. Because the batch twins are
  * oracle-gated and streaming semantics here are deterministic (Complete-
  * mode aggregates; Update-mode state emissions reduced by exact
  * aggregation), these are ORACLE-GATED too — DuckDB recomputes the same
  * result relationally, so a hash match proves stream ≡ batch ≡ SQL.
  *
  * Scale posture: everything stateful keys by user/window — state shards
  * across executors by the grouping key exactly as the batch shuffles do;
  * watermarks bound state for the interval join; the memory sinks hold
  * only aggregate-cardinality rows (the interval join writes an
  * epoch-addressed parquet sink instead — the idempotent reprocessing
  * pattern, overwrite-by-epoch, never append). */
object StreamQueries extends QueryModule {

  /** Unique sink names so re-runs in one JVM (Verify then Bench) never
    * collide on the memory sink's temp view. */
  private val seq = new java.util.concurrent.atomic.AtomicLong(0)
  private def sinkName(tag: String): String =
    s"graft_stream_${tag}_${seq.incrementAndGet()}"

  /** Run-scoped scratch root for file sinks + checkpoints, deleted on JVM
    * exit (same hygiene as LlmDedup.bloomStateDir). */
  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).foreach(deleteRec)
    f.delete(): Unit
  }
  private lazy val scratchRoot: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_").toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(dir)))
    dir.getAbsolutePath
  }

  /** Streaming source over the fixture's events table. `readStream` needs
    * an explicit schema, so probe the batch footer for `ts`'s physical
    * form (the fixture has shipped both `timestamp[ns]`-as-long and
    * `timestamp[us]` NTZ — see [[Tables.events]]) and normalize to the
    * session-zoned TimestampType either way. */
  private[graft] def streamEvents(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsPhysical = s.read
      .option("pathGlobFilter", "events.parquet").parquet(d)
      .schema("ts").dataType
    val eventsSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsPhysical),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val raw = s.readStream.schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(d)
    tsPhysical match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Drain a streaming DataFrame into a memory sink and return the sink
    * table (Complete for aggregates, Update for stateful emissions).
    *
    * CONSTRAINT (r14 advice): [[withStreamSizing]] disables
    * noDataMicroBatches for every query drained through here, which is
    * only safe because no registered stream has a WATERMARK-GATED FINAL
    * EMISSION — Complete/Update sinks re-emit state each batch, and the
    * Append-mode paths (dedup / interval join / score) emit on arrival.
    * An Append-mode watermark-finalized aggregation drained through this
    * helper would silently lose its final windows: route such a query
    * through its own drain with empty batches enabled. */
  private def drain(s: SparkSession, streamed: DataFrame, mode: OutputMode,
      tag: String): DataFrame = {
    val name = sinkName(tag)
    // Streaming conf (state partitions, no empty batches) applies from
    // start() — the engine snapshots the session conf when the query
    // starts — and is restored before the caller's batch tail runs.
    withStreamSizing(s) {
      val q = streamed.writeStream.outputMode(mode)
        .format("memory").queryName(name).start()
      q.processAllAvailable(); q.stop()
    }
    s.table(name)
  }

  /** Stateful queries need the RocksDB state store; set it for the run and
    * restore the previous provider after. */
  private def withRocksDb[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = s.conf.getOption(key)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  /** Streaming-scoped execution sizing, applied around each streaming
    * run and restored after (the [[withRocksDb]] pattern):
    *
    *  - `spark.sql.shuffle.partitions` → the STATE partition count. A
    *    streaming query pins its state sharding per checkpoint at plan
    *    time from this conf, and every micro-batch then pays one
    *    state-store instance open + commit PER PARTITION regardless of
    *    data volume. The batch default (cluster width) is the wrong
    *    driver for that choice: state partitioning should track expected
    *    LIVE-STATE VOLUME (target ~100-200 MB per partition, the same
    *    sizing rule as shuffle partitions in the optimization guide §2.2),
    *    because it is checkpoint-pinned — it cannot follow the cluster up
    *    or down anyway. Default 8 here (fixture state is KB-scale; 8 keeps
    *    the drain multi-core without paying 32 store commits per batch —
    *    measured 22.9 s → see OPTIMIZATION_r14.md for the family numbers);
    *    production sizing is live-state bytes / 128 MB via
    *    `spark.graft.stream.statePartitions` (e.g. ~1 TB of join/session
    *    state → 8192). Results are partition-count-invariant: every
    *    registered streaming query emits keyed aggregates / per-key state
    *    emissions that the oracle gates hash-exact.
    *
    *  - `spark.sql.streaming.noDataMicroBatches.enabled` → false. The
    *    engine's extra empty batch exists to advance the watermark for
    *    state EVICTION and watermark-gated FINAL emissions; every query
    *    here drains a finite backlog and reads the sink once, so the
    *    empty batch buys nothing (Complete/Update sinks re-emit state
    *    anyway; the Append-mode dedup/join/score emit rows on arrival,
    *    not on watermark) — it only adds one full micro-batch round of
    *    per-partition store opens/commits per query. Correctness is
    *    oracle-gated per query at every sf.
    */
  private def withStreamSizing[T](s: SparkSession)(body: => T): T = {
    // SINGLE-THREADED-DRIVER ASSUMPTION (r14 advice, matching withRocksDb):
    // this mutates session-global conf with try/finally restore. Fine for
    // the sequential Verify/Bench harness; a concurrent multi-query session
    // would need a cloned session (s.newSession()) per streaming run so the
    // 8-partition window can't leak into a concurrently planned query.
    val pKey = "spark.sql.shuffle.partitions"
    val nKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevP = s.conf.get(pKey)
    val prevN = s.conf.getOption(nKey)
    s.conf.set(pKey, s.conf.getOption("spark.graft.stream.statePartitions")
      .orElse(sys.env.get("SPARK_GRAFT_STREAM_PARTITIONS")).getOrElse("8"))
    s.conf.set(nKey, "false")
    try body
    finally {
      s.conf.set(pKey, prevP)
      prevN match {
        case Some(v) => s.conf.set(nKey, v)
        case None => s.conf.unset(nKey)
      }
    }
  }

  /** Streaming tumbling 1-hour window counts + exact value sums per event
    * type — the `readStream` twin of `ev_tumbling`, watermarked and run in
    * Complete mode so the drained sink holds the final window table. The
    * decimal-exact sum makes the hash portable (same dsum as batch). */
  def streamTumbling(s: SparkSession, d: String): DataFrame = {
    val agg = streamEvents(s, d)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), OracleSafe.dsum(col("value")).as("sum_value"))
      .select(unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n"), col("sum_value"))
    drain(s, agg, OutputMode.Complete(), "tumbling")
      .orderBy(col("window_start_us"), col("event_type"))
  }

  /** Streaming session windows (30-minute gap) per user — the `readStream`
    * twin of `ev_sessions`: session_window + watermark, Complete mode,
    * emitting the same (user, first, last, n) rows the batch
    * gaps-and-islands oracle derives. */
  def streamSessions(s: SparkSession, d: String): DataFrame = {
    val agg = streamEvents(s, d)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        unix_micros(min(col("ts"))).as("first_us"),
        unix_micros(max(col("ts"))).as("last_us"))
      .select(col("user_id"), col("first_us"), col("last_us"), col("n_events"))
    drain(s, agg, OutputMode.Complete(), "sessions")
      .orderBy(col("user_id"), col("first_us"))
  }

  /** Stream-stream interval join — each click joined to the same user's
    * views in the preceding 10 minutes, both sides watermarked so join
    * state purges past the watermark (the canonical bounded-state
    * stream-stream join). The sink is the epoch-addressed idempotent
    * parquet pattern: foreachBatch OVERWRITES `epoch=N`, so a reprocessed
    * epoch replaces itself instead of appending — exactly-once output on
    * top of at-least-once reprocessing. The result is read back from the
    * files, proving the full write path. */
  def streamIntervalJoin(s: SparkSession, d: String): DataFrame = {
    val out = s"$scratchRoot/ssj_${seq.incrementAndGet()}"
    val ckpt = s"$out-ckpt"
    // ONE streaming source, self-joined: both join sides filter the same
    // relation instance, so the engine tracks one file source and each
    // micro-batch lists/scans the backlog once instead of twice (the two-
    // source form read the identical parquet through two independent
    // sources). Join semantics are unchanged — same rows on both sides.
    val ev = streamEvents(s, d)
    val clicks = ev
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
      .withWatermark("c_ts", "30 minutes")
    val views = ev
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("v_id"))
      .withWatermark("v_ts", "30 minutes")
    val joined = clicks.join(views,
      col("c_user") === col("v_user") &&
        col("v_ts") >= col("c_ts") - expr("INTERVAL 10 MINUTES") &&
        col("v_ts") <= col("c_ts"))
      .select(col("c_id"), col("v_id"))
    withStreamSizing(s) {
      val q = joined.writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, epoch: Long) =>
          df.write.mode("overwrite").parquet(s"$out/epoch=$epoch")
        }
        .start()
      q.awaitTermination()
    }
    s.read.parquet(out).select(col("c_id"), col("v_id"))
      .orderBy(col("c_id"), col("v_id"))
  }

  /** Bounded top-k as streaming state — the `readStream` twin of
    * `agg_topk_heap`, REUSING TopK3.reduce so the batch ObjectHashAggregate
    * and the streaming state transition share one merge function. State
    * emissions are cumulative and every member of the final top-3 appears
    * in some emission (an entry only leaves state when dominated forever),
    * so distinct-emissions → rank ≤ 3 reproduces the final state under ANY
    * micro-batching — that reduction is what makes an Update-mode stateful
    * stream ORACLE-GATABLE. */
  def streamTopK(s: SparkSession, d: String): DataFrame = withRocksDb(s) {
    import graft.functions.{TopK3, TopKEntry}
    import s.implicits._
    class TopKProcessor
        extends StatefulProcessor[Long, (Long, Double, Long), (Long, Double, Long)] {
      @transient private var st: ValueState[Seq[TopKEntry]] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        st = getHandle.getValueState[Seq[TopKEntry]]("top",
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopKEntry]](),
          TTLConfig.NONE)
      override def handleInputRows(key: Long, rows: Iterator[(Long, Double, Long)],
          timers: TimerValues): Iterator[(Long, Double, Long)] = {
        val prev = if (st.exists()) st.get() else TopK3.zero
        val merged = rows.foldLeft(prev)((b, r) => TopK3.reduce(b, TopKEntry(r._2, r._3)))
        st.update(merged)
        merged.iterator.map(e => (key, e.value, e.id))
      }
    }
    val top = streamEvents(s, d)
      .select(col("user_id"), col("value"), col("event_id"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .transformWithState(new TopKProcessor, TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "value", "event_id")
    val emissions = drain(s, top, OutputMode.Update(), "topk").distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
    emissions.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("user_id"), col("rk").cast("int").as("rk"),
        col("event_id"), col("value"))
      .orderBy(col("user_id"), col("rk"))
  }

  /** Markov transition extraction as streaming state — the `readStream`
    * twin of `ev_markov_transitions`' lead() pairs: per user, the last
    * event type carries across micro-batches in a ValueState; each arriving
    * event emits one (prev, cur) transition, so total counts are exact
    * under any batching. Within a micro-batch rows sort by (ts, event_id) —
    * the production contract is per-key ordered ingestion (Kafka keyed
    * partitions); the sort makes an arbitrary batch honor it. */
  def streamMarkov(s: SparkSession, d: String): DataFrame = withRocksDb(s) {
    import s.implicits._
    class PairProcessor
        extends StatefulProcessor[Long, (Long, Long, Long, String), (String, String)] {
      @transient private var last: ValueState[String] = _
      override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
        last = getHandle.getValueState[String]("last", Encoders.STRING, TTLConfig.NONE)
      override def handleInputRows(key: Long,
          rows: Iterator[(Long, Long, Long, String)],
          timers: TimerValues): Iterator[(String, String)] = {
        val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        var prev = if (last.exists()) last.get() else null
        sorted.foreach { r =>
          if (prev != null) out += ((prev, r._4))
          prev = r._4
        }
        if (prev != null) last.update(prev)
        out.iterator
      }
    }
    val pairs = streamEvents(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .transformWithState(new PairProcessor, TimeMode.None(), OutputMode.Update())
      .toDF("cur", "nxt")
    drain(s, pairs, OutputMode.Update(), "markov")
      .groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("n"))
      .orderBy(col("cur"), col("nxt"))
  }

  /** Streaming ingestion COMMITTING INTO a transaction log — the fusion
    * of the streaming side's epoch-addressed idempotent sink and the
    * lakehouse side's log-decides-visibility protocol (the Delta-sink
    * contract): each micro-batch writes its data files under
    * `epoch=N/` (overwrite — a retried epoch replaces itself), then
    * appends log version N listing those files as adds. The LOG WRITE is
    * the commit point: a crash between data-write and log-write leaves
    * invisible files, never a torn table. The final read resolves
    * visibility by joins against the log (adds only here — ingestion
    * never removes) and aggregates per event type with exact cents; the
    * oracle recomputes from the raw events table, so the hash proves the
    * log-visible union of all epochs is EXACTLY the input — every batch
    * committed once, none lost, none duplicated. */
  def streamLogCommits(s: SparkSession, d: String): DataFrame = {
    val run = s"$scratchRoot/slog_${seq.incrementAndGet()}"
    val dataDir = s"$run/data"
    val logDir = s"$run/log"
    val ckpt = s"$run/ckpt"
    withStreamSizing(s) {
      val q = streamEvents(s, d)
        .select(col("event_id"), col("event_type"),
          floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, epoch: Long) =>
          val dir = s"$dataDir/epoch=$epoch"
          df.write.mode("overwrite").parquet(dir)
          // Commit point: log version = the file list of this epoch.
          df.sparkSession.read.parquet(dir)
            .select(col("_metadata.file_path").as("path")).distinct()
            .select(col("path"), lit("add").as("action"))
            .write.mode("overwrite").parquet(s"$logDir/v=$epoch")
        }
        .start()
      q.awaitTermination()
    }
    val log = s.read.option("basePath", logDir).parquet(logDir)
      .select(col("path"))
    s.read.option("basePath", dataDir).parquet(dataDir)
      .select(col("event_id"), col("event_type"), col("cents"),
        col("_metadata.file_path").as("path"))
      .join(log, Seq("path"), "left_semi")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_id")).as("n_distinct"),
        sum(col("cents")).cast("long").as("cents"))
      .orderBy(col("event_type"))
  }

  /** STREAM-STATIC JOIN — the enrichment primitive: the event stream joins
    * a STATIC dimension (the batch-read nation table, keyed by
    * user_id mod 25) and aggregates per nation name. Spark executes the
    * static side as a broadcast re-resolved per micro-batch — no stream
    * state at all, the scale-free dimension-enrichment path (contrast the
    * watermark-stated stream-stream interval join). Complete-mode window
    * so the drained sink is the final table; oracle joins relationally. */
  def streamStaticJoin(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.nation(s, d)
      .select(col("n_nationkey").cast("long").as("seg"), col("n_name"))
    val agg = streamEvents(s, d)
      .withColumn("seg", col("user_id") % 25)
      .join(broadcast(dim), Seq("seg"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100.0 + 0.5).cast("long")).cast("long")
          .as("cents"))
    drain(s, agg, OutputMode.Complete(), "static_join")
      .orderBy(col("n_name"))
  }

  /** STREAMING EXACTLY-ONCE DEDUP — the stream is deliberately DOUBLED
    * (two file sources over the same parquet unioned) and
    * `dropDuplicatesWithinWatermark` on the event id must collapse it back
    * to exactly one row per event: state holds ids only within the
    * watermark horizon (bounded — the production contract for
    * at-least-once upstreams). The append-mode sink is then aggregated;
    * the oracle recomputes from the raw table with each event ONCE, so
    * the hash proves every duplicate died and no original did. */
  def streamDedup(s: SparkSession, d: String): DataFrame = {
    val doubled = streamEvents(s, d).unionByName(streamEvents(s, d))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("event_type"),
        floor(col("value") * 100.0 + 0.5).cast("long").as("cents"))
    drain(s, doubled, OutputMode.Append(), "dedup")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_id")).as("n_distinct"),
        sum(col("cents")).cast("long").as("cents"))
      .orderBy(col("event_type"))
  }

  /** ONLINE MODEL SCORING — the streaming twin of [[graft.ops.Ml]]'s
    * broadcast-model inference: every event is scored in the micro-batch
    * map phase (type weight + value term, exact BIGINT milli-units), with
    * ZERO streaming state — the model rides the closure/broadcast exactly
    * as a production online scorer deploys. The append-mode sink is then
    * aggregated per type (count, exact margin sum, flagged count), and the
    * DuckDB oracle recomputes the same scores relationally — the hash
    * proves the stream scored every event exactly once with the same
    * arithmetic. */
  def streamScore(s: SparkSession, d: String): DataFrame = {
    val typeW = Seq("click" -> -200L, "error" -> -500L, "purchase" -> 800L,
      "signup" -> 300L, "view" -> -100L)
    val wExpr = typeW.foldLeft(lit(0L)) { case (e, (t, w)) =>
      when(col("event_type") === t, lit(w)).otherwise(e)
    }
    val scored = streamEvents(s, d)
      .select(col("event_id"), col("event_type"),
        (wExpr + lit(3L) * floor(col("value")).cast("long"))
          .as("margin_milli"))
    drain(s, scored, OutputMode.Append(), "score")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("margin_milli")).as("sum_margin"),
        sum(when(col("margin_milli") >= 1000L, 1L).otherwise(0L))
          .as("n_flagged"))
      .orderBy(col("event_type"))
  }

  /** Streaming twin of `ts_bandit_replay`: the per-(day, arm)
    * trial/success cells accumulate as a watermarked streaming aggregate
    * (Complete mode — the drained sink holds the final cell table), then
    * the IDENTICAL deterministic ε-greedy fold
    * ([[graft.ops.TimeSeries.banditTrajectory]] — shared code, not a
    * re-implementation) replays the policy. Gated by the SAME
    * recursive-CTE oracle as the batch form: stream ≡ batch ≡ SQL. */
  def streamBandit(s: SparkSession, d: String): DataFrame = {
    val cells = streamEvents(s, d)
      .withWatermark("ts", "1 hour")
      .select(expr("unix_micros(date_trunc('day', ts)) div 86400000000")
          .as("d"),
        expr("user_id % 3").as("arm"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("conv"))
      .groupBy(col("d"), col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("sv"))
    graft.ops.TimeSeries.banditTrajectory(
      drain(s, cells, OutputMode.Complete(), "bandit"))
  }

  /** Streaming twin of `ts_stl_daily`: daily counts accumulate as a
    * watermarked streaming aggregate, then the IDENTICAL decomposition
    * tail ([[graft.ops.TimeSeries.stlFromCounts]]) runs on the drained
    * table — gated by the batch query's oracle. */
  def streamStl(s: SparkSession, d: String): DataFrame = {
    val counts = streamEvents(s, d)
      .withWatermark("ts", "1 hour")
      .select(expr("unix_micros(date_trunc('day', ts)) div 86400000000")
        .as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("x"))
    graft.ops.TimeSeries.stlFromCounts(
      drain(s, counts, OutputMode.Complete(), "stl"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_stream_bandit" -> (streamBandit _),
    "ev_stream_stl_daily" -> (streamStl _),
    "ev_stream_score" -> (streamScore _),
    "ev_stream_static_join" -> (streamStaticJoin _),
    "ev_stream_dedup" -> (streamDedup _),
    "ev_stream_log_commits" -> (streamLogCommits _),
    "ev_stream_tumbling" -> (streamTumbling _),
    "ev_stream_sessions" -> (streamSessions _),
    "ev_stream_interval_join" -> (streamIntervalJoin _),
    "ev_stream_topk" -> (streamTopK _),
    "ev_stream_markov" -> (streamMarkov _),
  )

  private def sqlDsum(inner: String): String =
    s"CAST(CAST(SUM($inner) AS VARCHAR) AS DOUBLE)"

  override def oracleSql: Map[String, String] = Map(
    // Stream ≡ batch ≡ SQL: the drained streaming aggregate feeds the
    // same fold, so the batch query's recursive-CTE oracle gates both.
    "ev_stream_bandit" -> graft.ops.TimeSeries.oracleSql("ts_bandit_replay"),
    "ev_stream_stl_daily" -> graft.ops.TimeSeries.oracleSql("ts_stl_daily"),
    // The same scoring arithmetic relationally — every event once.
    "ev_stream_score" ->
      """WITH scored AS (
        |  SELECT event_type,
        |    (CASE event_type WHEN 'click' THEN CAST(-200 AS BIGINT)
        |      WHEN 'error' THEN -500 WHEN 'purchase' THEN 800
        |      WHEN 'signup' THEN 300 WHEN 'view' THEN -100
        |      ELSE 0 END)
        |      + 3 * CAST(FLOOR(value) AS BIGINT) AS margin_milli
        |  FROM events)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(margin_milli) AS BIGINT) AS sum_margin,
        |  CAST(SUM(CASE WHEN margin_milli >= 1000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_flagged
        |FROM scored GROUP BY event_type ORDER BY event_type""".stripMargin,
    // The static-dim enrichment relationally: every event keyed into its
    // user's nation segment.
    "ev_stream_static_join" ->
      """SELECT n_name,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS cents
        |FROM events JOIN nation ON user_id % 25 = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    // The doubled stream must collapse back to the raw table: each event
    // exactly once.
    "ev_stream_dedup" ->
      """SELECT event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
        |  CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS cents
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // The log-visible union of all committed epochs must be EXACTLY the
    // input stream — recomputed from the raw events table.
    "ev_stream_log_commits" ->
      """SELECT event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
        |  CAST(SUM(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
        |    AS cents
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // Identical to the ev_tumbling oracle: streaming Complete-mode windows
    // must equal the batch hour-truncated aggregate.
    "ev_stream_tumbling" ->
      s"""SELECT epoch_us(datetrunc('hour', ts)) AS window_start_us, event_type,
         |  COUNT(*) AS n, ${sqlDsum("CAST(value AS DECIMAL(18,4))")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY window_start_us, event_type""".stripMargin,
    // Identical to the ev_sessions gaps-and-islands oracle.
    "ev_stream_sessions" ->
      """WITH gaps AS (
        |  SELECT user_id, ts,
        |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY ts) >= 1800000000
        |      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |    THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, ts,
        |    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        |  FROM gaps)
        |SELECT user_id, epoch_us(MIN(ts)) AS first_us, epoch_us(MAX(ts)) AS last_us,
        |  COUNT(*) AS n_events
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, first_us""".stripMargin,
    // The stream-stream interval join relationally: clicks × views on the
    // same user with the view in the click's preceding 10 minutes.
    "ev_stream_interval_join" ->
      """SELECT c.event_id AS c_id, v.event_id AS v_id
        |FROM events c JOIN events v
        |  ON c.user_id = v.user_id
        |  AND c.event_type = 'click' AND v.event_type = 'view'
        |  AND epoch_us(v.ts) >= epoch_us(c.ts) - CAST(600 AS BIGINT) * 1000000
        |  AND epoch_us(v.ts) <= epoch_us(c.ts)
        |ORDER BY c_id, v_id""".stripMargin,
    // Final top-3 per user by (value DESC, event_id) — what the bounded
    // state must converge to regardless of batching.
    "ev_stream_topk" ->
      """SELECT user_id, CAST(rk AS INT) AS rk, event_id, value FROM (
        |  SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY value DESC, event_id) AS rk
        |  FROM events) t
        |WHERE rk <= 3 ORDER BY user_id, rk""".stripMargin,
    // Exact transition counts from the batch lead() pairs.
    "ev_stream_markov" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS nxt
        |  FROM events)
        |SELECT event_type AS cur, nxt, COUNT(*) AS n
        |FROM e WHERE nxt IS NOT NULL
        |GROUP BY cur, nxt ORDER BY cur, nxt""".stripMargin,
  )
}
