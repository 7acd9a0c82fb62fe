package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event analytics
  * ([[graft.operators.Events]]): same semantics, verified against the
  * same oracle-checked batch results in the spec.
  *
  * At scale these run as continuous jobs: watermarked tumbling windows
  * shuffle once per (window, type); sessionization keeps per-user state
  * in the state store, scaled by the user-key partitioning.
  */
object EventsStream {

  /** Parquet file-stream of the events table (`ts` normalized to nanos-long
    * by [[graft.sources.Tables.normalizeTs]] whatever the physical parquet
    * type, then floored to ntz seconds). The file source wants a directory;
    * the glob filter selects the events table out of the shared testdata
    * dir.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    graft.sources.Tables.normalizeTs(raw)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        timestamp_seconds(expr("ts div 1000000000")).as("ts"))
  }

  /** Watermarked hourly tumbling aggregation (streaming twin of
    * [[graft.operators.Events.hourly]]).
    */
  def hourly(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(col("w.start").cast("timestamp_ntz").as("hour"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Watermarked SLIDING aggregation (streaming twin of
    * [[graft.operators.Events.sliding]]): 1-hour windows every 15
    * minutes — same TimeWindow fan-out, state keyed by (window, type).
    */
  def sliding(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(col("w.start").cast("timestamp_ntz").as("win_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Streaming exact dedup — idempotent ingest: drop replayed events by
    * id within the watermark horizon (state bounded by the watermark, so
    * a continuous pipeline doesn't accumulate unbounded keys).
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming twin of [[graft.operators.Events.latest]]: the SAME
    * partial-aggregable `max(struct(...))` runs as a streaming
    * aggregation, so the state store holds exactly ONE candidate struct
    * per (user, type), merged in place each micro-batch — the
    * continuously-maintained compaction/upsert view a feature store or
    * serving index reads. Update/complete output; no watermark needed
    * because the state is O(keys), not O(events).
    */
  def latest(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), col("event_type"),
        struct(col("ts").cast("long").as("ts_s"), col("event_id"),
          col("value")).as("c"))
      .groupBy("user_id", "event_type")
      .agg(max("c").as("m"))
      .select(col("user_id"), col("event_type"),
        col("m.ts_s").as("last_ts_s"), col("m.event_id").as("last_event_id"),
        round(col("m.value"), 2).as("last_value"))

  /** Run a streaming frame to completion over the available input (one
    * AvailableNow pass through a memory sink) and return the result —
    * the harness that puts streaming twins under the driver's DuckDB
    * oracle gate: the streamed result must hash-match the BATCH twin's
    * oracle SQL.
    */
  private[graft] def runToFrame(spark: SparkSession, streamed: DataFrame,
                                name: String,
                                mode: String = "complete"): DataFrame = {
    val q = streamed.writeStream
      .format("memory").queryName(name).outputMode(mode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable(); q.stop()
    spark.table(name)
  }

  /** Driver query: the streaming latest-key compaction (40e) over the
    * events file-stream; oracle = the batch CDC compaction's SQL
    * ([[graft.operators.Events.latestOracle]]).
    */
  def qStreamLatest(s: SparkSession, dir: String): DataFrame =
    runToFrame(s, latest(readEvents(s, dir)), "stream_latest_drv")

  /** Driver query: the streaming hourly windowed aggregation (37);
    * oracle = the batch time-bucketing SQL
    * ([[graft.operators.Events.hourlyOracle]]).
    */
  def qStreamHourly(s: SparkSession, dir: String): DataFrame =
    runToFrame(s, hourly(readEvents(s, dir)), "stream_hourly_drv")

  /** Driver query: streaming exact dedup (39) under the oracle gate. The
    * replayed log is the union of TWO file-streams over the same events
    * table — every event arrives twice in the micro-batch, the
    * watermark-bounded state drops the replay, and the surviving rows
    * must hash-match the plain batch projection of the table
    * ([[graft.operators.Events.dedupedOracle]]) — making the dedup
    * observable (without the operator the result would be 2× the rows).
    */
  def qStreamDedup(s: SparkSession, dir: String): DataFrame = {
    val replayed = readEvents(s, dir).unionByName(readEvents(s, dir))
    val out = dedupedEvents(replayed)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("ts").cast("long").as("ts_s"))
    runToFrame(s, out, "stream_dedup_drv", "append")
  }

  /** Driver query: stateful streaming sessionization (38) under the
    * oracle gate. `flatMapGroupsWithState` in Append mode only emits
    * CLOSED sessions, so the harness unions the events file-stream with
    * a tiny standing "flush" table (one far-future row per user, written
    * once per source dir) whose gap closes every real session; the flush
    * rows' own sessions stay open and are never emitted. The streamed
    * output must hash-match the batch window-form sessionization
    * ([[graft.operators.Events.sessionizeOracle]]).
    */
  def qStreamSessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val flushPath = graft.operators.IndexCache.getOrBuild("sess_flush", dir) { p =>
      val ev = graft.sources.Tables.events(s, dir)
        .select(col("user_id"), expr("ts div 1000000000").as("ts_s"))
      val flushTs = ev.agg(max("ts_s")).first().getLong(0) + GapSeconds + 1
      ev.select(col("user_id")).distinct()
        .withColumn("ts_s", lit(flushTs))
        .write.mode("overwrite").parquet(p)
    }
    val real = readEvents(s, dir)
      .select(col("user_id"), col("ts").cast("long").as("ts_s"))
    val flush = s.readStream
      .schema("user_id BIGINT, ts_s BIGINT").parquet(flushPath)
    val sessions = sessionize(real.unionByName(flush).as[Ev])
    runToFrame(s, sessions.toDF(), "stream_sessionize_drv", "append")
  }

  /** Driver query: the streaming as-of join (40b) under the oracle gate —
    * the per-user last-purchase state over the events file-stream must
    * hash-match DuckDB's native ASOF JOIN
    * ([[graft.operators.Events.asofOracle]]). No flush is needed: every
    * event emits its feature row immediately (inner as-of semantics).
    */
  def qStreamAsof(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val evs = readEvents(s, dir)
      .select(col("event_id"), col("user_id"),
        col("ts").cast("long").as("ts_s"),
        (col("event_type") === "purchase").as("is_purchase"))
      .as[AsofEv]
    runToFrame(s, asofLastPurchase(evs).toDF(), "stream_asof_drv", "append")
  }

  case class Ev(user_id: Long, ts_s: Long)
  case class SessState(sessionId: Long, firstTs: Long, lastTs: Long, n: Long)
  case class SessionOut(user_id: Long, session_id: Long, n_events: Long, duration_s: Long)

  val GapSeconds = 1800L

  /** Stateful gap sessionization via flatMapGroupsWithState (streaming
    * twin of [[graft.operators.Events.sessionize]]): per-user state holds
    * the open session; a gap > 30 min closes it and emits.
    */
  def sessionize(events: Dataset[Ev]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessState], SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[List[SessState]]) =>
          val sorted = evs.toSeq.sortBy(_.ts_s)
          var open = state.getOption.flatMap(_.headOption)
          var nextId = open.map(_.sessionId).getOrElse(0L)
          val closed = scala.collection.mutable.ListBuffer[SessionOut]()
          sorted.foreach { e =>
            open match {
              case Some(s) if e.ts_s - s.lastTs <= GapSeconds =>
                open = Some(s.copy(lastTs = e.ts_s, n = s.n + 1))
              case Some(s) =>
                closed += SessionOut(userId, s.sessionId, s.n, s.lastTs - s.firstTs)
                nextId += 1
                open = Some(SessState(nextId, e.ts_s, e.ts_s, 1))
              case None =>
                nextId += 1
                open = Some(SessState(nextId, e.ts_s, e.ts_s, 1))
            }
          }
          state.update(open.toList)
          closed.iterator
      }
  }

  case class AsofEv(event_id: Long, user_id: Long, ts_s: Long, is_purchase: Boolean)
  case class AsofOut(event_id: Long, user_id: Long, ts_s: Long,
                     last_purchase_ts: Long, secs_since_purchase: Long)

  /** Streaming twin of [[graft.operators.Events.asofLastPurchase]]: the
    * per-user state is ONE long (the latest purchase time) — the as-of
    * "index" a feature store keeps hot. Within a micro-batch events are
    * processed in event-time order with purchases first at equal
    * timestamps, so a purchase matches itself exactly like the batch
    * union-marker form; across batches the state carries the running
    * maximum. Inner semantics: events before the user's first purchase
    * emit nothing (same as the batch oracle-gated query).
    */
  def asofLastPurchase(events: Dataset[AsofEv]): Dataset[AsofOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, AsofOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[AsofEv], state: GroupState[Long]) =>
          val sorted = evs.toSeq
            .sortBy(e => (e.ts_s, if (e.is_purchase) 0 else 1, e.event_id))
          var last = state.getOption.getOrElse(Long.MinValue)
          val out = scala.collection.mutable.ListBuffer[AsofOut]()
          sorted.foreach { e =>
            if (e.is_purchase && e.ts_s > last) last = e.ts_s
            if (last != Long.MinValue) {
              out += AsofOut(e.event_id, userId, e.ts_s, last, e.ts_s - last)
            }
          }
          if (last != Long.MinValue) state.update(last)
          out.iterator
      }
  }
}
