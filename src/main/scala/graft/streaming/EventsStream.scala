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

  /** Parquet file-stream of the events table (nanos ts → ntz seconds).
    * The file source wants a directory; the glob filter selects the
    * events table out of the shared testdata dir.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
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
