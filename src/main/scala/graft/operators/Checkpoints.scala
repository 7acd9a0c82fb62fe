package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic release of `localCheckpoint` block storage.
  *
  * Every eager localCheckpoint pins its partitions in the block manager
  * (MEMORY_AND_DISK). Spark reclaims them only via the ContextCleaner,
  * which acts when a GC enqueues the RDD's weak reference — and the
  * default periodic-GC interval is 30 minutes, longer than an entire
  * benchmark suite. In a long-lived JVM the result is monotonic block
  * residency growth: consumed one-shot checkpoints (refresh deltas,
  * fusion candidate frames, CC frontiers) stay pinned on-heap until a
  * full GC happens to run, and once the storage pool fills, every NEW
  * checkpoint additionally pays LRU eviction writes of the garbage to
  * disk — the r13 verdict's "query latency depends on what ran before
  * it" mechanism. This helper makes release explicit instead of
  * GC-driven.
  *
  * Two release scopes:
  *   - [[release]]: immediate — for build-scoped checkpoints that are
  *     fully consumed before their function returns (a refresh batch's
  *     delta postings after the segment write, a compaction's folded
  *     live view after the fold commits).
  *   - [[transient_]] + [[releaseTransients]]: query-scoped — a
  *     checkpoint consumed by the RETURNED plan of a query (candidate
  *     frames, inline postings) must outlive the call that created it,
  *     so it registers here and the harness (Bench / Verify / DevTime —
  *     or a serving process's request boundary) drains the registry
  *     between queries. Sequential-query harnesses only: a concurrent
  *     server must drain per-request scopes instead.
  *
  * Unpersisting a localCheckpoint'd RDD makes it unrecoverable (the
  * lineage was truncated), so both paths are only for frames whose
  * every consumer has already run — standing serving views go through
  * [[IndexRefresh.cachedView]]'s epoch roll instead, which calls
  * [[release]] on the frame it REPLACES, never on the live one.
  */
object Checkpoints {

  /** The checkpoint RDD backing an eagerly-checkpointed frame (the
    * plan is a bare [[LogicalRDD]] leaf after `localCheckpoint()`).
    */
  private def checkpointRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.logical match {
      case lr: LogicalRDD => Some(lr.rdd)
      case _              => None
    }

  /** Drop a consumed checkpoint's blocks NOW (async — the unpersist
    * message is fire-and-forget). No-op on a non-checkpoint frame or a
    * stopped context (ScaleBench's session-replacement loop clears
    * caches after the old context died).
    */
  def release(df: DataFrame): Unit =
    checkpointRdd(df).foreach { r =>
      try r.unpersist(blocking = false) catch { case _: Throwable => () }
    }

  // --- query-scoped transients ------------------------------------------------

  private val transients = new java.util.concurrent.ConcurrentLinkedQueue[RDD[_]]()

  /** `df.localCheckpoint()` + registration for boundary release. */
  def transient_(df: DataFrame): DataFrame = {
    val out = df.localCheckpoint()
    checkpointRdd(out).foreach(transients.add)
    out
  }

  /** Register an ALREADY-checkpointed frame for boundary release — the
    * iterative-loop pattern (DedupClusters): intermediate rounds are
    * released in-loop, but the final round's frame backs the returned
    * plan and must live until the query boundary.
    */
  def register(df: DataFrame): Unit =
    checkpointRdd(df).foreach(transients.add)

  /** Drain the registry — called BETWEEN queries (never mid-query: a
    * registered frame may still back the previous query's plan until
    * its last forced run completes).
    */
  def releaseTransients(): Unit = {
    var r = transients.poll()
    while (r != null) {
      try r.unpersist(blocking = false) catch { case _: Throwable => () }
      r = transients.poll()
    }
  }
}
