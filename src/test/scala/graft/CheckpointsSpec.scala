package graft

import graft.operators.{Checkpoints, IndexRefresh}
import org.apache.spark.sql.functions._

/** Deterministic checkpoint-block release (the r13 session-state
  * latency-growth fix): consumed localCheckpoints must leave the block
  * manager immediately — not at the ContextCleaner's next GC-driven
  * pass — so a long-lived JVM's residency is bounded by the LIVE
  * serving views, not by everything that ever ran.
  */
class CheckpointsSpec extends SparkSpec {

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("release drops a consumed checkpoint's RDD from the persistence registry") {
    val before = persistedIds
    val df = spark.range(100).toDF("v").localCheckpoint()
    assert(df.count() == 100)
    val added = persistedIds -- before
    assert(added.nonEmpty, "localCheckpoint should register a persistent RDD")
    Checkpoints.release(df)
    assert((persistedIds -- before).isEmpty,
      "release must unpersist the checkpoint RDD deterministically")
  }

  test("release is a safe no-op on a non-checkpoint frame") {
    val before = persistedIds
    Checkpoints.release(spark.range(5).toDF("v"))
    assert(persistedIds == before)
  }

  test("transient_ registers and releaseTransients drains the registry") {
    val before = persistedIds
    val a = Checkpoints.transient_(spark.range(10).toDF("a"))
    val b = Checkpoints.transient_(spark.range(20).toDF("b"))
    assert(a.count() == 10 && b.count() == 20)
    assert((persistedIds -- before).size >= 2)
    Checkpoints.releaseTransients()
    assert((persistedIds -- before).isEmpty,
      "the query-boundary drain must unpersist every registered transient")
    // drained registry: a second drain is a no-op (delta-scoped — an
    // earlier suite's leftover transients may legitimately drain too)
    Checkpoints.releaseTransients()
    assert((persistedIds -- before).isEmpty)
  }

  test("cachedView epoch roll releases the superseded view's blocks; eviction releases the rest") {
    val dir = java.nio.file.Files.createTempDirectory("ckpt_views").toString
    val docs = spark.range(0, 40).select(col("id").as("doc_id"),
      concat(lit("alpha beta gamma doc"), col("id") % 7).as("text"))
    IndexRefresh.buildBase(docs, dir)
    val before = persistedIds
    // capture the COUNT, not the frame: a rolled epoch releases the old
    // view's blocks, so holding a retired handle across a refresh is
    // exactly the misuse the per-probe-refetch convention forbids
    val d1Count = IndexRefresh.cachedDictView(spark, dir).count()
    assert(d1Count > 0)
    val afterFirst = persistedIds -- before
    assert(afterFirst.nonEmpty, "the epoch-cached view is checkpointed")
    // same epoch: the cached frame is served, nothing new is pinned
    IndexRefresh.cachedDictView(spark, dir).count()
    assert((persistedIds -- before) == afterFirst)
    // roll the epoch (one refresh batch) — the NEXT probe rebuilds and
    // must release the superseded view's blocks, not accumulate them
    val delta = spark.range(40, 45).select(col("id").as("doc_id"),
      lit("delta epsilon fresh").as("text"))
    IndexRefresh.refresh(spark, dir, delta, delta.limit(0))
    val d2 = IndexRefresh.cachedDictView(spark, dir)
    assert(d2.count() > d1Count)
    val afterRoll = persistedIds -- before
    assert(afterRoll.intersect(afterFirst).isEmpty,
      "the superseded epoch's view must be unpersisted on roll")
    assert(afterRoll.nonEmpty, "the new epoch's view is checkpointed")
    // retiring the layout releases its remaining views
    IndexRefresh.evictViews(dir)
    assert((persistedIds -- before).isEmpty,
      "evictViews must unpersist every cached view of the retired path")
  }
}
