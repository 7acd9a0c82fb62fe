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

  test("cachedView epoch roll defers release of the superseded view by ONE epoch; eviction releases everything") {
    val dir = java.nio.file.Files.createTempDirectory("ckpt_views").toString
    val docs = spark.range(0, 40).select(col("id").as("doc_id"),
      concat(lit("alpha beta gamma doc"), col("id") % 7).as("text"))
    IndexRefresh.buildBase(docs, dir)
    val before = persistedIds
    // a concurrent reader may fetch a view just before a refresh
    // commits and execute after it — so a ROLLED view must survive one
    // epoch of grace (released on the NEXT roll), never eagerly
    val d1 = IndexRefresh.cachedDictView(spark, dir)
    val d1Count = d1.count()
    assert(d1Count > 0)
    val afterFirst = persistedIds -- before
    assert(afterFirst.nonEmpty, "the epoch-cached view is checkpointed")
    // same epoch: the cached frame is served, nothing new is pinned
    IndexRefresh.cachedDictView(spark, dir).count()
    assert((persistedIds -- before) == afterFirst)
    // roll 1: the superseded view retires but its blocks stay — a
    // reader holding d1 across the commit still executes safely
    val delta = spark.range(40, 45).select(col("id").as("doc_id"),
      lit("delta epsilon fresh").as("text"))
    IndexRefresh.refresh(spark, dir, delta, delta.limit(0))
    val d2Count = IndexRefresh.cachedDictView(spark, dir).count()
    assert(d2Count > d1Count)
    val afterRoll1 = persistedIds -- before
    assert(afterFirst.subsetOf(afterRoll1),
      "the rolled view keeps its blocks for one epoch of grace")
    assert(d1.count() == d1Count,
      "a pre-roll reader's fetched view stays readable until the next roll")
    // roll 2: the grace epoch ends — the FIRST view's blocks go now
    val delta2 = spark.range(45, 50).select(col("id").as("doc_id"),
      lit("zeta eta theta").as("text"))
    IndexRefresh.refresh(spark, dir, delta2, delta2.limit(0))
    IndexRefresh.cachedDictView(spark, dir).count()
    assert((persistedIds -- before).intersect(afterFirst).isEmpty,
      "the next roll must release the previously retired view's blocks")
    // retiring the layout releases its remaining views AND the parked
    // retired frame
    IndexRefresh.evictViews(dir)
    assert((persistedIds -- before).isEmpty,
      "evictViews must unpersist every cached + retired view of the path")
  }

  test("request scopes isolate transients: draining scope A leaves scope B's frame readable") {
    val before = persistedIds
    val a = Checkpoints.newScope()
    val b = Checkpoints.newScope()
    // two interleaved requests register under their own scopes
    val fa = Checkpoints.withScope(a)(
      Checkpoints.transient_(spark.range(10).toDF("a")))
    val fb = Checkpoints.withScope(b)(
      Checkpoints.transient_(spark.range(20).toDF("b")))
    assert(fa.count() == 10 && fb.count() == 20)
    assert((persistedIds -- before).size >= 2)
    // request A completes and drains — B's frame must be untouched
    a.drain(blocking = true)
    assert(fb.count() == 20,
      "draining one request's scope must not release another's live frame")
    intercept[Throwable] {
      // fa's checkpoint blocks are gone and its lineage was truncated
      fa.count()
    }
    b.drain(blocking = true)
    assert((persistedIds -- before).isEmpty)
    // the GLOBAL registry saw none of it: a harness drain finds nothing
    Checkpoints.releaseTransients()
  }

  test("withRequestScope drains its own registrations at body end, not the global registry") {
    val before = persistedIds
    val outer = Checkpoints.transient_(spark.range(7).toDF("g")) // global
    Checkpoints.withRequestScope {
      val inner = Checkpoints.transient_(spark.range(5).toDF("r"))
      assert(inner.count() == 5)
    }
    // the request's frame is gone; the global one survives the scope
    assert(outer.count() == 7,
      "a request scope must not drain globally-registered transients")
    Checkpoints.releaseTransients()
    assert((persistedIds -- before).isEmpty)
  }
}
