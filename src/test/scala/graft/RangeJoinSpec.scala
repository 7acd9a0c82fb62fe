package graft

import graft.operators.{Pipeline, RangeJoin}
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bucket join equals the naive interval join") {
    val probe = Seq(0.0, 0.5, 1.0, 3.99, 4.0, 15.9, 16.0, 255.5, 480.0, 528.9)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("event_id", "value")
    val bands = RangeJoin.bandDim(spark)
    val bucketed = RangeJoin.bucketJoin(probe, col("value"), bands)
      .select("event_id", "band_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = probe.join(bands, col("value") >= col("lo") && col("value") < col("hi"))
      .select("event_id", "band_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive)
    // half-open semantics: 4.0 belongs to band 2 ([4,9)), not band 1 ([1,4))
    assert(bucketed.contains((4L, 2L)) && !bucketed.contains((4L, 1L)))
  }

  test("bucket join plans as a hash equi-join, never a nested loop") {
    val ev = graft.sources.Tables.events(spark, dir).select(col("event_id"), col("value"))
    val plan = RangeJoin.bucketJoin(ev, col("value"), RangeJoin.bandDim(spark))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"nested-loop join in plan:\n$plan")
  }

  test("corpus-level range join matches the naive plan's result") {
    val ev = graft.sources.Tables.events(spark, dir).select(col("event_id"), col("value"))
    val bands = RangeJoin.bandDim(spark)
    val a = RangeJoin.bucketJoin(ev, col("value"), bands).count()
    val b = ev.join(bands, col("value") >= col("lo") && col("value") < col("hi")).count()
    assert(a == b && a > 0)
  }

  test("clean-pack pipeline: bins are dense per source and account for every kept doc") {
    val out = Pipeline.cleanPack(spark, dir).cache()
    val perSource = out.groupBy("source")
      .agg(min("bin_id").as("lo"), max("bin_id").as("hi"),
        count(lit(1)).as("n_bins"))
    // greedy packing emits consecutive bins 0..max per source
    assert(perSource.filter(col("lo") =!= 0 || col("n_bins") =!= col("hi") + 1).count() == 0)
    // cheap invariant: every emitted bin holds at least one doc
    assert(out.filter(col("n_docs") < 1).count() == 0)
    out.unpersist()
  }

  test("decision log: one verdict per doc, reason is the first failing gate") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val log = Pipeline.decisionLog(spark, dir).cache()
    assert(log.count() == docs.count())
    // keep ⇔ all three gates pass
    assert(log.filter(col("keep") =!=
      (col("quality_keep") && col("is_canonical") && !col("contaminated")))
      .count() == 0)
    // reason priority: quality > duplicate > contaminated > kept
    assert(log.filter(!col("quality_keep") && col("reason") =!= "quality").count() == 0)
    assert(log.filter(col("quality_keep") && !col("is_canonical") &&
      col("reason") =!= "duplicate").count() == 0)
    assert(log.filter(col("reason") === "kept" && !col("keep")).count() == 0)
    // the quality+canonical universe matches the clean-pack pipeline's
    // doc accounting (cleanPack has no contamination gate)
    val packed = Pipeline.cleanPack(spark, dir)
      .agg(sum("n_docs")).head().getLong(0)
    assert(log.filter(col("quality_keep") && col("is_canonical")).count() == packed)
    log.unpersist()
  }
}
