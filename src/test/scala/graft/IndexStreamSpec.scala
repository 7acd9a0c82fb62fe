package graft

import graft.operators.{CorpusOps, IndexRefresh}
import graft.streaming.IndexStream
import org.apache.spark.sql.functions._

/** End-to-end retry semantics of the streaming refresh→fold loop's
  * generation counter (the r12 commit-then-advance fix): a fold that
  * dies MID-WRITE — partial output landed, no absorbed-through marker,
  * driver counter not advanced — must, on the streaming retry of the
  * SAME micro-batch, land the SAME generation directory with
  * bitwise-equal serving views to a run that never failed. The failure
  * is injected inside a real checkpointed `foreachBatch` (the query
  * terminates with the injected exception; the restart replays the
  * same batchId from the checkpoint), not simulated by calling the
  * fold twice — this is the deploy/failure path a production
  * compaction loop actually takes.
  */
class IndexStreamSpec extends SparkSpec {

  private def sortedRows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def views(p: String) = Seq(
    sortedRows(IndexRefresh.livePostings(spark, p).drop("seg")),
    sortedRows(IndexRefresh.dictView(spark, p)),
    sortedRows(IndexRefresh.champsView(spark, p)),
    sortedRows(IndexRefresh.statsView(spark, p)))

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete()
  }

  test("a fold killed mid-write retries into the same generation with equal views") {
    import org.apache.spark.sql.streaming.Trigger
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
    val curr = CorpusOps.currSnapshot(docs)
    val prev = CorpusOps.prevSnapshot(docs)
    val diff = CorpusOps.snapshotDiff(curr, prev)
      .filter(col("status") =!= "unchanged").localCheckpoint()

    val base = java.nio.file.Files.createTempDirectory("fold_retry").toString
    val src = s"$base/src"
    new java.io.File(src).mkdirs()
    // the whole delta as ONE durable micro-batch file (file source +
    // checkpoint = the restart replays batch 0 with the same id)
    diff.select("doc_id").coalesce(1).write.parquet(s"$base/stage")
    val part = new java.io.File(s"$base/stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(src, "batch0.parquet"))

    // the qStreamRefreshCompact loop body, with maxSegments = 1 so the
    // fold trips on the very first refresh batch, plus the one-shot
    // mid-write kill: half the fold's output is torn away and the
    // batch dies BEFORE the marker lands or the counter advances
    def runLoop(root: String, ckpt: String,
                failOnce: Boolean): (String, Int) = {
      var cur = s"$root/gen0"
      var gen = 0
      if (!new java.io.File(cur).exists()) IndexRefresh.buildBase(prev, cur)
      var armed = failOnce
      val q = spark.readStream.schema("doc_id LONG").parquet(src)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          val ids = batch.select("doc_id").distinct()
          if (!batch.isEmpty && batchId > IndexStream.absorbedThrough(cur)) {
            val d = diff.join(ids, Seq("doc_id"), "semi")
            IndexRefresh.refreshAt(spark, cur, 1 + batchId.toInt,
              curr.join(d.filter(col("status").isin("added", "changed"))
                .select("doc_id"), Seq("doc_id"), "semi"),
              prev.join(d.filter(col("status").isin("removed", "changed"))
                .select("doc_id"), Seq("doc_id"), "semi"))
            if (IndexRefresh.compactionPlan(spark, cur, maxSegments = 1)
                .head().getBoolean(4)) {
              val next = s"$root/gen${gen + 1}"
              IndexRefresh.compact(spark, cur, next)
              if (armed) {
                armed = false
                // mid-write kill: the dict view vanishes, the marker is
                // never written, the counter never advances
                deleteRec(new java.io.File(next, "seg=0/dict"))
                throw new RuntimeException("injected fold failure")
              }
              IndexStream.recordAbsorbedThrough(next, batchId)
              cur = next
              gen += 1
            }
          }
        }
        .start()
      q.awaitTermination()
      (cur, gen)
    }

    // failing run: first attempt dies inside the fold...
    val rootA = s"$base/a"
    val ckptA = s"$base/ckptA"
    val died = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runLoop(rootA, ckptA, failOnce = true)
    }
    assert(died.getMessage.contains("injected fold failure") ||
      Option(died.getCause).exists(_.getMessage.contains("injected fold failure")))
    // ...the half-written generation is visibly uncommitted (no marker)
    assert(!new java.io.File(s"$rootA/gen1/_graft_absorbed_through").exists())
    // restart from the SAME checkpoint: batch 0 replays at the same id,
    // the retry lands the SAME generation directory
    val (curA, genA) = runLoop(rootA, ckptA, failOnce = false)
    assert(genA == 1 && curA == s"$rootA/gen1")

    // clean run: same loop, no injected failure
    val (curB, genB) = runLoop(s"$base/b", s"$base/ckptB", failOnce = false)
    assert(genB == 1 && curB == s"$base/b/gen1")

    // the retried generation serves bitwise what the clean fold serves
    assert(views(curA) == views(curB))
  }
}
