package graft

import graft.streaming.IndexStream
import org.apache.spark.sql.functions._

/** Exactly-once RESTART semantics for the continuous-ingest path: a
  * streaming job checkpointed to disk is stopped, new input arrives,
  * and a RESTARTED query (fresh StreamingQuery object, same
  * checkpoint) must process ONLY the new files — the landed index
  * equals the batch result over all input with no row duplicated and
  * no row lost. This is the property a 1000-executor continuous
  * ingest relies on across deploys/failures; Spark's file-source +
  * checkpoint machinery provides it, and this spec pins our pipeline
  * to it.
  */
class CheckpointResumeSpec extends SparkSpec {

  test("index ingest restarted from its checkpoint processes only new files") {
    import org.apache.spark.sql.streaming.Trigger
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("text"))
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 === 1)

    val base = java.nio.file.Files.createTempDirectory("ckpt_resume").toString
    val (src, sink, ckpt) = (s"$base/src", s"$base/index", s"$base/ckpt")
    new java.io.File(src).mkdirs()

    def ingestAvailable(): Unit = {
      val schema = docs.schema
      val stream = spark.readStream.schema(schema).parquet(src)
      val q = IndexStream.chunkEmbedAssign(stream).writeStream
        .format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .partitionBy("cell")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // the file-stream source lists FILES, not Spark output directories —
    // land each half as one flat parquet file (the shape a real feed
    // drops into the landing dir)
    def landFlat(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"$base/stage_$name"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(src, name))
    }

    // phase 1: only the first half exists; ingest and STOP
    landFlat(half1, "d1.parquet")
    ingestAvailable()
    val afterPhase1 = spark.read.parquet(sink).count()

    // phase 2: new file arrives; RESTART from the same checkpoint
    landFlat(half2, "d2.parquet")
    ingestAvailable()

    val landed = spark.read.parquet(sink)
      .select(col("doc_id"), col("chunk_id"), col("chunk_hash"),
        col("cell").cast("long").as("cell"))
    val want = IndexStream.chunkEmbedAssign(docs)
      .select(col("doc_id"), col("chunk_id"), col("chunk_hash"),
        col("cell").cast("long").as("cell"))

    // no loss, no duplication: exact multiset equality with the batch run
    assert(landed.count() == want.count(),
      s"restart must not duplicate or drop rows (phase1 landed $afterPhase1)")
    assert(landed.exceptAll(want).count() == 0)
    assert(want.exceptAll(landed).count() == 0)
    // and phase 2 really was incremental (phase 1 landed only half)
    assert(afterPhase1 > 0 && afterPhase1 < want.count())
  }
}
