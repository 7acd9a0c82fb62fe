package graft

import graft.operators.Chunker
import org.apache.spark.sql.functions._

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, nTokens: Int) =
    (id, (1 to nTokens).map(i => s"t$i").mkString(" "))

  test("short doc yields exactly one chunk") {
    val df = Seq(doc(1, 5)).toDF("doc_id", "text")
    val rows = Chunker.chunk(df).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Int]("n_tokens") == 5)
  }

  test("exact chunk-size doc yields one chunk; one extra token adds a chunk") {
    assert(Chunker.chunk(Seq(doc(1, 32)).toDF("doc_id", "text")).count() == 1)
    val rows = Chunker.chunk(Seq(doc(1, 33)).toDF("doc_id", "text")).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Int]("n_tokens")).toSeq == Seq(32, 9)) // starts 1, 25
  }

  test("consecutive chunks overlap by `overlap` tokens") {
    val df = Seq(doc(1, 56)).toDF("doc_id", "text")
    val rows = Chunker.chunk(df).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[Int]("n_tokens")).toSeq == Seq(32, 32)) // 1..32, 25..56
  }

  test("every token is covered at sf0.001 corpus scale") {
    val docs = sources.Tables.documents(spark, TestSpark.Sf0001)
    val chunks = Chunker.chunk(docs)
    // last chunk of each doc must reach the doc's final token:
    // sum of (n_tokens - overlap-contributions) == token count per doc
    val perDoc = chunks.groupBy("doc_id")
      .agg(sum("n_tokens").as("sum_t"), count(lit(1)).as("n_chunks"))
    val joined = docs
      .select(col("doc_id"), functions.TextFunctions.tokenCount(col("text")).as("n"))
      .join(perDoc, "doc_id")
      .withColumn("expected",
        col("n") + (col("n_chunks") - 1) * Chunker.Overlap)
      .filter(col("sum_t") =!= col("expected"))
    assert(joined.count() == 0)
  }

  test("small-to-big expansion: interior chunks span chunk-1..chunk+1, edges clip") {
    import spark.implicits._
    // 80 tokens → 3 chunks at size=32/stride=24 (starts 0, 24, 48)
    val text = (1 to 80).map(i => s"w$i").mkString(" ")
    val docs = Seq((0L, text)).toDF("doc_id", "text")
    val out = Chunker.chunkExpanded(docs).collect()
      .map(r => r.getAs[Int]("chunk_id") ->
        (r.getAs[Int]("exp_from"), r.getAs[Int]("exp_to"),
          r.getAs[Int]("expanded_tokens"), r.getAs[String]("expanded_hash"))).toMap
    assert(out.keySet == Set(0, 1, 2))
    assert((out(0)._1, out(0)._2) == (0, 1)) // clipped at doc start
    assert((out(1)._1, out(1)._2) == (0, 2)) // full ±1 window
    assert((out(2)._1, out(2)._2) == (1, 2)) // clipped at doc end
    // interior chunk expands to the whole 80-token doc (tokens 1..80)
    val toks = (1 to 80).map(i => s"w$i")
    assert(out(1)._3 == 80)
    assert(out(1)._4 == java.security.MessageDigest.getInstance("MD5")
      .digest(toks.mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString)
    // edge chunk 0 covers tokens 1..56 (chunks 0-1)
    assert(out(0)._3 == 56)
  }

  test("chunker and expansion agree on every document's chunk ids") {
    val docs = sources.Tables.documents(spark, TestSpark.Sf0001)
    val a = Chunker.chunk(docs).select("doc_id", "chunk_id")
    val b = Chunker.chunkExpanded(docs).select("doc_id", "chunk_id")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }
}
