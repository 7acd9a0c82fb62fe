package graft

import graft.functions.TextFunctions._
import graft.operators._
import graft.sources.Tables
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

class KeywordIndexSpec extends SparkSpec {
  import spark.implicits._

  test("indexed bm25 equals inline bm25 (corpus)") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val inline = KeywordSearch.bm25(docs, KeywordSearch.QueryTerms).collect().toSeq
    val p = KeywordIndex.postings(docs)
    val indexed = KeywordIndex
      .searchFromIndex(p, KeywordIndex.docStats(p), KeywordSearch.QueryTerms)
      .collect().toSeq
    assert(indexed == inline)
  }

  test("dictionary: df counts docs, cf counts occurrences") {
    val docs = Seq(
      (0L, "a b a", "s0", "en"),
      (1L, "a c", "s0", "en")
    ).toDF("doc_id", "text", "source", "lang")
    val d = KeywordIndex.dictionary(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(d("a") == ((2L, 3L)))
    assert(d("b") == ((1L, 1L)))
    assert(d("c") == ((1L, 1L)))
  }

  test("driver-side bucket derivation matches the engine's partition column") {
    val terms = KeywordSearch.QueryTerms :+ "zz9"
    val engine = terms.toDF("term")
      .select(col("term"), pmod(portableHash(col("term")), lit(KeywordIndex.NumBuckets)).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    terms.foreach { t =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      assert(java.lang.Long.parseLong(hex, 16) % KeywordIndex.NumBuckets == engine(t))
    }
  }

  test("materialized index: search prunes to query-term buckets and matches inline") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val path = java.nio.file.Files.createTempDirectory("kw_idx").toString + "/idx"
    KeywordIndex.writeIndex(docs, path)
    val bucketDirs = new java.io.File(s"$path/postings").listFiles()
      .filter(_.getName.startsWith("term_bucket=")).map(_.getName)
    assert(bucketDirs.nonEmpty)
    val out = KeywordIndex.searchIndex(spark, path, KeywordSearch.QueryTerms)
    // the postings scan must carry a partition filter on term_bucket
    val scans = out.queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }
    assert(scans.exists(_.partitionFilters.exists(_.toString.contains("term_bucket"))))
    val inline = KeywordSearch.bm25(docs, KeywordSearch.QueryTerms).collect().toSeq
    assert(out.collect().toSeq == inline)
  }
}
