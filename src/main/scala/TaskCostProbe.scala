package graft
/** Dev probe: isolate the per-task constant at sf0.1 — time a trivial
  * aggregation over the standing postings artifact at several scan/shuffle
  * parallelism settings, plus a pure-compute stage, to see how much of a
  * small stage's wall time is per-task overhead vs rows.
  */
object TaskCostProbe {
  def main(a: Array[String]): Unit = {
    val dir = if (a.nonEmpty) a(0) else "/root/testdata/sf0.1"
    val s = GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val postings = operators.KeywordSearch.cachedBatchPostings(s, dir)
    println(s"postings rows=${postings.count()} parts=${postings.rdd.getNumPartitions}")
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"TASKCOST $tag%-50s med=${ts(2)}%.3f min=${ts.head}%.3f")
    }
    // 1. stats pass as the query runs it (scan parts as-is, 32 shuffle parts)
    time("stats groupBy(doc_id)+agg, shuffle=32") {
      BenchForce.force(
        postings.groupBy("doc_id").agg(first("dl").as("d"))
          .agg(count(lit(1)), avg("d")))
    }
    // 2. same with shuffle=4
    time("stats groupBy(doc_id)+agg, shuffle=4") {
      s.conf.set("spark.sql.shuffle.partitions", "4")
      BenchForce.force(
        postings.groupBy("doc_id").agg(first("dl").as("d"))
          .agg(count(lit(1)), avg("d")))
      s.conf.set("spark.sql.shuffle.partitions", "32")
    }
    // 3. same over a coalesced scan (4 scan tasks)
    time("stats over coalesce(4) scan, shuffle=4") {
      s.conf.set("spark.sql.shuffle.partitions", "4")
      BenchForce.force(
        postings.coalesce(4).groupBy("doc_id").agg(first("dl").as("d"))
          .agg(count(lit(1)), avg("d")))
      s.conf.set("spark.sql.shuffle.partitions", "32")
    }
    // 4. empty-ish stage: 32 tasks doing nothing (per-task floor)
    time("range(32 parts) map-only noop") {
      BenchForce.force(s.range(0, 32, 1, 32).toDF())
    }
    time("range(256 parts) map-only noop") {
      BenchForce.force(s.range(0, 256, 1, 256).toDF())
    }
    // 5. one shuffle of 32 map x 32 reduce tiny blocks
    time("tiny shuffle 32x32") {
      BenchForce.force(
        s.range(0, 10000, 1, 32).groupBy(pmod(col("id"), lit(1000)).as("k")).count())
    }
    s.stop()
  }
}
