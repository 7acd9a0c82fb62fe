/** Suite-order-invariance check (r13 verdict task #1's done criterion):
  * `runMain OrderCheck [query...]` — reads the committed
  * `BENCH_full.json`, re-times the named queries (default: the 8
  * slowest rows — the suite tail where state inflation showed) in THIS
  * fresh JVM (warm-up + median of 3, the DevTime convention, transients
  * drained between queries), and prints per-row
  * `in-suite median / fresh median`. PASS = every ratio ≤ 1.3: a row
  * that is >1.3× slower inside the 195-query suite than in a fresh JVM
  * means session state, not plan cost, set its benched number.
  */
object OrderCheck {
  private val Threshold = 1.3

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val raw = java.nio.file.Files.readString(
      java.nio.file.Paths.get("BENCH_full.json"))
    // minimal extraction of the "queries" map (flat {"name":sec,...})
    val qmap = """"queries":\{([^}]*)\}""".r.findFirstMatchIn(raw)
      .map(_.group(1)).getOrElse(sys.error("no queries map in BENCH_full.json"))
    val suite: Map[String, Double] =
      """"([^"]+)":(-?[0-9.]+)""".r.findAllMatchIn(qmap)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    val names =
      if (args.nonEmpty) args.toSeq
      else suite.filter(_._2 > 0).toSeq.sortBy(-_._2).take(8).map(_._1)
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }
    var fail = 0
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      graft.BenchForce.force(fn(spark, dir))
      val fresh = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.BenchForce.force(fn(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
      graft.operators.Checkpoints.releaseTransients()
      val rec = suite.getOrElse(n, -1.0)
      val ratio = rec / math.max(fresh, 1e-3)
      val ok = ratio <= Threshold
      if (!ok) fail += 1
      println(f"ORDERCHECK $n suite=$rec%.2f fresh=$fresh%.2f ratio=$ratio%.2f ${if (ok) "OK" else "INFLATED"}")
    }
    println(if (fail == 0) s"ORDERCHECK PASS (${names.size} rows, all <= ${Threshold}x)"
            else s"ORDERCHECK FAIL ($fail of ${names.size} rows inflated)")
    spark.stop()
    if (fail > 0) sys.exit(1)
  }
}
