/** Dev tool: time one SparkEntry query (median-of-warm-runs shape as
  * Bench) and optionally print its formatted plan.
  * Usage: runMain PerfProbe <queryName> [explain]
  * Data dir from SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: PerfProbe <queryName> [explain]")
      sys.exit(2)
    }
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.entry(spark).count()
    val fn = graft.SparkEntry.queries.getOrElse(args(0), {
      System.err.println(s"unknown query '${args(0)}'")
      sys.exit(2)
    })
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      println(f"run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    if (args.length > 1 && args(1) == "explain")
      fn(spark, dir).explain("formatted")
    spark.stop()
  }
}
