object PerfProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    graft.SparkEntry.entry(spark).count()
    val fn = graft.SparkEntry.queries(args(0))
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      println(f"run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    if (args.length > 1 && args(1) == "explain")
      fn(spark, dir).explain("formatted")
    spark.stop()
  }
}
