/** Dev tool: time named SparkEntry queries (warm-up + median of 3) at
  * an SF dir — `runMain DevTime <sfDir> <query>...`. The quick
  * before/after harness for serving-latency work (the [[QPlan]]
  * convention); not part of the driver contract.
  */
object DevTime {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => }
    args.drop(1).foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      graft.BenchForce.force(fn(spark, dir))
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.BenchForce.force(fn(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"DEVTIME $n median=${ts(1)}%.2f min=${ts(0)}%.2f")
      graft.operators.Checkpoints.releaseTransients() // query boundary
    }
    spark.stop()
  }
}
