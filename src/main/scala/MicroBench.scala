/** Scratch: time a handful of SparkEntry queries, median of N. */
object MicroBench {
  def main(a: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("MB_RUNS", "5").toInt
    val s = graft.GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder()
        .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.entry(s).count()
    a.foreach { name =>
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        graft.BenchForce.force(graft.SparkEntry.queries(name)(s, dir))
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"MB $name%-28s median=${times(n / 2)}%.3f min=${times.head}%.3f")
    }
    s.stop()
  }
}
