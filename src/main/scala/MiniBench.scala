object MiniBench {
  def main(a: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = graft.GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder()
        .master("local[32]").config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    try graft.SparkEntry.entry(s).count() catch { case _: Throwable => }
    val names = if (a.nonEmpty) a.toSeq else Seq(
      "hybrid_search_batch", "eval_retrieval_hybrid",
      "hybrid_search_batch_ivf", "kw_search_batch")
    names.foreach { n =>
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        graft.BenchForce.force(graft.SparkEntry.queries(n)(s, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"MINIBENCH $n median=${times.sorted.apply(2)}%.3f runs=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    s.stop()
  }
}
