/** Dev scratch: build the replicated scale dirs without running the bench. */
object ReplicateScale {
  def main(a: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    Seq(1, 10, 100).foreach { n =>
      val d = s"target/scale/x$n"
      if (!new java.io.File(s"$d/lineitem.parquet").exists())
        ScaleBench.replicate(spark, "/root/testdata/sf0.1", d, n)
      println(s"REPLICATED x$n")
    }
    spark.stop()
  }
}
