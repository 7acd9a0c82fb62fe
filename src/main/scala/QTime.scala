/** Dev scratch: time selected SparkEntry queries (median of 3) and show
  * whether the executed plan reuses exchanges. Args: sfDir query... */
object QTime {
  def main(a: Array[String]): Unit = {
    val s = graft.GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().master("local[32]")).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = a.head
    try graft.SparkEntry.entry(s).count() catch { case _: Throwable => }
    a.tail.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); graft.BenchForce.force(fn(s, dir)); (System.nanoTime()-t0)/1e9 }
      val df = fn(s, dir); df.collect()
      val p = df.queryExecution.executedPlan.toString
      println(f"QT $q%-28s ${ts.sorted.apply(1)}%6.2f s  runs=${ts.map(t => f"$t%.2f").mkString(",")}  reused=${p.linesIterator.count(_.contains("ReusedExchange"))}  ex=${p.linesIterator.count(_.contains("Exchange"))}")
    }
    s.stop()
  }
}
