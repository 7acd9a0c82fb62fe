/** Dev probe: split a query's wall time into DataFrame construction
  * (operator code, index-cache hits), Catalyst planning (analyze +
  * optimize + physical planning via `executedPlan`), and execution
  * (`BenchForce.force`). Median of 3 after one warm-up, like Bench.
  * Args: sfDir query...
  */
object PhaseProbe {
  def main(a: Array[String]): Unit = {
    val s = graft.GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = a.head
    try graft.SparkEntry.entry(s).count() catch { case _: Throwable => }
    a.tail.foreach { q =>
      val fn = graft.SparkEntry.queries(q)
      def one(): (Double, Double, Double) = {
        val t0 = System.nanoTime()
        val df = fn(s, dir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis+optimization+planning
        val t2 = System.nanoTime()
        graft.BenchForce.force(df)
        val t3 = System.nanoTime()
        ((t1 - t0) / 1e9, (t2 - t1) / 1e9, (t3 - t2) / 1e9)
      }
      one() // warm-up (pays index builds, codegen)
      val runs = (1 to 3).map(_ => one())
      graft.operators.Checkpoints.releaseTransients()
      def med(f: ((Double, Double, Double)) => Double) =
        runs.map(f).sorted.apply(1)
      println(f"PHASE $q%-40s build=${med(_._1)}%6.2f plan=${med(_._2)}%6.2f exec=${med(_._3)}%6.2f total=${med(t => t._1 + t._2 + t._3)}%6.2f")
    }
    s.stop()
  }
}
