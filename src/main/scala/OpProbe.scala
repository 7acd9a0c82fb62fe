import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Dev probe: per-OPERATOR metrics for one warm run of a query — walks
  * the AQE-final executed plan and prints every node's rows-out plus its
  * time metrics (codegen span duration, shuffle write time, broadcast
  * collect time, scan time). Maps wall time to operators where the
  * stage-level census can't. Args: sfDir query...
  */
object OpProbe {
  def main(a: Array[String]): Unit = {
    val s = graft.GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = a.head
    try graft.SparkEntry.entry(s).count() catch { case _: Throwable => }

    def walk(p: SparkPlan, d: Int): Seq[(Int, SparkPlan)] = p match {
      case ad: AdaptiveSparkPlanExec => walk(ad.executedPlan, d)
      case q: QueryStageExec => (d, q) +: walk(q.plan, d + 1)
      case r: ReusedExchangeExec => Seq((d, r))
      case _ => (d, p) +: p.children.flatMap(walk(_, d + 1))
    }
    a.tail.foreach { qn =>
      val fn = graft.SparkEntry.queries(qn)
      graft.BenchForce.force(fn(s, dir)) // warm-up
      graft.operators.Checkpoints.releaseTransients()
      val df = fn(s, dir)
      val t0 = System.nanoTime()
      graft.BenchForce.force(df)
      val wall = (System.nanoTime() - t0) / 1e9
      graft.operators.Checkpoints.releaseTransients()
      println(f"OPPROBE $qn wall=$wall%.2f")
      walk(df.queryExecution.executedPlan, 0).foreach { case (d, p) =>
        val m = p.metrics
        def g(k: String): Long = m.get(k).map(_.value).getOrElse(-1L)
        val rows = g("numOutputRows")
        val times = m.collect {
          case (k, v) if k.contains("time") || k == "duration" ||
            k.contains("Time") => s"$k=${v.value}"
        }.mkString(" ")
        if (rows >= 0 || times.nonEmpty)
          println(("  " * d) + f"${p.nodeName.take(60)}%-60s rows=$rows $times")
      }
    }
    s.stop()
  }
}
