object PlanProbe {
  def main(a: Array[String]): Unit = {
    val s = graft.GraftSession.local(8)
    s.sparkContext.setLogLevel("ERROR")
    val name = if (a.nonEmpty) a(0) else "hybrid_search_batch"
    val dir = if (a.length > 1) a(1) else "/root/testdata/sf0.01"
    val df = graft.SparkEntry.queries(name)(s, dir)
    df.collect() // finalize AQE on THIS queryExecution
    val plan = df.queryExecution.executedPlan.toString
    val ex = plan.linesIterator.count(_.contains("Exchange"))
    val reused = plan.linesIterator.count(l =>
      l.contains("ReusedExchange") || l.toLowerCase.contains("reused"))
    val scans = plan.linesIterator.count(_.contains("FileScan"))
    println(s"PLANPROBE $name exchanges=$ex reused=$reused filescans=$scans")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"/tmp/plan_$name.txt"), plan)
    s.stop()
  }
}
