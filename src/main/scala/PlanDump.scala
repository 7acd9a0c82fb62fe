/** Dev tool: dump `.explain("formatted")` (plus the post-execution AQE
  * final plan) for named SparkEntry queries to plans/<tag>/<query>_<suffix>.txt.
  * Args: tag suffix sfDir query...
  */
object PlanDump {
  def main(a: Array[String]): Unit = {
    val tag = a(0); val suffix = a(1); val dir = a(2)
    val s = graft.GraftSession.local(8)
    s.sparkContext.setLogLevel("ERROR")
    a.drop(3).foreach { q =>
      val df = graft.SparkEntry.queries(q)(s, dir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      graft.BenchForce.force(df) // finalize AQE on this queryExecution
      val finalPlan = df.queryExecution.executedPlan.toString
      val p = java.nio.file.Paths.get(s"plans/$tag/${q}_$suffix.txt")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p,
        formatted + "\n\n== AQE FINAL EXECUTED PLAN ==\n\n" + finalPlan)
      println(s"WROTE $p")
    }
    s.stop()
  }
}
