/** Dev scratch: print executed-plan operator counts for one query. */
object QPlan {
  def main(a: Array[String]): Unit = {
    val s = graft.GraftSession.local(8)
    s.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(a(1))(s, a(0))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    def c(pat: String) = p.linesIterator.count(_.contains(pat))
    println(s"PLAN cosine=${c("cosine_sim")} smj=${c("SortMergeJoin")} bhj=${c("BroadcastHashJoin")} ex=${c("Exchange")} reused=${c("ReusedExchange")} scans=${c("Scan parquet")}")
    s.stop()
  }
}
