package graft

/** Scratch utility: dump ONE SparkEntry query + its oracle SQL for local
  * DuckDB diffing (used by .claude/skills/verify during development). */
object DumpQuery {
  def main(a: Array[String]): Unit = {
    val s = graft.GraftSession.local(8)
    s.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(a(0))(s, a(1)).coalesce(1)
      .write.mode("overwrite").parquet(a(2))
    val q = graft.SparkEntry.oracleSql(a(0))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(a(2) + "_oracle.sql"), q)
    s.stop()
  }
}
