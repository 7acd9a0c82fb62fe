/** Dev tool: [[graft.Verify]] for a NAMED SUBSET of queries at any SF —
  * `runMain VerifySubset <sfDir> <outDir> <query>...` dumps each query's
  * result parquet plus the matching oracle_sql.json slice, ready for
  * `.claude/skills/verify/check.py <sfDir> <outDir>`. Exists because of
  * the r7 lesson (SURVEY §11): the driver gate compares only sf0.01,
  * and a serving twin whose query universe subtly diverges can stay
  * green there while serving a subset at sf0.1 — so any serving or
  * query-universe change gets this targeted sf0.1 compare without
  * paying the full 152-query Verify run.
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val dir = args(0); val out = args(1)
    val names = args.drop(2)
    // fail fast on a bad name BEFORE any Spark work: a typo must not
    // cost the whole multi-query dump (and every named query needs an
    // oracle — rows-only surfaces have nothing to compare here)
    require(names.nonEmpty, "usage: VerifySubset <sfDir> <outDir> <query>...")
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} — see SparkEntry.queries")
    val noOracle = names.filterNot(graft.SparkEntry.oracleSql.contains)
    require(noOracle.isEmpty,
      s"queries without a registered oracle: ${noOracle.mkString(", ")} — " +
        "VerifySubset compares against oracleSql; these are rows-only surfaces")
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(out).mkdirs()
    names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, dir)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/$n")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case '\r' => "\\r"; case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString } + "\""
    val json = names.map(n => s"${q(n)}: ${q(graft.SparkEntry.oracleSql(n))}")
      .mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/oracle_sql.json"), json)
    spark.stop()
  }
}
