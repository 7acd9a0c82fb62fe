/** Dev scratch: stage-level timing of dedup_ngram_jaccard's pieces. */
object NgramProbe {
  def main(a: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val s = graft.GraftSession.configure(
      org.apache.spark.sql.SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.codegen.wholeStage", sys.env.getOrElse("NP_CODEGEN", "true")))
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = a.headOption.getOrElse("/root/testdata/sf0.1")
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"NP $label%-28s ${(System.nanoTime()-t0)/1e9}%7.2f s"); r
    }
    val docs = s.read.parquet(s"$dir/documents.parquet")
    t("docs.count")(docs.count())
    val toks = docs.select(explode(array_distinct(
      graft.functions.TextFunctions.tokens(col("text")))).as("tok"))
    t("explode count")(toks.count())
    t("explode count 2")(toks.count())
    t("explode distinct count")(toks.distinct().count())
    t("probe limit65 collect")(toks.distinct().limit(65).collect().length)
    s.stop()
  }
}
