package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed access to the graft corpus tables (one parquet file/dir each).
  *
  * Reads stay fully declarative (`spark.read.parquet`) so Catalyst keeps
  * predicate pushdown, column pruning and partition pruning; never collect
  * or pre-materialize here.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Register every table as a temp view (Text2SQL / spark.sql surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))

  /** Re-slice a scan for CPU-dense per-row work (tokenization, cosine
    * fan-out). A small corpus file is one row group = ONE scan task, so
    * the expensive per-row compute serializes onto a single core — the
    * local stand-in for a cluster's thousands of scan splits. Identity
    * whenever the plan already carries at least default parallelism
    * (i.e. at any real scale), so the extra narrow shuffle is paid only
    * when it buys all the cores.
    */
  def parallel(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
