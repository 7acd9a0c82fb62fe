package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-side table layouts — the sink half of the source/sink surface.
  *
  * Three layouts cover the engine's scale needs:
  *  - plain parquet (the default everywhere),
  *  - partitioned parquet for prunable access paths
  *    ([[graft.operators.IvfIndex.writeIndex]] by cell,
  *    [[graft.operators.KeywordIndex.writeIndex]] by term bucket),
  *  - BUCKETED tables (this object) for co-located joins/aggregations:
  *    `bucketBy(n, key)` pre-shuffles ONCE at write time and records the
  *    layout in the catalog, so every later join or aggregation on the
  *    bucket key skips its Exchange entirely. At 100 TB, bucketing the
  *    fact tables on their join key turns the recurring fact-fact
  *    shuffle (the single most expensive stage in the star-join suite)
  *    into a zero-shuffle sort-merge join.
  *
  * Bucket counts must match across tables meant to co-join (Spark joins
  * bucketed tables exchange-free only when both sides hash into the same
  * bucket count, or a multiple under
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
  */
object Sinks {

  /** Materialize `df` as a bucketed, per-bucket-sorted external table.
    * The sort makes the on-disk layout directly mergeable — a sort-merge
    * join over two such tables needs neither Exchange nor Sort.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Date-partitioned event-stream layout: one directory per event day,
    * the canonical 100 TB time-series layout — every time-bounded query
    * prunes to its date range at file listing, and daily ingest appends
    * one new partition without touching history. The pre-write
    * repartition lines task output up with directories (one file per
    * partition per day, not one per task per day).
    */
  def writeTimePartitioned(events: DataFrame, path: String): Unit =
    events
      .withColumn("event_date",
        to_date(timestamp_seconds(expr("ts div 1000000000"))))
      .repartition(col("event_date"))
      .write.mode("overwrite").partitionBy("event_date").parquet(path)

  /** Time-range read over the partitioned layout — the filter lands on
    * the partition column, so pruning happens before any file IO.
    */
  def readTimeRange(spark: SparkSession, path: String,
                    from: String, to: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("event_date") >= from && col("event_date") <= to)

  /** JSON-lines export/import — the reference's interchange format for
    * processed corpora (`preprocessing.py` json dumps). Parquet is the
    * engine-native layout; JSON is the interop edge.
    */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(spark: SparkSession, path: String,
               schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
