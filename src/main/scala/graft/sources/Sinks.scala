package graft.sources

import org.apache.spark.sql.DataFrame

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
}
