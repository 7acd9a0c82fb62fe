package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Interleave the low `bits` bits of two bucketized longs into a
    * Z-value (Morton code) — pure codegen'd bit arithmetic, no UDF.
    */
  def zValue(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** Z-order clustered layout: range-normalize two numeric cluster
    * columns, bit-interleave them into a Morton code, range-partition +
    * sort the write by it. Every output file then covers a COMPACT
    * rectangle in (a, b) space, so parquet min/max stats prune files and
    * row groups for predicates on EITHER column — the multi-dimensional
    * upgrade of a single-column sort (the layout behind Delta/Iceberg's
    * OPTIMIZE ZORDER), built from stock Spark: one tiny min/max agg, a
    * broadcast, map-side bit math, one range exchange.
    *
    * The materialized `zv` column is the cluster key (kept in the files —
    * it doubles as a cheap locality bucket for downstream repartitions).
    * Normalization bounds come from the data; at 100 TB you'd pass fixed
    * domain bounds instead to keep appends stable — same plan.
    */
  def writeZOrdered(df: DataFrame, ca: String, cb: String, path: String,
                    bits: Int = 12, files: Int = 16): Unit = {
    // bounds collected to literals: one pass over the input lineage and
    // no synthetic stat columns joined in (at 100 TB pass fixed domain
    // bounds here instead to keep appends stable)
    val r = df.agg(min(ca).cast("double"), max(ca).cast("double"),
      min(cb).cast("double"), max(cb).cast("double")).head()
    val n = (1L << bits) - 1
    def bucketize(c: String, lo: Double, hi: Double): Column =
      least(lit(n), ((col(c) - lo).cast("double") /
        math.max(hi - lo, 1.0) * n).cast("long"))
    df.withColumn("zv", zValue(bucketize(ca, r.getDouble(0), r.getDouble(1)),
        bucketize(cb, r.getDouble(2), r.getDouble(3)), bits))
      .repartitionByRange(files, col("zv"))
      .sortWithinPartitions("zv")
      .write.mode("overwrite").parquet(path)
  }

  // --- driver-gated layout queries ----------------------------------------
  //
  // Each layout writes ONCE per (dir, JVM) via IndexCache — standing-
  // artifact semantics — and the driver query READS THE LAYOUT BACK,
  // so the DuckDB oracle (plain SQL over the source parquet) gates the
  // whole write→read round trip: partition derivation, bucketed join
  // results, and the Morton key itself are all independently recomputed.

  /** Bucketed orders+lineitem built once per dir; catalog names carry a
    * dir tag so several dirs coexist in one session.
    */
  private def bucketedTables(s: SparkSession, dir: String): (String, String) = {
    val tag = Integer.toHexString(dir.hashCode).takeRight(8)
    val (to, tl) = (s"orders_b_$tag", s"lineitem_b_$tag")
    graft.operators.IndexCache.getOrBuild("bucketed_join", dir) { p =>
      writeBucketed(Tables.orders(s, dir).select("o_orderkey", "o_orderpriority"),
        to, s"$p/orders_b", "o_orderkey", 8)
      writeBucketed(Tables.lineitem(s, dir).select("l_orderkey", "l_quantity"),
        tl, s"$p/lineitem_b", "l_orderkey", 8)
    }
    (to, tl)
  }

  /** Driver query (op 41): the zero-exchange bucketed fact-fact join —
    * merge join over the two bucketed tables (exchange-freeness is
    * spec-asserted; the plan hint keeps broadcast from hiding the
    * layout), aggregated per priority. The oracle is the PLAIN join in
    * DuckDB — the bucketed layout must change the plan, never the answer.
    */
  def qBucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val (to, tl) = bucketedTables(s, dir)
    s.table(tl).hint("merge")
      .join(s.table(to), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
      .orderBy("o_orderpriority")
  }

  val bucketedJoinOracle: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  round(sum(l_quantity), 2) AS qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Driver query (op 42): events written date-partitioned, read back in
    * FULL through the partitioned layout. The oracle recomputes every
    * row INCLUDING the derived partition value from the source table —
    * gating both row preservation and the partition derivation.
    */
  def qTimePartitioned(s: SparkSession, dir: String): DataFrame = {
    val p = graft.operators.IndexCache.getOrBuild("time_partitioned", dir) { p =>
      writeTimePartitioned(Tables.events(s, dir), s"$p/events")
    }
    s.read.parquet(s"$p/events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"),
        expr("ts div 1000000000").as("ts_s"),
        col("event_date").cast("string").as("event_date"))
      .orderBy("event_id")
  }

  val timePartitionedOracle: String =
    """SELECT event_id, user_id, event_type, value,
      |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
      |  CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** Driver query (op 44): events written Z-ORDERED on (user_id, ts_s),
    * read back with the materialized Morton key. The oracle recomputes
    * the ENTIRE Morton pipeline independently in DuckDB — data-derived
    * bounds, range bucketization (floor semantics match Spark's
    * double→long cast on non-negative values), and the 12-bit
    * interleave as raw bit arithmetic — so the cluster key itself is
    * oracle-gated, not just row preservation.
    */
  def qZOrdered(s: SparkSession, dir: String): DataFrame = {
    val p = graft.operators.IndexCache.getOrBuild("zorder_events", dir) { p =>
      writeZOrdered(Tables.events(s, dir).select(col("event_id"),
        col("user_id"), expr("ts div 1000000000").as("ts_s")),
        "user_id", "ts_s", s"$p/z")
    }
    s.read.parquet(s"$p/z")
      .select("event_id", "user_id", "ts_s", "zv")
      .orderBy("event_id")
  }

  def zOrderedOracle: String = {
    val bits = 12
    val n = (1L << bits) - 1
    val interleave = (0 until bits).map(i =>
      s"(((ba >> $i) & 1) << ${2 * i + 1}) | (((bb >> $i) & 1) << ${2 * i})")
      .mkString(" | ")
    s"""WITH src AS (
       |  SELECT event_id, user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
       |  FROM events),
       |bounds AS (
       |  SELECT CAST(min(user_id) AS DOUBLE) AS alo, CAST(max(user_id) AS DOUBLE) AS ahi,
       |    CAST(min(ts_s) AS DOUBLE) AS blo, CAST(max(ts_s) AS DOUBLE) AS bhi
       |  FROM src),
       |bucketized AS (
       |  SELECT event_id, user_id, ts_s,
       |    least($n, CAST(floor((user_id - alo) / greatest(ahi - alo, 1.0) * $n) AS BIGINT)) AS ba,
       |    least($n, CAST(floor((ts_s - blo) / greatest(bhi - blo, 1.0) * $n) AS BIGINT)) AS bb
       |  FROM src, bounds)
       |SELECT event_id, user_id, ts_s, ($interleave) AS zv
       |FROM bucketized
       |ORDER BY event_id""".stripMargin
  }

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
