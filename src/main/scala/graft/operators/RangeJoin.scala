package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval (range) join via bucket decomposition — the equi-join
  * formulation of `probe.value BETWEEN band.lo AND band.hi`.
  *
  * Spark executes a raw interval predicate as BroadcastNestedLoopJoin
  * (or a cartesian product when neither side fits in memory): O(|probe|
  * × |bands|) comparisons. That is fine for a 5-row dimension and fatal
  * for a real one (millions of IP ranges, price histories, geo tiles).
  * Bucket decomposition makes it an equi-join: every band explodes to
  * the fixed-width buckets it overlaps, the probe maps each value to its
  * bucket, the join key is the bucket id, and a residual filter
  * re-checks the exact interval. Work becomes O(|probe| + |bands| ×
  * avg_buckets_per_band) with an ordinary shuffle/broadcast hash join
  * that AQE can plan, skew-split, and co-locate like any other —
  * the same trick as Databricks' range-join bin optimization, built
  * here from primitives.
  */
object RangeJoin {

  val NumBands = 23
  val BucketWidth = 16.0

  /** Quadratic band edges [i², (i+1)²) — non-uniform widths, the case
    * where bucket decomposition actually earns its keep (uniform bands
    * would just BE buckets).
    */
  def bandDim(s: SparkSession): DataFrame =
    s.range(NumBands).select(col("id").as("band_id"),
      (col("id") * col("id")).cast("double").as("lo"),
      ((col("id") + 1) * (col("id") + 1)).cast("double").as("hi"))

  /** General form: `probe ⋈ bands ON lo <= value < hi` as an equi-join
    * on overlapping fixed-width buckets plus a residual filter. `bands`
    * must carry `lo`/`hi` columns; half-open interval semantics.
    */
  def bucketJoin(probe: DataFrame, valueCol: Column, bands: DataFrame,
                 width: Double = BucketWidth): DataFrame = {
    val exploded = bands.withColumn("__bucket",
      explode(sequence(
        floor(col("lo") / width).cast("long"),
        // hi is exclusive: the last overlapped bucket is the one holding
        // the largest value strictly below hi
        floor((col("hi") - lit(1e-9)) / width).cast("long"))))
    probe.withColumn("__bucket", floor(valueCol / width).cast("long"))
      .join(exploded, Seq("__bucket"))
      .filter(valueCol >= col("lo") && valueCol < col("hi"))
      .drop("__bucket")
  }

  /** Headline query: histogram events into the quadratic value bands. */
  def query(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_id"), col("value"))
    bucketJoin(ev, col("value"), bandDim(s))
      .groupBy("band_id", "lo", "hi")
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .orderBy("band_id")
  }

  val oracle: String =
    s"""WITH bands AS (
       |  SELECT i AS band_id, CAST(i * i AS DOUBLE) AS lo,
       |    CAST((i + 1) * (i + 1) AS DOUBLE) AS hi
       |  FROM range($NumBands) t(i))
       |SELECT band_id, lo, hi, count(*) AS n_events,
       |  round(sum(value), 2) AS total_value
       |FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
       |GROUP BY 1, 2, 3
       |ORDER BY band_id""".stripMargin
}
