package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** `events.ts` physical-type robustness — the r5 regression class: the
  * driver regenerates testdata and the `ts` column's parquet encoding
  * flips between NANOS-as-long and µs timestamp[_ntz]. The engine's
  * contract is ONE seam ([[Tables.normalizeTs]]) that widens whatever
  * arrives to epoch-nanos LONG; every events consumer then does exact
  * integer arithmetic. This spec writes the SAME instants in all three
  * encodings and proves the normalized reads are identical.
  */
class TsNormalizeSpec extends SparkSpec {

  private val secs = Seq(0L, 1L, 3599L, 3600L, 86399L, 86400L, 1700000000L)

  private def writeAndRead(dir: java.io.File, dfGen: => org.apache.spark.sql.DataFrame): Seq[(Long, Long)] = {
    val path = new java.io.File(dir, "events.parquet").getAbsolutePath
    dfGen.coalesce(1).write.mode("overwrite").parquet(path)
    val out = Tables.events(spark, dir.getAbsolutePath)
    assert(out.schema("ts").dataType == LongType,
      s"normalized ts must be nanos-long, got ${out.schema("ts").dataType}")
    out.select(col("event_id"), col("ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
  }

  test("long-nanos, timestamp and timestamp_ntz encodings normalize identically") {
    import spark.implicits._
    val base = secs.zipWithIndex.map { case (s, i) => (i.toLong, s) }

    val d1 = java.nio.file.Files.createTempDirectory("ts_long").toFile
    val asLong = writeAndRead(d1, base.toDF("event_id", "s")
      .select(col("event_id"), (col("s") * 1000000000L).as("ts")))

    val d2 = java.nio.file.Files.createTempDirectory("ts_ntz").toFile
    val asNtz = writeAndRead(d2, base.toDF("event_id", "s")
      .select(col("event_id"),
        timestamp_seconds(col("s")).cast("timestamp_ntz").as("ts")))

    val d3 = java.nio.file.Files.createTempDirectory("ts_tz").toFile
    val asTs = writeAndRead(d3, base.toDF("event_id", "s")
      .select(col("event_id"), timestamp_seconds(col("s")).as("ts")))

    assert(asLong == asNtz, "nanos-long vs timestamp_ntz")
    assert(asLong == asTs, "nanos-long vs timestamp")
    // and the values are the exact instants in nanos
    assert(asLong.map(_._2) == secs.map(_ * 1000000000L))
  }

  test("sub-second microseconds survive the widening (µs precision kept)") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("ts_us").toFile
    val micros = Seq((0L, 1500000L), (1L, 999999L)) // 1.5 s, 0.999999 s
    val got = writeAndRead(d, micros.toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts")))
    assert(got.map(_._2) == micros.map(_._2 * 1000L))
  }
}
