package graft

import graft.sources.{Sinks, Tables}
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpec {

  test("bucketed tables co-join without any exchange") {
    val tmp = java.nio.file.Files.createTempDirectory("bucketed").toString
    val orders = Tables.orders(spark, TestSpark.Sf0001)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    val lineitem = Tables.lineitem(spark, TestSpark.Sf0001)
      .select("l_orderkey", "l_quantity")
    Sinks.writeBucketed(orders, "orders_b", s"$tmp/orders_b", "o_orderkey", 8)
    Sinks.writeBucketed(lineitem, "lineitem_b", s"$tmp/lineitem_b", "l_orderkey", 8)

    // force the merge join (broadcast would hide the bucketing story)
    val joined = spark.table("lineitem_b").hint("merge")
      .join(spark.table("orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
    val n = joined.count()
    val plan = joined.queryExecution.executedPlan.toString

    // the join itself must be exchange-free; the only shuffle allowed is
    // the final small aggregation on o_orderpriority
    val joinSubtree = plan.split("SortMergeJoin").last
    assert(plan.contains("SortMergeJoin"))
    assert(!joinSubtree.contains("Exchange"),
      s"bucketed join should not shuffle, got:\n$plan")

    // same answer as the plain parquet formulation
    val want = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
    assert(joined.orderBy("o_orderpriority").collect().toSeq ==
      want.orderBy("o_orderpriority").collect().toSeq)
    assert(n > 0)

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
  }

  test("time-partitioned events: range read prunes partitions, same rows") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val events = Tables.events(spark, TestSpark.Sf0001)
    val tmp = java.nio.file.Files.createTempDirectory("events_part").toString + "/events"
    Sinks.writeTimePartitioned(events, tmp)
    val dateDirs = new java.io.File(tmp).listFiles()
      .filter(_.getName.startsWith("event_date=")).map(_.getName).sorted
    assert(dateDirs.length > 1, s"expected multiple date partitions, got ${dateDirs.toSeq}")

    val Array(lo, hi) = Array(dateDirs.head, dateDirs.last)
      .map(_.stripPrefix("event_date="))
    val ranged = Sinks.readTimeRange(spark, tmp, lo, lo) // first day only
    val scans = ranged.queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }
    assert(scans.exists(_.partitionFilters.exists(_.toString.contains("event_date"))))

    val wantFirstDay = events
      .filter(to_date(timestamp_seconds(expr("ts div 1000000000"))) === lo)
      .count()
    assert(ranged.count() == wantFirstDay && wantFirstDay > 0)
    // full range returns everything
    assert(Sinks.readTimeRange(spark, tmp, lo, hi).count() == events.count())
  }

  test("z-order layout: files cover compact rectangles in BOTH dimensions") {
    val events = Tables.events(spark, TestSpark.Sf0001)
      .select(col("user_id"), expr("ts div 1000000000").as("ts_s"))
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    Sinks.writeZOrdered(events, "user_id", "ts_s", s"$base/z")
    // linear baseline: single-column sort by user_id
    events.repartitionByRange(16, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(s"$base/linear")

    assert(spark.read.parquet(s"$base/z").count() == events.count())

    val bounds = events.agg(min("user_id"), max("user_id"),
      min("ts_s"), max("ts_s")).head()
    val (uLo, uHi) = (bounds.getLong(0).toDouble, bounds.getLong(1).toDouble)
    val (tLo, tHi) = (bounds.getLong(2).toDouble, bounds.getLong(3).toDouble)
    def meanSpan(path: String, c: String, lo: Double, hi: Double): Double = {
      val spans = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).toSeq.map { f =>
          val r = spark.read.parquet(f.toString).agg(min(c), max(c)).head()
          (r.getLong(1) - r.getLong(0)).toDouble / (hi - lo)
        }
      spans.sum / spans.length
    }
    // z-order: every file is narrow in BOTH dimensions …
    assert(meanSpan(s"$base/z", "user_id", uLo, uHi) < 0.7)
    assert(meanSpan(s"$base/z", "ts_s", tLo, tHi) < 0.7)
    // … while the single-column sort leaves the second dimension
    // unclustered (each file spans ~the full time range)
    assert(meanSpan(s"$base/linear", "user_id", uLo, uHi) < 0.2)
    assert(meanSpan(s"$base/linear", "ts_s", tLo, tHi) > 0.85)
  }

  test("json round-trip preserves the corpus") {
    val docs = Tables.documents(spark, TestSpark.Sf0001)
    val tmp = java.nio.file.Files.createTempDirectory("json_rt").toString + "/docs"
    Sinks.writeJson(docs, tmp)
    val back = Sinks.readJson(spark, tmp, docs.schema)
    assert(back.schema == docs.schema)
    assert(back.exceptAll(docs).count() == 0 && docs.exceptAll(back).count() == 0)
  }

  test("driver-facing bucketed join stays exchange-free at the join") {
    val joined = Sinks.qBucketedJoin(spark, TestSpark.Sf0001)
    assert(joined.count() > 0)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"),
      s"bucketed driver query must merge-join, got:\n$plan")
    // the join subtree must carry no Exchange — the bucketed layout IS
    // the shuffle; only the tiny final aggregation may exchange
    assert(!plan.split("SortMergeJoin").last.contains("Exchange"),
      s"bucketed driver join must not shuffle, got:\n$plan")
  }

  test("salted join equals the plain join") {
    import graft.operators.Skew
    val lineitem = Tables.lineitem(spark, TestSpark.Sf0001)
      .select("l_orderkey", "l_quantity")
    val orders = Tables.orders(spark, TestSpark.Sf0001)
      .select("o_orderkey", "o_orderpriority")
    val plain = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority").collect().toSeq
    val salted = Skew.saltedJoin(lineitem, orders, "l_orderkey", "o_orderkey", 8)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority").collect().toSeq
    assert(salted == plain)
  }
}
