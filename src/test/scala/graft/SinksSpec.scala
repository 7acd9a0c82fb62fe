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
}
