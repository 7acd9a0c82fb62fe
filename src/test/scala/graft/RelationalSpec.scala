package graft

import graft.operators.{Events, Relational}

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("entry: flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query has either an oracle or a documented reason") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
  }

  test("q1 groups by the 6 (returnflag, linestatus) combinations") {
    val rows = Relational.q1PricingSummary(spark, TestSpark.Sf0001).collect()
    assert(rows.length == 6)
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == 6)
  }

  test("sessionize: session durations are non-negative, counts sum to events") {
    val sess = Events.sessionize(spark, TestSpark.Sf0001)
    val agg = sess.agg(org.apache.spark.sql.functions.sum("n_events"),
      org.apache.spark.sql.functions.min("duration_s")).head()
    val nEvents = sources.Tables.events(spark, TestSpark.Sf0001).count()
    assert(agg.getLong(0) == nEvents)
    assert(agg.getLong(1) >= 0)
  }
}
