package graft

import graft.operators.{Events, Relational}

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("entry: flagship query returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query has either an oracle or a documented reason") {
    // rows-only by design: k-means codebooks, on-disk partition-pruned
    // layouts, and binary transforms are not SQL-expressible — their
    // equivalence proofs live in the spec suite (PqSpec, KeywordIndexSpec,
    // MultimodalSpec); the driver records a rows>0 check for these
    val rowsOnly = Set("pq_adc_search", "ivf_pq_search",
      "ivf_search_materialized", "kw_search_materialized", "multimodal_resize")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without query: $orphans")
    assert((rowsOnly -- SparkEntry.queries.keySet).isEmpty,
      "rows-only allowlist out of date")
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

  test("native session_window equals the lag+cumsum sessionization") {
    import org.apache.spark.sql.functions._
    // per user, the ordered (n_events, duration_s) session sequences match
    val viaLag = Events.sessionize(spark, TestSpark.Sf0001)
      .orderBy("user_id", "session_id")
      .select("user_id", "n_events", "duration_s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val viaNative = Events.sessionizeNative(spark, TestSpark.Sf0001)
      .orderBy("user_id", "start_s")
      .select("user_id", "n_events", "duration_s")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaNative == viaLag)
  }

  test("cohort retention: offset-0 cells are 1.0, cohort sizes cover every user") {
    import org.apache.spark.sql.functions._
    val out = Events.cohortRetention(spark, TestSpark.Sf0001).cache()
    // the anchor cell of every cohort retains everyone
    assert(out.filter(col("day_offset") === 0 && col("retention") =!= 1.0).count() == 0)
    // no cell exceeds its cohort
    assert(out.filter(col("n_users") > col("n_cohort")).count() == 0)
    // cohort sizes partition the user base
    val totalUsers = sources.Tables.events(spark, TestSpark.Sf0001)
      .select("user_id").distinct().count()
    val cohortSum = out.filter(col("day_offset") === 0)
      .agg(sum("n_users")).head().getLong(0)
    assert(cohortSum == totalUsers)
    out.unpersist()
  }

  test("funnel: stages are ordered and monotonically shrinking") {
    val r = Events.funnel(spark, TestSpark.Sf0001).head()
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p)
    assert(v > 0)
    // a window this tight must actually exclude someone on this corpus
    assert(c < v)
  }

  test("latest compaction: one row per key, carries that key's max-ts event") {
    import org.apache.spark.sql.functions._
    val out = Events.latest(spark, TestSpark.Sf0001)
    val ev = sources.Tables.events(spark, TestSpark.Sf0001)
    assert(out.count() ==
      ev.select("user_id", "event_type").distinct().count())
    // the compacted ts is the key's true max (second precision)
    val expectMax = ev.groupBy("user_id", "event_type")
      .agg(max(expr("ts div 1000000000")).as("mx"))
    val joined = out.join(expectMax, Seq("user_id", "event_type"))
    assert(joined.filter(col("last_ts_s") =!= col("mx")).count() == 0)
    // and the event_id actually belongs to an event at that key + second
    val valid = out.join(ev.select(col("user_id"), col("event_type"),
        expr("ts div 1000000000").as("last_ts_s"),
        col("event_id").as("last_event_id")),
      Seq("user_id", "event_type", "last_ts_s", "last_event_id"))
    assert(valid.count() == out.count())
  }
}
