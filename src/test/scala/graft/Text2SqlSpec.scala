package graft

import graft.operators.Text2Sql

class Text2SqlSpec extends SparkSpec {

  test("router separates the notebook's sql and regular exemplars") {
    // the notebook-8 route examples (train==test for the centroid router,
    // but a collapsed router would still misroute one side)
    assert(Text2Sql.Router.route("How many episodes have over 100,000 views?") == "sql")
    assert(Text2Sql.Router.route("What is the title of the most viewed episode?") == "sql")
    assert(Text2Sql.Router.route(
      "What is the difference between healthspan and longevity?") == "regular")
    assert(Text2Sql.Router.route(
      "What insights does Dr. Andrew Huberman provide about the role of breathwork in modulating the stress response?") == "regular")
  }

  test("translator covers the training-set template families") {
    def sqlOf(q: String): String = Text2Sql.translate(q).get.sql
    assert(sqlOf("""How many episodes have "exercise" mentioned in their summary?""")
      .contains("lower(summary) LIKE '%exercise%'"))
    assert(sqlOf("""How many episodes have "exercise" mentioned in their summary?""")
      .startsWith("SELECT count(*)"))
    assert(sqlOf("What are the titles of all the episodes featuring Andrew Huberman?")
      .contains("guest = 'Andrew Huberman'"))
    val both = sqlOf("""Which episodes have the word "nutrition" in both title and summary?""")
    assert(both.contains("lower(title) LIKE '%nutrition%'") &&
      both.contains("lower(summary) LIKE '%nutrition%'"))
    assert(sqlOf("How many episodes have view counts less than 10,000?")
      .contains("view_count < 10000"))
    assert(sqlOf("What are the titles of the top 5 most viewed episodes?")
      .contains("ORDER BY view_count DESC, id LIMIT 5"))
    assert(sqlOf("How many guests have appeared on the podcast?")
      .contains("count(DISTINCT guest)"))
    assert(sqlOf("""What is the average view count for episodes with "biohacking" in the title?""")
      .contains("avg(view_count)"))
    // word-level families carry a DuckDB dialect twin for the oracle
    val mcw = Text2Sql.translate("What is the most common word in episode titles?").get
    assert(mcw.sql.contains("explode(split(lower(title)"))
    assert(mcw.sqlDuck.get.contains("unnest(string_split_regex(lower(title)"))
    assert(mcw.sql.contains("ORDER BY count(*) DESC, w LIMIT 1"))
    // the modeled timeline: "released in the last year" = the view
    // timeline's final 365 days, a deterministic portable predicate
    assert(sqlOf("List the titles of episodes that were released in the last year.")
      .contains("release_date >= DATE '2024-01-01'"))
    // profession is the view's modeled function-of-guest column
    assert(sqlOf("What is the most common guest profession featured on the podcast?")
      .contains("GROUP BY profession ORDER BY count(*) DESC, profession LIMIT 1"))
    // still-unmodeled calendar concepts are refused, not guessed
    assert(Text2Sql.translate(
      "How many episodes were released last month?").isEmpty)
    assert(Text2Sql.translate(
      "What is the average episode duration in minutes?").isEmpty)
  }

  test("translator + router cover most of the FULL 300-question training set") {
    val f = new java.io.File(Text2Sql.QueriesPath)
    assume(f.exists(), "reference workload file not present")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(f)
    val qs = (0 until node.size()).map(node.get(_).asText())
    val routedSql = qs.filter(Text2Sql.Router.route(_) == "sql")
    val translated = routedSql.flatMap(Text2Sql.translate)
    info(s"${routedSql.size}/${qs.size} route to sql; " +
      s"${translated.size}/${routedSql.size} translate")
    // the whole file is the reference's SQL-route training set — the
    // router must send nearly all of it down the sql route, and the
    // template translator must handle a solid majority
    assert(routedSql.size >= (qs.size * 9) / 10)
    assert(translated.size >= (routedSql.size * 7) / 10)
    // every generated statement names only huberman columns
    assert(translated.forall(g => g.sql.contains("FROM huberman")))
  }

  test("fused suite plan equals the per-question all-legs union bitwise") {
    // the fused two-pass plan must compute the IDENTICAL
    // (qid, route, n_rows, checksum) row for every question that the
    // verbatim per-question legs produce (the DuckDB oracle re-executes
    // those legs, so this is the local twin of the driver gate)
    val fused = Text2Sql.qSuite(spark, TestSpark.Sf0001).collect().map(_.toSeq)
    val legs = Text2Sql.qSuiteAllLegs(spark, TestSpark.Sf0001).collect().map(_.toSeq)
    assert(fused.length == legs.length)
    fused.zip(legs).foreach { case (f, l) => assert(f == l, s"fused $f != leg $l") }
  }

  test("suite runs the sampled reference workload end to end") {
    val df = Text2Sql.qSuite(spark, TestSpark.Sf0001)
    val rows = df.collect()
    assert(rows.length == Text2Sql.entries.length)
    val executed = rows.filter(_.getString(1) == "sql")
    // most of the rl_sql training sample should route AND translate
    assert(executed.length >= rows.length / 2,
      s"only ${executed.length}/${rows.length} questions executed as SQL")
    // executed queries report real counts (n_rows >= 0)
    assert(executed.forall(_.getLong(2) >= 0))
    info(s"${executed.length}/${rows.length} sampled questions executed as SQL")
  }
}
