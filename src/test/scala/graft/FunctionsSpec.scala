package graft

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: lowercases, splits on non-alnum, drops empties") {
    val out = Seq("Hello, World!  foo-bar 42").toDF("text")
      .select(tokens(col("text"))).as[Seq[String]].head()
    assert(out == Seq("hello", "world", "foo", "bar", "42"))
  }

  test("shingles: k=3 windows; short docs yield one whole-doc shingle") {
    val df = Seq(Seq("a", "b", "c", "d"), Seq("a", "b")).toDF("toks")
    val out = df.select(shingles(col("toks"), 3)).as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq("a b"))
  }

  test("portableHash: deterministic, non-negative, 60-bit") {
    val h = Seq("abc", "abc", "xyz").toDF("s")
      .select(portableHash(col("s"))).as[Long].collect()
    assert(h(0) == h(1) && h(0) != h(2))
    assert(h.forall(v => v >= 0 && v < (1L << 60)))
  }

  test("token counts: regex vs whitespace vs bpe-ish") {
    val df = Seq("The quick2 brown-fox").toDF("text")
    val (t, w, b) = df.select(tokenCount(col("text")), wsTokenCount(col("text")),
      bpeTokenCount(col("text"))).as[(Int, Int, Int)].head()
    assert(t == 4) // the, quick2, brown, fox — alnum runs stay joined
    assert(w == 3)
    assert(b == 5) // "quick2" splits into alpha+digit runs
  }

  test("cosineSim: matches hand-computed value on float arrays") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val got = df.select(cosineSim(col("a"), col("b"))).as[Double].head()
    val want = 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(got - want) < 1e-12)
  }

  test("cosineSim: zero vector yields 0.0, not NaN") {
    val df = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
    assert(df.select(cosineSim(col("a"), col("b"))).as[Double].head() == 0.0)
  }

  test("cosineSim: null input yields null") {
    val df = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    assert(df.select(cosineSim(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("cosineSim agrees with the pure-functions fallback") {
    val df = Seq((Array(0.3f, -1.2f, 0.7f, 2.2f), Array(1.1f, 0.4f, -0.2f, 0.9f)))
      .toDF("a", "b")
    val (fast, slow) = df.select(cosineSim(col("a"), col("b")),
      cosineSimHof(col("a"), col("b"))).as[(Double, Double)].head()
    assert(math.abs(fast - slow) < 1e-12)
  }

  test("custom expressions are registered as SQL functions") {
    Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
      .createOrReplaceTempView("vecs")
    val sim = spark.sql("SELECT cosine_sim(a, b) AS s FROM vecs").as[Double].head()
    assert(math.abs(sim - 1.0) < 1e-12)
    val sh = spark.sql("SELECT word_shingles(array('a','b','c'), 2) AS s")
      .as[Seq[String]].head()
    assert(sh == Seq("a b", "b c"))
    val tf = spark.sql(
      "SELECT term_frequencies(array('a','b','a','c'), 'a', 'z') AS t")
      .as[Seq[Long]].head()
    assert(tf == Seq(4L, 2L, 0L)) // [dl, tf('a'), tf('z')]
    val dp = spark.sql(
      "SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head()
    assert(dp == 11.0)
    val sq = spark.sql(
      "SELECT sq8_quantize(array(0.5D, -1.0D)).qv AS q").as[Seq[Int]].head()
    assert(sq == Seq(64, -127)) // floor(.5*127/1+.5)=64, floor(-127.5+.5)=-127
    val shv = spark.sql(
      "SELECT simhash(array('a'), 4) AS h").as[Long].head()
    assert(shv >= 0L && shv < 16L)
    assert(spark.sql("SELECT simhash(array_remove(array('a'), 'a'), 4) AS h")
      .head().isNullAt(0))
  }

  test("fingerprint is whitespace/punct-insensitive") {
    val fps = Seq("Hello,   world!", "hello world").toDF("text")
      .select(fingerprint(col("text"))).as[String].collect()
    assert(fps(0) == fps(1))
  }
}
