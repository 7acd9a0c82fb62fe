package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("redact: masks emails and phones, counts hits, leaves clean text alone") {
    val docs = Seq(
      (0L, "contact bob.smith+x@example.co.uk or 555-123-4567 today"),
      (1L, "no pii here at all"),
      (2L, "two mails: a@b.io c@d.org and +1 555.321.7654 also 999 888 7777")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.redact(docs).collect()
      .map(r => r.getLong(0) -> ((r.getAs[Int]("n_emails"), r.getAs[Int]("n_phones")))).toMap
    assert(out(0L) == ((1, 1)))
    assert(out(1L) == ((0, 0)))
    assert(out(2L) == ((2, 2)))
    // the redacted hash of a clean doc equals the hash of its raw text
    val clean = TextAnalysis.redact(docs).filter(col("doc_id") === 1L)
      .select("redacted_hash").as[String].head()
    val raw = docs.filter(col("doc_id") === 1L)
      .select(md5(col("text"))).as[String].head()
    assert(clean == raw)
  }

  test("approx_count_distinct tracks exact vocabulary counts within rsd") {
    // the 100 TB swap-in for exact distinct counts in corpus reports:
    // HLL++ sketch aggregation (map-side partial merge, no distinct
    // shuffle); error bounded by the configured rsd
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf001)
    val toks = docs.select(explode(
      graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
    val exact = toks.select(countDistinct("tok")).head().getLong(0)
    val approx = toks.select(approx_count_distinct("tok", 0.02)).head().getLong(0)
    assert(math.abs(approx - exact) <= math.max(3, (exact * 0.06).toLong),
      s"approx $approx vs exact $exact")
    // same bound on a high-cardinality column
    val exactIds = docs.select(countDistinct("doc_id")).head().getLong(0)
    val approxIds = docs.select(approx_count_distinct("doc_id", 0.02)).head().getLong(0)
    assert(math.abs(approxIds - exactIds) <= math.max(3, (exactIds * 0.06).toLong))
  }

  test("bpe encode: merges apply in priority order with left-to-right semantics") {
    val docs = Seq(
      (0L, "fast table key row part stream")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncode(docs).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getAs[Int]("n_pieces")))).toMap
    // (s,t) then (a,r): f a st / (a,r)+(ar,t): p art
    assert(out("fast") == (("f a st", 3)))
    assert(out("part") == (("p art", 2)))
    // (t,a) then (ta,b): tab l e
    assert(out("table") == (("tab l e", 3)))
    // (e,y): k ey ; (o,w): r ow
    assert(out("key") == (("k ey", 2)))
    assert(out("row") == (("r ow", 2)))
    // (s,t) then (st,r): str e a m — a merged piece keeps merging
    assert(out("stream") == (("str e a m", 4)))
  }

  test("bpe encode: dictionary is distinct terms, every term segmented") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
    val out = TextAnalysis.bpeEncode(docs)
    val nTerms = docs.select(explode(graft.functions.TextFunctions.tokens(col("text"))))
      .distinct().count()
    assert(out.count() == nTerms)
    // pieces reassemble to the original term
    val broken = out.filter(
      regexp_replace(col("encoded"), " ", "") =!= col("term")).count()
    assert(broken == 0)
  }

  test("bpe train: learned merges match an independent naive trainer") {
    // independent reference: greedy left-to-right merge over symbol lists,
    // most-frequent pair per round, ties broken on the "a b" pair string
    def naiveTrain(words: Map[String, Long], rounds: Int): Seq[(String, String, Long)] = {
      var segs = words.map { case (w, c) => w.map(_.toString).toList -> c }.toSeq
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      var r = 0
      while (r < rounds) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        segs.foreach { case (syms, c) =>
          syms.zip(syms.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
        }
        if (counts.isEmpty) r = rounds
        else {
          val ((a, b), f) = counts.toSeq.minBy { case ((x, y), n) => (-n, s"$x $y") }
          out += ((a, b, f))
          segs = segs.map { case (syms, c) =>
            val merged = scala.collection.mutable.ListBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                merged += (a + b); i += 2
              } else { merged += syms(i); i += 1 }
            }
            merged.toList -> c
          }
          r += 1
        }
      }
      out.toSeq
    }
    val docs = Seq(
      (0L, "lower lower lowest newer newer newer wider wide widest"),
      (1L, "low low lowest new newest wide wider")
    ).toDF("doc_id", "text")
    val words = docs.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = naiveTrain(words, TextAnalysis.BpeTrainRounds)
    val got = TextAnalysis.bpeTrain(docs).collect()
      .map(r => (r.getString(1), r.getString(2), r.getAs[Long]("pair_freq"))).toSeq
    assert(got == expect, s"\nengine: $got\nnaive:  $expect")
    // merged symbol and rank bookkeeping are consistent
    val rows = TextAnalysis.bpeTrain(docs).collect()
    assert(rows.map(_.getAs[Int]("rn")).toSeq == (1 to rows.length))
    assert(rows.forall(r => r.getString(3) == r.getString(1) + r.getString(2)))
  }

  test("bpe encode learned: segmentation uses the trained merges end to end") {
    val docs = Seq(
      (0L, "lower lower lowest newer newer newer wider wide widest"),
      (1L, "low low lowest new newest wide wider")
    ).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val out = TextAnalysis.bpeEncodeLearned(docs).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // independent apply: greedy left-to-right per merge in priority order
    def applyMerges(word: String): List[String] = {
      merges.foldLeft(word.map(_.toString).toList) { case (syms, (a, b)) =>
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += syms(i); i += 1 }
        }
        out.toList
      }
    }
    out.keys.foreach { term =>
      assert(out(term) == applyMerges(term).mkString(" "), s"term $term")
    }
    // dictionary covers every distinct term, pieces reassemble
    val nTerms = docs.select(explode(graft.functions.TextFunctions.tokens(col("text"))))
      .distinct().count()
    assert(out.size == nTerms)
    assert(out.forall { case (t, e) => e.replace(" ", "") == t })
  }

  test("bpe compression: fertility is exact pieces-per-word by source") {
    val docs = Seq(
      (0L, "src0", "lower lower newest"),
      (1L, "src1", "low wide wide wide")
    ).toDF("doc_id", "source", "text")
    val merges = TextAnalysis.bpeTrainMerges(docs).map(m => (m._2, m._3))
    val seg = TextAnalysis.bpeApplyMerges(docs, merges).collect()
      .map(r => r.getString(0) -> r.getAs[Int]("n_pieces")).toMap
    val out = TextAnalysis.bpeCompression(docs, merges).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getAs[Double]("fertility")))).toMap
    // naive recount: word occurrences × that word's piece count
    val expect = Map(
      "src0" -> Seq("lower", "lower", "newest"),
      "src1" -> Seq("low", "wide", "wide", "wide"))
    expect.foreach { case (src, words) =>
      val np = words.map(seg(_).toLong).sum
      val (nw, npGot, fert) = out(src)
      assert(nw == words.length && npGot == np, s"$src: $nw/$npGot vs ${words.length}/$np")
      assert(fert == BigDecimal(np.toDouble / words.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("bpe train: exhausted corpus stops early with fewer merges") {
    val docs = Seq((0L, "ab ab cd")).toDF("doc_id", "text")
    // only 2 distinct pairs exist: (a,b) and (c,d) — training stops at 2
    val rows = TextAnalysis.bpeTrain(docs).collect()
    assert(rows.length == 2)
    assert(rows.map(r => (r.getString(1), r.getString(2))).toSet == Set("a" -> "b", "c" -> "d"))
    assert(rows.head.getAs[Long]("pair_freq") == 2L) // (a,b) weighted by term count
  }

  test("bigram lm: corpus-frequent transitions score higher than rare ones") {
    val docs = Seq(
      (0L, "a b a b a b a b"),   // only the dominant transitions
      (1L, "a b a b a b a c")    // ends in the rare a->c transition
    ).toDF("doc_id", "text")
    val out = TextAnalysis.lmBigram(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(0L) > out(1L))
    // corpus counts over BOTH docs: c(a b)=7, c(b a)=6, c(a c)=1,
    // prefix counts: a->8, b->6; doc 0 = (4·ln(7/8) + 3·ln(6/6)) / 7
    val expect0 = (4 * math.log(7.0 / 8) + 3 * math.log(1.0)) / 7
    assert(math.abs(out(0L) - expect0) < 1e-3)
  }

  test("pack: bins respect arrival order and the token budget boundary") {
    val docs = Seq(
      (0L, "a b c", "s"),    // 3 tokens, cum-before 0  -> bin 0
      (1L, "d e f g", "s"),  // 4 tokens, cum-before 3  -> bin 0
      (2L, "h i", "s"),      // 2 tokens, cum-before 7  -> bin 0
      (3L, "j k l", "s"),    // 3 tokens, cum-before 9  -> bin 1 (budget 8)
      (4L, "m", "t")         // other source: its own bin 0
    ).toDF("doc_id", "text", "source")
    val out = graft.operators.Chunker.pack(docs, budget = 8).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("bin_id")).toMap
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 0L))
  }

  test("decontaminate: exact and ngram collisions with the benchmark set") {
    val docs = Seq(
      (0L, "The Quick, Brown Fox! jumps high"),     // benchmark (0 % 50 == 0)
      (7L, "the quick brown fox jumps high"),       // normalized-equal -> exact
      (9L, "unrelated words only here nothing shared"),
      (50L, "totally distinct benchmark row indeed") // benchmark, no twin
    ).toDF("doc_id", "text").withColumn("source", lit("s"))
    val out = graft.operators.Dedup.decontaminate(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("bench_id"),
        r.getAs[String]("match_type")))
    assert(out.toSeq == Seq((7L, 0L, "exact")))
  }

  test("repetition: looping text scores high, varied text scores low") {
    val docs = Seq(
      (0L, "buy now buy now buy now buy now"),
      (1L, "every word here is completely different")
    ).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.repetition(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getAs[Double]("dup_token_ratio"), r.getAs[Double]("top_bigram_frac")))).toMap
    assert(out(0L)._1 == 0.75)       // 8 tokens, 2 distinct
    assert(out(0L)._2 > 0.5)         // "buy now" dominates bigrams
    assert(out(1L)._1 == 0.0)
    assert(out(1L)._2 <= 0.2)        // 6 tokens -> 5 bigrams, all distinct
  }

  test("repetition: native mode-count form ≡ interpreted-HOF reference form") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val native = graft.operators.TextAnalysis.repetition(docs).collect()
    val hof = graft.operators.TextAnalysis.repetitionHof(docs).collect()
    assert(native.length == hof.length && native.length > 0)
    native.zip(hof).foreach { case (a, b) => assert(a == b) }
  }

  test("vocab: top-k terms by tf with df, deterministic tiebreak") {
    val docs = Seq(
      (0L, "spark spark spark flink"),
      (1L, "spark flink duck duck"),
      (2L, "beam beam beam beam")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.vocab(docs, k = 3).collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Long]("tf"), r.getAs[Long]("df")))
    assert(out.toSeq == Seq(("beam", 4L, 1L), ("spark", 4L, 2L), ("duck", 2L, 1L)))
  }

  test("corpus stats: one-row rollup with consistent totals") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
    val r = graft.operators.TextAnalysis.corpusStats(docs).collect().head
    assert(r.getAs[Long]("n_docs") == docs.count())
    assert(r.getAs[Long]("total_tokens") > 0)
    assert(r.getAs[Long]("n_en") <= r.getAs[Long]("n_docs"))
    val avgUniq = r.getAs[Double]("avg_uniq_ratio")
    assert(avgUniq > 0.0 && avgUniq <= 1.0)
  }

  test("sample: deterministic, repeatable, rate roughly honored") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
    val a = TextAnalysis.sample(docs).select("doc_id").as[Long].collect().toSeq
    val b = TextAnalysis.sample(docs).select("doc_id").as[Long].collect().toSeq
    assert(a == b) // no RNG state: identical on every run
    val n = docs.count().toDouble
    assert(a.length > n * 0.15 && a.length < n * 0.45) // ~30% ± slack
    // sample at 100% keeps everything
    assert(TextAnalysis.sample(docs, 100).count() == docs.count())
  }
}
