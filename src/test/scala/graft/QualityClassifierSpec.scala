package graft

import graft.operators.QualityClassifier
import org.apache.spark.sql.functions._

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    // reference domain (src0): stopword-rich prose; crawl (srcX): terse junk
    val prose = (0L until 20L).map(i =>
      (i, "src0", s"the quick study of a system in the field is for the careful reader and the patient mind $i"))
    val junk = (20L until 40L).map(i =>
      (i, "srcX", s"buy cheap now click here $i zzz qqq xxx"))
    (prose ++ junk).toDF("doc_id", "source", "text")
  }

  test("trained classifier separates reference-domain prose from junk") {
    val w = QualityClassifier.trainOn(corpus)
    val out = QualityClassifier.score(corpus, w).collect()
    assert(out.length == 40)
    val byId = out.map(r => r.getLong(0) -> r.getAs[Double]("q_score")).toMap
    val proseMin = (0L until 20L).map(byId).min
    val junkMax = (20L until 40L).map(byId).max
    assert(proseMin > junkMax, s"proseMin $proseMin junkMax $junkMax")
  }

  test("serving score replays the fixed-order linear arithmetic") {
    val w = QualityClassifier.trainOn(corpus)
    val out = QualityClassifier.score(corpus, w).collect()
    val texts = corpus.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    out.foreach { r =>
      val toks = texts(r.getLong(0)).toLowerCase.split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)
      val f1 = toks.length.toDouble
      val f2 = toks.distinct.length.toDouble
      val f3 = texts(r.getLong(0)).length.toDouble
      val f4 = toks.count(QualityClassifier.Stopwords.contains).toDouble
      val lin = w._1 + w._2 * f1 + w._3 * f2 + w._4 * f3 + w._5 * f4
      assert(r.getAs[Double]("q_score") ==
        BigDecimal(lin).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"doc ${r.getLong(0)}")
    }
  }

  test("tercile banding splits a score gradient into three comparable bands") {
    // gradient corpus: prose fraction rises with doc_id → monotone scores
    val grad = (0L until 30L).map { i =>
      val prose = Seq.fill(i.toInt + 1)("the value of a measured result is in the method").mkString(" ")
      val junk = Seq.fill(30 - i.toInt)("zzz click qqq").mkString(" ")
      (i, if (i >= 15) "src0" else "srcX", s"$prose $junk")
    }.toDF("doc_id", "source", "text")
    val w = QualityClassifier.trainOn(grad)
    val scored = QualityClassifier.score(grad, w)
    val t = QualityClassifier.terciles(scored)
    assert(t._1 <= t._2)
    val bands = scored.withColumn("band", QualityClassifier.band(col("q_score"), t))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("band")).toMap
    val counts = bands.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet == Set("head", "middle", "tail"), counts.toString)
    counts.values.foreach(c => assert(c >= 5 && c <= 15, counts.toString))
    // banding follows the score gradient: low ids tail, high ids head
    assert((0L until 5L).forall(bands(_) == "tail"), bands.toString)
    assert((25L until 30L).forall(bands(_) == "head"), bands.toString)
  }

  test("serving is a shuffle-free scan") {
    val w = QualityClassifier.trainOn(corpus)
    val plan = QualityClassifier.score(corpus, w).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
