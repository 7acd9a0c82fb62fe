package graft

import graft.operators.{Embedder, Inference}
import graft.sources.Tables
import org.apache.spark.sql.functions._

class InferenceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, TestSpark.Sf0001)
    .select(col("doc_id"), col("text")).repartition(4)

  test("batched inference: one output per input, input order preserved, schema appended") {
    val out = Inference.embedBatched(docs, "text", "emb", maxBatch = 7)(() => ())(
      (_, xs) => xs.map(t => Array(t.length.toFloat)))
    assert(out.schema.fieldNames.toSeq == Seq("doc_id", "text", "emb"))
    val rows = out.select(col("doc_id"), length(col("text")).cast("float").as("want"),
      element_at(col("emb"), 1).as("got")).collect()
    assert(rows.nonEmpty && rows.forall(r => r.getFloat(1) == r.getFloat(2)))
  }

  test("batched inference: model is called in bounded batches, session init once per partition") {
    val batchSizes = spark.sparkContext.collectionAccumulator[Int]("batches")
    val inits = spark.sparkContext.collectionAccumulator[Int]("inits")
    val n = docs.count()
    val maxBatch = 32
    Inference.embedBatched(docs, "text", "emb", maxBatch)(() => { inits.add(1); () })(
      (_, xs) => { batchSizes.add(xs.length); xs.map(_ => Array(0f)) }).count()
    val sizes = batchSizes.value
    assert(sizes.asScala.forall(_ <= maxBatch))
    assert(sizes.asScala.map(_.toLong).sum == n)
    // one session per partition, not per batch or per row — >= not ==
    // because task retries / speculation can double-count accumulator
    // entries without a product bug (the sizes-sum == n check above is
    // the exactness gate)
    assert(inits.value.size() >= 4)
  }

  test("batched inference: a model returning the wrong count fails loudly") {
    intercept[org.apache.spark.SparkException] {
      Inference.embedBatched(docs, "text", "emb", 16)(() => ())(
        (_, xs) => xs.drop(1).map(_ => Array(0f))).count()
    }
  }

  test("hashing model through the seam is bit-equal to the column-expression featurizer") {
    val model = Inference.hashingModel()
    val viaSeam = Inference.embedBatched(docs, "text", "emb", 64)(() => model)(
      (m, xs) => m(xs))
      .select(col("doc_id"), col("emb")).as[(Long, Seq[Float])].collect().toMap
    val viaExpr = docs
      .select(col("doc_id"), Embedder.embed(col("text")).cast("array<float>").as("emb"))
      .as[(Long, Seq[Float])].collect().toMap
    assert(viaSeam == viaExpr)
  }

  test("cross-scorer seam: pair scores attach positionally") {
    val pairs = docs.limit(20).select(col("doc_id"),
      lit("spark query").as("q"), col("text").as("d"))
    val out = Inference.scorePairsBatched(pairs, "q", "d", "cross_score", 8)(() => ())(
      (_, xs) => xs.map { case (q, d) => (q.length + d.length).toDouble })
    val rows = out.select(col("doc_id"),
      (length(col("q")) + length(col("d"))).cast("double").as("want"),
      col("cross_score")).collect()
    assert(rows.length == 20 && rows.forall(r => r.getDouble(1) == r.getDouble(2)))
  }

  private implicit class JListOps(l: java.util.List[Int]) {
    def asScala: Seq[Int] = {
      val b = Seq.newBuilder[Int]
      l.forEach(x => b += x)
      b.result()
    }
  }
}
