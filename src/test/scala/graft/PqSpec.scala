package graft

import graft.operators.{ProductQuantizer => PQ, VectorSearch}
import graft.sources.Tables
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = Tables.embeddings(spark, TestSpark.Sf0001)
  private lazy val model = PQ.train(embs)

  test("pq encode: m codes per vector, all within [0, k)") {
    val codes = PQ.encode(embs, model)
    assert(codes.count() == embs.count())
    val bad = codes.filter(
      size(col("codes")) =!= PQ.M ||
        exists(col("codes"), c => c < 0 || c >= PQ.K)).count()
    assert(bad == 0)
  }

  test("pq adc score equals exact distance to the reconstructed vector") {
    val sub = PQ.Dim / PQ.M
    val q = embs.filter(col("vec_id") === 7L)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val qn = { val n = math.sqrt(q.map(x => x * x).sum); q.map(_ / n) }
    val table = PQ.adcTable(model, q)
    val sample = PQ.encode(embs.filter(col("vec_id") === 3L), model)
      .select(col("codes")).head().getSeq[Int](0)
    // reconstruct vec 3 from its codes and compute ||qn - recon||^2 directly
    val recon = sample.zipWithIndex.flatMap { case (c, j) => model.codebooks(j)(c) }
    val direct = qn.zip(recon).map { case (a, b) => (a - b) * (a - b) }.sum
    val viaTable = sample.zipWithIndex.map { case (c, j) => table(j)(c) }.sum
    assert(math.abs(direct - viaTable) < 1e-9)
  }

  test("ivf-pq: full-probe equals plain adc search; partial probe is a subset of probed cells") {
    val fullProbe = PQ.searchIvfAdc(embs, model, 7L, nprobe = 10, k = 10)
      .select("vec_id").as[Long].collect().toSeq
    val plain = PQ.searchAdc(embs, model, 7L, 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(fullProbe == plain) // probing every cell = no pruning
    val partial = PQ.searchIvfAdc(embs, model, 7L, nprobe = 2, k = 10)
      .select("label").distinct().as[Int].collect().toSet
    assert(partial.size <= 2) // results come only from probed cells
  }

  test("batch ivf-pq: each query's slice at full probe equals the single-query adc search") {
    val nlist = embs.select("label").distinct().count().toInt
    val batch = PQ.batchSearchIvfAdc(embs,
      model, _.filter(col("vec_id") % 20 === 0), nprobe = nlist)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val qids = batch.map(_._1).distinct
    assert(qids.nonEmpty)
    qids.foreach { q =>
      val slice = batch.filter(_._1 == q).map(t => (t._2, t._3)).toSeq
      val single = PQ.searchAdc(embs, model, q)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      assert(slice == single, s"q=$q")
    }
  }

  test("pq adc search overlaps the exact cosine top-k") {
    val exact = VectorSearch.topK(embs, 7L, 10)
      .select("vec_id").as[Long].collect().toSet
    val approx = PQ.searchAdc(embs, model, 7L, 10)
      .select("vec_id").as[Long].collect().toSet
    val overlap = exact.intersect(approx).size
    info(s"pq recall@10 = $overlap/10")
    assert(overlap >= 2, s"pq recall collapsed: $overlap/10")
  }
}
