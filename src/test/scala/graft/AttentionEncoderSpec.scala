package graft

import graft.operators.{AttentionEncoder, AttentionTrainer, Word2VecEmbedder}
import org.apache.spark.sql.functions._

class AttentionEncoderSpec extends SparkSpec {

  private lazy val w = Word2VecEmbedder.weightsFor(spark, TestSpark.Sf0001)

  // the TRAINED per-dir parameters — the unit properties (determinism,
  // position sensitivity, joint attention, seam invariance) must hold
  // for the served weights, not just the seeded init
  private lazy val p = AttentionTrainer.paramsFor(spark, TestSpark.Sf0001)

  test("encoder is deterministic and position-sensitive") {
    // two real vocabulary tokens (the test corpus is synthetic — picking
    // literal English words would silently collapse to one in-vocab token)
    val ts = w.keys.toSeq.sorted.take(4)
    val sent = ts.mkString(" ")
    val a = AttentionEncoder.encode(p, w, sent).get
    val b = AttentionEncoder.encode(p, w, sent).get
    assert(a.sameElements(b))
    // attention + positional embeddings: word ORDER must change the
    // sentence vector (the bag-mean w2v pooling cannot see this)
    val rev = AttentionEncoder.encode(p, w, ts.reverse.mkString(" ")).get
    assert(!a.sameElements(rev))
    // no in-vocabulary token → None (seam emits the empty vector)
    assert(AttentionEncoder.encode(p, w, "zzzzqqqqxxxx").isEmpty)
  }

  test("seam serving is batch-size and partitioning invariant") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("text")).limit(60)
    def run(maxBatch: Int, parts: Int): Map[Long, Seq[Float]] =
      AttentionEncoder.embedDocs(docs.repartition(parts), w, p, maxBatch)
        .select(col("doc_id"), col("att_emb"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1))
        .toMap
    val base = run(AttentionEncoder.MaxBatch, 4)
    // micro-batch boundaries must not change any embedding
    assert(run(1, 4) == base)
    // partition layout must not change any embedding (per-partition
    // session init, positional re-attach)
    assert(run(7, 13) == base)
  }

  test("cross-encoder is joint: swapping doc half changes the score, and " +
       "the pair is NOT a function of the two halves independently") {
    val ts = w.keys.toSeq.sorted
    val query = ts.take(4).mkString(" ")
    val d1 = ts.slice(4, 10).mkString(" ")
    val d2 = ts.slice(10, 16).mkString(" ")
    val s11 = AttentionEncoder.crossScore(p, w, query, d1).get
    val s12 = AttentionEncoder.crossScore(p, w, query, d2).get
    assert(s11 != s12)
    // deterministic
    assert(AttentionEncoder.crossScore(p, w, query, d1).get == s11)
    // un-encodable half → None
    assert(AttentionEncoder.crossScore(p, w, "zzzzqqqq", d1).isEmpty)
    assert(AttentionEncoder.crossScore(p, w, query, "zzzzqqqq").isEmpty)
  }

  test("cross-encoder pair serving is batch-size invariant") {
    val ts = w.keys.toSeq.sorted
    val query = ts.take(4).mkString(" ")
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
      .select(col("doc_id"), col("text")).limit(30)
      .withColumn("query", lit(query))
    def run(maxBatch: Int): Map[Long, Double] =
      AttentionEncoder.scorePairs(docs, w, p, maxBatch)
        .select(col("doc_id"), col("att_score"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(run(1) == run(AttentionEncoder.MaxBatch))
  }

  test("driver query returns a full ranked page with sane scores") {
    val df = AttentionEncoder.qSearch(spark, TestSpark.Sf0001)
    assert(df.columns.toSeq == Seq("doc_id", "score"))
    val rows = df.collect()
    assert(rows.length == AttentionEncoder.TopK)
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(s => s >= -1.0 && s <= 1.0))
    // descending, deterministic tiebreak already in the plan
    assert(scores.sameElements(scores.sorted.reverse))
    // the oracle is generated with literals once weights are cached
    assert(AttentionEncoder.searchOracle.contains("WITH emb(term, k, val) AS"))
  }
}
