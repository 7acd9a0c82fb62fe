package graft

import graft.operators.{Chunker, Dedup}
import org.apache.spark.sql.graftshim.TopKBuffer

/** Seeded randomized property checks (no external generator dep). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("TopKBuffer equals naive sort-take over random inputs") {
    (1 to 50).foreach { _ =>
      val k = 1 + rnd.nextInt(8)
      val n = rnd.nextInt(60)
      val xs = Seq.fill(n)((rnd.nextInt(10) / 2.0, rnd.nextLong().abs % 100))
      val buf = new TopKBuffer(k)
      xs.foreach { case (s, i) => buf.insert(s, i) }
      val got = buf.sortedBestFirst.toSeq.map { case (s, i, _) => (s, i) }
      // duplicates allowed in buffer; compare against naive WITH duplicates
      val naiveDup = xs.sortWith((a, b) =>
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)).take(k)
      assert(got == naiveDup, s"k=$k xs=$xs")
    }
  }

  test("chunker covers every token exactly once net of overlaps, any size") {
    val cases = (1 to 20).map(_ => 1 + rnd.nextInt(200))
    val df = cases.zipWithIndex.map { case (n, id) =>
      (id.toLong, (1 to n).map(i => s"t$i").mkString(" "))
    }.toDF("doc_id", "text")
    val rows = Chunker.chunk(df).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    cases.zipWithIndex.foreach { case (n, id) =>
      val chunks = byDoc(id.toLong).sortBy(_.getAs[Int]("chunk_id"))
      val sum = chunks.map(_.getAs[Int]("n_tokens")).sum
      assert(sum == n + (chunks.length - 1) * Chunker.Overlap, s"n=$n")
      // every chunk except possibly the last is full-size
      chunks.dropRight(1).foreach(c => assert(c.getAs[Int]("n_tokens") == Chunker.ChunkSize))
    }
  }

  test("minhash permutation constants are valid and signatures bounded") {
    assert(Dedup.Perms.size == Dedup.NumHashes)
    assert(Dedup.Perms.forall { case (a, b) =>
      a > 0 && a < Dedup.P && b >= 0 && b < Dedup.P })
    val docs = (0L to 5L).map(i =>
      (i, Seq.fill(20)(s"w${rnd.nextInt(50)}").mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    val sigs = Dedup.minhashSignature(docs).collect()
    sigs.foreach { r =>
      val sig = r.getAs[scala.collection.Seq[Long]]("sig")
      assert(sig.length == Dedup.NumHashes)
      assert(sig.forall(v => v >= 0 && v < Dedup.P))
    }
  }

  test("TermFrequencies equals per-term size(filter(...)) over random token arrays") {
    import graft.functions.TextFunctions._
    import org.apache.spark.sql.functions._
    val vocab = (0 until 12).map(i => s"w$i")
    val terms = Seq("w0", "w3", "w7", "zz")
    val docs = (0 until 40).map { id =>
      (id.toLong, Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val native = docs.select(col("doc_id"),
      termFrequencies(tokens(col("text")), terms).as("tfs")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val reference = docs.select(
      Seq(col("doc_id"), size(tokens(col("text"))).cast("long").as("dl")) ++
        terms.map(t =>
          size(filter(tokens(col("text")), x => x === t)).cast("long").as(s"tf_$t")): _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to terms.size + 1).map(i => r.getLong(i)))
      .toMap
    assert(native.keySet == reference.keySet)
    native.foreach { case (id, tfs) => assert(tfs == reference(id), s"doc $id") }
  }

  test("native simhash/minhash equal their exploded forms on random docs") {
    // adversarial vocabulary: tiny (forced collisions), punctuation,
    // digits, repeated tokens, single-token and near-empty docs
    val vocab = Seq("a", "b", "ab", "a1", "7", "the", "x-y", "Zz")
    val docs = (0 until 60).map { id =>
      val n = if (id < 5) id else 1 + rnd.nextInt(40)
      (id.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "), "s")
    }.toDF("doc_id", "text", "source")
    val nativeSim = Dedup.simhash(docs).collect().map(_.toString).toSeq
    val explodedSim = Dedup.simhashExploded(docs).collect().map(_.toString).toSeq
    assert(nativeSim == explodedSim)
    val nativeMin = Dedup.minhashSignature(docs)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val explodedMin = Dedup.minhashSignatureExploded(docs)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(nativeMin == explodedMin)
  }

  test("semantic dedup keep-rule on random embeddings: drops = higher-id in-cell partners") {
    import org.apache.spark.sql.functions._
    val n = 60; val dim = 8
    val embs = (0L until n).map { i =>
      // planted clusters: 4 archetypes + small noise → real dup structure
      val base = Array.tabulate(dim)(d => if (d % 4 == (i % 4).toInt) 1.0f else 0.0f)
      val vec = base.map(v => v + (rnd.nextFloat() - 0.5f) * 0.1f)
      (i, vec, i % 4)
    }.toDF("vec_id", "embedding", "label")
    val out = Dedup.semanticDedup(embs).collect()
    assert(out.length == n)
    val cellOf = out.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    val kept = out.filter(_.getAs[Boolean]("is_kept")).map(_.getAs[Long]("vec_id")).toSet
    // independent O(n²) reference: normalized cosine ≥ τ, same cell, lower id exists
    val vecs = embs.collect().map(r => r.getAs[Long]("vec_id") ->
      r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val na = math.max(math.sqrt(a.map(x => x * x).sum), 1e-30)
      val nb = math.max(math.sqrt(b.map(x => x * x).sum), 1e-30)
      val dot = a.zip(b).map { case (x, y) => (x / na) * (y / nb) }.sum
      BigDecimal(dot).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    (0L until n).foreach { v =>
      val hasLowerDup = (0L until v).exists(u =>
        cellOf(u) == cellOf(v) && cos(vecs(u), vecs(v)) >= Dedup.CosineDupThreshold)
      assert(kept.contains(v) == !hasLowerDup, s"vec $v")
    }
  }

  test("empty corpus: search and dedup operators return empty, not errors") {
    import graft.operators._
    import org.apache.spark.sql.functions._
    val empty = Seq.empty[(Long, String, String, String)]
      .toDF("doc_id", "text", "source", "lang")
    assert(KeywordSearch.bm25(empty, KeywordSearch.QueryTerms).count() == 0)
    assert(Dedup.exact(empty).count() == 0)
    assert(Dedup.minhashLsh(empty).count() == 0)
    assert(Dedup.ngramJaccard(empty).count() == 0)
    assert(Chunker.chunk(empty.select(col("doc_id"), col("text"))).count() == 0)
    val emptyVecs = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(VectorSearch.topK(emptyVecs, 0L).count() == 0)
    assert(Dedup.embeddingNearDup(emptyVecs).count() == 0)
    // champion index: empty postings → empty lists → empty ranking
    val emptyPostings = KeywordSearch.buildBatchPostings(
      empty.select(col("doc_id"), col("text")))
    val emptyChamps = ChampionIndex.buildChampions(emptyPostings)
    assert(emptyChamps.count() == 0)
    assert(ChampionIndex.bm25BatchPruned(empty, emptyPostings, emptyChamps)
      .count() == 0)
  }

  test("jaccard pairs are symmetric in construction: d1 < d2 always") {
    val out = Dedup.ngramJaccard(
      sources.Tables.documents(spark, TestSpark.Sf0001)).collect()
    assert(out.forall(r => r.getAs[Long]("d1") < r.getAs[Long]("d2")))
    val pairs = out.map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")))
    assert(pairs.distinct.length == pairs.length, "no duplicate pairs")
  }
}
