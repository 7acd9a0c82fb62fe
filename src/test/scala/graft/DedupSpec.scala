package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog again and again", "s0"),
    (1L, "The quick brown fox JUMPS over the lazy dog again and again!", "s0"), // exact dup mod norm
    (2L, "the quick brown fox jumps over the lazy cat again and again", "s0"),  // near dup
    (3L, "completely different content about spark query engines at scale", "s1")
  ).toDF("doc_id", "text", "source")
    .withColumn("lang", lit("en"))

  test("exact dedup groups normalized duplicates") {
    val out = Dedup.exact(docs).collect()
    val dupGroup = out.find(_.getAs[Long]("n_docs") == 2)
    assert(dupGroup.isDefined)
    assert(dupGroup.get.getAs[Long]("keeper_doc_id") == 0L)
    assert(out.length == 3) // 4 docs, one merged pair
  }

  test("minhash signatures of identical docs are identical") {
    val sigs = Dedup.minhashSignature(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[Long]]("sig").toList).toMap
    assert(sigs(0L) == sigs(1L))
    assert(sigs(0L) != sigs(3L))
    assert(sigs(0L).length == Dedup.NumHashes)
  }

  test("minhash LSH surfaces the exact and near pair, not the unrelated doc") {
    val pairs = Dedup.minhashLsh(docs).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Double]("jaccard")))
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L && p._3 == 1.0))
    assert(pairs.forall(p => p._2 != 3L))
  }

  test("hot-bucket guard: inert on non-degenerate corpora, trips on duplicate blowup") {
    import spark.implicits._
    // non-degenerate: guarded (default cap) == unguarded, bitwise
    val corpus = graft.sources.Tables.documents(spark, TestSpark.Sf0001)
    val guarded = Dedup.minhashLsh(corpus).collect().map(_.toString).toSeq
    val exact = Dedup.minhashLsh(corpus, Int.MaxValue).collect().map(_.toString).toSeq
    assert(guarded == exact)
    // degenerate: 30 identical docs + one distinct near-pair. With the
    // cap at 10 the identical block's buckets are skipped from pairwise
    // verify, the disjoint near-pair still surfaces, and hotBuckets
    // reports the block with its representative
    val dup = (0L until 30L).map(i => (i, "spark rows columns tables joins again and again"))
    val other = Seq(100L -> "totally different text about streams windows watermarks here",
                    101L -> "totally different text about streams windows watermarks there")
    val degenerate = (dup ++ other).toDF("doc_id", "text")
    val g = Dedup.minhashLsh(degenerate, maxBucket = 10).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")))
    assert(!g.exists(p => p._1 < 30L && p._2 < 30L), "hot block must be skipped")
    assert(g.contains((100L, 101L)), "normal buckets still verify")
    val hot = Dedup.hotBuckets(degenerate, minSize = 11).collect()
    assert(hot.nonEmpty)
    assert(hot.forall(r => r.getAs[Long]("n_docs") == 30L &&
      r.getAs[Long]("rep_doc") == 0L))
  }

  test("simhash: identical docs equal, near docs close in hamming") {
    val hs = Dedup.simhash(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(hs(0L) == hs(1L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(hs(0L), hs(2L)) < hamming(hs(0L), hs(3L)))
  }

  test("unigram jaccard finds the within-block near pair") {
    val out = Dedup.ngramJaccard(docs).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")))
    assert(out.contains((0L, 1L)))
    assert(out.contains((0L, 2L))) // 10 of 11 distinct tokens shared
    assert(!out.exists(p => p._1 == 3L || p._2 == 3L)) // different source block
  }

  test("simhash pairs: block-filtered candidates equal naive hamming scan") {
    val out = Dedup.simhashPairs(docs).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Int]("hamming")))
    assert(out.contains((0L, 1L, 0))) // exact dup: hamming 0
    // naive cross-check on this tiny corpus
    val hs = Dedup.simhash(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash"))
    val naive = for {
      (d1, h1) <- hs; (d2, h2) <- hs if d1 < d2
      hd = java.lang.Long.bitCount(h1 ^ h2) if hd <= Dedup.HammingThreshold
    } yield (d1, d2, hd)
    assert(out.toSet == naive.toSet)
  }

  test("embedding near-dup finds only above-threshold pairs") {
    val embs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.999f, 0.04f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDup(embs).collect()
    assert(out.length == 1)
    assert((out.head.getAs[Long]("v1"), out.head.getAs[Long]("v2")) == (0L, 1L))
  }

  test("lsh-blocked near-dup recall matches the s-curve prediction") {
    val embs = sources.Tables.embeddings(spark, TestSpark.Sf001)
    val bruteRows = Dedup.embeddingNearDup(embs).collect()
    val brute = bruteRows.map(r => (r.getAs[Long]("v1"), r.getAs[Long]("v2"))).toSet
    val lsh = Dedup.embeddingNearDupLsh(embs).collect()
      .map(r => (r.getAs[Long]("v1"), r.getAs[Long]("v2"))).toSet
    assert(lsh.subsetOf(brute))
    if (brute.nonEmpty) {
      val recall = lsh.size.toDouble / brute.size
      // analytic OR-amplified sign-LSH catch probability per TRUE pair:
      //   p(c) = 1 - (1 - (1 - arccos(c)/pi)^planes)^tables
      // mean over the actual pair cosines = the expected recall; the
      // measured value must sit in a tolerance band around it (14 pairs
      // at sf0.001-scale variance), proving the banding implements the
      // s-curve rather than clearing an arbitrary bar. At this 0.45
      // threshold the curve is intentionally mid-slope: near-dup LSH is
      // tuned for high-cosine pairs, and the exact verify + replayed
      // oracle already pin the algorithm itself.
      val expected = bruteRows.map { r =>
        val theta = math.acos(math.min(1.0, r.getAs[Double]("cosine")))
        val pTable = math.pow(1.0 - theta / math.Pi, Dedup.PlanesPerTable)
        1.0 - math.pow(1.0 - pTable, Dedup.LshTables)
      }.sum / brute.size
      info(f"LSH recall at ${Dedup.CosineDupThreshold}: $recall%.3f " +
        f"(${lsh.size}/${brute.size}), s-curve expectation $expected%.3f")
      assert(math.abs(recall - expected) <= 0.35)
    }
  }

  test("lsh buckets partition the corpus completely") {
    val embs = sources.Tables.embeddings(spark, TestSpark.Sf0001)
    val stats = Dedup.lshBucketStats(embs)
    assert(stats.agg(sum("n_vecs")).as[Long].head() == embs.count())
  }

  test("bloom decontamination equals the exact broadcast probe") {
    val real = sources.Tables.documents(spark, TestSpark.Sf001)
    val exact = Dedup.decontaminate(real).collect().map(_.toString).toSeq
    val bloom = Dedup.decontaminateBloom(real).collect().map(_.toString).toSeq
    assert(exact.nonEmpty && bloom == exact)
    // a tighter sketch (more false positives for the verify join to
    // kill) must not change the output either
    val tiny = Dedup.decontaminateBloom(real, expectedBenchItems = 4)
      .collect().map(_.toString).toSeq
    assert(tiny == exact)
  }

  test("adaptive jaccard takes the prefix path on a >64-term vocabulary") {
    import spark.implicits._
    // 70 distinct tokens force the general path through the SAME
    // dispatch the driver query uses; a planted near-dup must surface
    val vocab = (0 until 70).map(i => f"tok$i%02d")
    val base = vocab.take(30).mkString(" ")
    val docs = Seq(
      (1L, base + " tok68", "s"),
      (2L, base + " tok69", "s"),           // jaccard 30/32 with doc 1
      (3L, vocab.drop(30).take(35).mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    val out = Dedup.ngramJaccard(docs).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")))
    assert(out.toSeq == Seq((1L, 2L)))
  }

  test("jaccard mask path equals prefix path on the real corpus") {
    import graft.functions.TextFunctions.tokens
    val real = sources.Tables.documents(spark, TestSpark.Sf001)
    val sets = real.select(col("doc_id"), col("source"),
      array_sort(array_distinct(tokens(col("text")))).as("tset"))
      .withColumn("set_key", md5(array_join(col("tset"), "")))
      .select("source", "set_key", "tset")
      .dropDuplicates("source", "set_key")
      .withColumn("tsize", size(col("tset")))
    val vocab = sets.select(explode(col("tset")).as("tok"))
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    assert(vocab.length <= 64, "fixture vocabulary must fit the mask path")
    val mask = Dedup.maskSetPairs(sets, vocab)
      .orderBy("source", "k1", "k2").collect().map(_.toString).toSeq
    val prefix = Dedup.prefixSetPairs(sets)
      .orderBy("source", "k1", "k2").collect().map(_.toString).toSeq
    assert(mask.nonEmpty && mask == prefix)
  }

  test("codegen minhash signature equals the exploded groupBy form") {
    val real = sources.Tables.documents(spark, TestSpark.Sf001)
    val native = Dedup.minhashSignature(real)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    val exploded = Dedup.minhashSignatureExploded(real)
      .orderBy("doc_id").collect().map(_.toString).toSeq
    assert(native.nonEmpty && native == exploded)
  }

  test("codegen simhash equals the exploded groupBy form") {
    val real = sources.Tables.documents(spark, TestSpark.Sf001)
    val native = Dedup.simhash(real).collect().map(_.toString).toSeq
    val exploded = Dedup.simhashExploded(real).collect().map(_.toString).toSeq
    assert(native.nonEmpty && native == exploded)
  }

  test("codegen lsh signature equals the interpreted hyperplane form") {
    val embs = sources.Tables.embeddings(spark, TestSpark.Sf001)
    val nPlanes = Dedup.LshTables * Dedup.PlanesPerTable
    val native = embs.select(col("vec_id"),
      graft.functions.VectorFunctions.lshBuckets(col("embedding"),
        Dedup.Hyperplanes.take(nPlanes).map(_.map(_.toDouble)),
        Dedup.PlanesPerTable).as("b"))
    val hof = embs.select(col("vec_id"),
      array((0 until Dedup.LshTables).map { t =>
        (0 until Dedup.PlanesPerTable)
          .map(j => Dedup.planeBitHof(col("embedding"), t * Dedup.PlanesPerTable + j, j))
          .reduce(_ + _)
      }: _*).as("b"))
    assert(native.orderBy("vec_id").collect().map(_.toString).toSeq ==
      hof.orderBy("vec_id").collect().map(_.toString).toSeq)
  }

  test("incremental probe equals full-corpus pairs restricted to the new batch") {
    val corpus = sources.Tables.documents(spark, TestSpark.Sf001)
    val full = Dedup.minhashLsh(corpus).collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Double]("jaccard")))
    val expected = (full.map { case (a, b, j) => (b, a, j) } ++ full)
      .filter { case (n, o, _) =>
        n % Dedup.NewMod == Dedup.NewMod - 1 &&
          (o % Dedup.NewMod != Dedup.NewMod - 1 || o < n) }
      .sortBy(p => (p._1, p._2)).toSeq
    val got = Dedup.qIncremental(spark, TestSpark.Sf001).collect()
      .map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("dup_of"),
        r.getAs[Double]("jaccard"))).toSeq
    assert(got == expected)
  }

  test("semantic dedup drops exactly the higher-id halves of in-cell dup pairs") {
    val embs = sources.Tables.embeddings(spark, TestSpark.Sf001)
    val out = Dedup.semanticDedup(embs).collect()
    assert(out.length == embs.count()) // every vector gets a verdict
    val cellOf = out.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    // independent check: brute-force pairs ≥ τ restricted to same cell
    val allPairs = Dedup.embeddingNearDup(embs).collect()
      .map(r => (r.getAs[Long]("v1"), r.getAs[Long]("v2")))
    val inCellV2 = allPairs.filter { case (a, b) => cellOf(a) == cellOf(b) }
      .map(_._2).toSet
    val dropped = out.filter(!_.getAs[Boolean]("is_kept"))
      .map(_.getAs[Long]("vec_id")).toSet
    assert(dropped == inCellV2)
    // blocking is a subset of brute force: nothing outside a pair drops
    assert(dropped.subsetOf(allPairs.flatMap(p => Seq(p._1, p._2)).toSet))
  }

  test("band index lands band-partitioned on disk") {
    val docs = sources.Tables.documents(spark, TestSpark.Sf0001)
    val path = java.nio.file.Files.createTempDirectory("band_idx_spec").toString
    Dedup.writeBandIndex(docs, path)
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory).map(_.getName)
    assert((0 until Dedup.Bands).forall(b => dirs.contains(s"band_id=$b")))
  }

  test("span profile: verbatim duplicates share every span, unique docs none") {
    // 12-token docs → 5 spans each at k=8; docs 0/1 are normalized-equal
    val out = Dedup.spanProfile(docs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Double]("dup_ratio"),
          r.getAs[Boolean]("keep"))).toMap
    assert(out(0L)._2 == 1.0 && !out(0L)._3) // all spans shared with doc 1
    assert(out(1L)._2 == 1.0 && !out(1L)._3)
    assert(out(3L)._2 == 0.0 && out(3L)._3)  // nothing shared
    // doc 2 differs by one token: its spans containing 'cat' are unique,
    // spans before the change are shared with docs 0/1
    assert(out(2L)._2 > 0.0 && out(2L)._2 < 1.0)
    assert(out(0L)._1 == 5)
  }

  test("span profile: span counts come from distinct spans per doc") {
    import spark.implicits._
    // internal repetition: the same 8-gram repeated within ONE doc must
    // count once and stay non-duplicated (cross-doc signal only)
    val rep = Seq(
      (0L, "a b c d e f g h a b c d e f g h", "s0"),
      (1L, "totally different words one two three four five six seven", "s1")
    ).toDF("doc_id", "text", "source").withColumn("lang", lit("en"))
    val out = Dedup.spanProfile(rep).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans"))).toMap
    // 16 tokens → 9 windows, but window i and i+8 repeat → distinct < 9
    assert(out(0L)._1 < 9)
    assert(out(0L)._2 == 0 && out(1L)._2 == 0)
  }
}
