package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TRANSFORMER-CLASS sentence encoder through the batched-inference
  * seam — the minilm-shaped occupant of the reference's
  * sentence-transformer slot (`src/database/weaviate_interface_v4.py:289`
  * `_create_query_vector`; the sandbox has no ONNX runtime, so the
  * forward pass is pure JVM, exactly the architecture a served encoder
  * runs): token embeddings + learned positions → a stack of
  * [[Layers]]=2 blocks of [[Heads]]=2-head self-ATTENTION → residual +
  * LayerNorm → ReLU FFN → residual + LayerNorm → mean-pool. Token
  * embeddings are the corpus-TRAINED Word2Vec vectors
  * ([[Word2VecEmbedder]] — real learned weights); the projection / FFN
  * / LayerNorm / positional / segment / head parameters are CORPUS-
  * TRAINED too, by [[AttentionTrainer]] (deterministic contrastive +
  * pairwise objectives, full analytic backprop through this exact
  * architecture; the LCG values in [[SeedParams]] are the
  * INITIALIZATION, kept as the trained/seeded comparison baseline).
  * Weights are materialized to a per-dir parquet artifact and serving
  * loads the artifact — swapping in externally pretrained weights
  * changes ONLY the tensor values, not one line of plumbing.
  *
  * Served exactly like an ONNX session would be: weights load once per
  * partition behind [[Inference.embedBatched]], rows feed in bounded
  * micro-batches, outputs re-attach positionally — no shuffle, no
  * per-row model calls.
  *
  * Determinism contract (what makes a full transformer forward pass
  * DuckDB-replayable BITWISE): attention is ReLU-normalized instead of
  * softmax — per head, `a_ij = relu(q_i·k_j/√dh) / (1 + Σ_j relu(..))`
  * (softmax replaced by relu is a published attention variant,
  * arXiv:2309.08586; the +1 denominator bounds the weights like
  * softmax1). With that, the whole pass uses ONLY IEEE-correctly-
  * rounded ops (+ − × ÷ sqrt max), every summation runs in a PINNED
  * order (dims ascending within each head, positions ascending — the
  * [[Word2VecEmbedder]] sorted-sum pattern), the head split is integer
  * index arithmetic, and every parameter round-trips exactly through
  * shortest-decimal literals — so the DuckDB oracle reproduces the JVM
  * forward pass bit-for-bit and the rankings hash-match. (TRAINED
  * parameters keep the contract: they are just different doubles,
  * embedded the same literal way.)
  *
  * Scale design: serving is a pure map over partitions (weights are a
  * closure constant — a broadcast at cluster scale); cost is
  * O(docs × Layers × MaxPos² × Dim) map-side with NO shuffle; the
  * top-k search reuses the one-pass inference frame for both sides.
  */
object AttentionEncoder {
  val Dim = Word2VecEmbedder.Dim // token/model width (16)
  val Heads = 2
  val HeadDim = Dim / Heads      // 8
  val Layers = 2
  val Hidden = 32                // FFN expansion
  val MaxPos = 12                // sequence cap (first in-vocab tokens)
  val MaxBatch = 64
  val TopK = 10
  val QueryDocId = 42L
  val LnEps = 1e-5
  /** √dh — irrational, but ONE double value shared verbatim by the JVM
    * pass and (via shortest-decimal round-trip) the SQL literal.
    */
  private[graft] val HeadScale = math.sqrt(HeadDim.toDouble)

  // --- parameters ----------------------------------------------------------

  /** One transformer block's parameters. */
  private[graft] case class LayerParams(
    wq: Array[Array[Double]], wk: Array[Array[Double]],
    wv: Array[Array[Double]], wo: Array[Array[Double]],
    w1: Array[Array[Double]], w2: Array[Array[Double]],
    g1: Array[Double], b1: Array[Double],
    g2: Array[Double], b2: Array[Double])

  /** The full parameter set of the encoder (everything except the
    * frozen Word2Vec token embeddings): the two blocks, learned
    * positions, cross-encoder segment embeddings, and the linear
    * scoring head. Doubles as the GRADIENT container in
    * [[AttentionTrainer]] (same shapes).
    */
  private[graft] case class AttnParams(
    l1: LayerParams, l2: LayerParams,
    pe: Array[Array[Double]],
    segA: Array[Double], segB: Array[Double],
    wh: Array[Double])

  /** One LCG stream fills every parameter tensor in a fixed order —
    * fully deterministic, no files, identical on every JVM.
    */
  private def lcgDoubles(n: Int, seed: Long): Array[Double] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      // top 20 bits → [-0.25, 0.25): small init keeps activations tame
      ((s >>> 44).toDouble / 1048576.0 - 0.5) * 0.5
    }
  }

  private def mat(rows: Int, cols: Int, seed: Long): Array[Array[Double]] = {
    val flat = lcgDoubles(rows * cols, seed)
    Array.tabulate(rows, cols)((r, c) => flat(r * cols + c))
  }

  private def layerParams(seed0: Long): LayerParams = LayerParams(
    mat(Dim, Dim, seed0), mat(Dim, Dim, seed0 + 1),
    mat(Dim, Dim, seed0 + 2), mat(Dim, Dim, seed0 + 3),
    mat(Dim, Hidden, seed0 + 4), mat(Hidden, Dim, seed0 + 5),
    lcgDoubles(Dim, seed0 + 6).map(1.0 + _), lcgDoubles(Dim, seed0 + 7),
    lcgDoubles(Dim, seed0 + 8).map(1.0 + _), lcgDoubles(Dim, seed0 + 9))

  /** The deterministic seeded INITIALIZATION (and the baseline the
    * trained/seeded quality spec compares against). Fresh arrays per
    * call — [[AttentionTrainer]] mutates its copy in place.
    */
  private[graft] def seedParams(): AttnParams = AttnParams(
    layerParams(1001L), layerParams(1101L), mat(MaxPos, Dim, 1007L),
    lcgDoubles(Dim, 1012L), lcgDoubles(Dim, 1013L), lcgDoubles(Dim, 1014L))

  /** Shared immutable seeded instance (do NOT mutate). */
  private[graft] lazy val SeedParams: AttnParams = seedParams()

  // --- the forward pass (pure JVM, pinned operation order) -----------------

  private[graft] def tokenize(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+").toSeq.filter(_.nonEmpty)

  /** out[i][o] = Σ_k x[i][k]·w[k][o], k ascending — the pinned matmul. */
  private def matmul(x: Array[Array[Double]], w: Array[Array[Double]]): Array[Array[Double]] =
    Array.tabulate(x.length, w(0).length) { (i, o) =>
      var acc = 0.0; var k = 0
      while (k < w.length) { acc += x(i)(k) * w(k)(o); k += 1 }
      acc
    }

  /** (x−μ)/√(σ²+ε)·g + b with μ, σ² accumulated dim-ascending. */
  private def layerNorm(x: Array[Double], g: Array[Double], b: Array[Double]): Array[Double] = {
    var mu = 0.0; var k = 0
    while (k < Dim) { mu += x(k); k += 1 }
    mu = mu / Dim
    var va = 0.0; k = 0
    while (k < Dim) { val d = x(k) - mu; va += d * d; k += 1 }
    va = va / Dim
    val s = math.sqrt(va + LnEps)
    Array.tabulate(Dim)(k => (x(k) - mu) / s * g(k) + b(k))
  }

  /** One transformer block: multi-head ReLU attention → residual + LN →
    * ReLU FFN → residual + LN, every accumulation in pinned order (k
    * ascending WITHIN each head's slice, j ascending over positions).
    */
  private def block(x: Array[Array[Double]], l: LayerParams): Array[Array[Double]] = {
    val n = x.length
    val q = matmul(x, l.wq); val kk = matmul(x, l.wk); val v = matmul(x, l.wv)
    // per-head ReLU attention: r_h(i,j) = relu(q_i·k_j over head h / √dh)
    val r = Array.tabulate(Heads, n, n) { (h, i, j) =>
      var acc = 0.0; var k = h * HeadDim
      val end = (h + 1) * HeadDim
      while (k < end) { acc += q(i)(k) * kk(j)(k); k += 1 }
      val s = acc / HeadScale
      if (s > 0) s else 0.0
    }
    val denom = Array.tabulate(Heads, n) { (h, i) =>
      var acc = 0.0; var j = 0
      while (j < n) { acc += r(h)(i)(j); j += 1 }
      1.0 + acc
    }
    // heads write disjoint output slices — concat is the index split
    val c = Array.tabulate(n, Dim) { (i, o) =>
      val h = o / HeadDim
      var acc = 0.0; var j = 0
      while (j < n) { acc += r(h)(i)(j) / denom(h)(i) * v(j)(o); j += 1 }
      acc
    }
    val attOut = matmul(c, l.wo)
    val h1 = Array.tabulate(n, Dim)((p, k) => x(p)(k) + attOut(p)(k))
    val ln1 = h1.map(layerNorm(_, l.g1, l.b1))
    val f = matmul(ln1, l.w1).map(_.map(h => if (h > 0) h else 0.0))
    val f2 = matmul(f, l.w2)
    val h2 = Array.tabulate(n, Dim)((p, k) => ln1(p)(k) + f2(p)(k))
    h2.map(layerNorm(_, l.g2, l.b2))
  }

  private def stack(x: Array[Array[Double]], p: AttnParams): Array[Array[Double]] =
    block(block(x, p.l1), p.l2)

  /** Encode one text: first [[MaxPos]] in-vocabulary tokens in DOCUMENT
    * order (positions matter — unlike [[Word2VecEmbedder]]'s bag mean),
    * the two-block stack, mean-pool. None when nothing is in vocabulary.
    */
  private[graft] def encode(p: AttnParams, w2v: Map[String, Array[Float]],
                            text: String): Option[Array[Float]] = {
    val toks = tokenize(text).filter(w2v.contains).take(MaxPos)
    if (toks.isEmpty) return None
    Some(encodeToks(p, w2v, toks))
  }

  /** [[encode]] over an already-extracted in-vocabulary token window —
    * the serving arithmetic (double accumulation, float truncation at
    * the pooled edge), shared with the trainer's eval harness.
    */
  private[graft] def encodeToks(p: AttnParams, w2v: Map[String, Array[Float]],
                                toks: Seq[String]): Array[Float] = {
    val n = toks.length
    val x = Array.tabulate(n, Dim)((pos, k) => w2v(toks(pos))(k).toDouble + p.pe(pos)(k))
    val out = stack(x, p)
    // mean-pool position-ascending; float truncation at the output edge
    Array.tabulate(Dim) { k =>
      var acc = 0.0; var pos = 0
      while (pos < n) { acc += out(pos)(k); pos += 1 }
      (acc / n).toFloat
    }
  }

  /** The query half of the cross-encoder pair sequence. */
  val QTokens = 6

  /** CROSS-ENCODE a (query, document) pair: the two halves form ONE
    * sequence (first [[QTokens]] in-vocab query tokens, then up to
    * MaxPos − QTokens doc tokens) with segment embeddings marking the
    * halves, attention runs JOINTLY over both (the cross-encoder
    * property a bi-encoder cannot express), and a linear head over the
    * mean-pooled output yields the relevance score. None when either
    * half has no in-vocabulary token.
    */
  private[graft] def crossScore(p: AttnParams, w2v: Map[String, Array[Float]],
                                query: String, doc: String): Option[Double] = {
    val qt = tokenize(query).filter(w2v.contains).take(QTokens)
    val dt = tokenize(doc).filter(w2v.contains).take(MaxPos - QTokens)
    if (qt.isEmpty || dt.isEmpty) return None
    Some(crossScoreToks(p, w2v, qt, dt))
  }

  /** [[crossScore]] over already-extracted token halves (shared with
    * the trainer's eval harness).
    */
  private[graft] def crossScoreToks(p: AttnParams, w2v: Map[String, Array[Float]],
                                    qt: Seq[String], dt: Seq[String]): Double = {
    val seq = qt ++ dt
    val nq = qt.length
    val n = seq.length
    val x = Array.tabulate(n, Dim) { (pos, k) =>
      w2v(seq(pos))(k).toDouble + p.pe(pos)(k) +
        (if (pos < nq) p.segA(k) else p.segB(k))
    }
    val out = stack(x, p)
    // mean-pool (double — the scalar head is the output edge), linear head
    var score = 0.0
    var k = 0
    while (k < Dim) {
      var acc = 0.0; var pos = 0
      while (pos < n) { acc += out(pos)(k); pos += 1 }
      score += acc / n * p.wh(k)
      k += 1
    }
    score
  }

  /** Embed `docs.text` through the inference seam — session-init once
    * per partition, bounded micro-batches, positional re-attach. Docs
    * with no in-vocabulary token carry an empty vector (the seam
    * contract is one output per input; consumers filter).
    */
  def embedDocs(docs: DataFrame, w2v: Map[String, Array[Float]],
                p: AttnParams, maxBatch: Int = MaxBatch): DataFrame =
    Inference.embedBatched(docs, "text", "att_emb", maxBatch)(() => (w2v, p))(
      (s, texts) => texts.map(t => encode(s._2, s._1, t).getOrElse(Array.empty[Float])))

  /** Driver query: cosine top-k retrieval over the transformer-encoded
    * corpus — the e2e embed→search pipeline with the TRAINED attention
    * encoder in the model slot (one inference pass feeds both sides).
    */
  def qSearch(s: SparkSession, dir: String): DataFrame = {
    val w = Word2VecEmbedder.weightsFor(s, dir)
    val p = AttentionTrainer.paramsFor(s, dir)
    val embedded = embedDocs(
      Tables.documents(s, dir).select(col("doc_id"), col("text")), w, p)
      .filter(size(col("att_emb")) > 0)
      .select(col("doc_id"), col("att_emb"))
      .transform(Checkpoints.transient_) // one inference pass feeds both
                                         // the query row and the corpus
                                         // side; released at the query
                                         // boundary
    val q = embedded.filter(col("doc_id") === QueryDocId)
      .select(col("att_emb").as("q_emb"))
    embedded.filter(col("doc_id") =!= QueryDocId)
      .join(broadcast(q))
      .select(col("doc_id"),
        round(graft.functions.VectorFunctions.cosineSim(col("att_emb"), col("q_emb")), 4)
          .as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(TopK)
  }

  /** Score (query, doc-text) pair columns through the pair-scoring
    * inference seam — the served-cross-encoder shape (reference
    * `src/reranker.py:27` `_cross_encoder_score`), transformer-class
    * occupant of the slot [[LearnedReranker]] fills with a linear model.
    * Pairs with an un-encodable half score −1e308 (below every real
    * score; the seam contract is one output per input).
    */
  def scorePairs(pairs: DataFrame, w2v: Map[String, Array[Float]],
                 p: AttnParams, maxBatch: Int = MaxBatch): DataFrame =
    Inference.scorePairsBatched(pairs, "query", "text", "att_score", maxBatch)(
      () => (w2v, p))((s, ps) => ps.map { case (q, d) =>
        crossScore(s._2, s._1, q, d).getOrElse(-1e308)
      })

  /** Driver query: BM25 top-[[LearnedReranker.CandidateK]] candidates
    * re-scored by the TRAINED attention CROSS-ENCODER, top-[[TopK]] by
    * the joint-attention score — the [[LearnedReranker.qSearch]]
    * harness with the transformer-class model in the slot.
    */
  def qRerank(s: SparkSession, dir: String): DataFrame = {
    val w = Word2VecEmbedder.weightsFor(s, dir)
    val p = AttentionTrainer.paramsFor(s, dir)
    val docs = Tables.documents(s, dir)
    val cand = KeywordSearch.bm25(docs, KeywordSearch.QueryTerms,
      LearnedReranker.CandidateK)
      .select(col("doc_id"), col("score").as("bm25_score"))
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .withColumn("query", lit(KeywordSearch.QueryTerms.mkString(" ")))
    scorePairs(cand, w, p)
      .select(col("doc_id"), col("bm25_score"),
        round(col("att_score"), 6).as("att_score"))
      .orderBy(desc("att_score"), asc("doc_id"))
      .limit(TopK)
  }

  // --- the DuckDB oracle: the SAME forward pass replayed in SQL ------------

  /** A matrix as a LONG-form literal table `(r, c, w)` — matmuls become
    * plain hash joins + ordered sums; no row ever carries a tensor
    * struct (the list-of-lists form made DuckDB drag the whole
    * parameter block through every matmul row).
    */
  private def litLong(name: String, m: Array[Array[Double]]): String = {
    val vals = (for (r <- m.indices; c <- m(r).indices)
      yield s"(${r + 1}, ${c + 1}, ${m(r)(c)})").mkString(", ")
    s"$name(r, c, w) AS (SELECT * FROM (VALUES $vals) AS t(r, c, w))"
  }

  /** LayerNorm gain/bias pair as one literal table `(k, g, b)`. */
  private def litGb(name: String, g: Array[Double], b: Array[Double]): String = {
    val vals = g.indices.map(k => s"(${k + 1}, ${g(k)}, ${b(k)})").mkString(", ")
    s"$name(k, g, b) AS (SELECT * FROM (VALUES $vals) AS t(k, g, b))"
  }

  /** Token embeddings long-form (term, k, val) — float widened exactly. */
  private def embCte(w: Map[String, Array[Float]]): String = {
    val embVals = w.toSeq.sortBy(_._1).flatMap { case (term, v) =>
      v.indices.map(k => s"('$term', ${k + 1}, ${v(k).toDouble})")
    }.mkString(", ")
    s"emb(term, k, val) AS (SELECT * FROM (VALUES $embVals) AS t(term, k, val))"
  }

  /** One layer's parameter tensors as literal long-form CTEs, names
    * suffixed by the layer tag.
    */
  private def layerParamCtes(t: String, l: LayerParams): String =
    s"""${litLong(s"wq$t", l.wq)},
       |${litLong(s"wk$t", l.wk)},
       |${litLong(s"wvm$t", l.wv)},
       |${litLong(s"wo$t", l.wo)},
       |${litLong(s"w1$t", l.w1)},
       |${litLong(s"w2$t", l.w2)},
       |${litGb(s"gba$t", l.g1, l.b1)},
       |${litGb(s"gbb$t", l.g2, l.b2)}""".stripMargin

  private def paramCtes(p: AttnParams): String =
    s"""${layerParamCtes("1", p.l1)},
       |${layerParamCtes("2", p.l2)},
       |${litLong("pe", p.pe)}""".stripMargin

  /** One transformer block as CTEs over a long-form `(doc, pos, k, val)`
    * input frame `$in`, emitting `${p}ln2` of the same shape: matmuls
    * join the literal tensors with the sum pinned `ORDER BY` the
    * contraction index, the head split is `(o-1) // HeadDim` integer
    * arithmetic, LayerNorm runs the same two-pass mean/variance order —
    * bitwise the JVM [[block]], by construction. CTEs are MATERIALIZED:
    * DuckDB inlines plain CTEs per reference, which made the deep
    * shared chain recompute exponentially (324 s → 10 s).
    */
  private def blockCtes(p: String, in: String, t: String): String =
    s"""${p}qm AS MATERIALIZED (
       |  SELECT x.doc, x.pos, wq$t.c AS o,
       |    sum(x.val * wq$t.w ORDER BY x.k) AS val
       |  FROM $in x JOIN wq$t ON wq$t.r = x.k GROUP BY x.doc, x.pos, wq$t.c),
       |${p}km AS MATERIALIZED (
       |  SELECT x.doc, x.pos, wk$t.c AS o,
       |    sum(x.val * wk$t.w ORDER BY x.k) AS val
       |  FROM $in x JOIN wk$t ON wk$t.r = x.k GROUP BY x.doc, x.pos, wk$t.c),
       |${p}vm AS MATERIALIZED (
       |  SELECT x.doc, x.pos, wvm$t.c AS o,
       |    sum(x.val * wvm$t.w ORDER BY x.k) AS val
       |  FROM $in x JOIN wvm$t ON wvm$t.r = x.k GROUP BY x.doc, x.pos, wvm$t.c),
       |${p}att AS MATERIALIZED (
       |  SELECT a.doc, a.pos AS i, b.pos AS j, ((a.o - 1) // $HeadDim) AS h,
       |    CASE WHEN sum(a.val * b.val ORDER BY a.o) / $HeadScale > 0
       |         THEN sum(a.val * b.val ORDER BY a.o) / $HeadScale ELSE 0.0 END AS r
       |  FROM ${p}qm a JOIN ${p}km b ON a.doc = b.doc AND a.o = b.o
       |  GROUP BY a.doc, a.pos, b.pos, ((a.o - 1) // $HeadDim)),
       |${p}dnm AS MATERIALIZED (
       |  SELECT doc, i, h, 1.0 + sum(r ORDER BY j) AS denom
       |  FROM ${p}att GROUP BY doc, i, h),
       |${p}ctx AS MATERIALIZED (
       |  SELECT att.doc, att.i AS pos, vm.o,
       |    sum(att.r / dnm.denom * vm.val ORDER BY att.j) AS val
       |  FROM ${p}att att
       |  JOIN ${p}dnm dnm ON att.doc = dnm.doc AND att.i = dnm.i AND att.h = dnm.h
       |  JOIN ${p}vm vm ON att.doc = vm.doc AND att.j = vm.pos
       |    AND ((vm.o - 1) // $HeadDim) = att.h
       |  GROUP BY att.doc, att.i, vm.o),
       |${p}h1 AS MATERIALIZED (
       |  SELECT x.doc, x.pos, x.k, x.val + ao.val AS val
       |  FROM $in x JOIN (
       |    SELECT c.doc, c.pos, wo$t.c AS k,
       |      sum(c.val * wo$t.w ORDER BY c.o) AS val
       |    FROM ${p}ctx c JOIN wo$t ON wo$t.r = c.o GROUP BY c.doc, c.pos, wo$t.c
       |  ) ao ON x.doc = ao.doc AND x.pos = ao.pos AND x.k = ao.k),
       |${p}mu1 AS MATERIALIZED (SELECT doc, pos, sum(val ORDER BY k) / $Dim AS mu FROM ${p}h1 GROUP BY doc, pos),
       |${p}va1 AS MATERIALIZED (
       |  SELECT h1.doc, h1.pos,
       |    sum((h1.val - mu) * (h1.val - mu) ORDER BY k) / $Dim AS va
       |  FROM ${p}h1 h1 JOIN ${p}mu1 mu1 ON h1.doc = mu1.doc AND h1.pos = mu1.pos
       |  GROUP BY h1.doc, h1.pos),
       |${p}ln1 AS MATERIALIZED (
       |  SELECT h1.doc, h1.pos, h1.k,
       |    (h1.val - mu) / sqrt(va + $LnEps) * gba$t.g + gba$t.b AS val
       |  FROM ${p}h1 h1
       |  JOIN ${p}mu1 mu1 ON h1.doc = mu1.doc AND h1.pos = mu1.pos
       |  JOIN ${p}va1 va1 ON h1.doc = va1.doc AND h1.pos = va1.pos
       |  JOIN gba$t ON gba$t.k = h1.k),
       |${p}ff AS MATERIALIZED (
       |  SELECT l.doc, l.pos, w1$t.c AS h,
       |    CASE WHEN sum(l.val * w1$t.w ORDER BY l.k) > 0
       |         THEN sum(l.val * w1$t.w ORDER BY l.k) ELSE 0.0 END AS val
       |  FROM ${p}ln1 l JOIN w1$t ON w1$t.r = l.k GROUP BY l.doc, l.pos, w1$t.c),
       |${p}h2 AS MATERIALIZED (
       |  SELECT l.doc, l.pos, l.k, l.val + f2.val AS val
       |  FROM ${p}ln1 l JOIN (
       |    SELECT ff.doc, ff.pos, w2$t.c AS k,
       |      sum(ff.val * w2$t.w ORDER BY ff.h) AS val
       |    FROM ${p}ff ff JOIN w2$t ON w2$t.r = ff.h GROUP BY ff.doc, ff.pos, w2$t.c
       |  ) f2 ON l.doc = f2.doc AND l.pos = f2.pos AND l.k = f2.k),
       |${p}mu2 AS MATERIALIZED (SELECT doc, pos, sum(val ORDER BY k) / $Dim AS mu FROM ${p}h2 GROUP BY doc, pos),
       |${p}va2 AS MATERIALIZED (
       |  SELECT h2.doc, h2.pos,
       |    sum((h2.val - mu) * (h2.val - mu) ORDER BY k) / $Dim AS va
       |  FROM ${p}h2 h2 JOIN ${p}mu2 mu2 ON h2.doc = mu2.doc AND h2.pos = mu2.pos
       |  GROUP BY h2.doc, h2.pos),
       |${p}ln2 AS MATERIALIZED (
       |  SELECT h2.doc, h2.pos, h2.k,
       |    (h2.val - mu) / sqrt(va + $LnEps) * gbb$t.g + gbb$t.b AS val
       |  FROM ${p}h2 h2
       |  JOIN ${p}mu2 mu2 ON h2.doc = mu2.doc AND h2.pos = mu2.pos
       |  JOIN ${p}va2 va2 ON h2.doc = va2.doc AND h2.pos = va2.pos
       |  JOIN gbb$t ON gbb$t.k = h2.k)""".stripMargin

  /** The two-block stack: layer 1 over `x`, layer 2 over layer 1's
    * output; the stack's output CTE is `b_ln2`.
    */
  private val stackCtes: String =
    s"""${blockCtes("a_", "x", "1")},
       |${blockCtes("b_", "a_ln2", "2")}""".stripMargin

  /** Referencing a nonexistent column makes the oracle FAIL loudly in
    * DuckDB rather than compare as a plausible empty result.
    */
  private val emptyOracle =
    "SELECT attention_encoder_weights_not_trained FROM documents"

  /** (w2v weights, trained attention params) for the most recently
    * queried dir — both caches must resolve or the oracle fails loudly.
    */
  private def cachedModel: Option[(Map[String, Array[Float]], AttnParams)] =
    for {
      w <- Word2VecEmbedder.cachedWeights
      p <- AttentionTrainer.cachedParams
    } yield (w, p)

  def searchOracle: String = cachedModel.fold(emptyOracle) { case (w, p) =>
    s"""WITH ${embCte(w)},
       |${paramCtes(p)},
       |raw AS MATERIALIZED (
       |  SELECT doc_id, unnest(l) AS term, unnest(range(1, len(l) + 1)) AS rp
       |  FROM (SELECT doc_id, ${TextAnalysis.sqlToks} AS l FROM documents) t0),
       |ranked AS MATERIALIZED (
       |  SELECT doc_id, term,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY rp) AS pos
       |  FROM raw WHERE term IN (SELECT term FROM emb)),
       |toks AS MATERIALIZED (SELECT * FROM ranked WHERE pos <= $MaxPos),
       |nn AS MATERIALIZED (SELECT doc_id AS doc, count(*) AS n FROM toks GROUP BY doc_id),
       |x AS MATERIALIZED (
       |  SELECT t.doc_id AS doc, t.pos, e.k, e.val + pe.w AS val
       |  FROM toks t
       |  JOIN emb e ON t.term = e.term
       |  JOIN pe ON pe.r = t.pos AND pe.c = e.k),
       |$stackCtes,
       |pooled_long AS MATERIALIZED (
       |  SELECT ln2.doc, ln2.k,
       |    CAST(sum(ln2.val ORDER BY ln2.pos) / nn.n AS REAL) AS pv
       |  FROM b_ln2 ln2 JOIN nn ON ln2.doc = nn.doc
       |  GROUP BY ln2.doc, ln2.k, nn.n),
       |pooled AS MATERIALIZED (
       |  SELECT doc AS doc_id, list(CAST(pv AS DOUBLE) ORDER BY k) AS e
       |  FROM pooled_long GROUP BY doc),
       |q AS (SELECT e AS q_emb FROM pooled WHERE doc_id = $QueryDocId)
       |SELECT doc_id,
       |  round(${VectorSearch.cosineSql("e", "q_emb", Dim)}, 4) AS score
       |FROM pooled, q
       |WHERE doc_id <> $QueryDocId
       |ORDER BY score DESC, doc_id
       |LIMIT $TopK""".stripMargin
  }

  /** Cross-encoder rerank oracle: candidates from the oracled BM25 SQL,
    * the pair sequence assembled exactly like [[crossScore]] (query-half
    * token/position literals — the query is a constant of the benchmark
    * — + document tokens at positions nq+1.., segment embeddings via a
    * CASE on the position split), the SAME [[stackCtes]] chain, then
    * double mean-pool × the literal head, rounded at the output edge.
    */
  def rerankOracle: String = cachedModel.fold(emptyOracle) { case (w, p) =>
    val query = KeywordSearch.QueryTerms.mkString(" ")
    val qt = tokenize(query).filter(w.contains).take(QTokens)
    val nq = qt.length
    val qlitVals = qt.zipWithIndex
      .map { case (t, i) => s"(${i + 1}, '$t')" }.mkString(", ")
    val segVals = (0 until Dim)
      .map(k => s"(${k + 1}, ${p.segA(k)}, ${p.segB(k)})").mkString(", ")
    val whVals = (0 until Dim)
      .map(k => s"(${k + 1}, ${p.wh(k)})").mkString(", ")
    val maxDoc = MaxPos - QTokens
    s"""WITH ${embCte(w)},
       |${paramCtes(p)},
       |sab(k, a, b) AS (SELECT * FROM (VALUES $segVals) AS t(k, a, b)),
       |whd(k, w) AS (SELECT * FROM (VALUES $whVals) AS t(k, w)),
       |qlit(pos, term) AS (SELECT * FROM (VALUES $qlitVals) AS t(pos, term)),
       |cand AS MATERIALIZED (${KeywordSearch.bm25Sql(KeywordSearch.QueryTerms, LearnedReranker.CandidateK)}),
       |raw AS MATERIALIZED (
       |  SELECT d.doc_id, unnest(l) AS term, unnest(range(1, len(l) + 1)) AS rp
       |  FROM (SELECT doc_id, ${TextAnalysis.sqlToks} AS l FROM documents
       |        WHERE doc_id IN (SELECT doc_id FROM cand)) d),
       |dtoks AS MATERIALIZED (
       |  SELECT doc_id, term, dpos FROM (
       |    SELECT doc_id, term,
       |      row_number() OVER (PARTITION BY doc_id ORDER BY rp) AS dpos
       |    FROM raw WHERE term IN (SELECT term FROM emb)) t
       |  WHERE dpos <= $maxDoc),
       |seq AS MATERIALIZED (
       |  -- query-half rows ONLY for docs that encode (have >=1 in-vocab
       |  -- token): the JVM scores such pairs -1e308 (crossScore's
       |  -- un-encodable-half sentinel), so a doc absent from dtoks must
       |  -- NOT pick up a query-only score here — it is sentinel-scored
       |  -- in the final select instead
       |  SELECT c.doc_id AS doc, q.pos, q.term
       |  FROM cand c, qlit q
       |  WHERE c.doc_id IN (SELECT doc_id FROM dtoks)
       |  UNION ALL
       |  SELECT doc_id AS doc, $nq + dpos AS pos, term FROM dtoks),
       |nn AS MATERIALIZED (SELECT doc, count(*) AS n FROM seq GROUP BY doc),
       |x AS MATERIALIZED (
       |  SELECT s.doc, s.pos, e.k,
       |    e.val + pe.w + CASE WHEN s.pos <= $nq THEN sab.a ELSE sab.b END AS val
       |  FROM seq s
       |  JOIN emb e ON s.term = e.term
       |  JOIN pe ON pe.r = s.pos AND pe.c = e.k
       |  JOIN sab ON sab.k = e.k),
       |$stackCtes,
       |pooled AS MATERIALIZED (
       |  SELECT ln2.doc, ln2.k,
       |    sum(ln2.val ORDER BY ln2.pos) / nn.n AS pv
       |  FROM b_ln2 ln2 JOIN nn ON ln2.doc = nn.doc
       |  GROUP BY ln2.doc, ln2.k, nn.n),
       |scored AS MATERIALIZED (
       |  SELECT pooled.doc AS doc_id,
       |    sum(pv * whd.w ORDER BY pooled.k) AS raw_score
       |  FROM pooled JOIN whd ON whd.k = pooled.k
       |  GROUP BY pooled.doc)
       |SELECT cand.doc_id, cand.score AS bm25_score,
       |  round(coalesce(raw_score, -1e308), 6) AS att_score
       |FROM cand LEFT JOIN scored ON cand.doc_id = scored.doc_id
       |ORDER BY att_score DESC, cand.doc_id
       |LIMIT $TopK""".stripMargin
  }
}
