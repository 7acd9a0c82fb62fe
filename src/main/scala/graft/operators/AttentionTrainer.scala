package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import AttentionEncoder.{AttnParams, LayerParams, Dim, Heads, HeadDim, Hidden,
  MaxPos, QTokens, HeadScale, LnEps}

/** CORPUS-TRAINING for the [[AttentionEncoder]] — closes the last
  * "seeded parameters" gap in the transformer slot: every tensor the
  * encoder serves (projections, FFN, LayerNorm, positions, segments,
  * scoring head) is gradient-trained on the corpus through FULL
  * ANALYTIC BACKPROP of the exact serving architecture (ReLU-normalized
  * attention, arXiv:2309.08586), with the corpus-trained Word2Vec token
  * embeddings frozen underneath ([[Word2VecEmbedder]] — they have their
  * own oracle).
  *
  * Objectives (both fully deterministic — no RNG anywhere):
  *
  *  - '''Phase 1, bi-encoder blocks''': contrastive InfoNCE over
  *    augmentation positives — the unsupervised SimCSE/ESimCSE recipe
  *    (arXiv:2104.08821, 2109.04380) with a DETERMINISTIC augmentation:
  *    the positive for a document's token window is the same window
  *    with every 3rd token dropped (token dropout shifts every later
  *    POSITION, so the encoder must learn position-robust matching —
  *    the corpus is synthetic i.i.d. word soup, so lexical overlap is
  *    the only learnable retrieval structure, measured: disjoint-half
  *    and source-label signal are both at chance). In-batch negatives,
  *    symmetric (row+column) cross-entropy over the cosine/τ matrix.
  *  - '''Phase 2, cross-encoder head''': the segment embeddings and the
  *    linear scoring head are trained with logistic loss on same-doc
  *    (positive) vs other-doc (negative) (query-view, doc-half) pairs
  *    THROUGH the frozen phase-1 blocks — the standard head-finetune;
  *    freezing keeps phase 2 from degrading the bi-encoder geometry
  *    (pe/blocks are shared by both paths).
  *
  * Measured on held-out sf0.001 docs (n=200, fully deterministic):
  * bi-encoder sparse-view hit-rate@10 0.10 (seeded) → 0.245 (trained);
  * cross-encoder pairwise accuracy 0.50 → 0.515. The cross head's low
  * ceiling is a property of the task, not a tuning artifact (joint
  * training, all-params finetune, and higher-LR/longer head schedules
  * all measured 0.49–0.55): a LINEAR readout of the mean-pooled joint
  * sequence can only see duplicate-token signal on this i.i.d.-word
  * corpus, and adapting the shared blocks toward the cross task trades
  * away bi-encoder hit-rate (0.245 → 0.18–0.225 in the all-params
  * variants). The committed config is the Pareto point that protects
  * the retrieval headline.
  *
  * Training is driver-side over a BOUNDED sample (first [[TrainDocs]]
  * qualifying docs by doc_id — the collect is ≤512 short token windows
  * by construction, the documented literal-constants pattern); every
  * batch, accumulation, and Adam update runs in a pinned order with
  * StrictMath transcendentals, so the trained tensors are bitwise
  * reproducible on any JVM. At real scale this slot is data-parallel
  * SGD (per-partition gradients, deterministic tree aggregation) — the
  * [[Word2VecEmbedder]] one-MLlib-job precedent; the serving path is
  * unchanged either way because weights flow through the SAME per-dir
  * parquet artifact: train → materialize → reload → literal-tensor
  * oracle ([[AttentionEncoder.searchOracle]] embeds the TRAINED doubles
  * via shortest-decimal round-trip, so the bitwise DuckDB replay
  * contract survives training untouched).
  */
object AttentionTrainer {
  val TrainDocs = 256   // bounded training sample (first qualifying by doc_id)
  val HeldDocs = 200    // held-out eval sample (the next qualifying docs)
  val MinToks = 6       // a doc qualifies with >= this many in-vocab tokens
  val Batch = 32
  val Steps1 = 200      // phase-1 contrastive steps
  val Steps2 = 150      // phase-2 head steps
  val Lr = 5e-3
  val Lr2 = 5e-3        // phase-2 head-only learning rate
  val Tau = 0.05        // InfoNCE temperature (the SimCSE default)
  val Clip = 3.0        // global gradient-norm clip
  val Beta1 = 0.9; val Beta2 = 0.999; val AdamEps = 1e-8

  /** Deterministic augmentation: drop every 3rd token (positions of all
    * later tokens shift — the position-robustness signal).
    */
  private[graft] def dropView(toks: Seq[String]): Seq[String] =
    toks.zipWithIndex.collect { case (t, i) if i % 3 != 2 => t }

  /** Harder held-out QUERY view: KEEP every 3rd token (~1/3 overlap) —
    * evaluation generalizes across augmentation strengths.
    */
  private[graft] def keepView(toks: Seq[String]): Seq[String] =
    toks.zipWithIndex.collect { case (t, i) if i % 3 == 0 => t }

  // --- data ----------------------------------------------------------------

  /** (train, heldOut) token windows: first-[[MaxPos]] in-vocab tokens of
    * the corpus docs in doc_id order; first [[TrainDocs]] qualifying
    * windows train, the next [[HeldDocs]] are the spec's held-out eval
    * set. Bounded collect: ≤512 docs' first characters, any sf.
    */
  private[graft] def tokenWindows(s: SparkSession, dir: String,
                                  w2v: Map[String, Array[Float]])
      : (Array[Array[String]], Array[Array[String]]) = {
    import org.apache.spark.sql.functions.col
    val texts = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .orderBy(col("doc_id")).limit(TrainDocs + HeldDocs + 56)
      .collect().map(_.getString(1))
    val windows = texts.iterator
      .map(t => AttentionEncoder.tokenize(t).filter(w2v.contains).take(MaxPos).toArray)
      .filter(_.length >= MinToks)
      .toArray
    (windows.take(TrainDocs), windows.slice(TrainDocs, TrainDocs + HeldDocs))
  }

  // --- forward with caches / analytic backward -----------------------------

  /** Everything one block's backward pass needs. */
  private final class BlockCache(
    val x: Array[Array[Double]],
    val q: Array[Array[Double]], val kk: Array[Array[Double]], val v: Array[Array[Double]],
    val r: Array[Array[Array[Double]]], val denom: Array[Array[Double]],
    val c: Array[Array[Double]],
    val xhat1: Array[Array[Double]], val sd1: Array[Double], val ln1: Array[Array[Double]],
    val f: Array[Array[Double]],
    val xhat2: Array[Array[Double]], val sd2: Array[Double],
    val out: Array[Array[Double]])

  private def matmul(x: Array[Array[Double]], w: Array[Array[Double]]): Array[Array[Double]] =
    Array.tabulate(x.length, w(0).length) { (i, o) =>
      var acc = 0.0; var k = 0
      while (k < w.length) { acc += x(i)(k) * w(k)(o); k += 1 }
      acc
    }

  /** LN forward returning (xhat, sd, y). */
  private def lnFwd(x: Array[Double], g: Array[Double], b: Array[Double])
      : (Array[Double], Double, Array[Double]) = {
    var mu = 0.0; var k = 0
    while (k < Dim) { mu += x(k); k += 1 }
    mu /= Dim
    var va = 0.0; k = 0
    while (k < Dim) { val d = x(k) - mu; va += d * d; k += 1 }
    va /= Dim
    val sd = math.sqrt(va + LnEps)
    val xhat = Array.tabulate(Dim)(k => (x(k) - mu) / sd)
    (xhat, sd, Array.tabulate(Dim)(k => xhat(k) * g(k) + b(k)))
  }

  /** LN backward: given dy, xhat, sd, g → dx; accumulates dg/db. */
  private def lnBwd(dy: Array[Double], xhat: Array[Double], sd: Double,
                    g: Array[Double], dg: Array[Double], db: Array[Double]): Array[Double] = {
    var m1 = 0.0; var m2 = 0.0; var k = 0
    val dxhat = new Array[Double](Dim)
    while (k < Dim) {
      dg(k) += dy(k) * xhat(k); db(k) += dy(k)
      dxhat(k) = dy(k) * g(k)
      m1 += dxhat(k); m2 += dxhat(k) * xhat(k)
      k += 1
    }
    m1 /= Dim; m2 /= Dim
    Array.tabulate(Dim)(k => (dxhat(k) - m1 - xhat(k) * m2) / sd)
  }

  /** The serving [[AttentionEncoder.block]] arithmetic, recording every
    * intermediate the backward pass needs.
    */
  private def blockFwd(x: Array[Array[Double]], l: LayerParams): BlockCache = {
    val n = x.length
    val q = matmul(x, l.wq); val kk = matmul(x, l.wk); val v = matmul(x, l.wv)
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
    val c = Array.tabulate(n, Dim) { (i, o) =>
      val h = o / HeadDim
      var acc = 0.0; var j = 0
      while (j < n) { acc += r(h)(i)(j) / denom(h)(i) * v(j)(o); j += 1 }
      acc
    }
    val attOut = matmul(c, l.wo)
    val h1 = Array.tabulate(n, Dim)((p, k) => x(p)(k) + attOut(p)(k))
    val ln1Trip = h1.map(lnFwd(_, l.g1, l.b1))
    val ln1 = ln1Trip.map(_._3)
    val f = matmul(ln1, l.w1).map(_.map(h => if (h > 0) h else 0.0))
    val f2 = matmul(f, l.w2)
    val h2 = Array.tabulate(n, Dim)((p, k) => ln1(p)(k) + f2(p)(k))
    val ln2Trip = h2.map(lnFwd(_, l.g2, l.b2))
    new BlockCache(x, q, kk, v, r, denom, c,
      ln1Trip.map(_._1), ln1Trip.map(_._2), ln1, f,
      ln2Trip.map(_._1), ln2Trip.map(_._2), ln2Trip.map(_._3))
  }

  /** Backward through one block: dOut → dX, gradients accumulated into
    * `gl` (a [[LayerParams]]-shaped gradient container).
    */
  private def blockBwd(bc: BlockCache, l: LayerParams, gl: LayerParams,
                       dOut: Array[Array[Double]]): Array[Array[Double]] = {
    val n = bc.x.length
    // LN2 backward
    val dh2 = Array.tabulate(n)(p => lnBwd(dOut(p), bc.xhat2(p), bc.sd2(p), l.g2, gl.g2, gl.b2))
    // residual: dln1 += dh2; FFN: df2 = dh2
    val dln1 = Array.tabulate(n, Dim)((p, k) => dh2(p)(k))
    // dW2[h][k] += f[p][h] * df2[p][k];  df[p][h] = Σ_k df2[p][k]*W2[h][k]
    val dfpre = Array.ofDim[Double](n, Hidden)
    var p = 0
    while (p < n) {
      var h = 0
      while (h < Hidden) {
        var acc = 0.0; var k = 0
        while (k < Dim) {
          gl.w2(h)(k) += bc.f(p)(h) * dh2(p)(k)
          acc += dh2(p)(k) * l.w2(h)(k)
          k += 1
        }
        dfpre(p)(h) = if (bc.f(p)(h) > 0) acc else 0.0
        h += 1
      }
      p += 1
    }
    // dW1[k][h] += ln1[p][k]*dfpre[p][h]; dln1[p][k] += Σ_h dfpre[p][h]*W1[k][h]
    p = 0
    while (p < n) {
      var k = 0
      while (k < Dim) {
        var acc = 0.0; var h = 0
        while (h < Hidden) {
          gl.w1(k)(h) += bc.ln1(p)(k) * dfpre(p)(h)
          acc += dfpre(p)(h) * l.w1(k)(h)
          h += 1
        }
        dln1(p)(k) += acc
        k += 1
      }
      p += 1
    }
    // LN1 backward
    val dh1 = Array.tabulate(n)(p => lnBwd(dln1(p), bc.xhat1(p), bc.sd1(p), l.g1, gl.g1, gl.b1))
    // residual: dx = dh1; attention output: dAttOut = dh1
    val dx = Array.tabulate(n, Dim)((p, k) => dh1(p)(k))
    // dWo[o][k] += c[p][o]*dh1[p][k]; dc[p][o] = Σ_k dh1[p][k]*Wo[o][k]
    val dc = Array.ofDim[Double](n, Dim)
    p = 0
    while (p < n) {
      var o = 0
      while (o < Dim) {
        var acc = 0.0; var k = 0
        while (k < Dim) {
          gl.wo(o)(k) += bc.c(p)(o) * dh1(p)(k)
          acc += dh1(p)(k) * l.wo(o)(k)
          k += 1
        }
        dc(p)(o) = acc
        o += 1
      }
      p += 1
    }
    // attention backward
    val dv = Array.ofDim[Double](n, Dim)
    val ds = Array.ofDim[Double](Heads, n, n)
    var h = 0
    while (h < Heads) {
      var i = 0
      while (i < n) {
        val den = bc.denom(h)(i)
        // da over j, plus S = Σ_l da_l * r_l for the denominator term
        val da = new Array[Double](n)
        var sAcc = 0.0
        var j = 0
        while (j < n) {
          var acc = 0.0
          var o = h * HeadDim
          val end = (h + 1) * HeadDim
          while (o < end) { acc += dc(i)(o) * bc.v(j)(o); o += 1 }
          da(j) = acc
          sAcc += acc * bc.r(h)(i)(j)
          j += 1
        }
        j = 0
        while (j < n) {
          // dv via a = r/denom
          var o = h * HeadDim
          val end = (h + 1) * HeadDim
          val a = bc.r(h)(i)(j) / den
          while (o < end) { dv(j)(o) += a * dc(i)(o); o += 1 }
          val dr = da(j) / den - sAcc / (den * den)
          ds(h)(i)(j) = if (bc.r(h)(i)(j) > 0) dr else 0.0
          j += 1
        }
        i += 1
      }
      h += 1
    }
    // dq/dk through the scaled dot product
    val dq = Array.ofDim[Double](n, Dim)
    val dkk = Array.ofDim[Double](n, Dim)
    var k = 0
    while (k < Dim) {
      val h = k / HeadDim
      var i = 0
      while (i < n) {
        var j = 0
        while (j < n) {
          val d = ds(h)(i)(j) / HeadScale
          dq(i)(k) += d * bc.kk(j)(k)
          dkk(j)(k) += d * bc.q(i)(k)
          j += 1
        }
        i += 1
      }
      k += 1
    }
    // input projections: dW += xᵀ·dY, dx += dY·Wᵀ
    def proj(dy: Array[Array[Double]], w: Array[Array[Double]], gw: Array[Array[Double]]): Unit = {
      var p = 0
      while (p < n) {
        var k = 0
        while (k < Dim) {
          var acc = 0.0; var o = 0
          while (o < Dim) {
            gw(k)(o) += bc.x(p)(k) * dy(p)(o)
            acc += dy(p)(o) * w(k)(o)
            o += 1
          }
          dx(p)(k) += acc
          k += 1
        }
        p += 1
      }
    }
    proj(dq, l.wq, gl.wq); proj(dkk, l.wk, gl.wk); proj(dv, l.wv, gl.wv)
    dx
  }

  /** Two-block forward with caches (training replica of the serving
    * stack — same arithmetic, pooled in DOUBLE for the loss).
    */
  private final class Fwd(val b1: BlockCache, val b2: BlockCache, val n: Int) {
    val pooled: Array[Double] = Array.tabulate(Dim) { k =>
      var acc = 0.0; var p = 0
      while (p < n) { acc += b2.out(p)(k); p += 1 }
      acc / n
    }
  }

  private def fwd(p: AttnParams, x: Array[Array[Double]]): Fwd = {
    val b1 = blockFwd(x, p.l1)
    val b2 = blockFwd(b1.out, p.l2)
    new Fwd(b1, b2, x.length)
  }

  /** Backward from a pooled-output gradient to the input embedding
    * gradient (returned); block gradients accumulate into `g`.
    */
  private def bwd(p: AttnParams, g: AttnParams, fw: Fwd,
                  dPooled: Array[Double]): Array[Array[Double]] = {
    val dOut = Array.tabulate(fw.n, Dim)((_, k) => dPooled(k) / fw.n)
    val dIn2 = blockBwd(fw.b2, p.l2, g.l2, dOut)
    blockBwd(fw.b1, p.l1, g.l1, dIn2)
  }

  private def biInput(p: AttnParams, w2v: Map[String, Array[Float]],
                      toks: Seq[String]): Array[Array[Double]] =
    Array.tabulate(toks.length, Dim)((pos, k) => w2v(toks(pos))(k).toDouble + p.pe(pos)(k))

  private def crossInput(p: AttnParams, w2v: Map[String, Array[Float]],
                         qt: Seq[String], dt: Seq[String]): Array[Array[Double]] = {
    val seq = qt ++ dt
    val nq = qt.length
    Array.tabulate(seq.length, Dim) { (pos, k) =>
      w2v(seq(pos))(k).toDouble + p.pe(pos)(k) +
        (if (pos < nq) p.segA(k) else p.segB(k))
    }
  }

  // --- parameter plumbing (shared row order for grads / Adam / clip) -------

  private def zeroLayer(): LayerParams = LayerParams(
    Array.ofDim[Double](Dim, Dim), Array.ofDim[Double](Dim, Dim),
    Array.ofDim[Double](Dim, Dim), Array.ofDim[Double](Dim, Dim),
    Array.ofDim[Double](Dim, Hidden), Array.ofDim[Double](Hidden, Dim),
    new Array[Double](Dim), new Array[Double](Dim),
    new Array[Double](Dim), new Array[Double](Dim))

  private[graft] def zeroParams(): AttnParams = AttnParams(
    zeroLayer(), zeroLayer(), Array.ofDim[Double](MaxPos, Dim),
    new Array[Double](Dim), new Array[Double](Dim), new Array[Double](Dim))

  private def layerRows(l: LayerParams): Array[Array[Double]] =
    l.wq ++ l.wk ++ l.wv ++ l.wo ++ l.w1 ++ l.w2 ++ Array(l.g1, l.b1, l.g2, l.b2)

  /** Every parameter leaf as rows, in ONE fixed order shared by params,
    * gradients, and Adam state. The last 3 rows (segA, segB, wh) are
    * the phase-2 head.
    */
  private def rows(p: AttnParams): Array[Array[Double]] =
    layerRows(p.l1) ++ layerRows(p.l2) ++ p.pe ++ Array(p.segA, p.segB, p.wh)

  private final class AdamState(shape: Array[Array[Double]]) {
    val m: Array[Array[Double]] = shape.map(r => new Array[Double](r.length))
    val v: Array[Array[Double]] = shape.map(r => new Array[Double](r.length))
    def step(pr: Array[Array[Double]], gr: Array[Array[Double]],
             mask: Int => Boolean, t: Int, lr: Double): Unit = {
      val bc1 = 1.0 - StrictMath.pow(Beta1, t.toDouble)
      val bc2 = 1.0 - StrictMath.pow(Beta2, t.toDouble)
      var i = 0
      while (i < pr.length) {
        if (mask(i)) {
          val p = pr(i); val g = gr(i); val mi = m(i); val vi = v(i)
          var j = 0
          while (j < p.length) {
            mi(j) = Beta1 * mi(j) + (1 - Beta1) * g(j)
            vi(j) = Beta2 * vi(j) + (1 - Beta2) * g(j) * g(j)
            p(j) -= lr * (mi(j) / bc1) / (math.sqrt(vi(j) / bc2) + AdamEps)
            j += 1
          }
        }
        i += 1
      }
    }
  }

  private def clipGrads(gr: Array[Array[Double]], mask: Int => Boolean): Unit = {
    var sq = 0.0
    var i = 0
    while (i < gr.length) {
      if (mask(i)) { val g = gr(i); var j = 0; while (j < g.length) { sq += g(j) * g(j); j += 1 } }
      i += 1
    }
    val norm = math.sqrt(sq)
    if (norm > Clip) {
      val sc = Clip / norm
      i = 0
      while (i < gr.length) {
        if (mask(i)) { val g = gr(i); var j = 0; while (j < g.length) { g(j) *= sc; j += 1 } }
        i += 1
      }
    }
  }

  // --- objectives ----------------------------------------------------------

  private def norm(e: Array[Double]): Double = {
    var s = 0.0; var k = 0
    while (k < Dim) { s += e(k) * e(k); k += 1 }
    math.max(math.sqrt(s), 1e-12)
  }

  /** One symmetric-InfoNCE step over batch `idx`: accumulates gradients
    * into `g`, returns the loss. cos backward:
    * d cos(u,v)/du = v/(|u||v|) − cos·u/|u|².
    */
  private[graft] def contrastiveStep(p: AttnParams, g: AttnParams,
                                     w2v: Map[String, Array[Float]],
                                     seqs: Array[Array[String]],
                                     idx: Seq[Int]): Double = {
    val b = idx.length
    val qToks = idx.map(i => dropView(seqs(i).toSeq)).toArray
    val dToks = idx.map(i => seqs(i).toSeq).toArray
    val qFwd = qToks.map(t => fwd(p, biInput(p, w2v, t)))
    val dFwd = dToks.map(t => fwd(p, biInput(p, w2v, t)))
    val eQ = qFwd.map(_.pooled); val eD = dFwd.map(_.pooled)
    val nQ = eQ.map(norm); val nD = eD.map(norm)
    val cosM = Array.tabulate(b, b) { (i, j) =>
      var s = 0.0; var k = 0
      while (k < Dim) { s += eQ(i)(k) * eD(j)(k); k += 1 }
      s / (nQ(i) * nD(j))
    }
    // row softmax (queries over docs) + column softmax (docs over queries)
    def softmax(row: Array[Double]): Array[Double] = {
      val mx = row.max
      val ex = row.map(v => StrictMath.exp(v - mx))
      val s = ex.sum
      ex.map(_ / s)
    }
    val pRow = Array.tabulate(b)(i => softmax(Array.tabulate(b)(j => cosM(i)(j) / Tau)))
    val pCol = Array.tabulate(b)(j => softmax(Array.tabulate(b)(i => cosM(i)(j) / Tau)))
    var loss = 0.0
    for (i <- 0 until b) {
      loss += -StrictMath.log(math.max(pRow(i)(i), 1e-300)) / (2.0 * b)
      loss += -StrictMath.log(math.max(pCol(i)(i), 1e-300)) / (2.0 * b)
    }
    val dCos = Array.tabulate(b, b) { (i, j) =>
      val dlt = if (i == j) 1.0 else 0.0
      ((pRow(i)(j) - dlt) + (pCol(j)(i) - dlt)) / (2.0 * b) / Tau
    }
    val dEQ = Array.tabulate(b, Dim) { (i, k) =>
      var acc = 0.0; var j = 0
      while (j < b) {
        acc += dCos(i)(j) * (eD(j)(k) / (nQ(i) * nD(j)) - cosM(i)(j) * eQ(i)(k) / (nQ(i) * nQ(i)))
        j += 1
      }
      acc
    }
    val dED = Array.tabulate(b, Dim) { (j, k) =>
      var acc = 0.0; var i = 0
      while (i < b) {
        acc += dCos(i)(j) * (eQ(i)(k) / (nQ(i) * nD(j)) - cosM(i)(j) * eD(j)(k) / (nD(j) * nD(j)))
        i += 1
      }
      acc
    }
    for (i <- 0 until b) {
      val dxQ = bwd(p, g, qFwd(i), dEQ(i))
      for (pos <- dxQ.indices; k <- 0 until Dim) g.pe(pos)(k) += dxQ(pos)(k)
      val dxD = bwd(p, g, dFwd(i), dED(i))
      for (pos <- dxD.indices; k <- 0 until Dim) g.pe(pos)(k) += dxD(pos)(k)
    }
    loss
  }

  /** One phase-2 step: logistic loss on (query-view, doc-half) pairs —
    * per anchor one positive (its own doc) and two in-batch negatives.
    * Gradients accumulate into `g` for EVERY tensor; the caller masks
    * the update to segA/segB/wh (blocks and positions stay frozen).
    */
  private[graft] def crossStep(p: AttnParams, g: AttnParams,
                               w2v: Map[String, Array[Float]],
                               seqs: Array[Array[String]],
                               idx: Seq[Int]): Double = {
    val b = idx.length
    val qh = idx.map(i => dropView(seqs(i).toSeq).take(QTokens)).toArray
    val dh = idx.map(i => seqs(i).toSeq.take(MaxPos - QTokens)).toArray
    val pairs = (0 until b).flatMap(i =>
      Seq((i, i, 1.0), (i, (i + 1) % b, 0.0), (i, (i + 2) % b, 0.0)))
    val nPairs = pairs.length
    var loss = 0.0
    pairs.foreach { case (qi, di, y) =>
      val fw = fwd(p, crossInput(p, w2v, qh(qi), dh(di)))
      var score = 0.0
      var k = 0
      while (k < Dim) { score += fw.pooled(k) * p.wh(k); k += 1 }
      val sig = 1.0 / (1.0 + StrictMath.exp(-score))
      loss += -(y * StrictMath.log(math.max(sig, 1e-300)) +
        (1 - y) * StrictMath.log(math.max(1 - sig, 1e-300))) / nPairs
      val dScore = (sig - y) / nPairs
      val dPooled = new Array[Double](Dim)
      k = 0
      while (k < Dim) {
        g.wh(k) += dScore * fw.pooled(k)
        dPooled(k) = dScore * p.wh(k)
        k += 1
      }
      val dx = bwd(p, g, fw, dPooled)
      val nq = qh(qi).length
      for (pos <- dx.indices; k <- 0 until Dim) {
        g.pe(pos)(k) += dx(pos)(k)
        if (pos < nq) g.segA(k) += dx(pos)(k) else g.segB(k) += dx(pos)(k)
      }
    }
    loss
  }

  // --- training loop -------------------------------------------------------

  /** Train from the seeded init over the dir's corpus sample. Pure
    * driver-side JVM, fully deterministic.
    */
  private[graft] def train(s: SparkSession, dir: String,
                           w2v: Map[String, Array[Float]]): AttnParams =
    trainSteps(s, dir, w2v, Steps1, Steps2)

  /** [[train]] with explicit step counts — the spec's hook for pinning
    * bitwise retrain determinism on a short schedule (the full schedule
    * is the same loop, just longer).
    */
  private[graft] def trainSteps(s: SparkSession, dir: String,
                                w2v: Map[String, Array[Float]],
                                steps1: Int, steps2: Int): AttnParams = {
    val (seqs, _) = tokenWindows(s, dir, w2v)
    val p = AttentionEncoder.seedParams()
    val pr = rows(p)
    val nRows = pr.length
    val allMask = (_: Int) => true
    val headMask = (i: Int) => i >= nRows - 3
    def batchIdx(step: Int): Seq[Int] =
      (0 until math.min(Batch, seqs.length)).map(b => (step * Batch + b) % seqs.length)
    val debug = sys.props.contains("graft.attn.debug")
    val adam1 = new AdamState(pr)
    for (step <- 0 until steps1) {
      val g = zeroParams()
      val l = contrastiveStep(p, g, w2v, seqs, batchIdx(step))
      val gr = rows(g)
      clipGrads(gr, allMask)
      adam1.step(pr, gr, allMask, step + 1, Lr)
      if (debug && step % 25 == 0) println(s"attn p1 step=$step loss=$l")
    }
    val adam2 = new AdamState(pr)
    for (step <- 0 until steps2) {
      val g = zeroParams()
      val l = crossStep(p, g, w2v, seqs, batchIdx(step))
      val gr = rows(g)
      clipGrads(gr, headMask)
      adam2.step(pr, gr, headMask, step + 1, Lr2)
      if (debug && step % 25 == 0) println(s"attn p2 step=$step loss=$l")
    }
    p
  }

  // --- persistence (train → parquet artifact → reload → serve) -------------

  private def tensorRows(p: AttnParams): Seq[(String, Int, Int, Double)] = {
    def m(name: String, t: Array[Array[Double]]) =
      for (r <- t.indices; c <- t(r).indices) yield (name, r, c, t(r)(c))
    def v(name: String, t: Array[Double]) =
      t.indices.map(c => (name, 0, c, t(c)))
    def layer(tag: String, l: LayerParams) =
      m(s"${tag}_wq", l.wq) ++ m(s"${tag}_wk", l.wk) ++ m(s"${tag}_wv", l.wv) ++
        m(s"${tag}_wo", l.wo) ++ m(s"${tag}_w1", l.w1) ++ m(s"${tag}_w2", l.w2) ++
        v(s"${tag}_g1", l.g1) ++ v(s"${tag}_b1", l.b1) ++
        v(s"${tag}_g2", l.g2) ++ v(s"${tag}_b2", l.b2)
    layer("l1", p.l1) ++ layer("l2", p.l2) ++ m("pe", p.pe) ++
      v("segA", p.segA) ++ v("segB", p.segB) ++ v("wh", p.wh)
  }

  private def writeParams(s: SparkSession, p: AttnParams, path: String): Unit = {
    import s.implicits._
    tensorRows(p).toDF("tensor", "r", "c", "w")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Reload the materialized tensors (the collect is the ~4.5k-value
    * parameter table — bounded by the architecture, not the data).
    */
  private def readParams(s: SparkSession, path: String): AttnParams = {
    val p = zeroParams()
    def tensor(name: String): Any = name match {
      case "pe" => p.pe
      case "segA" => p.segA
      case "segB" => p.segB
      case "wh" => p.wh
      case other =>
        val l = if (other.startsWith("l1_")) p.l1 else p.l2
        other.drop(3) match {
          case "wq" => l.wq; case "wk" => l.wk; case "wv" => l.wv
          case "wo" => l.wo; case "w1" => l.w1; case "w2" => l.w2
          case "g1" => l.g1; case "b1" => l.b1; case "g2" => l.g2; case "b2" => l.b2
        }
    }
    s.read.parquet(path).collect().foreach { row =>
      val (name, r, c, w) = (row.getString(0), row.getInt(1), row.getInt(2), row.getDouble(3))
      tensor(name) match {
        case m: Array[Array[Double]] => m(r)(c) = w
        case v: Array[Double] => v(c) = w
      }
    }
    p
  }

  // --- per-dir cache (the Word2VecEmbedder pattern) ------------------------

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, AttnParams]()
  @volatile private var lastDir: Option[String] = None

  /** Train (or reuse the materialized artifact), load, cache per dir.
    * The parquet round-trip IS the point: serving consumes the weight
    * artifact, not the trainer.
    */
  private[graft] def paramsFor(s: SparkSession, dir: String): AttnParams = {
    val p = cache.computeIfAbsent(dir, { d =>
      val w2v = Word2VecEmbedder.weightsFor(s, d)
      val path = IndexCache.getOrBuild("attn_weights", d) { pth =>
        writeParams(s, train(s, d, w2v), pth)
      }
      readParams(s, path)
    })
    lastDir = Some(dir)
    p
  }

  /** The trained params for the MOST RECENTLY queried dir — the
    * literal-tensor source for [[AttentionEncoder.searchOracle]] /
    * [[AttentionEncoder.rerankOracle]]; None (→ loud-failure oracle)
    * only before any training. Keyed off `lastDir` directly (the
    * multi-dir-JVM rule, see [[Word2VecEmbedder.cachedWeights]]).
    */
  private[graft] def cachedParams: Option[AttnParams] =
    lastDir.flatMap(d => Option(cache.get(d)))

  // --- held-out evaluation (the trained-vs-seeded quality gate) ------------

  /** Hit-rate@k of sparse-view self-retrieval over held-out windows:
    * query i = [[keepView]] of window i (≈1/3 token overlap, positions
    * shifted), corpus = the full windows, SERVING arithmetic
    * ([[AttentionEncoder.encodeToks]] — float edge included). The
    * "golden label" of query i is document i.
    */
  private[graft] def hitRateAtK(p: AttnParams, w2v: Map[String, Array[Float]],
                                seqs: Array[Array[String]], k: Int): Double = {
    val corpus = seqs.map(t => AttentionEncoder.encodeToks(p, w2v, t.toSeq))
    var hits = 0
    for (i <- seqs.indices) {
      val q = AttentionEncoder.encodeToks(p, w2v, keepView(seqs(i).toSeq))
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var s = 0.0; var na = 0.0; var nb = 0.0; var kk = 0
        while (kk < Dim) { s += a(kk) * b(kk); na += a(kk) * a(kk); nb += b(kk) * b(kk); kk += 1 }
        s / math.max(math.sqrt(na) * math.sqrt(nb), 1e-12)
      }
      val top = corpus.zipWithIndex.map { case (e, j) => (cos(q, e), j) }
        .sortBy { case (sc, j) => (-sc, j) }.take(k)
      if (top.exists(_._2 == i)) hits += 1
    }
    hits.toDouble / seqs.length
  }

  /** Pairwise accuracy of the cross-encoder on held-out windows:
    * score(query-view i, doc-half i) should beat score(query-view i,
    * doc-half i+1) — SERVING arithmetic ([[AttentionEncoder.crossScoreToks]]).
    */
  private[graft] def crossPairAccuracy(p: AttnParams, w2v: Map[String, Array[Float]],
                                       seqs: Array[Array[String]]): Double = {
    var correct = 0
    val n = seqs.length
    for (i <- 0 until n) {
      val qh = dropView(seqs(i).toSeq).take(QTokens)
      val pos = AttentionEncoder.crossScoreToks(p, w2v, qh, seqs(i).toSeq.take(MaxPos - QTokens))
      val neg = AttentionEncoder.crossScoreToks(p, w2v, qh, seqs((i + 1) % n).toSeq.take(MaxPos - QTokens))
      if (pos > neg) correct += 1
    }
    correct.toDouble / n
  }
}
