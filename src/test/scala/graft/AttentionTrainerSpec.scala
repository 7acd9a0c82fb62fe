package graft

import graft.operators.{AttentionEncoder, AttentionTrainer, Word2VecEmbedder}

/** Pins the trainer's analytic backprop against central finite
  * differences (the only ground truth for hand-written gradients), and
  * the trained-vs-seeded quality gates on held-out documents.
  */
class AttentionTrainerSpec extends SparkSpec {

  private lazy val w = Word2VecEmbedder.weightsFor(spark, TestSpark.Sf0001)
  private lazy val windows = AttentionTrainer.tokenWindows(spark, TestSpark.Sf0001, w)
  private lazy val trainSeqs = windows._1
  private lazy val heldSeqs = windows._2

  /** Relative error robust to tiny magnitudes. */
  private def relErr(a: Double, b: Double): Double =
    math.abs(a - b) / math.max(1e-7, math.abs(a) + math.abs(b))

  /** Central finite difference of `loss` w.r.t. one coordinate accessed
    * through (get, set).
    */
  private def fd(get: => Double, set: Double => Unit, loss: () => Double): Double = {
    val h = 1e-6
    val x0 = get
    set(x0 + h); val lp = loss()
    set(x0 - h); val lm = loss()
    set(x0)
    (lp - lm) / (2 * h)
  }

  test("contrastive-step gradients match finite differences on every tensor kind") {
    val p = AttentionEncoder.seedParams()
    val idx = 0 until 4
    def loss(): Double =
      AttentionTrainer.contrastiveStep(p, AttentionTrainer.zeroParams(), w, trainSeqs, idx)
    val g = AttentionTrainer.zeroParams()
    AttentionTrainer.contrastiveStep(p, g, w, trainSeqs, idx)
    // one probe per tensor kind, off-diagonal coordinates, both layers
    val probes: Seq[(String, () => Double, Double => Unit, () => Double)] = Seq(
      ("l1.wq", () => p.l1.wq(0)(3), v => p.l1.wq(0)(3) = v, () => g.l1.wq(0)(3)),
      ("l1.wk", () => p.l1.wk(5)(1), v => p.l1.wk(5)(1) = v, () => g.l1.wk(5)(1)),
      ("l1.wv", () => p.l1.wv(2)(9), v => p.l1.wv(2)(9) = v, () => g.l1.wv(2)(9)),
      ("l1.wo", () => p.l1.wo(7)(0), v => p.l1.wo(7)(0) = v, () => g.l1.wo(7)(0)),
      ("l1.w1", () => p.l1.w1(4)(20), v => p.l1.w1(4)(20) = v, () => g.l1.w1(4)(20)),
      ("l1.w2", () => p.l1.w2(17)(6), v => p.l1.w2(17)(6) = v, () => g.l1.w2(17)(6)),
      ("l1.g1", () => p.l1.g1(8), v => p.l1.g1(8) = v, () => g.l1.g1(8)),
      ("l1.b1", () => p.l1.b1(11), v => p.l1.b1(11) = v, () => g.l1.b1(11)),
      ("l1.g2", () => p.l1.g2(3), v => p.l1.g2(3) = v, () => g.l1.g2(3)),
      ("l1.b2", () => p.l1.b2(0), v => p.l1.b2(0) = v, () => g.l1.b2(0)),
      ("l2.wq", () => p.l2.wq(9)(9), v => p.l2.wq(9)(9) = v, () => g.l2.wq(9)(9)),
      ("l2.wk", () => p.l2.wk(0)(15), v => p.l2.wk(0)(15) = v, () => g.l2.wk(0)(15)),
      ("l2.wv", () => p.l2.wv(12)(4), v => p.l2.wv(12)(4) = v, () => g.l2.wv(12)(4)),
      ("l2.wo", () => p.l2.wo(6)(13), v => p.l2.wo(6)(13) = v, () => g.l2.wo(6)(13)),
      ("l2.w1", () => p.l2.w1(15)(0), v => p.l2.w1(15)(0) = v, () => g.l2.w1(15)(0)),
      ("l2.w2", () => p.l2.w2(31)(15), v => p.l2.w2(31)(15) = v, () => g.l2.w2(31)(15)),
      ("l2.g2", () => p.l2.g2(14), v => p.l2.g2(14) = v, () => g.l2.g2(14)),
      ("pe00", () => p.pe(0)(0), v => p.pe(0)(0) = v, () => g.pe(0)(0)),
      ("pe52", () => p.pe(5)(2), v => p.pe(5)(2) = v, () => g.pe(5)(2)))
    probes.foreach { case (name, get, set, grad) =>
      val numeric = fd(get(), set, () => loss())
      val analytic = grad()
      assert(relErr(analytic, numeric) < 1e-3,
        s"$name: analytic=$analytic numeric=$numeric")
    }
  }

  test("cross-step gradients match finite differences (head, segments, and frozen tensors)") {
    val p = AttentionEncoder.seedParams()
    val idx = 0 until 4
    def loss(): Double =
      AttentionTrainer.crossStep(p, AttentionTrainer.zeroParams(), w, trainSeqs, idx)
    val g = AttentionTrainer.zeroParams()
    AttentionTrainer.crossStep(p, g, w, trainSeqs, idx)
    val probes: Seq[(String, () => Double, Double => Unit, () => Double)] = Seq(
      ("wh", () => p.wh(0), v => p.wh(0) = v, () => g.wh(0)),
      ("wh9", () => p.wh(9), v => p.wh(9) = v, () => g.wh(9)),
      ("segA", () => p.segA(4), v => p.segA(4) = v, () => g.segA(4)),
      ("segB", () => p.segB(7), v => p.segB(7) = v, () => g.segB(7)),
      // backprop THROUGH the frozen blocks still has to be right — the
      // segment gradients flow through them
      ("pe", () => p.pe(2)(6), v => p.pe(2)(6) = v, () => g.pe(2)(6)),
      ("l1.wq", () => p.l1.wq(1)(2), v => p.l1.wq(1)(2) = v, () => g.l1.wq(1)(2)))
    probes.foreach { case (name, get, set, grad) =>
      val numeric = fd(get(), set, () => loss())
      val analytic = grad()
      assert(relErr(analytic, numeric) < 1e-3,
        s"$name: analytic=$analytic numeric=$numeric")
    }
  }

  test("training improves held-out sparse-view retrieval over the seeded init") {
    val trained = AttentionTrainer.paramsFor(spark, TestSpark.Sf0001)
    val k = 10
    val seeded = AttentionTrainer.hitRateAtK(AttentionEncoder.SeedParams, w, heldSeqs, k)
    val tuned = AttentionTrainer.hitRateAtK(trained, w, heldSeqs, k)
    info(s"held-out hit-rate@$k: seeded=$seeded trained=$tuned (n=${heldSeqs.length})")
    assert(tuned >= seeded,
      s"trained hit-rate@$k $tuned must be >= seeded $seeded")
  }

  test("training improves held-out cross-encoder pairwise accuracy over the seeded init") {
    val trained = AttentionTrainer.paramsFor(spark, TestSpark.Sf0001)
    val seeded = AttentionTrainer.crossPairAccuracy(AttentionEncoder.SeedParams, w, heldSeqs)
    val tuned = AttentionTrainer.crossPairAccuracy(trained, w, heldSeqs)
    info(s"held-out pairwise accuracy: seeded=$seeded trained=$tuned (n=${heldSeqs.length})")
    assert(tuned >= seeded,
      s"trained pairwise accuracy $tuned must be >= seeded $seeded")
  }

  test("training is bitwise deterministic: two runs of the same schedule produce identical tensors") {
    // short schedule — the full run is the same loop, just longer; two
    // independent trainings (fresh seeded init, fresh Adam state each)
    // must agree on EVERY double, which is what lets the per-dir weight
    // artifact stand in for the trainer across JVMs
    val a = AttentionTrainer.trainSteps(spark, TestSpark.Sf0001, w, 8, 8)
    val b = AttentionTrainer.trainSteps(spark, TestSpark.Sf0001, w, 8, 8)
    def rowsOf(p: graft.operators.AttentionEncoder.AttnParams): Seq[Array[Double]] =
      Seq(p.pe(0), p.pe(11), p.segA, p.segB, p.wh,
        p.l1.wq(0), p.l1.w2(31), p.l1.g2, p.l2.wk(7), p.l2.b1)
    rowsOf(a).zip(rowsOf(b)).zipWithIndex.foreach { case ((ra, rb), i) =>
      assert(ra.sameElements(rb), s"tensor row $i diverged between trainings")
    }
    // and the short schedule actually moved the params (it trained)
    assert(!a.pe(0).sameElements(graft.operators.AttentionEncoder.SeedParams.pe(0)))
  }

  test("the served params are the parquet artifact, bit-for-bit") {
    // paramsFor returns the RELOADED artifact; a second in-JVM load must
    // reproduce it exactly (double fidelity through parquet)
    val a = AttentionTrainer.paramsFor(spark, TestSpark.Sf0001)
    val b = AttentionTrainer.paramsFor(spark, TestSpark.Sf0001)
    assert(a eq b) // cached
    // and training moved the tensors away from the seed (it really trained)
    val s = AttentionEncoder.SeedParams
    assert(!a.pe(0).sameElements(s.pe(0)))
    assert(!a.wh.sameElements(s.wh))
    assert(!a.l1.wq(0).sameElements(s.l1.wq(0)))
  }
}
