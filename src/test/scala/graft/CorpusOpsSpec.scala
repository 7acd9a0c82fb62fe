package graft

import graft.operators.{CorpusOps, Events}
import graft.sources.Tables
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("temperature mix matches an independent JVM replay of rates and lottery") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val rows = docs.select("doc_id", "lang").as[(Long, String)].collect()
    // rate derivation in pure Scala: e_i = N / (sqrt(n_i) * sum_j sqrt(n_j)),
    // langs folded in sorted order (the operator's pinned accumulation)
    val counts = rows.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    var ssum = 0.0; var ntot = 0.0
    counts.keys.toSeq.sorted.foreach { l => ssum += math.sqrt(counts(l)); ntot += counts(l) }
    val rate = counts.map { case (l, n) => l -> ntot / (math.sqrt(n) * ssum) }
    def lottery(docId: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"mixt:$docId".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % 10000).toDouble / 10000.0
    }
    val expected = rows.flatMap { case (id, l) =>
      val w = rate(l)
      val n = math.floor(w).toInt + (if (lottery(id) < w - math.floor(w)) 1 else 0)
      (1 to n).map(i => (id, l,
        BigDecimal(w).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, i))
    }.sortBy(r => (r._1, r._4)).toSeq
    val got = CorpusOps.mixTemperature(docs)
      .as[(Long, String, Double, Int)].collect().toSeq
    assert(got == expected)
  }

  test("temperature mix: rarer sources get strictly higher epochs, corpus size preserved in expectation") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val n = docs.count()
    val byLang = CorpusOps.mixTemperature(docs)
      .groupBy("lang").agg(first("epoch").as("epoch"), count(lit(1)).as("out"))
      .join(docs.groupBy("lang").agg(count(lit(1)).as("src")), "lang")
      .select("lang", "epoch", "src", "out")
      .as[(String, Double, Long, Long)].collect()
    // epoch monotone decreasing in source size
    byLang.sortBy(_._3).map(_._2).toSeq.sliding(2).foreach { p =>
      if (p.length == 2) assert(p(0) >= p(1))
    }
    // sum(n_i * e_i) = N by construction; emitted within lottery slack
    val out = byLang.map(_._4).sum
    assert(math.abs(out - n) <= byLang.length * 50)
  }

  test("mix upsamples by floor(w) or floor(w)+1 copies and keys them") {
    val docs = Tables.documents(spark, dir)
    val out = CorpusOps.mix(docs)
    val perDoc = out.groupBy("doc_id", "lang").agg(count(lit(1)).as("n"),
      max("copy_idx").as("max_idx"))
    // copies are 1..n (copy_idx keys the repeats densely)
    assert(perDoc.filter(col("n") =!= col("max_idx")).count() == 0)
    val byLang = perDoc.groupBy("lang")
      .agg(min("n").as("lo"), max("n").as("hi")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val w = CorpusOps.MixWeights.toMap
    byLang.foreach { case (l, (lo, hi)) =>
      assert(lo >= math.floor(w(l)).toLong.max(1L) &&
        hi <= math.ceil(w(l)).toLong,
        s"$l copies in [$lo,$hi] outside [floor,ceil] of ${w(l)}")
    }
  }

  test("mix is deterministic under repartitioning (no RNG state)") {
    val docs = Tables.documents(spark, dir)
    val a = CorpusOps.mix(docs).collect().toSeq
    val b = CorpusOps.mix(docs.repartition(13)).collect().toSeq
    assert(a == b)
  }

  test("mix downsampling hits the target rate within lottery tolerance") {
    val docs = Tables.documents(spark, dir)
    val n = docs.filter(col("lang") === "zh").count().toDouble
    val kept = CorpusOps.mix(docs).filter(col("lang") === "zh").count().toDouble
    // w=0.25: binomial(n, .25) — loose 5-sigma band, deterministic draw
    val sigma = math.sqrt(n * 0.25 * 0.75)
    assert(math.abs(kept - 0.25 * n) <= 5 * sigma + 1)
  }

  test("split covers every doc once, deterministically, roughly 98/1/1") {
    val docs = Tables.documents(spark, dir)
    val out = CorpusOps.split(docs)
    assert(out.count() == docs.count())
    assert(out.filter(col("split").isNull).count() == 0)
    assert(CorpusOps.split(docs.repartition(7)).collect().toSeq ==
      out.collect().toSeq)
    val n = docs.count().toDouble
    val train = out.filter(col("split") === "train").count().toDouble
    val sigma = math.sqrt(n * 0.98 * 0.02)
    assert(math.abs(train - 0.98 * n) <= 5 * sigma + 1)
  }

  test("shuffle shards: covers every doc once, positions dense, deterministic") {
    val docs = Tables.documents(spark, dir)
    val out = CorpusOps.shuffleShards(docs)
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
    // positions are 1..n within each shard (dense, no gaps)
    val perShard = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
    assert(perShard.filter(col("n") =!= col("mx") || col("mn") =!= 1).count() == 0)
    // deterministic under repartitioning — no RNG state
    assert(CorpusOps.shuffleShards(docs.repartition(11)).collect().toSeq ==
      out.collect().toSeq)
  }

  test("shuffle shards: order is genuinely shuffled and shards balanced") {
    val docs = Tables.documents(spark, dir)
    val out = CorpusOps.shuffleShards(docs)
    // within a shard, doc_ids must NOT be in sorted order (else it's not a
    // shuffle): count order inversions in shard 0's position sequence
    val seq0 = out.filter(col("shard") === 0).orderBy("pos")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val inversions = seq0.sliding(2).count { case Seq(a, b) => a > b; case _ => false }
    assert(inversions > seq0.length / 10, s"only $inversions inversions in ${seq0.length}")
    // shard sizes within 5 sigma of uniform
    val n = docs.count().toDouble
    val p = 1.0 / CorpusOps.NumShards
    val sigma = math.sqrt(n * p * (1 - p))
    val sizes = out.groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.length == CorpusOps.NumShards)
    sizes.foreach(s => assert(math.abs(s - n * p) <= 5 * sigma + 1))
  }

  test("snapshot diff: every stride lands in its class, union covers both versions") {
    val out = CorpusOps.qDiff(spark, dir).cache()
    val byStatus = out.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Set("added", "removed", "changed", "unchanged")
      .subsetOf(byStatus.keySet))
    // classes follow the carving strides exactly
    val docs = Tables.documents(spark, dir)
    val nAdded = docs.filter(col("doc_id") % CorpusOps.DiffAddStride === 5 &&
      col("doc_id") % CorpusOps.DiffRemoveStride =!= 3).count()
    val nRemoved = docs.filter(col("doc_id") % CorpusOps.DiffRemoveStride === 3 &&
      col("doc_id") % CorpusOps.DiffAddStride =!= 5).count()
    assert(byStatus("added") == nAdded)
    assert(byStatus("removed") == nRemoved)
    // every doc of either version appears exactly once
    assert(out.count() == docs.filter(
      col("doc_id") % CorpusOps.DiffRemoveStride =!= 3 ||
        col("doc_id") % CorpusOps.DiffAddStride =!= 5).count())
    out.unpersist()
  }

  test("dsir importance sample is invariant under repartitioning") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val (t, r) = CorpusOps.dsirTotals(docs)
    val base = CorpusOps.importanceSample(docs, t, r).collect().toSeq
    // no RNG state: hash-seeded Gumbel noise → identical draw on any layout
    val shuffled = CorpusOps.importanceSample(docs.repartition(7), t, r).collect().toSeq
    assert(base.map(_.toString) == shuffled.map(_.toString))
    // the one-pass served form (LM artifact + single scoring pass) is
    // bitwise-identical to the fully-inline derivation
    val lm = CorpusOps.dsirLmFit(docs)
    assert((lm.map(_._2).sum, lm.map(_._3).sum) == ((t, r)))
    val served = CorpusOps.importanceSampleServed(docs, lm).collect().toSeq
    assert(base.map(_.toString) == served.map(_.toString))
    // structure: dense ranks, target source excluded, k rows
    assert(base.map(_.getAs[Int]("rn")).toSeq == (1 to base.length))
    assert(base.forall(_.getAs[String]("source") != CorpusOps.DsirTarget))
    assert(base.length == math.min(CorpusOps.DsirK,
      docs.filter(col("source") =!= CorpusOps.DsirTarget).count()).toInt)
  }

  test("bpe train is invariant under repartitioning") {
    import graft.operators.TextAnalysis
    val docs = Tables.documents(spark, dir)
    val base = TextAnalysis.bpeTrain(docs).collect().map(_.toString).toSeq
    // integer pair counts + lexicographic tie-break → layout-independent argmax
    val shuffled = TextAnalysis.bpeTrain(docs.repartition(7)).collect().map(_.toString).toSeq
    assert(base == shuffled)
    assert(base.nonEmpty)
  }

  test("quantiles are monotone and approx_percentile tracks exact at scale") {
    val docs = Tables.documents(spark, dir)
    val exact = CorpusOps.quantiles(docs).collect()
    exact.foreach { r =>
      val Seq(p25, p50, p75, p95) =
        Seq("p25", "p50", "p75", "p95").map(r.getAs[Double])
      assert(p25 <= p50 && p50 <= p75 && p75 <= p95)
    }
    // the 100 TB swap-in: sketch agg within 5% of the exact per-group sort
    val approx = docs.groupBy("lang").agg(
      expr("approx_percentile(n_chars, 0.5, 10000)").as("a50")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("a50")).toMap
    exact.foreach { r =>
      val rel = math.abs(approx(r.getAs[String]("lang")) - r.getAs[Double]("p50")) /
        r.getAs[Double]("p50")
      assert(rel <= 0.05, s"approx p50 off by ${rel * 100}%")
    }
  }

  test("asof join: no future leakage, self-match at purchase time") {
    val out = Events.asofLastPurchase(spark, dir).cache()
    assert(out.filter(col("last_purchase_ts") > col("ts_s")).count() == 0)
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"))
    val joined = out.join(ev, "event_id")
    // a purchase event's nearest at-or-before purchase is itself
    assert(joined.filter(col("event_type") === "purchase" &&
      (col("last_purchase_ts") =!= col("ts_s") || col("last_purchase_ts").isNull))
      .count() == 0)
    // inner as-of: output has no nulls, and the dropped events are
    // exactly those before their user's first purchase
    assert(out.filter(col("last_purchase_ts").isNull).count() == 0)
    val firstPurchase = out.join(ev, "event_id")
      .filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min("ts_s").as("first_p"))
    val all = Tables.events(spark, dir)
      .select(col("event_id"), expr("ts div 1000000000").as("ts_s"), col("user_id"))
    val dropped = all.join(out.select("event_id"), Seq("event_id"), "left_anti")
      .join(firstPurchase, Seq("user_id"), "left")
    assert(dropped.filter(col("first_p").isNotNull && col("ts_s") >= col("first_p"))
      .count() == 0)
    assert(out.count() + dropped.count() == all.count())
    out.unpersist()
  }

  test("cluster sample: per-cluster quota in hash order, argmin assignment") {
    val dir = TestSpark.Sf0001
    val embs = Tables.embeddings(spark, dir)
    val cents = CorpusOps.clusterCentroids(spark, dir)
    assert(cents.size == CorpusOps.ClusterK && cents.forall(_.size == 64))
    val per = 10
    val out = CorpusOps.clusterSample(embs, cents, per = per).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    // quota + dense ranks per cluster
    out.groupBy(_._1).foreach { case (_, rows) =>
      val rns = rows.map(_._2).sorted.toSeq
      assert(rns == (1 to rows.size) && rows.size <= per)
    }
    // assignment = brute-force argmin over the captured centroids,
    // lottery order = (hash, vec_id) — replicated independently
    val byVec = embs.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble)).toMap
    def argmin(v: Seq[Double]): Int =
      cents.zipWithIndex.map { case (c, i) =>
        (v.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, i)
      }.min._2
    def u(id: Long): BigInt = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"cs:$id".getBytes("UTF-8"))
      BigInt(1, md).toString(16).reverse.padTo(32, '0').reverse.take(15)
        .foldLeft(BigInt(0))((a, ch) => a * 16 + Integer.parseInt(ch.toString, 16)) % BigInt("1000000000000")
    }
    val want = byVec.keys.toSeq
      .map(id => (argmin(byVec(id)), u(id), id))
      .groupBy(_._1).flatMap { case (c, rows) =>
        rows.sortBy(r => (r._2, r._3)).take(per).zipWithIndex
          .map { case ((_, _, id), i) => (c, i + 1, id) }
      }.toSet
    assert(out.toSet == want && out.nonEmpty)
  }
}
