package graft.operators

import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-composition operators for training-data assembly: weighted
  * source mixing (up/down-sampling to a target language/domain mixture)
  * and per-group length-distribution quantiles (the knobs a pretraining
  * data recipe is written in).
  */
object CorpusOps {

  // --- weighted corpus mixing ---------------------------------------------

  /** Target mixture: epochs per language — >1 upsamples (integer repeats
    * + a deterministic fractional lottery), <1 downsamples. The classic
    * data-recipe rebalance (cf. the sampling weights tables in the LLaMA /
    * Gopher training-mix descriptions).
    */
  val MixWeights: Seq[(String, Double)] = Seq(
    "en" -> 2.25, "de" -> 1.0, "fr" -> 0.5, "es" -> 0.5, "zh" -> 0.25)

  /** Each doc emits `floor(w)` copies plus one more iff its hash-lottery
    * draw falls under frac(w). Determinism: the draw is a portable md5
    * hash of the doc_id (stable under repartitioning, reshuffling, and
    * engine — same rows come out in Spark and DuckDB; no RNG state, so a
    * retry or a 1000-executor run picks the identical sample). `copy_idx`
    * keys the repeats so downstream packing/shuffling can treat copies as
    * distinct rows. Map-side only: no shuffle at all until the output
    * ordering (which real pipelines drop).
    */
  def mix(docs: DataFrame, weights: Seq[(String, Double)] = MixWeights): DataFrame = {
    val w: Column = weights.foldRight(lit(0.0)) { case ((l, wt), acc) =>
      when(col("lang") === l, lit(wt)).otherwise(acc)
    }
    val u = (portableHash(concat(lit("mix:"), col("doc_id"))) % 10000)
      .cast("double") / 10000.0
    docs.select(col("doc_id"), col("lang"), w.as("w"), u.as("u"))
      .withColumn("n_copies",
        (floor(col("w")) + when(col("u") < col("w") - floor(col("w")), 1)
          .otherwise(0)).cast("int"))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(1), col("n_copies"))).as("copy_idx"))
      .orderBy("doc_id", "copy_idx")
  }

  def mixOracle(weights: Seq[(String, Double)] = MixWeights): String = {
    val cases = weights.map { case (l, wt) => s"WHEN '$l' THEN $wt" }.mkString(" ")
    s"""WITH weighted AS (
       |  SELECT doc_id, lang,
       |    CASE lang $cases ELSE 0.0 END AS w,
       |    CAST(CAST('0x' || substring(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000 AS DOUBLE) / 10000.0 AS u
       |  FROM documents),
       |counted AS (
       |  SELECT doc_id, lang,
       |    CAST(floor(w) + CASE WHEN u < w - floor(w) THEN 1 ELSE 0 END AS INT) AS n
       |  FROM weighted)
       |SELECT doc_id, lang, CAST(unnest(range(1, n + 1)) AS INT) AS copy_idx
       |FROM counted WHERE n > 0
       |ORDER BY doc_id, copy_idx""".stripMargin
  }

  /** TEMPERATURE-smoothed source mixing — the data-DERIVED epoch recipe
    * ([[mix]] takes its epochs as given): sample languages with
    * probability ∝ (n_i/N)^α, the multilingual rebalance published with
    * mT5 (arXiv:2010.11934 §3.2) and XLM-R — rare languages upsample,
    * dominant ones downsample, corpus size is preserved in expectation.
    *
    * The exponent is FIXED at α = 1/2 (the temperature T=2 point of the
    * published family): sqrt is IEEE-correctly-rounded in both engines
    * where pow() is not, so the whole rate derivation — q_i =
    * √n_i / Σ_j √n_j, epoch e_i = N·q_i/n_i = N/(√n_i·Σ_j √n_j) —
    * replays BITWISE in DuckDB. The Σ over languages folds in sorted
    * lang order (pinned floating accumulation); emission is [[mix]]'s
    * map-side integer-repeats + md5 hash-lottery (its own salt), and
    * the rounded epoch rides along so the oracle checks the derivation
    * itself, not just membership.
    *
    * Scale: one tiny groupBy(lang) aggregate (|langs| rows), a 1-row
    * normalizer, a broadcast rate join, then a pure map — no
    * corpus-sized shuffle anywhere.
    */
  def mixTemperature(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy("lang").agg(count(lit(1)).cast("double").as("n"))
    val tot = counts.agg(collect_list(struct(col("lang"), col("n"))).as("xs"))
      .select(
        aggregate(transform(array_sort(col("xs")), x => sqrt(x.getField("n"))),
          lit(0.0), (a, x) => a + x).as("ssum"),
        aggregate(transform(array_sort(col("xs")), x => x.getField("n")),
          lit(0.0), (a, x) => a + x).as("ntot"))
    val rates = counts.join(broadcast(tot))
      .select(col("lang"), (col("ntot") / (sqrt(col("n")) * col("ssum"))).as("w"))
    val u = (portableHash(concat(lit("mixt:"), col("doc_id"))) % 10000)
      .cast("double") / 10000.0
    docs.join(broadcast(rates), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("w"), u.as("u"))
      .withColumn("n_copies",
        (floor(col("w")) + when(col("u") < col("w") - floor(col("w")), 1)
          .otherwise(0)).cast("int"))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("lang"), round(col("w"), 6).as("epoch"),
        explode(sequence(lit(1), col("n_copies"))).as("copy_idx"))
      .orderBy("doc_id", "copy_idx")
  }

  val mixTemperatureOracle: String =
    """WITH counts AS (
      |  SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM documents GROUP BY lang),
      |tot AS (
      |  SELECT sum(sqrt(n) ORDER BY lang) AS ssum, sum(n ORDER BY lang) AS ntot
      |  FROM counts),
      |rates AS (SELECT lang, ntot / (sqrt(n) * ssum) AS w FROM counts, tot),
      |weighted AS (
      |  SELECT doc_id, lang, w,
      |    CAST(CAST('0x' || substring(md5('mixt:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000 AS DOUBLE) / 10000.0 AS u
      |  FROM documents JOIN rates USING (lang)),
      |counted AS (
      |  SELECT doc_id, lang, w,
      |    CAST(floor(w) + CASE WHEN u < w - floor(w) THEN 1 ELSE 0 END AS INT) AS nc
      |  FROM weighted)
      |SELECT doc_id, lang, round(w, 6) AS epoch,
      |  CAST(unnest(range(1, nc + 1)) AS INT) AS copy_idx
      |FROM counted WHERE nc > 0
      |ORDER BY doc_id, copy_idx""".stripMargin

  def qMixTemperature(s: SparkSession, dir: String): DataFrame =
    mixTemperature(Tables.documents(s, dir))

  // --- deterministic train/val/test split ---------------------------------

  /** 98/1/1 split boundaries in hash-lottery basis points. */
  val SplitBounds: Seq[(String, Int)] = Seq("train" -> 9800, "val" -> 9900, "test" -> 10000)

  /** Holdout assignment by portable content-keyed hash — stable under
    * repartitioning, appends, and engine (no RNG state, no sampleBy):
    * a doc keeps its split forever, which is what makes eval sets
    * trustworthy across corpus refreshes. Map-side only; the split is
    * uniform within every stratum because the hash is independent of
    * lang/source (spec asserts per-language proportions).
    */
  def split(docs: DataFrame): DataFrame = {
    val u = portableHash(concat(lit("split:"), col("doc_id"))) % 10000
    val splitCol = SplitBounds.foldRight(lit(null).cast("string")) {
      case ((name, hi), acc) => when(u < hi, lit(name)).otherwise(acc)
    }
    docs.select(col("doc_id"), col("lang"), splitCol.as("split"))
      .orderBy("doc_id")
  }

  val splitOracle: String = {
    val cases = SplitBounds.reverse.foldLeft("NULL") { case (acc, (name, hi)) =>
      s"CASE WHEN u < $hi THEN '$name' ELSE $acc END"
    }
    s"""WITH hashed AS (
       |  SELECT doc_id, lang,
       |    CAST('0x' || substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 10000 AS u
       |  FROM documents)
       |SELECT doc_id, lang, $cases AS split
       |FROM hashed
       |ORDER BY doc_id""".stripMargin
  }

  // --- deterministic global shuffle → training shards ---------------------

  val NumShards = 8

  /** Deterministic global shuffle: every doc gets a pseudo-random but
    * content-determined position in one of [[NumShards]] shards — the
    * shuffled-shard layout training data loaders consume. No RNG state:
    * the permutation is the portable-hash order, so a retry, a different
    * partitioning, or another engine produces the identical shard files
    * (and appending new docs doesn't reorder existing ones within their
    * hash neighborhood).
    *
    * Scale design: shard assignment is map-side; the only shuffle is the
    * repartition-by-shard, and the within-shard sort is exactly the sort
    * the shard writer needs anyway (`repartition(shard).sortWithinPartitions`
    * in the write path). No global total order is ever materialized — the
    * hash IS the order, so 100 TB shuffles in one exchange with keyed
    * sorts, never a corpus-wide orderBy.
    */
  def shuffleShards(docs: DataFrame, nShards: Int = NumShards): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = portableHash(concat(lit("shuffle:"), col("doc_id")))
    val w = Window.partitionBy("shard").orderBy("h", "doc_id")
    docs.select(col("doc_id"), h.as("h"))
      .withColumn("shard", (col("h") % nShards).cast("int"))
      .withColumn("pos", row_number().over(w))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("shard", "pos")
  }

  def shuffleShardsOracle(nShards: Int = NumShards): String =
    s"""WITH hashed AS (
       |  SELECT doc_id,
       |    CAST('0x' || substring(md5('shuffle:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
       |  FROM documents)
       |SELECT doc_id, CAST(h % $nShards AS INT) AS shard,
       |  row_number() OVER (PARTITION BY h % $nShards ORDER BY h, doc_id) AS pos
       |FROM hashed
       |ORDER BY shard, pos""".stripMargin

  // --- per-group length quantiles -----------------------------------------

  /** Exact per-language doc-length quantiles (linear interpolation — the
    * same definition as DuckDB's quantile_cont). Exact percentile sorts
    * within each group; at 100 TB swap `percentile` for
    * `approx_percentile(n_chars, array(...), accuracy)` — a sketch
    * aggregation with map-side partial merge, no per-group sort — and
    * keep this exact form as its small-SF oracle (see the spec, which
    * bounds the sketch's error against this query).
    */
  def quantiles(docs: DataFrame): DataFrame =
    docs.groupBy("lang").agg(
      count(lit(1)).as("n_docs"),
      round(expr("percentile(n_chars, 0.25)"), 2).as("p25"),
      round(expr("percentile(n_chars, 0.5)"), 2).as("p50"),
      round(expr("percentile(n_chars, 0.75)"), 2).as("p75"),
      round(expr("percentile(n_chars, 0.95)"), 2).as("p95"))
      .orderBy("lang")

  val quantilesOracle: String =
    """SELECT lang, count(*) AS n_docs,
      |  round(quantile_cont(n_chars, 0.25), 2) AS p25,
      |  round(quantile_cont(n_chars, 0.5), 2) AS p50,
      |  round(quantile_cont(n_chars, 0.75), 2) AS p75,
      |  round(quantile_cont(n_chars, 0.95), 2) AS p95
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  // --- snapshot diff -------------------------------------------------------

  /** Strides carving the two synthetic snapshot views out of the one
    * driver table (so the oracle replays the exact same versions):
    * docs ≡ 5 (mod 17) are missing from the PREVIOUS snapshot (→ added),
    * docs ≡ 3 (mod 29) are missing from the CURRENT one (→ removed),
    * docs ≡ 4 (mod 23) carry perturbed text in the previous snapshot
    * (→ changed).
    */
  val DiffAddStride = 17
  val DiffRemoveStride = 29
  val DiffChangeStride = 23

  /** Corpus snapshot diff — the audit an incremental refresh emits:
    * classify every doc added / removed / changed / unchanged by content
    * fingerprint. Both sides reduce map-side to (doc_id, fingerprint);
    * the diff is ONE keyed full-outer join — at 100 TB the fingerprint
    * columns are a few % of corpus bytes, and id-bucketed snapshot
    * layouts make the join exchange-free ([[graft.sources.Sinks
    * .writeBucketed]]). Downstream: `added ∪ changed` is exactly the
    * batch the incremental dedup probe ([[Dedup.qIncremental]]) and the
    * index appenders consume.
    */
  def snapshotDiff(curr: DataFrame, prev: DataFrame): DataFrame =
    curr.select(col("doc_id"), fingerprint(col("text")).as("fp_new"))
      .join(prev.select(col("doc_id"), fingerprint(col("text")).as("fp_old")),
        Seq("doc_id"), "full")
      .select(col("doc_id"),
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_new") =!= col("fp_old"), "changed")
          .otherwise("unchanged").as("status"))
      .orderBy("doc_id")

  /** The CURRENT snapshot view (shared with [[IndexRefresh]]'s driver
    * queries so engine and oracle agree on the exact same versions).
    */
  private[graft] def currSnapshot(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % DiffRemoveStride =!= 3)

  /** The PREVIOUS snapshot view: added docs absent, changed docs carry
    * the perturbed prior text.
    */
  private[graft] def prevSnapshot(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % DiffAddStride =!= 5)
      .withColumn("text",
        when(col("doc_id") % DiffChangeStride === 4,
          concat(col("text"), lit(" rev1"))).otherwise(col("text")))

  def qDiff(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    snapshotDiff(currSnapshot(docs), prevSnapshot(docs))
  }

  val diffOracle: String =
    s"""WITH curr AS (
       |  SELECT doc_id, md5(array_to_string(${graft.operators.TextAnalysis.sqlToks}, ' ')) AS fp_new
       |  FROM documents WHERE doc_id % $DiffRemoveStride <> 3),
       |prev0 AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % $DiffChangeStride = 4 THEN text || ' rev1' ELSE text END AS text
       |  FROM documents WHERE doc_id % $DiffAddStride <> 5),
       |prev AS (
       |  SELECT doc_id, md5(array_to_string(${graft.operators.TextAnalysis.sqlToks}, ' ')) AS fp_old
       |  FROM prev0)
       |SELECT doc_id,
       |  CASE WHEN fp_old IS NULL THEN 'added'
       |       WHEN fp_new IS NULL THEN 'removed'
       |       WHEN fp_new <> fp_old THEN 'changed'
       |       ELSE 'unchanged' END AS status
       |FROM curr FULL JOIN prev USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  // --- importance resampling (DSIR-style) ----------------------------------

  val DsirTarget = "src0"
  val DsirBuckets = 512
  val DsirK = 50

  /** DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169):
    * pick raw-corpus documents whose hashed-n-gram profile looks like a
    * TARGET domain. Per-bucket unigram models fit on the target source
    * and on the rest of the corpus (add-1 smoothing over the hashed
    * feature space); each raw document's importance weight is the sum
    * over its tokens of the target/raw log-probability ratio; the
    * sample is Gumbel top-k over weight + deterministic hash-seeded
    * Gumbel noise — sampling-without-replacement ∝ exp(weight), fully
    * reproducible (no RNG state, stable under repartitioning).
    *
    * Scale shape: both LM tables are ≤ `buckets` rows (broadcast); the
    * weight pass is the tokenize explode + two broadcast joins + one
    * doc-keyed sum — linear, one shuffle; the final top-k is
    * TakeOrdered, never a global sort.
    */
  /** The two LM normalizers (total target tokens, total raw tokens) —
    * bounded driver scalars, the literal-constants oracle pattern.
    */
  def dsirTotals(docs: DataFrame, target: String = DsirTarget): (Long, Long) = {
    val perSide = docs
      .select((col("source") === target).as("is_t"), explode(tokens(col("text"))).as("t"))
      .groupBy("is_t").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    (perSide.getOrElse(true, 0L), perSide.getOrElse(false, 0L))
  }

  private def dsirBucket(t: Column, buckets: Int): Column =
    pmod(portableHash(t), lit(buckets))

  /** Shared weight+rank tail over per-token rows already joined to the
    * LM counts: `joined(doc_id, source, ct, cr)` with nullable counts.
    */
  private def dsirTail(joined: DataFrame, tTot: Long, rTot: Long,
                       buckets: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ratio =
      log((coalesce(col("ct"), lit(0L)).cast("double") + 1.0d) / (tTot + buckets).toDouble) -
        log((coalesce(col("cr"), lit(0L)).cast("double") + 1.0d) / (rTot + buckets).toDouble)
    val u = (pmod(portableHash(concat(lit("dsir#"), col("doc_id").cast("string"))),
      lit(1000000)).cast("double") + 0.5d) / 1000000.0d
    val gumbel = -log(-log(u))
    val scored = joined
      .select(col("doc_id"), col("source"), ratio.as("lr"))
      .groupBy("doc_id", "source")
      .agg(KeywordSearch.pinnedSumValues(col("lr")).as("lw"))
      .select(col("doc_id"), col("source"), col("lw"),
        (col("lw") + gumbel).as("sc"))
    scored.orderBy(desc("sc"), asc("doc_id")).limit(k)
      .withColumn("rn", row_number().over(
        Window.orderBy(desc("sc"), asc("doc_id"))))
      .select(col("rn"), col("doc_id"), col("source"),
        round(col("lw"), 4).as("log_weight"),
        round(col("sc"), 4).as("sample_score"))
      .orderBy("rn")
  }

  def importanceSample(docs: DataFrame, tTot: Long, rTot: Long,
                       target: String = DsirTarget,
                       buckets: Int = DsirBuckets, k: Int = DsirK): DataFrame = {
    val toks = docs
      .select(col("doc_id"), col("source"), explode(tokens(col("text"))).as("t"))
      .select(col("doc_id"), col("source"), dsirBucket(col("t"), buckets).as("f"))
    val tgt = toks.filter(col("source") === target)
      .groupBy("f").agg(count(lit(1)).as("ct"))
    val raw = toks.filter(col("source") =!= target)
      .groupBy("f").agg(count(lit(1)).as("cr"))
    dsirTail(
      toks.filter(col("source") =!= target)
        .join(broadcast(tgt), Seq("f"), "left")
        .join(broadcast(raw), Seq("f"), "left"),
      tTot, rTot, buckets, k)
  }

  /** One-pass LM fit: per-bucket (target, raw) token counts — a
    * ≤`buckets`-row trained-model artifact collected driver-side (the
    * IVF-centroid pattern) whose column sums ARE the two normalizer
    * totals, so fitting costs ONE corpus pass instead of the three the
    * fully-inline form pays (target counts, raw counts, totals).
    */
  def dsirLmFit(docs: DataFrame, target: String = DsirTarget,
                buckets: Int = DsirBuckets): Seq[(Long, Long, Long)] =
    docs.select((col("source") === target).as("is_t"),
      explode(tokens(col("text"))).as("t"))
      .select(col("is_t"), dsirBucket(col("t"), buckets).as("f"))
      .groupBy("f").agg(
        sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
        sum(when(!col("is_t"), 1L).otherwise(0L)).as("cr"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  /** The SERVING form: score against a fitted LM artifact — one
    * tokenize pass, one broadcast join, one doc-keyed sum (the shape a
    * 100 TB selection sweep runs; measured 94 s → one-pass at the 100×
    * replicated scale). Identical results to [[importanceSample]]
    * (spec-pinned): every scored token's bucket exists in the LM table
    * (its own raw count is ≥ 1), and a zero target count joins as 0 —
    * the same value the inline form's missing-bucket coalesce yields.
    */
  def importanceSampleServed(docs: DataFrame, lm: Seq[(Long, Long, Long)],
                             target: String = DsirTarget,
                             buckets: Int = DsirBuckets, k: Int = DsirK): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tTot = lm.map(_._2).sum
    val rTot = lm.map(_._3).sum
    val lmDf = lm.toDF("f", "ct", "cr")
    dsirTail(
      docs.filter(col("source") =!= target)
        .select(col("doc_id"), col("source"), explode(tokens(col("text"))).as("t"))
        .select(col("doc_id"), col("source"), dsirBucket(col("t"), buckets).as("f"))
        .join(broadcast(lmDf), Seq("f"), "left"),
      tTot, rTot, buckets, k)
  }

  /** Oracle: the same hashed-unigram LM ratio + Gumbel top-k re-derived
    * in SQL. `tTot`/`rTot` fold in as literals (they are counts the
    * engine also materializes driver-side — bounded by construction).
    */
  def importanceSampleSql(tTot: Long, rTot: Long, target: String = DsirTarget,
                          buckets: Int = DsirBuckets, k: Int = DsirK): String = {
    val fExpr =
      s"CAST('0x' || substring(md5(t), 1, 15) AS BIGINT) % $buckets"
    s"""WITH toks AS (
       |  SELECT doc_id, source, $fExpr AS f
       |  FROM (SELECT doc_id, source, unnest(${TextAnalysis.sqlToks}) AS t
       |        FROM documents)),
       |tgt AS (SELECT f, count(*) AS ct FROM toks WHERE source = '$target' GROUP BY f),
       |raw AS (SELECT f, count(*) AS cr FROM toks WHERE source <> '$target' GROUP BY f),
       |scored AS (
       |  SELECT doc_id, source, sum(lr ORDER BY lr) AS lw
       |  FROM (
       |    SELECT doc_id, source,
       |      ln((CAST(coalesce(ct, 0) AS DOUBLE) + 1.0) / ${tTot + buckets}.0)
       |        - ln((CAST(coalesce(cr, 0) AS DOUBLE) + 1.0) / ${rTot + buckets}.0) AS lr
       |    FROM toks LEFT JOIN tgt USING (f) LEFT JOIN raw USING (f)
       |    WHERE source <> '$target')
       |  GROUP BY doc_id, source),
       |noised AS (
       |  SELECT doc_id, source, lw,
       |    lw - ln(-ln((CAST('0x' || substring(md5('dsir#' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000 + 0.5) / 1000000.0)) AS sc
       |  FROM scored),
       |ranked AS (
       |  SELECT row_number() OVER (ORDER BY sc DESC, doc_id) AS rn,
       |    doc_id, source, round(lw, 4) AS log_weight, round(sc, 4) AS sample_score
       |  FROM noised)
       |SELECT rn, doc_id, source, log_weight, sample_score
       |FROM ranked WHERE rn <= $k
       |ORDER BY rn""".stripMargin
  }

  private val dsirCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Long, Long, Long)]]()
  @volatile private var dsirLastDir: Option[String] = None

  /** Driver query: the serving form over the per-dir cached LM artifact
    * (fit once, score forever).
    */
  def qImportanceSample(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val lm = dsirCache.computeIfAbsent(dir, _ => dsirLmFit(docs))
    dsirLastDir = Some(dir)
    importanceSampleServed(docs, lm)
  }

  /** Per-dir literal-constants oracle (totals fold in as literals after
    * the query runs — SURVEY §6; ambiguous/unpopulated cache fails
    * loudly rather than comparing a plausible empty result).
    */
  def importanceSampleOracle: String =
    if (dsirCache.size() > 1) "SELECT dsir_totals_ambiguous FROM documents"
    else dsirLastDir.flatMap(d => Option(dsirCache.get(d)))
      .fold("SELECT dsir_totals_not_derived FROM documents") { lm =>
        importanceSampleSql(lm.map(_._2).sum, lm.map(_._3).sum)
      }

  def qMix(s: SparkSession, dir: String): DataFrame = mix(Tables.documents(s, dir))
  def qSplit(s: SparkSession, dir: String): DataFrame = split(Tables.documents(s, dir))
  def qQuantiles(s: SparkSession, dir: String): DataFrame =
    quantiles(Tables.documents(s, dir))

  // --- cluster-balanced sampling (k-means diversity quota) -------------------

  /** Number of k-means clusters for the balanced sampler. */
  val ClusterK = 8
  /** Per-cluster sample quota. */
  val ClusterPer = 50

  private val clusterModelMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Seq[Double]]]()
  @volatile private var lastClusterModel: Option[Seq[Seq[Double]]] = None

  /** Seeded k-means centroids over the embeddings (memoized per dir —
    * training is one MLlib job; the ORACLE never re-trains, it gets
    * the centroids as literals, the [[ProductQuantizer]] capture
    * convention).
    */
  private[graft] def clusterCentroids(s: SparkSession, dir: String,
                                      k: Int = ClusterK,
                                      seed: Long = 42L): Seq[Seq[Double]] =
    clusterModelMemo.computeIfAbsent(dir, _ => {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.array_to_vector
      val feat = Tables.embeddings(s, dir)
        .select(array_to_vector(col("embedding").cast("array<double>"))
          .as("features"))
      new KMeans().setK(k).setSeed(seed).fit(feat)
        .clusterCenters.map(_.toArray.toSeq).toSeq
    })

  /** CLUSTER-BALANCED corpus sampling — the diversity-preserving
    * subsample a training-data pipeline draws when a uniform sample
    * would be dominated by the corpus' majority modes (the data-mixing
    * practice behind cluster-balanced curation; SemDeDup's clustering
    * reused for SELECTION instead of removal): k-means clusters over
    * the embeddings (seeded MLlib training on a bounded job, centroids
    * captured for the oracle), every vector assigned to its nearest
    * centroid by the SAME ordered arithmetic both engines evaluate
    * (element-ordered squared-distance sum; ties by cluster index),
    * then an EQUAL QUOTA per cluster drawn in deterministic
    * hash-lottery order (portable md5, reduced mod 1e12 so the heap's
    * double-typed score stays exact, ties by vec_id).
    *
    * Scale shape: assignment is a map-side k×dim literal expression
    * (no shuffle, no model broadcast needed — the centroids ARE the
    * plan); the quota is k bounded heaps ([[graft.functions
    * .VectorFunctions.topKByScore]]) — ONE aggregate exchange carrying
    * ≤ k·per·partitions rows, never a per-cluster window sort. At
    * 100 TB this is a single pass over the embeddings.
    */
  def qClusterSample(s: SparkSession, dir: String): DataFrame = {
    val cents = clusterCentroids(s, dir)
    lastClusterModel = Some(cents)
    clusterSample(Tables.embeddings(s, dir), cents)
  }

  private[graft] def clusterSample(embs: DataFrame, cents: Seq[Seq[Double]],
                                   per: Int = ClusterPer): DataFrame = {
    import graft.functions.VectorFunctions.topKByScore
    val e = col("embedding").cast("array<double>")
    val dists = array(cents.zipWithIndex.map { case (v, c) =>
      struct(
        aggregate(zip_with(e, typedLit(v), (a, b) => (a - b) * (a - b)),
          lit(0.0), (acc, x) => acc + x).as("d2"),
        lit(c).as("c"))
    }: _*)
    // array_min over (d2, c) structs = lexicographic argmin — exactly
    // the oracle's ORDER BY d2 ASC, c ASC tiebreak
    val assigned = embs.select(col("vec_id"),
      array_min(dists).getField("c").as("cluster"))
    val u = pmod(portableHash(concat(lit("cs:"), col("vec_id").cast("string"))),
      lit(1000000000000L))
    assigned
      .select(col("cluster"), col("vec_id"), u.as("u"))
      .groupBy("cluster")
      // smallest-u-first ≡ top-k by -u; u < 2^40 so the double cast is
      // exact and the heap's (score, id) order replays the oracle's
      // (u, vec_id) exactly
      .agg(topKByScore(-col("u").cast("double"), col("vec_id"), per).as("top"))
      .select(col("cluster"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("cluster"), (col("i") + 1).as("rn"), col("t.id").as("vec_id"))
      .orderBy("cluster", "rn")
  }

  /** Oracle for [[qClusterSample]]: the captured centroids as a literal
    * VALUES table (k-means training is not SQL-expressible; given the
    * centroids, assignment + lottery are pure arithmetic), the
    * element-ordered distance sums, the argmin tiebreak, the md5
    * lottery, the per-cluster quota.
    */
  def clusterSampleSql(cents: Seq[Seq[Double]], per: Int = ClusterPer): String = {
    val dim = cents.head.size
    val vals = cents.zipWithIndex
      .map { case (v, c) => s"($c, [${v.mkString(", ")}])" }
      .mkString(",\n    ")
    s"""WITH cb AS (SELECT * FROM (VALUES
       |    $vals) AS t(c, cent)),
       |dists AS (
       |  SELECT vec_id, c,
       |    list_sum(list_transform(range(1, ${dim + 1}), i ->
       |      (CAST(embedding[i] AS DOUBLE) - cent[i]) * (CAST(embedding[i] AS DOUBLE) - cent[i]))) AS d2
       |  FROM embeddings, cb),
       |assigned AS (
       |  SELECT vec_id, c AS cluster FROM (
       |    SELECT vec_id, c,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c ASC) AS arn
       |    FROM dists)
       |  WHERE arn = 1),
       |keyed AS (
       |  SELECT cluster, vec_id,
       |    CAST('0x' || substring(md5('cs:' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000000000 AS u
       |  FROM assigned),
       |ranked AS (
       |  SELECT cluster, vec_id,
       |    row_number() OVER (PARTITION BY cluster ORDER BY u, vec_id) AS rn
       |  FROM keyed
       |  QUALIFY rn <= $per)
       |SELECT cluster, rn, vec_id FROM ranked ORDER BY cluster, rn""".stripMargin
  }

  /** Oracle under the capture convention — a def, dumped after the
    * queries run.
    */
  def clusterSampleOracle: String = lastClusterModel.fold(
    "SELECT cluster_model_not_captured FROM embeddings")(clusterSampleSql(_))
}
