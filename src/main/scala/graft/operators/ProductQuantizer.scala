package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{PqAdcScore, PqAdcScoreDyn, PqEncode, Shims}

/** Product quantization + ADC search — the memory-bound ANN scale path
  * beyond SQ8 ([[VectorSearch.quantize]]): m codebook indices per vector
  * (m bytes at k ≤ 256) instead of 4·d bytes, with query-time scoring as
  * m table lookups per row (Jégou et al., TPAMI 2011). Complements the
  * reference's `batch_index_data` ANN-build surface the same way
  * [[IvfIndex]] does — IVF prunes WHICH vectors are scanned, PQ shrinks
  * WHAT is scanned; production systems compose them (IVF-PQ).
  *
  * Training is per-subspace seeded k-means (MLlib over the subvector
  * slices — one small fit per subspace); codebooks are tiny
  * (m·k·(d/m) doubles) and ship to executors inside the
  * [[org.apache.spark.sql.graftshim.PqEncode]] /
  * [[org.apache.spark.sql.graftshim.PqAdcScore]] expressions.
  *
  * Vectors are L2-normalized before train/encode/query, making ADC's L2
  * ranking equivalent to cosine ranking (||x−q||² = 2 − 2·cos on the
  * unit sphere), so results are comparable to [[VectorSearch.topK]].
  */
object ProductQuantizer {
  val M = 8          // subspaces
  val K = 16         // centroids per subspace
  val Dim = 64

  case class Model(m: Int, dim: Int, codebooks: Seq[Seq[Seq[Double]]])

  private[operators] def normalized(c: Column): Column = {
    val d = transform(c, x => x.cast("double"))
    // Generate-barrier-free: norm referenced once inside the lambda is
    // loop-invariant but cheap (d adds) relative to the one-off encode.
    transform(d, x => x / sqrt(aggregate(d, lit(0.0d), (a, v) => a + v * v)))
  }

  /** Per-subspace seeded k-means over the normalized TRAINING SAMPLE.
    *
    * Deliberately driver-side: PQ codebooks are trained on a bounded
    * sample (callers pass one — `qAdcSearch` strides 10%; faiss does
    * exactly this) and the result is m·k·(d/m) doubles, so Lloyd's
    * iterations on the collected sample cost milliseconds, where one
    * MLlib fit PER SUBSPACE costs seconds of job-scheduling overhead at
    * ANY scale. Deterministic: stride-seeded init, fixed iteration
    * count, no RNG.
    */
  /** Training-sample cap: k-means needs a bounded sample, not the
    * corpus (faiss guidance is ~256 training points per centroid —
    * 16 centroids × 8 subspaces needs thousands, this allows 16×
    * that), so training cost is O(1) in corpus size. Below the cap
    * the whole stride sample trains (both driver-gate SFs are below
    * it — the captured-literal oracles see the identical model);
    * above it the sample is the [[MaxTrainSample]] vectors least by
    * `xxhash64(vec_id)` via the bounded TakeOrdered heap — a
    * DEBIASED deterministic subsample (the hash is uniform over ids,
    * so the kept set is distribution-representative at any corpus
    * size), instead of a corpus-wide global sort + collect. An
    * earlier form ordered by the embedding itself, which above the
    * cap trains every subspace's centroids on one corner of the
    * sphere (the most-negative first components — faiss's
    * ~256-points-per-centroid guidance assumes random sampling);
    * hash order keeps partition-invariance (vec_id is unique, the
    * hash order is a fixed permutation) without the bias. WHICH
    * vectors are kept is the hash order's job; the INIT order of the
    * collected sample is then re-pinned by a driver-side
    * lexicographic sort — so below the cap (kept set = the whole
    * input) the trained model is bit-identical to the pre-hash-order
    * form, and above it only the selection debiases.
    */
  val MaxTrainSample = 16384

  /** Elementwise lexicographic order on equal-length vectors — the
    * driver-side init-order pin (matches Spark's array ordering, the
    * pre-r13 `orderBy(e)` sequence).
    */
  private val lexVec: java.util.Comparator[Array[Double]] =
    (a: Array[Double], b: Array[Double]) => {
      var i = 0
      var r = 0
      while (r == 0 && i < a.length && i < b.length) {
        r = java.lang.Double.compare(a(i), b(i))
        i += 1
      }
      if (r != 0) r else Integer.compare(a.length, b.length)
    }

  def train(embs: DataFrame, m: Int = M, k: Int = K, seed: Long = 42L): Model = {
    val sub = Dim / m
    val sample = embs
      .select(normalized(col("embedding")).as("e"), col("vec_id"))
      // stable DEBIASED selection → partition-invariant kept set
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(MaxTrainSample)
      .collect().map(_.getSeq[Double](0).toArray)
    java.util.Arrays.sort(sample, lexVec)
    require(sample.nonEmpty, "PQ training sample is empty")
    val codebooks = (0 until m).map { j =>
      val vecs = sample.map(v => java.util.Arrays.copyOfRange(v, j * sub, (j + 1) * sub))
      lloyd(vecs, k, seed + j).map(_.toSeq).toSeq
    }
    Model(m, Dim, codebooks)
  }

  /** Deterministic Lloyd's: stride init over the (stably ordered)
    * sample, `iters` fixed refinement passes, empty clusters keep their
    * centroid.
    */
  private def lloyd(xs: Array[Array[Double]], k: Int, seed: Long,
                    iters: Int = 10): Array[Array[Double]] = {
    val n = xs.length
    val d = xs(0).length
    val off = math.abs(seed % n).toInt
    var cents = Array.tabulate(k)(i => xs(((i.toLong * n) / k + off).toInt % n).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Int](k)
      xs.foreach { x =>
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < k) {
          var dist = 0.0; var i = 0
          while (i < d) { val t = x(i) - cents(c)(i); dist += t * t; i += 1 }
          if (dist < bd) { bd = dist; best = c }
          c += 1
        }
        counts(best) += 1
        val s = sums(best); var i = 0
        while (i < d) { s(i) += x(i); i += 1 }
      }
      cents = Array.tabulate(k)(c =>
        if (counts(c) > 0) sums(c).map(_ / counts(c)) else cents(c))
      it += 1
    }
    cents
  }

  /** Encode the corpus: one `array<int>` of m codes per vector.
    * Normalization happens INSIDE [[PqEncode]] (same IEEE ops — see
    * the expression's note): the declarative [[normalized]] wrapper
    * re-evaluated the norm aggregate per element interpreted.
    */
  def encode(embs: DataFrame, model: Model): DataFrame =
    embs.select(col("vec_id"), col("label"),
      Shims.column(PqEncode(
        Shims.expression(col("embedding")), model.codebooks,
        normalize = true)).as("codes"))

  /** Per-query ADC table: table(j)(c) = ||q_sub_j − codebook(j)(c)||². */
  def adcTable(model: Model, query: Seq[Double]): Seq[Seq[Double]] = {
    val n = math.sqrt(query.map(x => x * x).sum)
    val q = query.map(_ / n)
    val sub = model.dim / model.m
    model.codebooks.zipWithIndex.map { case (book, j) =>
      book.map { cent =>
        var d2 = 0.0
        var t = 0
        while (t < sub) {
          val diff = q(j * sub + t) - cent(t); d2 += diff * diff; t += 1
        }
        d2
      }
    }
  }

  /** Approximate top-k by ascending ADC distance. The query vector is
    * looked up on the driver (one tiny collect — the serving analog is
    * the embedded user query arriving as a literal). Output and ordering
    * use the 6dp-rounded distance (vec_id tiebreak) so the DuckDB oracle
    * replaying the same arithmetic ranks identically.
    */
  def searchAdc(embs: DataFrame, model: Model, queryVecId: Long,
                k: Int = VectorSearch.TopK): DataFrame = {
    val q = embs.filter(col("vec_id") === queryVecId)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val table = adcTable(model, q)
    encode(embs.filter(col("vec_id") =!= queryVecId), model)
      .select(col("vec_id"), col("label"),
        round(Shims.column(PqAdcScore(Shims.expression(col("codes")), table)), 6).as("adc"))
      .orderBy(asc("adc"), asc("vec_id"))
      .limit(k)
  }

  /** IVF-PQ: the production composition — IVF prunes WHICH cells are
    * scanned (nprobe/nlist of the corpus, partition-prunable on disk),
    * PQ shrinks WHAT each scanned row costs (m table lookups over m
    * bytes). Cells here are the corpus `label` coarse quantizer, exactly
    * as in [[IvfIndex.search]]; swapping in the k-means assigner changes
    * nothing downstream.
    */
  /** Driver-facing queries. Codebooks train on a 10% hash-stride SAMPLE
    * — the production shape: PQ training reads a sliver, encoding
    * streams the full corpus. The trained model is cached per source dir
    * (standing-index semantics, cf. [[IndexCache]]) and its codebooks
    * are embedded as literal values into the DuckDB oracle: training
    * itself isn't SQL-expressible, but given the (deterministic,
    * spec-pinned) codebooks, encode + ADC scoring are pure join +
    * arithmetic the oracle replays exactly.
    */
  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[String, Model]()
  @volatile private var lastDir: Option[String] = None

  def modelFor(s: org.apache.spark.sql.SparkSession, dir: String): Model = {
    lastDir = Some(dir)
    modelCache.computeIfAbsent(dir, _ =>
      train(graft.sources.Tables.embeddings(s, dir)
        .filter(col("vec_id") % 10 === 0)))
  }

  def qAdcSearch(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val e = graft.sources.Tables.embeddings(s, dir)
    searchAdc(e, modelFor(s, dir), VectorSearch.QueryVecId)
  }

  def qIvfAdcSearch(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val e = graft.sources.Tables.embeddings(s, dir)
    searchIvfAdc(e, modelFor(s, dir), VectorSearch.QueryVecId)
  }

  // --- batch IVF-PQ (the full serving composition) --------------------------

  /** Multi-query IVF-PQ search — every serving lever stacked: the query
    * BATCH amortizes one pass, IVF prunes WHICH cells each query scans
    * ([[IvfIndex.batchProbedCells]]), PQ shrinks WHAT each candidate
    * costs (m-byte codes, ADC table lookups). Per-query ADC tables are
    * a TINY frame (|queries|·m·k rows) built declaratively from the
    * codebooks and broadcast into the candidate scan; the j-ordered
    * table-lookup sum keeps the accumulation order identical to
    * [[PqAdcScore]] and the oracle. Candidates rank per query through
    * the bounded heap on the 6dp-rounded distance (vec_id tiebreak).
    */
  def batchSearchIvfAdc(embs: DataFrame, model: Model,
                        selectQueries: DataFrame => DataFrame,
                        nprobe: Int = IvfIndex.NProbe,
                        k: Int = VectorSearch.TopK): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val sub = model.dim / model.m
    val queries = selectQueries(embs)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val probed = IvfIndex.batchProbedCells(embs, queries, nprobe)
    // per-query ADC tables: (q_id, j, c, d2) — |queries|·m·k rows
    val cb = model.codebooks.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (cent, c) => (j, c, cent) }
    }.toDF("j", "c", "cent")
    val tables = queries
      .select(col("q_id"), normalized(col("q_emb")).as("qn"))
      .join(broadcast(cb))
      .select(col("q_id"), col("j"), col("c"),
        aggregate(
          zip_with(slice(col("qn"), col("j") * sub + 1, lit(sub)), col("cent"),
            (a, b) => (a - b) * (a - b)),
          lit(0.0d), (acc, v) => acc + v).as("d2"))
    // each DISTINCT vector in the probed-cell union encodes exactly ONCE
    // on the scan (the encode is the expensive leg — per-pair encoding
    // would pay it |queries| times over shared cells), and the per-query
    // fan-out happens AFTER the encode via the broadcast probe pairs —
    // the candidate frame is never shuffled or joined row-at-scale. The
    // (q_id, j, c, d2) table rows reshape into one m×k ARRAY per query
    // (bounded group folds, c- then j-sorted) and ride the same
    // broadcast, so each candidate row pays exactly m in-register,
    // j-ORDERED lookups inside whole-stage codegen ([[graftshim
    // .PqAdcScoreDyn]] — bitwise [[PqAdcScore]]'s sum; the r11 explode-
    // to-m-rows + collect_list re-aggregate was a billions-of-rows
    // sort-spilling aggregate at 100×).
    val cells = probed.select(col("cell")).distinct()
    // Tables.parallel: the fan-out stage's parallelism is the SCAN's
    // partition count (broadcast joins add no exchange) — a corpus
    // written as a few files would drive the whole 120M-row probe on
    // as many tasks (measured: 3 of 32 cores busy at 100×)
    val enc = Tables.parallel(embs)
      .join(broadcast(cells), col("label") === col("cell"))
      .select(col("vec_id"), col("label"),
        Shims.column(PqEncode(
          Shims.expression(col("embedding")), model.codebooks,
          normalize = true)).as("codes"))
    val perJ = tables.groupBy("q_id", "j")
      .agg(transform(array_sort(collect_list(struct(col("c"), col("d2")))),
        x => x.getField("d2")).as("row"))
    val tbls = perJ.groupBy("q_id")
      // j-major flatten: tbl(j·k + c) — the flat layout PqAdcScoreDyn
      // indexes with primitive reads (no per-row nested-array views)
      .agg(flatten(transform(array_sort(collect_list(struct(col("j"), col("row")))),
        x => x.getField("row"))).as("tbl"))
    val probeTbl = probed.join(tbls, Seq("q_id"))
    val adcs = enc
      .join(broadcast(probeTbl), col("label") === col("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(Shims.column(PqAdcScoreDyn(
          Shims.expression(col("codes")),
          Shims.expression(col("tbl")))), 6).as("adc"))
    adcs
      .groupBy("q_id")
      .agg(graft.functions.VectorFunctions
        .topKByScore(-col("adc"), col("vec_id"), k).as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("i", "t")))
      .select(col("q_id"), (col("i") + 1).as("rn"), col("t.id").as("vec_id"),
        (-col("t.score")).as("adc"))
      .orderBy("q_id", "rn")
  }

  def qBatchIvfAdcSearch(s: org.apache.spark.sql.SparkSession,
                         dir: String): DataFrame = {
    val e = graft.sources.Tables.embeddings(s, dir)
    batchSearchIvfAdc(e, modelFor(s, dir),
      _.filter(col("vec_id") % VectorSearch.BatchStride === 0))
  }

  // --- DuckDB oracle ---------------------------------------------------------

  /** Codebooks of the most recently trained model as a SQL literal table
    * `(j, c, cent DOUBLE[])`. [[graft.Verify]] dumps oracles AFTER
    * running the queries, so the per-dir cache is populated; Double
    * round-trips exactly through its shortest decimal representation.
    */
  private[operators] def codebookValues(model: Model): String =
    model.codebooks.zipWithIndex.flatMap { case (book, j) =>
      book.zipWithIndex.map { case (cent, c) =>
        s"($j, $c, [${cent.mkString(", ")}])"
      }
    }.mkString(",\n    ")

  /** The oracle embeds ONE model's codebooks; with several dirs trained
    * in one JVM the "last dir" could silently be the wrong one, so that
    * case degrades to the loud failing oracle instead (the driver flow
    * — Verify — is one dir per process, where this is exact).
    */
  private def currentModel: Option[Model] =
    if (modelCache.size() > 1) None
    else lastDir.flatMap(d => Option(modelCache.get(d)))

  /** Shared oracle CTEs: literal codebooks, L2-normalized corpus, the
    * query row, per-(vector, subspace) nearest-centroid encode (strict-<
    * argmin == ORDER BY d2, c), the per-query ADC table, and the j-ordered
    * table-lookup sum — every accumulation in the same sequential order
    * as [[PqEncode]]/[[PqAdcScore]]/[[adcTable]].
    */
  private def adcCtes(model: Model, queryVecId: Long,
                      distsExtra: String): String = {
    val sub = model.dim / model.m
    s"""cb AS (SELECT * FROM (VALUES
       |    ${codebookValues(model)}) AS t(j, c, cent)),
       |norm AS (
       |  SELECT vec_id, label,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
       |      sqrt(list_sum(list_transform(embedding,
       |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS e
       |  FROM embeddings),
       |q AS (SELECT e AS qe FROM norm WHERE vec_id = $queryVecId),
       |dists AS (
       |  SELECT vec_id, label, j, c,
       |    list_sum(list_transform(range(1, ${sub + 1}), t ->
       |      (e[j * $sub + t] - cent[t]) * (e[j * $sub + t] - cent[t]))) AS d2
       |  FROM norm, cb
       |  WHERE vec_id <> $queryVecId$distsExtra),
       |enc AS (
       |  SELECT vec_id, label, j, c,
       |    row_number() OVER (PARTITION BY vec_id, j ORDER BY d2 ASC, c ASC) AS rn
       |  FROM dists),
       |tbl AS (
       |  SELECT j, c,
       |    list_sum(list_transform(range(1, ${sub + 1}), t ->
       |      (qe[j * $sub + t] - cent[t]) * (qe[j * $sub + t] - cent[t]))) AS d2
       |  FROM q, cb),
       |adcs AS (
       |  SELECT enc.vec_id, enc.label,
       |    list_sum(list(tbl.d2 ORDER BY enc.j)) AS adc
       |  FROM enc JOIN tbl ON enc.j = tbl.j AND enc.c = tbl.c
       |  WHERE rn = 1
       |  GROUP BY enc.vec_id, enc.label)""".stripMargin
  }

  /** Referencing a nonexistent column makes the oracle FAIL loudly in
    * DuckDB rather than compare as a plausible empty result.
    */
  private val emptyOracle =
    "SELECT pq_model_not_trained_or_ambiguous FROM embeddings"

  def adcSearchOracle: String = currentModel.fold(emptyOracle) { model =>
    s"""WITH ${adcCtes(model, VectorSearch.QueryVecId, "")}
       |SELECT vec_id, label, round(adc, 6) AS adc
       |FROM adcs
       |ORDER BY round(adc, 6), vec_id
       |LIMIT ${VectorSearch.TopK}""".stripMargin
  }

  /** Batch IVF-PQ oracle: the per-query probed-cell CTEs compose with a
    * per-query ADC-table CTE (qn × literal codebooks) and the candidate
    * encode/score replay — same arithmetic, same j-ordered sums, same
    * round-before-rank as [[batchSearchIvfAdc]].
    */
  def batchIvfAdcSearchOracle: String = currentModel.fold(emptyOracle) { model =>
    val sub = model.dim / model.m
    val stride = VectorSearch.BatchStride
    s"""WITH cb AS (SELECT * FROM (VALUES
       |    ${codebookValues(model)}) AS t(j, c, cent)),
       |${IvfIndex.batchProbedSqlCtes(s"vec_id % $stride = 0", IvfIndex.NProbe)},
       |norm AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE) /
       |      sqrt(list_sum(list_transform(embedding,
       |        y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))) AS e
       |  FROM embeddings),
       |qn AS (
       |  SELECT q.q_id, n.e AS qnv FROM queries q JOIN norm n ON n.vec_id = q.q_id),
       |tbls AS (
       |  SELECT q_id, j, c,
       |    list_sum(list_transform(range(1, ${sub + 1}), t ->
       |      (qnv[j * $sub + t] - cent[t]) * (qnv[j * $sub + t] - cent[t]))) AS d2
       |  FROM qn, cb),
       |cands AS (
       |  SELECT p.q_id, e.vec_id
       |  FROM embeddings e JOIN probed p ON e.label = p.cell
       |  WHERE e.vec_id <> p.q_id),
       |dists AS (
       |  SELECT vec_id, j, c,
       |    list_sum(list_transform(range(1, ${sub + 1}), t ->
       |      (e[j * $sub + t] - cent[t]) * (e[j * $sub + t] - cent[t]))) AS d2e
       |  FROM norm, cb
       |  WHERE vec_id IN (SELECT vec_id FROM cands)),
       |enc AS (
       |  SELECT vec_id, j, c,
       |    row_number() OVER (PARTITION BY vec_id, j ORDER BY d2e ASC, c ASC) AS rn
       |  FROM dists),
       |adcs AS (
       |  SELECT cands.q_id, cands.vec_id,
       |    round(list_sum(list(tbls.d2 ORDER BY enc.j)), 6) AS adc
       |  FROM cands
       |  JOIN enc ON enc.vec_id = cands.vec_id AND enc.rn = 1
       |  JOIN tbls ON tbls.q_id = cands.q_id AND tbls.j = enc.j AND tbls.c = enc.c
       |  GROUP BY 1, 2),
       |ranked AS (
       |  SELECT q_id, vec_id, adc,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adc ASC, vec_id ASC) AS rn
       |  FROM adcs
       |  QUALIFY rn <= ${VectorSearch.TopK})
       |SELECT q_id, rn, vec_id, adc
       |FROM ranked
       |ORDER BY q_id, rn""".stripMargin
  }

  /** IVF-PQ oracle: [[IvfIndex.searchSql]]'s centroid-ranking CTEs pick
    * the nprobe cells, then the shared ADC pipeline scores only those
    * cells' vectors.
    */
  def ivfAdcSearchOracle: String = currentModel.fold(emptyOracle) { model =>
    val qid = VectorSearch.QueryVecId
    s"""WITH rawq AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = $qid),
       |exploded AS (
       |  SELECT label AS cell, generate_subscripts(embedding, 1) AS dim,
       |    CAST(unnest(embedding) AS DOUBLE) AS ev
       |  FROM embeddings),
       |cent_long AS (
       |  SELECT cell, dim, avg(ev) AS cv FROM exploded GROUP BY 1, 2),
       |cent AS (
       |  SELECT cell, list(cv ORDER BY dim) AS centroid FROM cent_long GROUP BY cell),
       |probed AS (
       |  SELECT cell FROM cent, rawq
       |  ORDER BY round(${VectorSearch.cosineSql("centroid", "q_emb")}, 6) DESC, cell
       |  LIMIT ${IvfIndex.NProbe}),
       |${adcCtes(model, qid, "\n    AND label IN (SELECT cell FROM probed)")}
       |SELECT vec_id, label, round(adc, 6) AS adc
       |FROM adcs
       |ORDER BY round(adc, 6), vec_id
       |LIMIT ${VectorSearch.TopK}""".stripMargin
  }

  def searchIvfAdc(embs: DataFrame, model: Model, queryVecId: Long,
                   nprobe: Int = IvfIndex.NProbe,
                   k: Int = VectorSearch.TopK): DataFrame = {
    val q = embs.filter(col("vec_id") === queryVecId)
      .select(col("embedding").as("q_emb"))
    val probed = IvfIndex.centroidArrays(embs)
      .join(broadcast(q))
      .select(col("cell"),
        round(graft.functions.VectorFunctions.cosineSim(
          col("centroid"), col("q_emb")), 6).as("cscore"))
      .orderBy(desc("cscore"), asc("cell"))
      .limit(nprobe)
      .select("cell")
    val qv = embs.filter(col("vec_id") === queryVecId)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val table = adcTable(model, qv)
    encode(
      embs.filter(col("vec_id") =!= queryVecId)
        .join(broadcast(probed), col("label") === col("cell")), model)
      .select(col("vec_id"), col("label"),
        round(Shims.column(PqAdcScore(Shims.expression(col("codes")), table)), 6).as("adc"))
      .orderBy(asc("adc"), asc("vec_id"))
      .limit(k)
  }
}
