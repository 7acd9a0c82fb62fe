package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The whole training-data path as ONE declarative plan: quality filter
  * (C4/Gopher-style heuristics) → duplicate-cluster resolution keeping
  * only canonical survivors → greedy sequence packing into token-budget
  * bins → per-bin accounting. This is the composition a 100 TB corpus
  * refresh actually runs; expressing it as a single DataFrame lets
  * Catalyst share the tokenization scan between the quality and packing
  * stages and pipeline the filters before the packing shuffle.
  *
  * Oracle: the same composition in one DuckDB statement — quality CTE +
  * recursive-CTE transitive closure for clusters + window-packing CTE.
  */
object Pipeline {

  def cleanPack(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val keepQuality = TextAnalysis.quality(docs)
      .filter(col("passes_filter")).select("doc_id")
    // consumes the standing pair set via DedupClusters.query (pairs
    // materialize once per source dir — the corpus-refresh shape)
    val keepCanonical = DedupClusters.query(s, dir)
      .filter(col("is_canonical")).select("doc_id")
    val clean = docs.join(keepQuality, "doc_id").join(keepCanonical, "doc_id")
    Chunker.pack(clean)
      .groupBy("source", "bin_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"))
      .orderBy("source", "bin_id")
  }

  /** Per-doc decision log — the audit artifact a production corpus
    * refresh emits alongside the cleaned data: every document's verdict
    * on each gate (quality, duplicate-canonical, decontamination), the
    * final keep flag, and the FIRST failing gate as the drop reason.
    * Makes the pipeline debuggable ("why did doc X disappear?") and the
    * gate mix monitorable (group by reason = the run's funnel report).
    *
    * Scale design: three keyed joins on doc_id (quality and cluster
    * verdicts are corpus-sized — shuffle joins; the contaminated id set
    * is benchmark-collision-sized — broadcast); the verdict columns and
    * reason CASE are map-side expressions above them.
    */
  def decisionLog(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val quality = TextAnalysis.quality(docs)
      .select(col("doc_id"), col("passes_filter"))
    val canon = DedupClusters.query(s, dir)
      .select(col("doc_id"), col("is_canonical"))
    val contaminated = Dedup.qDecontaminate(s, dir)
      .select(col("doc_id")).distinct()
      .withColumn("hit", lit(true))
    docs.select(col("doc_id"), col("source"))
      .join(quality, "doc_id")
      .join(canon, "doc_id")
      .join(broadcast(contaminated), Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        col("passes_filter").as("quality_keep"), col("is_canonical"),
        coalesce(col("hit"), lit(false)).as("contaminated"))
      .withColumn("keep",
        col("quality_keep") && col("is_canonical") && !col("contaminated"))
      .withColumn("reason",
        when(!col("quality_keep"), "quality")
          .when(!col("is_canonical"), "duplicate")
          .when(col("contaminated"), "contaminated")
          .otherwise("kept"))
      .orderBy("doc_id")
  }

  /** Shared CTE fragments — the ONE SQL copy of the quality gate and the
    * pair-closure chain, composed by BOTH [[oracle]] and
    * [[decisionLogOracle]] (drift between the two oracles would silently
    * weaken the gate).
    */
  private[graft] val qualityGateSql: String = {
    val stopEn = TextAnalysis.StopEn.map(w => s"'$w'").mkString(", ")
    s"""(len(toks) >= 10 AND len(toks) <= 1000
       |     AND len(list_filter(toks, t -> t IN ($stopEn))) > 0)""".stripMargin
  }

  private val closureCtesSql: String =
    s"""pairs AS (SELECT d1, d2 FROM (${Dedup.minhashLshOracle})),
       |edges AS (
       |  SELECT d1 AS src, d2 AS dst FROM pairs
       |  UNION ALL
       |  SELECT d2 AS src, d1 AS dst FROM pairs),
       |reach AS (
       |  SELECT doc_id, doc_id AS label FROM documents
       |  UNION
       |  SELECT e.dst AS doc_id, r.label
       |  FROM reach r JOIN edges e ON r.doc_id = e.src)""".stripMargin

  val decisionLogOracle: String = {
    val shingleSql =
      s"""CASE WHEN len(toks) >= 3
         |  THEN list_transform(range(1, len(toks) - 1), i -> array_to_string(list_slice(toks, i, i + 2), ' '))
         |  ELSE [array_to_string(toks, ' ')] END""".stripMargin
    s"""WITH RECURSIVE
       |toked AS (
       |  SELECT doc_id, source, ${TextAnalysis.sqlToks} AS toks FROM documents),
       |quality AS (
       |  SELECT doc_id,
       |    $qualityGateSql AS quality_keep
       |  FROM toked),
       |$closureCtesSql,
       |canon AS (
       |  SELECT doc_id, doc_id = min(label) AS is_canonical
       |  FROM reach GROUP BY doc_id),
       |sigs AS (
       |  SELECT doc_id, md5(array_to_string(toks, ' ')) AS fp,
       |    list_min(list_transform($shingleSql,
       |      s -> CAST('0x' || substring(md5(s), 1, 15) AS BIGINT))) AS msh
       |  FROM toked),
       |bench AS (
       |  SELECT doc_id AS bench_id, fp AS bfp, msh AS bmsh FROM sigs
       |  WHERE doc_id % ${Dedup.BenchStride} = 0),
       |cont AS (
       |  SELECT DISTINCT s.doc_id
       |  FROM sigs s JOIN bench b ON (s.fp = b.bfp OR s.msh = b.bmsh)
       |  WHERE s.doc_id <> b.bench_id)
       |SELECT t.doc_id, t.source, q.quality_keep, c.is_canonical,
       |  (cont.doc_id IS NOT NULL) AS contaminated,
       |  (q.quality_keep AND c.is_canonical AND cont.doc_id IS NULL) AS keep,
       |  CASE WHEN NOT q.quality_keep THEN 'quality'
       |       WHEN NOT c.is_canonical THEN 'duplicate'
       |       WHEN cont.doc_id IS NOT NULL THEN 'contaminated'
       |       ELSE 'kept' END AS reason
       |FROM toked t
       |JOIN quality q USING (doc_id)
       |JOIN canon c USING (doc_id)
       |LEFT JOIN cont ON t.doc_id = cont.doc_id
       |ORDER BY t.doc_id""".stripMargin
  }

  val oracle: String = {
    s"""WITH RECURSIVE
       |toked AS (
       |  SELECT doc_id, source, ${TextAnalysis.sqlToks} AS toks FROM documents),
       |quality AS (
       |  SELECT doc_id FROM toked
       |  WHERE $qualityGateSql),
       |$closureCtesSql,
       |canonical AS (
       |  SELECT doc_id FROM reach GROUP BY doc_id HAVING doc_id = min(label)),
       |clean AS (
       |  SELECT t.doc_id, t.source, len(t.toks) AS n_tokens
       |  FROM toked t
       |  JOIN quality q ON t.doc_id = q.doc_id
       |  JOIN canonical c ON t.doc_id = c.doc_id),
       |packed AS (
       |  SELECT source, n_tokens,
       |    CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
       |      / ${Chunker.PackBudget}) AS BIGINT) AS bin_id
       |  FROM clean)
       |SELECT source, bin_id, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
       |FROM packed
       |GROUP BY source, bin_id
       |ORDER BY source, bin_id""".stripMargin
  }
}
