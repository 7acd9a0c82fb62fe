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

  val oracle: String = {
    val stopEn = TextAnalysis.StopEn.map(w => s"'$w'").mkString(", ")
    s"""WITH RECURSIVE
       |toked AS (
       |  SELECT doc_id, source, ${TextAnalysis.sqlToks} AS toks FROM documents),
       |quality AS (
       |  SELECT doc_id FROM toked
       |  WHERE len(toks) BETWEEN 10 AND 1000
       |    AND len(list_filter(toks, t -> t IN ($stopEn))) > 0),
       |pairs AS (SELECT d1, d2 FROM (${Dedup.minhashLshOracle})),
       |edges AS (
       |  SELECT d1 AS src, d2 AS dst FROM pairs
       |  UNION ALL
       |  SELECT d2 AS src, d1 AS dst FROM pairs),
       |reach AS (
       |  SELECT doc_id, doc_id AS label FROM documents
       |  UNION
       |  SELECT e.dst AS doc_id, r.label
       |  FROM reach r JOIN edges e ON r.doc_id = e.src),
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
