package graft.operators

import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inverted keyword index — the keyword-side analog of the reference's
  * batch index build (`WeaviateIndexer.batch_index_data`, reference
  * `src/database/weaviate_interface_v4.py:409-492`, which feeds Weaviate's
  * BM25 inverted index). In Spark the index IS two DataFrames:
  *
  *   postings(term, doc_id, source, lang, tf)   — one row per (term, doc)
  *   docstats(doc_id, source, lang, dl)         — per-doc token length
  *
  * materialized as parquet partitioned by `term_bucket =
  * portable_hash(term) % NumBuckets`, so a query for a handful of terms
  * prunes to those terms' bucket directories at the file-listing level.
  *
  * Scale design (100 TB): the corpus is tokenized ONCE at build time;
  * every subsequent search reads only `|query terms|` buckets of the
  * postings table — never the corpus. Per-term df comes from a
  * `groupBy(term)` over the pruned postings (a few thousand rows), corpus
  * stats (N, avgdl) are one tiny pre-aggregated row, both re-join as
  * broadcasts, and the global top-k is a TakeOrderedAndProject heap.
  * [[searchFromIndex]] must reproduce [[KeywordSearch.bm25]] exactly —
  * `kw_search_indexed` registers the SAME oracle SQL as `kw_search_bm25`,
  * so the correctness gate is the equivalence proof of the rewrite.
  */
object KeywordIndex {
  val NumBuckets = 64

  /** Posting list build: explode tokens → one partial-aggregated shuffle
    * keyed by (term, doc). Zero-token docs vanish at the explode —
    * identical corpus-statistics semantics to [[KeywordSearch.termStats]].
    */
  def postings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), col("lang"),
        explode(tokens(col("text"))).as("term"))
      .groupBy("term", "doc_id", "source", "lang")
      .agg(count(lit(1)).as("tf"))

  /** Per-doc stats derived from the (already aggregated) postings. */
  def docStats(postings: DataFrame): DataFrame =
    postings.groupBy("doc_id", "source", "lang")
      .agg(sum("tf").as("dl"))

  /** The index dictionary: per-term document frequency and collection
    * frequency — the oracle-checkable summary of the index build (the
    * postings table itself is row-per-(term,doc) and order-unstable).
    */
  def dictionary(docs: DataFrame): DataFrame =
    postings(docs).groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").cast("long").as("cf"))
      .orderBy("term")

  val dictionaryOracle: String =
    s"""WITH toked AS (
       |  SELECT doc_id, unnest(${TextAnalysis.sqlToks}) AS term FROM documents),
       |postings AS (
       |  SELECT term, doc_id, count(*) AS tf FROM toked GROUP BY 1, 2)
       |SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
       |FROM postings
       |GROUP BY term
       |ORDER BY term""".stripMargin

  /** BM25 top-k from the inverted index: filter postings to the query
    * terms (bucket- and term-prunable), join per-term df and the one-row
    * corpus stats as broadcasts, score each posting map-side, sum partial
    * scores per doc, heap top-k. The corpus is never re-tokenized.
    */
  def searchFromIndex(postings: DataFrame, docstats: DataFrame,
                      terms: Seq[String], topK: Int = KeywordSearch.TopK): DataFrame = {
    import KeywordSearch.{K1, B}
    val hits = postings.filter(col("term").isin(terms: _*))
    val corpus = docstats.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))
    val termDf = hits.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = hits
      .join(broadcast(termDf), Seq("term"))
      .join(docstats.select("doc_id", "dl"), Seq("doc_id"))
      .join(broadcast(corpus))
      .select(col("doc_id"), col("source"), col("lang"),
        (log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf").cast("double") * (K1 + 1)) /
          (col("tf").cast("double") + lit(K1) *
            (lit(1 - B) + lit(B) * col("dl").cast("double") / col("avgdl"))))
          .as("partial"))
    scored.groupBy("doc_id", "source", "lang")
      .agg(round(sum("partial"), 4).as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(topK)
  }

  /** Materialize the index as bucket-partitioned parquet: postings land in
    * `postings/term_bucket=<h>/`, so a search's `.filter(term isin ...)`
    * prunes to |query terms| directories before any I/O. docstats and the
    * one-row corpus aggregate are written alongside (the tiny side).
    */
  def writeIndex(docs: DataFrame, path: String): Unit = {
    val p = postings(docs)
    p.withColumn("term_bucket", pmod(portableHash(col("term")), lit(NumBuckets)))
      .write.mode("overwrite").partitionBy("term_bucket")
      .parquet(s"$path/postings")
    docStats(p).write.mode("overwrite").parquet(s"$path/docstats")
  }

  /** Search the materialized index. The bucket filter is derived from the
    * query terms, so parquet partition pruning limits the scan to the
    * query terms' buckets (verified in the spec via PartitionFilters).
    */
  def searchIndex(spark: SparkSession, path: String, terms: Seq[String],
                  topK: Int = KeywordSearch.TopK): DataFrame = {
    val buckets = terms.map { t =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % NumBuckets
    }.distinct
    val p = spark.read.parquet(s"$path/postings")
      .filter(col("term_bucket").isin(buckets: _*) && col("term").isin(terms: _*))
    searchFromIndex(p, spark.read.parquet(s"$path/docstats"), terms, topK)
  }

  // --- wiring ---------------------------------------------------------------

  def qDictionary(s: SparkSession, dir: String): DataFrame =
    dictionary(Tables.documents(s, dir))

  /** Rows-only driver query: full postings materialization + search that
    * reads ONLY the query terms' term_bucket partitions from disk (the
    * partition-pruned path the spec asserts via PartitionFilters).
    */
  def qSearchMaterialized(s: SparkSession, dir: String): DataFrame = {
    val path = IndexCache.getOrBuild("kw_idx", dir)(
      writeIndex(Tables.documents(s, dir), _))
    searchIndex(s, path, KeywordSearch.QueryTerms)
  }

  /** In-line build + indexed search; must equal `kw_search_bm25` bitwise.
    *
    * The transient build is cheaper than the materialized one: postings
    * are filtered to the query terms BEFORE the (term, doc) aggregation
    * (the only shuffled token rows are query-term hits), and doc lengths
    * come from a zero-shuffle `size(tokens)` map instead of re-aggregating
    * the full postings — the same two-scan shape as
    * [[KeywordSearch.termStatsZeroShuffle]].
    */
  def qSearchIndexed(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val hits = docs.select(col("doc_id"), col("source"), col("lang"),
        explode(tokens(col("text"))).as("term"))
      .filter(col("term").isin(KeywordSearch.QueryTerms: _*))
      .groupBy("term", "doc_id", "source", "lang")
      .agg(count(lit(1)).as("tf"))
    val docstats = docs.select(col("doc_id"), col("source"), col("lang"),
        size(tokens(col("text"))).cast("long").as("dl"))
      .filter(col("dl") > 0)
    searchFromIndex(hits, docstats, KeywordSearch.QueryTerms)
  }

  /** Same oracle as `kw_search_bm25` — the equivalence proof. */
  val searchIndexedOracle: String = KeywordSearch.searchOracle
}
