package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by chunking, BM25, dedup and text analysis.
  *
  * Everything here is a pure column expression (codegen'd by Tungsten, no
  * UDFs) and every construct has an exact DuckDB equivalent so the oracle
  * can replay pipelines bit-for-bit:
  *   - tokenization  = split on `[^a-z0-9]+` after lowercasing
  *   - portable hash = first 15 hex chars of md5 as a 60-bit non-negative
  *     long (`conv(substr(md5(x),1,15),16,10)` ↔ DuckDB
  *     `cast('0x'||substring(md5(x),1,15) as bigint)`)
  *
  * Reference behaviors modeled: tiktoken-style token counting in
  * `src/app_functions.py:47-88` (validate_token_threshold) and the chunking
  * notebooks (chunk_size/overlap in `src/evaluation/retrieval_evaluation.py`).
  */
object TextFunctions {

  /** Lowercased alphanumeric tokens, empty strings dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** Whitespace token count (fast approximation). */
  def wsTokenCount(text: Column): Column =
    size(filter(split(text, "\\s+"), t => length(t) > 0))

  /** BPE-ish token count: alpha runs and digit runs count separately,
    * mirroring how byte-pair vocabularies split number/word boundaries.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+"), lit(0)))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** 60-bit non-negative hash, identical in Spark and DuckDB. */
  def portableHash(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("bigint")

  /** Canonical text: lowercase, alnum runs joined by single spaces. */
  def normalized(text: Column): Column = array_join(tokens(text), " ")

  /** Content fingerprint over normalized text (reference: exact-identity of
    * a chunk — doc_id derivation — generalized to content addressing).
    */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Word k-shingles over a token array; docs shorter than k yield their
    * whole token list as a single shingle. Backed by the native
    * [[org.apache.spark.sql.graftshim.WordShingles]] loop.
    */
  def shingles(toks: Column, k: Int): Column = {
    import org.apache.spark.sql.graftshim.{Shims, WordShingles}
    Shims.column(WordShingles(Shims.expression(toks), k))
  }

  /** `[dl, tf(terms(0)), ..]` in one token-array pass — the map-side BM25
    * statistics vector. Backed by the native
    * [[org.apache.spark.sql.graftshim.TermFrequencies]] loop.
    */
  def termFrequencies(toks: Column, terms: Seq[String]): Column = {
    import org.apache.spark.sql.graftshim.{Shims, TermFrequencies}
    Shims.column(TermFrequencies(Shims.expression(toks), terms))
  }

  /** Whole-document SimHash over a token array in one native pass — no
    * explode, no shuffle. Null for an empty array (the exploded
    * groupBy form emits no row for a tokenless doc). Backed by
    * [[org.apache.spark.sql.graftshim.SimHash]].
    */
  def simhashNative(toks: Column, bits: Int): Column = {
    import org.apache.spark.sql.graftshim.{Shims, SimHash}
    Shims.column(SimHash(Shims.expression(toks), bits))
  }

  /** MinHash signature over a shingle array in one native pass — no
    * explode, no shuffle. Null for an empty array. Backed by
    * [[org.apache.spark.sql.graftshim.MinHashSig]].
    */
  def minhashSig(shingleArr: Column, perms: Seq[(Long, Long)], p: Long): Column = {
    import org.apache.spark.sql.graftshim.{MinHashSig, Shims}
    Shims.column(MinHashSig(Shims.expression(shingleArr), perms, p))
  }

  /** Count of the most frequent adjacent token pair in one fused native
    * pass — equivalent to the O(n²) interpreted-HOF formulation
    * `array_max(transform(array_distinct(bigrams), b =>
    * size(filter(bigrams, x => x === b))))` but O(n), with no
    * bigram-string materialization. Backed by
    * [[org.apache.spark.sql.graftshim.TopBigramCount]].
    */
  def topBigramCount(toks: Column): Column = {
    import org.apache.spark.sql.graftshim.{Shims, TopBigramCount}
    Shims.column(TopBigramCount(Shims.expression(toks)))
  }

  /** Reference formulation of [[shingles]] via built-in higher-order
    * functions only (kept for cross-checking the native expression).
    */
  def shinglesHof(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(1), size(toks) - (k - 1)),
        i => array_join(slice(toks, i, lit(k)), " ")))
      .otherwise(array(array_join(toks, " ")))
}
