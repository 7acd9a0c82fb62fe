package graft.operators

import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting (reference `src/app_functions.py:47-88` uses tiktoken
  * for prompt budgeting), quality scoring, language ID, and content
  * fingerprinting. All pure column expressions — linear scans, no
  * shuffles, fully codegen'd.
  */
object TextAnalysis {

  val sqlToks = "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"

  // --- token counting ------------------------------------------------------

  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      wsTokenCount(col("text")).as("n_ws_tokens"),
      bpeTokenCount(col("text")).as("n_bpe_tokens"))
      .orderBy("doc_id")

  val tokenCountsOracle: String =
    s"""SELECT doc_id,
       |  len($sqlToks) AS n_tokens,
       |  len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS n_ws_tokens,
       |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+')) AS n_bpe_tokens
       |FROM documents
       |ORDER BY doc_id""".stripMargin

  // --- quality scoring -----------------------------------------------------

  /** English function words used for both quality and language scoring. */
  val StopEn: Seq[String] = Seq("the", "a", "an", "is", "of", "and", "to", "in")
  val StopDe: Seq[String] = Seq("der", "die", "das", "und", "ist", "ein")
  val StopFr: Seq[String] = Seq("le", "la", "les", "et", "est", "un")
  val StopEs: Seq[String] = Seq("el", "los", "las", "y", "es", "un")

  private def stopCount(words: Seq[String]): Column =
    size(filter(col("toks"), t => t.isin(words.map(lit): _*)))

  private def stopCountSql(words: Seq[String]): String =
    s"len(list_filter(toks, t -> t IN (${words.map(w => s"'$w'").mkString(", ")})))"

  /** Quality = mix of stopword density, alphabetic density and length —
    * the length/punct/stopword-ratio heuristic family used by pretraining
    * corpus filters (C4/Gopher-style rules).
    */
  def quality(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        round(stopCount(StopEn).cast("double") / size(col("toks")), 4).as("stop_ratio"),
        round(length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("double") /
          length(col("text")), 4).as("alpha_ratio"),
        ((size(col("toks")) >= 10) && (size(col("toks")) <= 1000) &&
          (stopCount(StopEn) > 0)).as("passes_filter"))
      .orderBy("doc_id")

  val qualityOracle: String =
    s"""WITH toked AS (SELECT doc_id, text, $sqlToks AS toks FROM documents)
       |SELECT doc_id,
       |  len(toks) AS n_tokens,
       |  round(CAST(${stopCountSql(StopEn)} AS DOUBLE) / len(toks), 4) AS stop_ratio,
       |  round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
       |        / length(text), 4) AS alpha_ratio,
       |  (len(toks) >= 10 AND len(toks) <= 1000 AND ${stopCountSql(StopEn)} > 0) AS passes_filter
       |FROM toked
       |ORDER BY doc_id""".stripMargin

  // --- language ID ---------------------------------------------------------

  /** Stopword-profile language ID: score = function-word hits per token
    * for each candidate language; argmax with fixed priority
    * en > de > fr > es, 'und' when nothing matches.
    */
  def langId(docs: DataFrame): DataFrame = {
    val scored = docs.select(col("doc_id"), col("lang").as("declared_lang"),
      tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("declared_lang"),
        stopCount(StopEn).as("s_en"), stopCount(StopDe).as("s_de"),
        stopCount(StopFr).as("s_fr"), stopCount(StopEs).as("s_es"))
    scored.select(col("doc_id"), col("declared_lang"),
      when(col("s_en") > 0 && col("s_en") >= col("s_de") &&
        col("s_en") >= col("s_fr") && col("s_en") >= col("s_es"), "en")
        .when(col("s_de") > 0 && col("s_de") >= col("s_fr") &&
          col("s_de") >= col("s_es"), "de")
        .when(col("s_fr") > 0 && col("s_fr") >= col("s_es"), "fr")
        .when(col("s_es") > 0, "es")
        .otherwise("und").as("predicted_lang"))
      .orderBy("doc_id")
  }

  val langIdOracle: String =
    s"""WITH toked AS (SELECT doc_id, lang AS declared_lang, $sqlToks AS toks FROM documents),
       |scored AS (
       |  SELECT doc_id, declared_lang,
       |    ${stopCountSql(StopEn)} AS s_en, ${stopCountSql(StopDe)} AS s_de,
       |    ${stopCountSql(StopFr)} AS s_fr, ${stopCountSql(StopEs)} AS s_es
       |  FROM toked)
       |SELECT doc_id, declared_lang,
       |  CASE WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
       |       WHEN s_de > 0 AND s_de >= s_fr AND s_de >= s_es THEN 'de'
       |       WHEN s_fr > 0 AND s_fr >= s_es THEN 'fr'
       |       WHEN s_es > 0 THEN 'es'
       |       ELSE 'und' END AS predicted_lang
       |FROM scored
       |ORDER BY doc_id""".stripMargin

  // --- corpus language-model score ----------------------------------------

  /** Unigram LM quality signal: mean log corpus-frequency of a doc's
    * tokens (the cheap stand-in for perplexity-based quality filters —
    * docs full of corpus-rare garbage score low).
    *
    * Scale shape: the unigram table is a tiny aggregate broadcast back
    * into a single exploded pass; one shuffle keyed by doc for the final
    * mean.
    */
  def lmScore(docs: DataFrame): DataFrame = {
    val toked = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
    val freq = toked.groupBy("tok").agg(count(lit(1)).as("tf"))
    val total = freq.agg(sum("tf").as("total"))
    toked
      .join(broadcast(freq), "tok")
      .join(broadcast(total))
      .groupBy("doc_id")
      .agg(round(avg(log(col("tf").cast("double") / col("total"))), 4).as("lm_score"))
      .orderBy("doc_id")
  }

  val lmScoreOracle: String =
    s"""WITH toked AS (
       |  SELECT doc_id, unnest($sqlToks) AS tok FROM documents),
       |freq AS (SELECT tok, count(*) AS tf FROM toked GROUP BY tok),
       |total AS (SELECT sum(tf) AS total FROM freq)
       |SELECT doc_id,
       |  round(avg(ln(CAST(tf AS DOUBLE) / total)), 4) AS lm_score
       |FROM toked JOIN freq USING (tok), total
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // --- fingerprinting ------------------------------------------------------

  /** Content fingerprint: md5 of normalized text plus the min portable
    * hash over word 3-shingles (a 1-perm MinHash sketch — the building
    * block of winnowing-style fingerprints).
    */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        md5(array_join(col("toks"), " ")).as("fp"),
        array_min(transform(shingles(col("toks"), 3), s => portableHash(s)))
          .as("min_shingle_hash"))
      .orderBy("doc_id")

  val fingerprintsOracle: String =
    s"""WITH toked AS (SELECT doc_id, $sqlToks AS toks FROM documents)
       |SELECT doc_id,
       |  md5(array_to_string(toks, ' ')) AS fp,
       |  list_min(list_transform(
       |    CASE WHEN len(toks) >= 3
       |      THEN list_transform(range(1, len(toks) - 1), i -> array_to_string(list_slice(toks, i, i + 2), ' '))
       |      ELSE [array_to_string(toks, ' ')] END,
       |    s -> CAST('0x' || substring(md5(s), 1, 15) AS BIGINT))) AS min_shingle_hash
       |FROM toked
       |ORDER BY doc_id""".stripMargin

  // --- repetition metrics --------------------------------------------------

  /** Gopher-style repetition signals: duplicate-token fraction and the
    * fraction of the doc covered by its most frequent bigram — the
    * filter family that catches boilerplate / keyword-stuffed /
    * looping-generator text. Pure per-row array expressions; the bigram
    * mode is a fused native shingle+count pass
    * ([[graft.functions.TextFunctions.topBigramCount]]) — O(n) per row
    * with no bigram-string materialization, where the interpreted-HOF
    * distinct×occurrences scan was O(n²), and the docs this filter
    * TARGETS (long, repetitive) are exactly where n² explodes.
    */
  def repetition(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        round(lit(1.0) - size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")), 4).as("dup_token_ratio"),
        round(topBigramCount(col("toks")).cast("double") /
          (size(col("toks")) - 1), 4).as("top_bigram_frac"))
      .orderBy("doc_id")

  /** Reference HOF formulation of the bigram-mode count (O(n²)
    * interpreted lambdas) — kept ONLY for the spec that pins the native
    * [[repetition]] form equal to it; never run on real data.
    */
  def repetitionHof(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("toks"),
        shingles(col("toks"), 2).as("bigrams"))
      .select(col("doc_id"),
        round(lit(1.0) - size(array_distinct(col("toks"))).cast("double") /
          size(col("toks")), 4).as("dup_token_ratio"),
        round(array_max(transform(array_distinct(col("bigrams")),
          b => org.apache.spark.sql.functions.size(
            filter(col("bigrams"), x => x === b)))).cast("double") /
          size(col("bigrams")), 4).as("top_bigram_frac"))
      .orderBy("doc_id")

  val repetitionOracle: String =
    s"""WITH toked AS (SELECT doc_id, $sqlToks AS toks FROM documents),
       |big AS (
       |  SELECT doc_id, toks,
       |    list_transform(range(1, len(toks)), i -> array_to_string(list_slice(toks, i, i + 1), ' ')) AS bigrams
       |  FROM toked WHERE len(toks) >= 2)
       |SELECT doc_id,
       |  round(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4) AS dup_token_ratio,
       |  round(CAST(list_max(list_transform(list_distinct(bigrams),
       |      b -> len(list_filter(bigrams, x -> x = b)))) AS DOUBLE)
       |    / len(bigrams), 4) AS top_bigram_frac
       |FROM big
       |ORDER BY doc_id""".stripMargin

  // --- corpus-level rollup -------------------------------------------------

  /** One-row corpus report: size, token volume, language mix, mean
    * quality signals — the summary a pipeline run logs per snapshot.
    * Composes the per-doc text ops into a single aggregate (tiny final
    * row; the scan is one pass).
    */
  def corpusStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"), tokens(col("text")).as("toks"))
      .select(col("lang"), size(col("toks")).as("n"),
        (size(array_distinct(col("toks"))).cast("double") /
          greatest(size(col("toks")), lit(1))).as("uniq"))
      .agg(count(lit(1)).as("n_docs"),
        sum("n").cast("long").as("total_tokens"),
        round(avg("n"), 4).as("avg_tokens"),
        sum((col("lang") === "en").cast("long")).cast("long").as("n_en"),
        round(avg("uniq"), 4).as("avg_uniq_ratio"))

  val corpusStatsOracle: String =
    s"""WITH toked AS (SELECT doc_id, lang, $sqlToks AS toks FROM documents)
       |SELECT count(*) AS n_docs,
       |  CAST(sum(len(toks)) AS BIGINT) AS total_tokens,
       |  round(avg(len(toks)), 4) AS avg_tokens,
       |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
       |  round(avg(CAST(len(list_distinct(toks)) AS DOUBLE) / greatest(len(toks), 1)), 4) AS avg_uniq_ratio
       |FROM toked""".stripMargin

  // --- vocabulary report ---------------------------------------------------

  val VocabK = 50

  /** Top-k corpus vocabulary by term frequency (with document
    * frequency) — the vocab/stopword-building pass of a pretraining
    * pipeline and the data behind df-ordered prefix filtering
    * ([[Dedup.ngramJaccard]]). Scale shape: explode → two-phase
    * partial aggregation (count + distinct-doc count), then heap top-k
    * (TakeOrderedAndProject) — never a full sort of the vocabulary.
    */
  def vocab(docs: DataFrame, k: Int = VocabK): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("tf"), countDistinct("doc_id").as("df"))
      .orderBy(desc("tf"), asc("term"))
      .limit(k)

  val vocabOracle: String =
    s"""WITH toked AS (
       |  SELECT doc_id, unnest($sqlToks) AS term FROM documents)
       |SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df
       |FROM toked
       |GROUP BY term
       |ORDER BY tf DESC, term
       |LIMIT $VocabK""".stripMargin

  // --- BPE pair statistics -------------------------------------------------

  val PairStatsK = 30

  /** Adjacent-token-pair frequencies — the corpus-scan half of one BPE
    * merge round (Sennrich et al. 2016: the merge candidate IS the
    * most-frequent adjacent pair): tf = total adjacent occurrences, df =
    * documents containing the pair. Tokenizer training at 100 TB is
    * bottlenecked on exactly this scan; the merge loop itself is
    * driver-side control flow over the tiny pair table.
    *
    * Scale shape: pairs come from the native word-shingle loop (k=2 —
    * one pass per row, no self-zip of exploded tokens), then one
    * partial-aggregated groupBy and a heap top-k. Same plan family as
    * the vocabulary report.
    */
  def pairStats(docs: DataFrame, k: Int = PairStatsK): DataFrame =
    // explode(array(..)) is the Generate barrier (see
    // KeywordSearch.termStatsZeroShuffle): without it the pushed-down
    // size() filter and the shingle projection would each re-run the
    // regex tokenization per row
    docs.select(col("doc_id"), explode(array(tokens(col("text")))).as("toks"))
      .filter(org.apache.spark.sql.functions.size(col("toks")) >= 2)
      .select(col("doc_id"), explode(shingles(col("toks"), 2)).as("pair"))
      .groupBy("pair")
      .agg(count(lit(1)).as("tf"), countDistinct("doc_id").as("df"))
      .orderBy(desc("tf"), asc("pair"))
      .limit(k)

  val pairStatsOracle: String =
    s"""WITH toked AS (
       |  SELECT doc_id, $sqlToks AS toks FROM documents),
       |pairs AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(toks)),
       |      i -> toks[i] || ' ' || toks[i + 1])) AS pair
       |  FROM toked WHERE len(toks) >= 2)
       |SELECT pair, count(*) AS tf, count(DISTINCT doc_id) AS df
       |FROM pairs
       |GROUP BY pair
       |ORDER BY tf DESC, pair
       |LIMIT $PairStatsK""".stripMargin

  // --- BPE segmentation apply ----------------------------------------------

  /** Fixed merge table (priority order) — the output of BPE training
    * (Sennrich et al. 2016; [[pairStats]] is the corpus scan of one
    * training round). Constants, like [[KeywordSearch.QueryTerms]], so
    * both engines replay the identical segmentation.
    */
  val BpeMerges: Seq[(String, String)] = Seq(
    "s" -> "t", "a" -> "r", "t" -> "a", "ta" -> "b",
    "o" -> "w", "e" -> "y", "ar" -> "t", "st" -> "r")

  /** Apply a learned BPE merge table to the corpus vocabulary: each
    * dictionary term splits to characters, then each merge (in priority
    * order) joins every left-to-right non-overlapping occurrence of its
    * pair — the tokenizer-apply step of the BPE story whose
    * learning-side corpus scan is [[pairStats]].
    *
    * The merge loop is an unrolled chain of codegen'd `replace` calls
    * over a space-delimited piece string (boundaries keep a pair from
    * matching inside a previously merged piece). Left-to-right
    * non-overlapping replacement is the defined semantics in BOTH
    * engines, so the oracle replays the segmentation bitwise — including
    * the boundary-sharing case where directly adjacent occurrences of
    * the same pair consume their shared separator.
    *
    * Scale design: the merge chain is a pure map over the DICTIONARY
    * (distinct terms), not the corpus — 100 TB of text funnels through
    * one distinct-aggregate into a vocabulary-sized segmentation job;
    * re-tokenizing the corpus is then a broadcast join of the
    * segmentation table.
    */
  def bpeEncode(docs: DataFrame): DataFrame = {
    val dict = docs.select(explode(tokens(col("text"))).as("term")).distinct()
      .withColumn("s0", concat(lit(" "), regexp_replace(col("term"), "(.)", "$1 ")))
    val merged = BpeMerges.zipWithIndex.foldLeft(dict) {
      case (df, ((a, b), i)) =>
        df.withColumn(s"s${i + 1}", expr(s"replace(s$i, ' $a $b ', ' $a$b ')"))
    }
    merged.select(col("term"),
      trim(col(s"s${BpeMerges.length}")).as("encoded"))
      .withColumn("n_pieces", size(split(col("encoded"), " ")))
      .orderBy("term")
  }

  val bpeEncodeOracle: String = {
    val chain = BpeMerges.foldLeft("s") { case (acc, (a, b)) =>
      s"replace($acc, ' $a $b ', ' $a$b ')"
    }
    s"""WITH dict AS (SELECT DISTINCT unnest($sqlToks) AS term FROM documents),
       |spaced AS (
       |  SELECT term, ' ' || regexp_replace(term, '(.)', '\\1 ', 'g') AS s
       |  FROM dict)
       |SELECT term, trim($chain) AS encoded,
       |  len(string_split(trim($chain), ' ')) AS n_pieces
       |FROM spaced
       |ORDER BY term""".stripMargin
  }

  // --- BPE merge training --------------------------------------------------

  val BpeTrainRounds = 8

  /** Learn a BPE merge table from the corpus itself (Sennrich et al.
    * 2016) — the training loop whose single-round corpus scan is
    * [[pairStats]] and whose apply step is [[bpeEncode]]. Each round
    * counts adjacent symbol pairs over the word-frequency dictionary
    * (weighted by term frequency), merges the most frequent pair
    * (ties broken lexicographically), and re-segments.
    *
    * Scale design: the corpus funnels through ONE groupBy into a
    * vocabulary-sized `(segmentation, term-count)` frame, checkpointed
    * once; every training round is then a partial-aggregated pair count
    * over that small frame plus a 1-row argmax driver probe (bounded by
    * construction, the IVF-centroid pattern) and a codegen'd `replace`.
    * This is exactly how production tokenizer trainers scale: 100 TB of
    * text costs one scan; the merge loop never touches the corpus again.
    *
    * Oracle: the full training derivation unrolled in SQL — each round's
    * pair count, argmax, and re-segmentation as chained CTEs, so DuckDB
    * re-learns the identical merge table from the raw corpus (no
    * literal replay; both engines share left-to-right non-overlapping
    * `replace` semantics, see [[bpeEncode]]).
    */
  /** The training loop itself; returns the merge table as driver rows
    * (bounded: ≤ rounds entries — the learned model artifact).
    */
  def bpeTrainMerges(docs: DataFrame, rounds: Int = BpeTrainRounds): Seq[(Int, String, String, String, Long)] = {
    val vocab = docs.select(explode(tokens(col("text"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .select(concat(lit(" "), regexp_replace(col("term"), "(.)", "$1 ")).as("s"),
        col("cnt"))
      .localCheckpoint()
    var cur = vocab
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
    var done = false
    while (!done && merges.length < rounds) {
      val top = cur
        .select(col("cnt"), explode(shingles(split(trim(col("s")), " "), 2)).as("pair"))
        .filter(col("pair").contains(" "))
        .groupBy("pair").agg(sum("cnt").as("freq"))
        .orderBy(desc("freq"), asc("pair"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val Array(a, b) = top(0).getString(0).split(" ", 2)
        // tokens are [a-z0-9]+ so the interpolated replace is injection-safe
        require(a.matches("[a-z0-9]+") && b.matches("[a-z0-9]+"), s"bad pair: '$a' '$b'")
        merges += ((merges.length + 1, a, b, a + b, top(0).getLong(1)))
        cur = cur.withColumn("s", expr(s"replace(s, ' $a $b ', ' $a$b ')"))
      }
    }
    Checkpoints.release(vocab) // fully consumed by the training loop
    merges.toSeq
  }

  def bpeTrain(docs: DataFrame, rounds: Int = BpeTrainRounds): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeTrainMerges(docs, rounds)
      .toDF("rn", "left_sym", "right_sym", "merged", "pair_freq")
      .orderBy("rn")
  }

  /** Shared WITH-chain: per-round pair count (p_i), argmax merge (m_i),
    * and re-segmentation (w_i). The apply step LEFT JOINs the 1-row
    * argmax so an exhausted corpus (m_i empty) passes the dictionary
    * through unchanged — mirroring the engine's early exit.
    */
  private def bpeRoundCtes(rounds: Int): String = {
    def pairCte(i: Int) =
      s"""p$i AS (
         |  SELECT pair, CAST(sum(cnt) AS BIGINT) AS freq FROM (
         |    SELECT cnt, unnest(list_transform(range(1, len(pc)),
         |      i -> pc[i] || ' ' || pc[i + 1])) AS pair
         |    FROM (SELECT string_split(trim(s), ' ') AS pc, cnt FROM w${i - 1}))
         |  GROUP BY pair)"""
    def argmaxCte(i: Int) =
      s"m$i AS (SELECT pair, freq FROM p$i ORDER BY freq DESC, pair LIMIT 1)"
    def applyCte(i: Int) =
      s"""w$i AS (
         |  SELECT w.term,
         |    CASE WHEN m.pair IS NULL THEN w.s ELSE replace(w.s,
         |      ' ' || string_split(m.pair, ' ')[1] || ' ' || string_split(m.pair, ' ')[2] || ' ',
         |      ' ' || string_split(m.pair, ' ')[1] || string_split(m.pair, ' ')[2] || ' ') END AS s,
         |    w.cnt
         |  FROM w${i - 1} w LEFT JOIN m$i m ON TRUE)"""
    val roundCtes = (1 to rounds).flatMap(i => Seq(pairCte(i), argmaxCte(i), applyCte(i)))
      .mkString(",\n")
    s"""vocab AS (
       |  SELECT term, count(*) AS cnt
       |  FROM (SELECT unnest($sqlToks) AS term FROM documents) GROUP BY term),
       |w0 AS (SELECT term, ' ' || regexp_replace(term, '(.)', '\\1 ', 'g') AS s, cnt FROM vocab),
       |$roundCtes"""
  }

  def bpeTrainSql(rounds: Int = BpeTrainRounds): String = {
    val union = (1 to rounds).map { i =>
      s"""SELECT $i AS rn, string_split(pair, ' ')[1] AS left_sym,
         |  string_split(pair, ' ')[2] AS right_sym,
         |  replace(pair, ' ', '') AS merged, freq AS pair_freq FROM m$i"""
    }.mkString("\nUNION ALL\n")
    s"""WITH ${bpeRoundCtes(rounds)}
       |SELECT * FROM (
       |$union
       |) ORDER BY rn""".stripMargin
  }

  /** Segment the corpus dictionary with the merge table [[bpeTrain]]
    * just learned — the end-to-end tokenizer pipeline (train on the
    * corpus, tokenize the corpus), vs [[bpeEncode]]'s fixed table. The
    * learned merges transfer engine→apply as a bounded driver artifact
    * (≤ rounds rows, the IVF-centroid pattern); the oracle instead
    * re-learns AND re-applies them in one unrolled CTE chain, so the
    * whole pipeline is corpus-derived SQL with no literal replay.
    */
  /** Segmentation table for a learned merge list (vocabulary-sized). */
  def bpeApplyMerges(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val dict = docs.select(explode(tokens(col("text"))).as("term")).distinct()
      .withColumn("s0", concat(lit(" "), regexp_replace(col("term"), "(.)", "$1 ")))
    val merged = merges.zipWithIndex.foldLeft(dict) {
      case (df, ((a, b), i)) =>
        df.withColumn(s"s${i + 1}", expr(s"replace(s$i, ' $a $b ', ' $a$b ')"))
    }
    merged.select(col("term"), trim(col(s"s${merges.length}")).as("encoded"))
      .withColumn("n_pieces", size(split(col("encoded"), " ")))
      .orderBy("term")
  }

  def bpeEncodeLearned(docs: DataFrame, rounds: Int = BpeTrainRounds): DataFrame =
    bpeApplyMerges(docs, bpeTrainMerges(docs, rounds).map(m => (m._2, m._3)))

  /** Tokenizer fertility report: pieces-per-word by source under the
    * learned merge table — the standard "how well does this tokenizer
    * compress my corpus" metric. The segmentation table is
    * vocabulary-sized and broadcast; the corpus side is one explode +
    * partial-aggregated groupBy. Fertility divides two exact integer
    * sums once at the output edge, so the round is bitwise-stable.
    */
  def bpeCompression(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val seg = bpeApplyMerges(docs, merges).select(col("term"), col("n_pieces"))
    docs.select(col("source"), explode(tokens(col("text"))).as("term"))
      .join(broadcast(seg), Seq("term"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_words"), sum(col("n_pieces").cast("long")).as("np"))
      .select(col("source"), col("n_words"), col("np").as("n_pieces"),
        round(col("np").cast("double") / col("n_words"), 4).as("fertility"))
      .orderBy("source")
  }

  def bpeEncodeLearnedSql(rounds: Int = BpeTrainRounds): String =
    s"""WITH ${bpeRoundCtes(rounds)}
       |SELECT term, trim(s) AS encoded,
       |  len(string_split(trim(s), ' ')) AS n_pieces
       |FROM w$rounds
       |ORDER BY term""".stripMargin

  def bpeCompressionSql(rounds: Int = BpeTrainRounds): String =
    s"""WITH ${bpeRoundCtes(rounds)},
       |seg AS (
       |  SELECT term, len(string_split(trim(s), ' ')) AS n_pieces FROM w$rounds),
       |occ AS (
       |  SELECT source, unnest($sqlToks) AS term FROM documents)
       |SELECT source, count(*) AS n_words,
       |  CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
       |  round(CAST(sum(n_pieces) AS DOUBLE) / count(*), 4) AS fertility
       |FROM occ JOIN seg USING (term)
       |GROUP BY source
       |ORDER BY source""".stripMargin

  /** Per-dir learned-merge cache: the three BPE driver queries (train /
    * encode / compression report) share one training run — the
    * standing-model-artifact pattern ([[LearnedReranker]]).
    */
  private val mergeCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(Int, String, String, String, Long)]]()

  private def learnedMerges(s: SparkSession, dir: String): Seq[(Int, String, String, String, Long)] =
    mergeCache.computeIfAbsent(dir, d => bpeTrainMerges(Tables.documents(s, d)))

  // --- bigram LM scoring ---------------------------------------------------

  /** Bigram-LM document score: mean log conditional probability
    * ln(c(w_{i-1} w_i) / c(w_{i-1} ·)) over the doc's bigrams, with both
    * counts from the corpus itself — the conditional-perplexity upgrade
    * of [[lmScore]]'s unigram filter (the CCNet/KenLM perplexity-filter
    * family, with the corpus standing in for the reference LM).
    *
    * Scale design: the bigram scan reuses the native 2-shingle pass
    * (one explode, partial-aggregated counts); prefix counts derive from
    * the bigram table itself (sum over first token — no second corpus
    * scan). The count tables here ride broadcast joins; past broadcast
    * size the same plan runs as two keyed shuffle joins on pair/tok1 —
    * swap `broadcast()` off, nothing else changes.
    */
  def lmBigram(docs: DataFrame): DataFrame = {
    val pairs = docs
      .select(col("doc_id"), explode(array(tokens(col("text")))).as("toks"))
      .filter(org.apache.spark.sql.functions.size(col("toks")) >= 2)
      .select(col("doc_id"), explode(shingles(col("toks"), 2)).as("pair"))
    val pairCounts = pairs.groupBy("pair").agg(count(lit(1)).as("c_pair"))
    val prefixCounts = pairCounts
      .groupBy(split(col("pair"), " ").getItem(0).as("tok1"))
      .agg(sum("c_pair").as("c_prefix"))
    pairs.join(broadcast(pairCounts), "pair")
      .withColumn("tok1", split(col("pair"), " ").getItem(0))
      .join(broadcast(prefixCounts), "tok1")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(log(col("c_pair").cast("double") / col("c_prefix"))), 4)
          .as("bigram_lm_score"))
      .orderBy("doc_id")
  }

  val lmBigramOracle: String =
    s"""WITH toked AS (
       |  SELECT doc_id, $sqlToks AS toks FROM documents),
       |pairs AS (
       |  SELECT doc_id,
       |    unnest(list_transform(range(1, len(toks)),
       |      i -> toks[i] || ' ' || toks[i + 1])) AS pair
       |  FROM toked WHERE len(toks) >= 2),
       |pc AS (SELECT pair, count(*) AS c_pair FROM pairs GROUP BY pair),
       |pfx AS (
       |  SELECT string_split(pair, ' ')[1] AS tok1,
       |    CAST(sum(c_pair) AS BIGINT) AS c_prefix
       |  FROM pc GROUP BY 1)
       |SELECT doc_id, count(*) AS n_bigrams,
       |  round(avg(ln(CAST(c_pair AS DOUBLE) / c_prefix)), 4) AS bigram_lm_score
       |FROM pairs
       |JOIN pc USING (pair)
       |JOIN pfx ON string_split(pair, ' ')[1] = pfx.tok1
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  // --- PII redaction -------------------------------------------------------

  /** Email/phone redaction — the scrub pass every training-data pipeline
    * runs before corpus release. Patterns kept to the RE2-compatible
    * subset so Spark (java.util.regex) and DuckDB (RE2) agree literally;
    * masking is global per doc (both engines replace all matches). Counts
    * come from `regexp_extract_all` lengths, so the audit trail (how many
    * hits per doc) is part of the same single scan.
    */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhoneRe = "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

  def redact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      md5(regexp_replace(regexp_replace(col("text"), EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>")).as("redacted_hash"),
      size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("text"), lit(PhoneRe), lit(0))).as("n_phones"))
      .orderBy("doc_id")

  val redactOracle: String = {
    val email = EmailRe
    val phone = PhoneRe
    s"""SELECT doc_id,
       |  md5(regexp_replace(regexp_replace(text, '$email', '<EMAIL>', 'g'),
       |    '$phone', '<PHONE>', 'g')) AS redacted_hash,
       |  len(regexp_extract_all(text, '$email')) AS n_emails,
       |  len(regexp_extract_all(text, '$phone')) AS n_phones
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  // --- deterministic corpus sampling ---------------------------------------

  val SampleRatePct = 30

  /** Hash-based deterministic sampling — the reproducible downsample
    * every corpus-building job needs (same doc set on every run, no RNG
    * state, stable under re-partitioning; at 100 TB a `rand()` sample is
    * neither reproducible nor resumable). Keeps docs whose content-hash
    * bucket falls under the rate.
    */
  def sample(docs: DataFrame, ratePct: Int = SampleRatePct): DataFrame =
    docs.select(col("doc_id"), col("source"),
      pmod(portableHash(concat(lit("sample#"), col("doc_id").cast("string"))),
        lit(100)).as("bucket"))
      .filter(col("bucket") < ratePct)
      .orderBy("doc_id")

  def sampleOracle(ratePct: Int = SampleRatePct): String =
    s"""SELECT doc_id, source,
       |  CAST('0x' || substring(md5('sample#' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS bucket
       |FROM documents
       |WHERE CAST('0x' || substring(md5('sample#' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 < $ratePct
       |ORDER BY doc_id""".stripMargin

  // --- wiring --------------------------------------------------------------

  def qTokenCounts(s: SparkSession, dir: String): DataFrame = tokenCounts(Tables.documents(s, dir))
  def qQuality(s: SparkSession, dir: String): DataFrame = quality(Tables.documents(s, dir))
  def qLangId(s: SparkSession, dir: String): DataFrame = langId(Tables.documents(s, dir))
  def qFingerprints(s: SparkSession, dir: String): DataFrame = fingerprints(Tables.documents(s, dir))
  def qLmScore(s: SparkSession, dir: String): DataFrame = lmScore(Tables.documents(s, dir))
  def qRedact(s: SparkSession, dir: String): DataFrame = redact(Tables.documents(s, dir))
  def qRepetition(s: SparkSession, dir: String): DataFrame = repetition(Tables.documents(s, dir))
  def qCorpusStats(s: SparkSession, dir: String): DataFrame = corpusStats(Tables.documents(s, dir))
  def qVocab(s: SparkSession, dir: String): DataFrame = vocab(Tables.documents(s, dir))
  def qPairStats(s: SparkSession, dir: String): DataFrame = pairStats(Tables.documents(s, dir))
  def qBpeEncode(s: SparkSession, dir: String): DataFrame = bpeEncode(Tables.documents(s, dir))
  def qBpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    learnedMerges(s, dir)
      .toDF("rn", "left_sym", "right_sym", "merged", "pair_freq")
      .orderBy("rn")
  }
  def qBpeEncodeLearned(s: SparkSession, dir: String): DataFrame =
    bpeApplyMerges(Tables.documents(s, dir), learnedMerges(s, dir).map(m => (m._2, m._3)))
  def qBpeCompression(s: SparkSession, dir: String): DataFrame =
    bpeCompression(Tables.documents(s, dir), learnedMerges(s, dir).map(m => (m._2, m._3)))
  def qLmBigram(s: SparkSession, dir: String): DataFrame = lmBigram(Tables.documents(s, dir))
  def qSample(s: SparkSession, dir: String): DataFrame = sample(Tables.documents(s, dir))
}
