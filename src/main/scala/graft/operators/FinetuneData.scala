package graft.operators

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding fine-tune dataset generation — the Spark-native
  * `QueryContextGenerator` (reference
  * `src/evaluation/retrieval_evaluation.py`: `_clean_validate_data`,
  * `train_val_split`, `_remove_bad_questions`) + the triplet format the
  * fine-tuning notebook trains on (notebook 6 `format_training_dataset`:
  * anchor / positive / hard_negative for MultipleNegativesRankingLoss).
  *
  * The reference asks an LLM for a question per chunk; the inference
  * slot's deterministic stand-in is an extractive probe — the doc's
  * `QTokens` globally-rarest tokens (rarity = corpus document frequency,
  * the distinctive content a question would target), with the
  * `_remove_bad_questions` removal words excluded from the probe.
  *
  * Pipeline, all declarative:
  *   1. clean/validate: keep docs longer than the corpus MEDIAN length
  *      (`_clean_validate_data`'s default `total_chars` = the 50th
  *      percentile — exact interpolated percentile, portable to DuckDB's
  *      quantile_cont);
  *   2. deterministic "shuffle": order by a portable content-keyed hash
  *      — the reference's random.shuffle made reproducible — and take the
  *      first `trainN` docs as train, the next `valN` as validation
  *      (disjoint, as in `train_val_split`);
  *   3. anchor probe per selected doc (rarity-ordered, bad words out);
  *   4. hard-negative mining: each selected doc's nearest OTHER doc by
  *      embedding cosine — one corpus scan, selected side broadcast,
  *      bounded heap, no window over the corpus.
  *
  * Scale: the median is one tiny agg (swap `approx_percentile` at
  * 100 TB); selection is a TakeOrderedAndProject heap (trainN+valN
  * winners, no global sort materialized); the df dictionary is one
  * corpus agg broadcast to the (trainN+valN)-row side; negative mining
  * is the [[VectorSearch.batchTopK]] single-scan shape.
  */
object FinetuneData {
  val TrainN = 20
  val ValN = 5
  val QTokens = 5
  val RemovalWords = Seq("transcript", "episode", "excerpt")

  def triplets(docs: DataFrame, embs: DataFrame, trainN: Int = TrainN,
               valN: Int = ValN): DataFrame = {
    val med = docs.agg(expr("percentile(n_chars, 0.5)").as("med"))
    // deterministic shuffle-rank; heap-select the trainN+valN winners
    val selected = docs.join(broadcast(med))
      .filter(col("n_chars") > col("med"))
      .select(col("doc_id"), col("text"),
        portableHash(concat(lit("ft#"), col("doc_id").cast("string"))).as("h"))
      .orderBy(asc("h"), asc("doc_id"))
      .limit(trainN + valN)
    // rank within the tiny selected set only (trainN+valN rows)
    val split = selected
      .withColumn("rn", row_number().over(Window.orderBy(asc("h"), asc("doc_id"))))
      .withColumn("split", when(col("rn") <= trainN, lit("train")).otherwise(lit("val")))
    // anchor probe: per-doc QTokens rarest corpus tokens, bad words out
    val df = docs.select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
    val anchors = split
      .select(col("doc_id"), col("split"), explode(array_distinct(tokens(col("text")))).as("tok"))
      .filter(!col("tok").isInCollection(RemovalWords))
      .join(broadcast(df), "tok")
      .groupBy("doc_id", "split")
      // rarity order via sortable padded strings "0000000df#tok" — the
      // same lexicographic order in Spark and DuckDB (structs don't
      // sort identically across engines); strip the 11-char prefix
      .agg(array_join(transform(
        slice(array_sort(collect_list(
          concat(lpad(col("df").cast("string"), 10, "0"), lit("#"), col("tok")))),
          1, QTokens),
        t => substring(t, 12, 1000)), " ").as("anchor"))
    // hard negative: nearest non-self doc by embedding cosine
    val qs = split.join(embs, col("doc_id") === col("vec_id"))
      .select(col("doc_id").as("q_id"), col("embedding").as("q_emb"))
    val negs = embs.join(broadcast(qs), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        cosineSim(col("embedding"), col("q_emb")).as("s"))
      .groupBy("q_id")
      .agg(topKByScore(col("s"), col("vec_id"), 1).as("top"))
      .select(col("q_id").as("doc_id"), col("top")(0).getField("id").as("neg_id"),
        round(col("top")(0).getField("score"), 4).as("neg_score"))
    anchors.join(negs, Seq("doc_id"))
      .select(col("doc_id"), col("split"), col("anchor"), col("neg_id"), col("neg_score"))
      .orderBy("doc_id")
  }

  def tripletsSql(trainN: Int = TrainN, valN: Int = ValN): String = {
    val removal = RemovalWords.map(w => s"'$w'").mkString("(", ", ", ")")
    s"""WITH med AS (SELECT quantile_cont(n_chars, 0.5) AS med FROM documents),
       |selected AS (
       |  SELECT doc_id, text,
       |    CAST('0x' || substring(md5('ft#' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
       |  FROM documents, med WHERE n_chars > med
       |  ORDER BY h, doc_id LIMIT ${trainN + valN}),
       |split AS (
       |  SELECT doc_id, text,
       |    CASE WHEN row_number() OVER (ORDER BY h, doc_id) <= $trainN
       |      THEN 'train' ELSE 'val' END AS split
       |  FROM selected),
       |df AS (
       |  SELECT tok, count(*) AS df
       |  FROM (SELECT doc_id, unnest(list_distinct(${TextAnalysis.sqlToks})) AS tok
       |        FROM documents)
       |  GROUP BY tok),
       |anchors AS (
       |  SELECT doc_id, split,
       |    array_to_string(list_transform(
       |      (list_sort(list(lpad(CAST(df.df AS VARCHAR), 10, '0') || '#' || tok)))[1:$QTokens],
       |      p -> substring(p, 12, 1000)), ' ') AS anchor
       |  FROM (SELECT doc_id, split, unnest(list_distinct(${TextAnalysis.sqlToks})) AS tok
       |        FROM split)
       |  JOIN df USING (tok)
       |  WHERE tok NOT IN $removal
       |  GROUP BY doc_id, split),
       |scored AS (
       |  SELECT s.doc_id, e.vec_id,
       |    ${VectorSearch.cosineSql("e.embedding", "q.embedding")} AS s
       |  FROM split s
       |  JOIN embeddings q ON s.doc_id = q.vec_id
       |  JOIN embeddings e ON e.vec_id <> s.doc_id),
       |negs AS (
       |  SELECT doc_id, vec_id AS neg_id, round(s, 4) AS neg_score,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, vec_id) AS rn
       |  FROM scored QUALIFY rn = 1)
       |SELECT doc_id, split, anchor, neg_id, neg_score
       |FROM anchors JOIN negs USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  def query(s: SparkSession, dir: String): DataFrame =
    triplets(Tables.documents(s, dir), Tables.embeddings(s, dir))

  val oracle: String = tripletsSql()
}
