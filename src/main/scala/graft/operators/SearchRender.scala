package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Search-result rendering — the Spark-native shape of
  * `app_functions.search_result` (reference `src/app_functions.py:163`:
  * each hit renders a watch URL + an HH:MM:SS timestamp) and
  * `create_video_url` (reference `src/preprocessor/preprocessing.py:113`:
  * `https://youtube.com/watch?v=<id>&list=<playlist>`).
  *
  * The engine's half is the deterministic projection: URL synthesis from
  * id columns and zero-padded HH:MM:SS formatting — pure column
  * expressions over the top-k hits (k rows; rendering never touches the
  * corpus scan).
  */
object SearchRender {

  /** Seconds → zero-padded "HH:MM:SS" (reference `convert_seconds`,
    * app_functions.py:41 — `time.strftime('%H:%M:%S', gmtime(s))`).
    */
  def hms(secs: Column): Column = {
    def pad2(c: Column) = lpad(c.cast("string"), 2, "0")
    concat(pad2(floor(secs / 3600)), lit(":"),
      pad2(floor(pmod(secs, lit(3600)) / 60)), lit(":"),
      pad2(pmod(secs, lit(60))))
  }

  /** Watch-URL synthesis from id + playlist columns. */
  def watchUrl(id: Column, playlist: Column): Column =
    concat(lit("https://www.youtube.com/watch?v="), id, lit("&list="), playlist)

  /** Render the vector-search top-k: join hit ids back to document
    * metadata (1:1 broadcast-sized — k rows drive the join) and emit the
    * UI projection. The synthetic duration (n_chars modulo 2h) stands in
    * for the reference's chapter timestamp.
    */
  def render(embs: DataFrame, docs: DataFrame, queryVecId: Long,
             k: Int = VectorSearch.TopK): DataFrame =
    VectorSearch.topK(embs, queryVecId, k)
      .join(docs.select(col("doc_id"), col("source"), col("n_chars")),
        col("vec_id") === col("doc_id"))
      .select(col("vec_id"), col("score"),
        watchUrl(col("doc_id").cast("string"), col("source")).as("url"),
        hms(pmod(col("n_chars"), lit(7200))).as("time_str"))
      .orderBy(desc("score"), asc("vec_id"))

  def query(s: SparkSession, dir: String): DataFrame =
    render(Tables.embeddings(s, dir), Tables.documents(s, dir),
      VectorSearch.QueryVecId)

  val oracle: String = {
    val topk =
      s"""SELECT vec_id,
         |  round(${VectorSearch.cosineSql("embedding", "q_emb")}, 4) AS score
         |FROM embeddings, q
         |WHERE vec_id <> ${VectorSearch.QueryVecId}
         |ORDER BY score DESC, vec_id
         |LIMIT ${VectorSearch.TopK}""".stripMargin
    s"""WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = ${VectorSearch.QueryVecId}),
       |hits AS ($topk)
       |SELECT vec_id, score,
       |  'https://www.youtube.com/watch?v=' || CAST(doc_id AS VARCHAR) || '&list=' || source AS url,
       |  lpad(CAST(CAST(floor((n_chars % 7200) / 3600) AS BIGINT) AS VARCHAR), 2, '0') || ':' ||
       |  lpad(CAST(CAST(floor(((n_chars % 7200) % 3600) / 60) AS BIGINT) AS VARCHAR), 2, '0') || ':' ||
       |  lpad(CAST((n_chars % 7200) % 60 AS VARCHAR), 2, '0') AS time_str
       |FROM hits JOIN documents ON vec_id = doc_id
       |ORDER BY score DESC, vec_id""".stripMargin
  }
}
