package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ingest-side metadata join — the Spark-native
  * `join_all_transcripts_to_meta` + `convert_raw_data` (reference
  * `notebooks/data_ingest/data_ingest.py:190-222`,
  * `src/preprocessor/preprocessing.py:126-144`): join content to its
  * metadata record on the id key, drop unused fields (projection), coerce
  * types, and synthesize the episode URL
  * (`Utilities.create_video_url`, preprocessing.py:113-124).
  *
  * Scale: a 1:1 key equi-join; with both sides bucketed/partitioned by id
  * this is co-located at any scale (here the optimizer picks the join
  * strategy; AQE converts to broadcast when one side is small).
  */
object Ingest {

  def metaJoin(docs: DataFrame, meta: DataFrame): DataFrame =
    docs.join(meta, col("doc_id") === col("vec_id"))
      .select(
        col("doc_id"),
        concat(lit("https://www.youtube.com/watch?v="), col("doc_id")).as("episode_url"),
        col("label").cast("int").as("category"),
        col("n_chars").cast("bigint").as("content_length"),
        col("source"), col("lang"))
      .orderBy("doc_id")

  def query(s: SparkSession, dir: String): DataFrame =
    metaJoin(Tables.documents(s, dir),
      Tables.embeddings(s, dir).select("vec_id", "label"))

  val oracle: String =
    """SELECT doc_id,
      |  'https://www.youtube.com/watch?v=' || CAST(doc_id AS VARCHAR) AS episode_url,
      |  CAST(label AS INT) AS category,
      |  CAST(n_chars AS BIGINT) AS content_length,
      |  source, lang
      |FROM documents JOIN embeddings ON doc_id = vec_id
      |ORDER BY doc_id""".stripMargin
}
