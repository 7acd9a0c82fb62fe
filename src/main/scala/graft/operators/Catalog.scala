package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Collection management — the Spark-native counterparts of the
  * reference's Weaviate admin surface
  * (`src/database/weaviate_interface_v4.py`): `show_all_collections`
  * (L112), `show_collection_properties` (L143), `delete_collection`
  * (L155), `get_doc_count` (L170). Collections map to catalog tables /
  * views; properties map to schema columns.
  */
object Catalog {

  /** All registered collections (show_all_collections). */
  def listCollections(spark: SparkSession): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).toSeq.sorted

  /** Property (column) inventory of one collection
    * (show_collection_properties).
    */
  def collectionProperties(spark: SparkSession, name: String): DataFrame =
    spark.catalog.listColumns(name)
      .select(col("name"), col("dataType"), col("nullable"))
      .orderBy("name")

  /** Full collection configuration (show_collection_config,
    * weaviate_interface_v4.py:131): the vectorizer/index settings of a
    * collection. In graft a collection's "config" is its schema plus the
    * engine's search configuration — the vector column's dimension and
    * distance metric, the coarse-index geometry (nlist/nprobe), and the
    * BM25 parameters — one row per setting, alongside one row per
    * property (mirroring the detailed `list_all` dict the reference
    * returns).
    */
  def collectionConfig(spark: SparkSession, name: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, NumericType}
    import spark.implicits._
    val df = spark.table(name)
    // the vector column is the first NUMERIC array (a token array<string>
    // must not be reported as the vectorizer output)
    val vecCol = df.schema.fields.find(f => f.dataType match {
      case ArrayType(_: NumericType, _) => true
      case _ => false
    })
    val props = df.schema.fields.toSeq.map(f =>
      ("property", f.name, f.dataType.simpleString))
    // one bounded probe (LIMIT 1) for the dimension — a config call must
    // not scan the collection; an empty collection simply omits the row
    val vecDim = vecCol.flatMap { f =>
      df.select(size(col(f.name))).limit(1).collect().headOption
        .filter(!_.isNullAt(0)).map(_.getInt(0))
    }
    val cfg = Seq(
      ("config", "collection", name),
      ("config", "distance_metric", "cosine"),
      ("config", "vector_index", "ivf"),
      ("config", "ivf_nprobe", IvfIndex.NProbe.toString),
      ("config", "bm25_k1", KeywordSearch.K1.toString),
      ("config", "bm25_b", KeywordSearch.B.toString)) ++
      vecCol.map(f => ("config", "vector_column", f.name)) ++
      vecDim.map(d => ("config", "vector_dim", d.toString)) ++
      props
    cfg.toDF("kind", "key", "value").orderBy("kind", "key")
  }

  /** Drop a collection registration (delete_collection). */
  def deleteCollection(spark: SparkSession, name: String): Boolean =
    spark.catalog.dropTempView(name)

  /** Row count of a collection (get_doc_count — see also
    * [[KeywordSearch.docCount]] for the oracle-checked query form).
    */
  def docCount(spark: SparkSession, name: String): Long =
    spark.table(name).count()

  val PageSize = 10
  val PageOffset = 20

  /** Filtered, sorted, paginated object listing — the v4 client's
    * `fetch_objects(filters=, sort=, limit=, offset=)` browse surface
    * (the non-search read path of the reference's collection API).
    *
    * Scale note: ORDER BY + OFFSET/LIMIT plans as TakeOrderedAndProject
    * with limit = offset + pageSize — a bounded heap per partition, never
    * a global sort. Deep pagination (offset ≫ page) degrades by design;
    * at scale a keyset cursor (WHERE (n_chars, doc_id) < last_seen) keeps
    * every page a heap of size `pageSize` — same plan shape, so the
    * offset form is the API-parity query and the cursor form is the
    * documented 100 TB idiom.
    */
  def fetchObjectsPage(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.documents(spark, dir)
      .filter(col("lang") === "en")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(desc("n_chars"), asc("doc_id"))
      .offset(PageOffset)
      .limit(PageSize)

  val fetchObjectsPageOracle: String =
    s"""SELECT doc_id, source, n_chars
       |FROM documents
       |WHERE lang = 'en'
       |ORDER BY n_chars DESC, doc_id
       |LIMIT $PageSize OFFSET $PageOffset""".stripMargin
}
