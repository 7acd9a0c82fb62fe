package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Collection management — the Spark-native counterparts of the
  * reference's Weaviate admin surface
  * (`src/database/weaviate_interface_v4.py`): `create_collection` (L77
  * client / L383 indexer), `batch_index_data` (L409),
  * `show_all_collections` (L112), `show_collection_properties` (L143),
  * `delete_collection` (L155), `get_doc_count` (L170). Collections map
  * to catalog tables / views; properties map to schema columns.
  */
object Catalog {

  /** Declared collection property — the reference's
    * `weaviate.classes.config.Property` shape
    * (`src/database/properties_template.py`): a name, a portable data
    * type, and the two index intents. `dataType` takes the reference's
    * lower-cased names: `text`, `int`, `number`, `bool`, `date`,
    * `text_array`, `number_array`, `vector`.
    */
  final case class Property(name: String, dataType: String,
                            description: String = "",
                            indexFilterable: Boolean = true,
                            indexSearchable: Boolean = false)

  private[operators] final case class CollectionMeta(
    properties: Seq[Property], description: String)

  /** Declared-config registry for collections created through
    * [[createCollection]] (a temp view carries no property-level
    * metadata of its own). JVM-scoped like the view registry it
    * mirrors.
    */
  private val declared =
    new java.util.concurrent.ConcurrentHashMap[String, CollectionMeta]()

  private def sparkType(dt: String): org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case "text"         => StringType
      case "int"          => LongType
      case "number"       => DoubleType
      case "bool"         => BooleanType
      case "date"         => TimestampType
      case "text_array"   => ArrayType(StringType)
      case "number_array" => ArrayType(DoubleType)
      case "vector"       => ArrayType(FloatType)
      case other => throw new IllegalArgumentException(
        s"unknown property data type '$other'")
    }
  }

  /** Create an EMPTY collection with the declared schema
    * (create_collection, ref L77/L383): registers a queryable view with
    * one column per property and records the declared config so
    * [[collectionConfig]] reflects it. Returns false (no-op) when the
    * collection already exists — the reference prints "already exists"
    * and returns; hyphenated names are rejected exactly as the
    * reference's indexer does (L392).
    *
    * Scale note: the registration is metadata-only (an empty frame with
    * a declared schema — no job runs); on a real cluster the same call
    * maps to `CREATE TABLE ... USING parquet/delta` with the identical
    * StructType, and [[batchIndexData]]'s landing becomes an append
    * write instead of a view swap.
    */
  def createCollection(spark: SparkSession, name: String,
                       properties: Seq[Property],
                       description: String = ""): Boolean = {
    if (name.contains("-"))
      throw new IllegalArgumentException("Collection name cannot contain hyphens")
    require(properties.nonEmpty,
      s"Tried to create Collection <$name> but no properties were provided.")
    if (spark.catalog.tableExists(name)) false
    else {
      import org.apache.spark.sql.types.{StructField, StructType}
      val schema = StructType(properties.map(p =>
        StructField(p.name, sparkType(p.dataType), nullable = true)))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .createOrReplaceTempView(name)
      declared.put(name, CollectionMeta(properties, description))
      true
    }
  }

  /** Per-batch indexing report — the reference's return dict
    * (`num_errors` / `error_messages` / `doc_ids`, ref L441) plus the
    * explicit abort flag its print-and-abort flow implies.
    */
  final case class BatchReport(numErrors: Long, errorDocIds: Seq[String],
                               errorMessages: Seq[String], completed: Boolean,
                               indexed: Long)

  /** Land a batch of rows into a collection (batch_index_data, ref
    * L409): creates the collection first when absent (requiring
    * `properties`, as the reference does), conforms the batch to the
    * declared schema (declared columns selected by NAME and cast to the
    * declared type — extra columns are rejected loudly, not silently
    * dropped), counts rows with a null unique id as errors, and aborts
    * the whole batch when errors exceed `errorThreshold` of the batch
    * (the reference's abort-on-threshold loop).
    *
    * Landing is a view swap over the union of the existing rows and the
    * good batch rows — the local-mode stand-in for an append write to
    * the managed table (same schema contract, same error accounting).
    */
  def batchIndexData(spark: SparkSession, name: String, data: DataFrame,
                     errorThreshold: Double = 0.01,
                     uniqueIdField: String = "doc_id",
                     properties: Seq[Property] = Nil,
                     collectionDescription: String = ""): BatchReport = {
    if (!spark.catalog.tableExists(name))
      createCollection(spark, name, properties, collectionDescription)
    val target = spark.table(name)
    val targetCols = target.schema.fields.map(_.name).toSeq
    val extra = data.schema.fields.map(_.name).filterNot(targetCols.contains)
    if (extra.nonEmpty)
      throw new IllegalArgumentException(
        s"batch carries properties not in collection <$name>: ${extra.mkString(", ")}")
    val missing = targetCols.filterNot(data.schema.fields.map(_.name).contains)
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"batch is missing collection <$name> properties: ${missing.mkString(", ")}")
    require(targetCols.contains(uniqueIdField),
      s"unique id field '$uniqueIdField' is not a property of <$name>")
    val conformed = data.select(target.schema.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
    // ONE pass decides errors and good rows (null unique id = the
    // reference's per-object add failure)
    val total = conformed.count()
    val bad = conformed.filter(col(uniqueIdField).isNull)
    val badIds = bad.select(col(uniqueIdField).cast("string")).collect()
      .map(r => if (r.isNullAt(0)) "null" else r.getString(0)).toSeq
    val nBad = badIds.length.toLong
    if (total > 0 && nBad > errorThreshold * total)
      BatchReport(nBad, badIds,
        Seq(s"Upload errors exceed error_threshold: $nBad/$total"),
        completed = false, indexed = 0L)
    else {
      val good = conformed.filter(col(uniqueIdField).isNotNull)
      target.union(good).createOrReplaceTempView(name)
      BatchReport(nBad, badIds,
        if (nBad == 0) Nil else Seq(s"$nBad object(s) had a null '$uniqueIdField'"),
        completed = true, indexed = total - nBad)
    }
  }

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
    // declared-config rows for collections created via createCollection:
    // the description and per-property index intents the caller declared
    val meta = Option(declared.get(name))
    val declaredRows = meta.toSeq.flatMap { m =>
      ("config", "description", m.description) +:
        m.properties.flatMap(p => Seq(
          ("index_filterable", p.name, p.indexFilterable.toString),
          ("index_searchable", p.name, p.indexSearchable.toString)))
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
      declaredRows ++
      props
    cfg.toDF("kind", "key", "value").orderBy("kind", "key")
  }

  /** Drop a collection registration (delete_collection) — declared
    * config goes with it.
    */
  def deleteCollection(spark: SparkSession, name: String): Boolean = {
    declared.remove(name)
    spark.catalog.dropTempView(name)
  }

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
