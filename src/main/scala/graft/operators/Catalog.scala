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

  /** Drop a collection registration (delete_collection). */
  def deleteCollection(spark: SparkSession, name: String): Boolean =
    spark.catalog.dropTempView(name)

  /** Row count of a collection (get_doc_count — see also
    * [[KeywordSearch.docCount]] for the oracle-checked query form).
    */
  def docCount(spark: SparkSession, name: String): Long =
    spark.table(name).count()
}
