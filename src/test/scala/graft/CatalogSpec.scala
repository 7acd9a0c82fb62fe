package graft

import graft.operators.Catalog
import graft.sources.Tables

class CatalogSpec extends SparkSpec {

  test("collection management: list, properties, count, delete") {
    Tables.registerAll(spark, TestSpark.Sf0001)
    val names = Catalog.listCollections(spark)
    assert(Tables.all.forall(names.contains))

    val props = Catalog.collectionProperties(spark, "documents").collect()
      .map(r => r.getAs[String]("name") -> r.getAs[String]("dataType")).toMap
    assert(props("doc_id") == "bigint")
    assert(props("text") == "string")

    assert(Catalog.docCount(spark, "region") == 5L)

    assert(Catalog.deleteCollection(spark, "region"))
    assert(!Catalog.listCollections(spark).contains("region"))
    // re-register for other suites sharing the session
    Tables.registerAll(spark, TestSpark.Sf0001)
  }

  test("show_collection_config: schema properties plus engine search settings") {
    Tables.registerAll(spark, TestSpark.Sf0001)
    val cfg = Catalog.collectionConfig(spark, "embeddings").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(cfg(("config", "collection")) == "embeddings")
    assert(cfg(("config", "distance_metric")) == "cosine")
    assert(cfg(("config", "vector_column")) == "embedding")
    assert(cfg(("config", "vector_dim")) == "64")
    assert(cfg(("config", "bm25_k1")) == "1.2")
    assert(cfg(("property", "vec_id")) == "bigint")
    // the client facade surfaces the same frame
    val viaClient = new GraftClient(spark, TestSpark.Sf0001)
      .showCollectionConfig("embeddings").collect()
    assert(viaClient.length == cfg.size)
  }

  test("fetch_objects page: sorted page equals the offset slice of the full sort") {
    import org.apache.spark.sql.functions._
    val page = Catalog.fetchObjectsPage(spark, TestSpark.Sf0001).collect()
    val full = Tables.documents(spark, TestSpark.Sf0001)
      .filter(col("lang") === "en")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .orderBy(desc("n_chars"), asc("doc_id"))
      .collect()
    assert(page.toSeq == full.slice(Catalog.PageOffset,
      Catalog.PageOffset + Catalog.PageSize).toSeq)
    // pagination never duplicates or skips across consecutive pages
    assert(page.length == Catalog.PageSize)
  }
}
