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

  test("create_collection: declare -> index -> count -> delete round-trip") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val props = Seq(
      Catalog.Property("doc_id", "text", "unique id", indexFilterable = true),
      Catalog.Property("title", "text", indexSearchable = true),
      Catalog.Property("view_count", "int"),
      Catalog.Property("content_embedding", "vector"))
    Catalog.deleteCollection(spark, "podcasts")

    assert(Catalog.createCollection(spark, "podcasts", props, "episode index"))
    assert(Catalog.listCollections(spark).contains("podcasts"))
    assert(Catalog.docCount(spark, "podcasts") == 0L)
    // re-create is a no-op, as the reference's exists-check makes it
    assert(!Catalog.createCollection(spark, "podcasts", props))

    // declared schema is queryable before any data lands
    val sch = Catalog.collectionProperties(spark, "podcasts").collect()
      .map(r => r.getAs[String]("name") -> r.getAs[String]("dataType")).toMap
    assert(sch("doc_id") == "string" && sch("view_count") == "bigint" &&
      sch("content_embedding") == "array<float>")

    // config reflects the DECLARED settings
    val cfg = Catalog.collectionConfig(spark, "podcasts").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getString(2)).toMap
    assert(cfg(("config", "description")) == "episode index")
    assert(cfg(("index_searchable", "title")) == "true")
    assert(cfg(("index_filterable", "doc_id")) == "true")
    assert(cfg(("config", "vector_column")) == "content_embedding")

    // batch_index_data-shaped writes land (int upcast via declared cast)
    val batch = Seq(
      ("ep1", "intro to spark", 10, Array(1f, 0f)),
      ("ep2", "catalyst deep dive", 20, Array(0f, 1f)))
      .toDF("doc_id", "title", "view_count", "content_embedding")
    val rep = Catalog.batchIndexData(spark, "podcasts", batch)
    assert(rep.completed && rep.numErrors == 0 && rep.indexed == 2)
    assert(Catalog.docCount(spark, "podcasts") == 2L)
    // a second batch appends
    val rep2 = Catalog.batchIndexData(spark, "podcasts",
      Seq(("ep3", "tungsten", 5, Array(1f, 1f)))
        .toDF("doc_id", "title", "view_count", "content_embedding"))
    assert(rep2.completed && Catalog.docCount(spark, "podcasts") == 3L)
    // the landed rows answer queries through the named collection
    assert(spark.table("podcasts").filter(col("view_count") > 8).count() == 2L)

    assert(Catalog.deleteCollection(spark, "podcasts"))
    assert(!Catalog.listCollections(spark).contains("podcasts"))
  }

  test("create_collection guards: hyphen name, threshold abort, schema drift") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Catalog.createCollection(spark, "bad-name",
        Seq(Catalog.Property("doc_id", "text")))
    }

    // batch_index_data creates the collection when absent iff properties
    // are provided — the reference's ValueError otherwise
    Catalog.deleteCollection(spark, "scratch")
    intercept[IllegalArgumentException] {
      Catalog.batchIndexData(spark, "scratch",
        Seq(("a", 1)).toDF("doc_id", "n"))
    }
    val props = Seq(Catalog.Property("doc_id", "text"),
      Catalog.Property("n", "int"))
    // >1% null ids aborts the whole batch — nothing lands
    val bad = Seq(Some("a") -> 1, None -> 2, Some("c") -> 3)
      .map { case (id, n) => (id.orNull, n) }.toDF("doc_id", "n")
    val rep = Catalog.batchIndexData(spark, "scratch", bad, properties = props)
    assert(!rep.completed && rep.numErrors == 1 && rep.indexed == 0)
    assert(Catalog.docCount(spark, "scratch") == 0L)
    // a generous threshold lands only the good rows and reports the bad
    val rep2 = Catalog.batchIndexData(spark, "scratch", bad,
      errorThreshold = 0.5, properties = props)
    assert(rep2.completed && rep2.numErrors == 1 && rep2.indexed == 2)
    assert(Catalog.docCount(spark, "scratch") == 2L)
    // extra/missing batch columns are loud errors, never silent drops
    intercept[IllegalArgumentException] {
      Catalog.batchIndexData(spark, "scratch",
        Seq(("a", 1, true)).toDF("doc_id", "n", "rogue"))
    }
    intercept[IllegalArgumentException] {
      Catalog.batchIndexData(spark, "scratch", Seq("a").toDF("doc_id"))
    }
    Catalog.deleteCollection(spark, "scratch")
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
