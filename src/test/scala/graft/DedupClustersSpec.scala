package graft

import graft.operators.DedupClusters
import org.apache.spark.sql.functions._

class DedupClustersSpec extends SparkSpec {
  import spark.implicits._

  private def docsOf(ids: Long*) = ids.toDF("doc_id")
  private def pairsOf(ps: (Long, Long)*) = ps.toDF("d1", "d2")

  private def labelMap(ids: Seq[Long], ps: Seq[(Long, Long)]): Map[Long, Long] =
    DedupClusters.clusters(docsOf(ids: _*), pairsOf(ps: _*)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap

  test("chain components collapse to the min id (multi-round propagation)") {
    // 0-1-2-3-4 is a diameter-4 chain: exercises >1 propagate+jump round
    val m = labelMap(0L to 6L, Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)))
    assert((0L to 4L).forall(m(_) == 0L))
    assert(m(5L) == 5L && m(6L) == 5L)
  }

  test("singletons are their own canonical cluster") {
    val out = DedupClusters.clusters(docsOf(10L, 20L), pairsOf())
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("cluster_id"), r.getAs[Boolean]("is_canonical")))
    assert(out.toSet == Set((10L, 10L, true), (20L, 20L, true)))
  }

  test("exactly one canonical doc per cluster, and it is the min") {
    val out = DedupClusters.clusters(
      docsOf(0L to 9L: _*),
      pairsOf((7L, 9L), (1L, 3L), (3L, 5L), (2L, 8L))).collect()
    val byCluster = out.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (cid, rows) =>
      assert(rows.map(_.getAs[Long]("doc_id")).min == cid)
      assert(rows.count(_.getAs[Boolean]("is_canonical")) == 1)
    }
    assert(byCluster.keySet == Set(0L, 1L, 2L, 4L, 6L, 7L))
  }

  test("corpus-level clusters cover every document exactly once") {
    val dir = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.documents(spark, dir)
    val out = DedupClusters.query(spark, dir)
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
    // every cluster_id is itself a member of its cluster (root closure)
    assert(out.filter(col("doc_id") === col("cluster_id"))
      .count() == out.select("cluster_id").distinct().count())
  }
}
