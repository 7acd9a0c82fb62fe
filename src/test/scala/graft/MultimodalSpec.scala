package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "abcdefgh"), (1L, "0123456789abcdef"), (2L, "xyz")
  ).toDF("doc_id", "text")

  test("payload metadata: byte length and stable digest") {
    val out = Multimodal.meta(docs).collect()
    assert(out.map(_.getAs[Int]("n_bytes")).toSeq == Seq(8, 16, 3))
    assert(out.map(_.getAs[String]("modality")).toSeq == Seq("image", "audio", "video"))
    assert(out.forall(_.getAs[String]("digest").length == 32))
  }

  test("feature extraction: frame fan-out with typed schema") {
    val feats = Multimodal.extractFeatures(docs, nFrames = 4)
    assert(feats.schema == Multimodal.featureSchema)
    val perDoc = feats.groupBy("doc_id").count().collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("count")).toMap
    assert(perDoc(0L) == 4 && perDoc(1L) == 4)
    assert(perDoc(2L) == 3) // payload shorter than nFrames
    val f = feats.filter(col("doc_id") === 0L && col("frame_index") === 0).collect().head
    assert(f.getAs[scala.collection.Seq[Float]]("feature").length == 4)
  }

  test("feature extraction is deterministic") {
    val a = Multimodal.extractFeatures(docs).collect().map(_.toString).sorted
    val b = Multimodal.extractFeatures(docs).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("resize: every payload lands at the target byte shape, deterministically") {
    val out = Multimodal.resize(docs, 4, 3).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Int]("width") == 4 && r.getAs[Int]("height") == 3)
      assert(r.getAs[Array[Byte]]("payload").length == 12)
    }
    val again = Multimodal.resize(docs, 4, 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload").toSeq).toMap
    out.foreach { r =>
      assert(again(r.getAs[Long]("doc_id")) == r.getAs[Array[Byte]]("payload").toSeq)
    }
  }
}
