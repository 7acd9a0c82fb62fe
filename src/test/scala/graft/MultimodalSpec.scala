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

  test("real PNG codec: encode -> decode round-trip is lossless") {
    val enc = Multimodal.encodeImages(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    // payloads are genuine PNG files (magic bytes) written by ImageIO
    assert(enc.values.forall(p =>
      (p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G'))
    // decoding recovers the exact checkerboard: re-derive the expected
    // per-channel sums from the generator's md5 pixel function
    val feats = Multimodal.decodeImageFeatures(Multimodal.encodeImages(docs))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    texts.foreach { case (id, t) =>
      val d = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
      def b(i: Int) = (d(i) & 0xff).toLong
      val half = Multimodal.Side * Multimodal.Side / 2
      val (w, h, sr, sg, sb) = feats(id)
      assert(w == Multimodal.Side && h == Multimodal.Side)
      assert(sr == half * (b(0) + b(3)) && sg == half * (b(1) + b(4)) &&
        sb == half * (b(2) + b(5)))
    }
  }

  test("real PNG codec: nearest-neighbor resize samples even coordinates only") {
    val out = Multimodal.decodeImageFeatures(
      Multimodal.resizeImages(Multimodal.encodeImages(docs),
        Multimodal.ResizedSide, Multimodal.ResizedSide)).collect()
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach { r =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(texts(r.getLong(0)).getBytes("UTF-8"))
      def b(i: Int) = (d(i) & 0xff).toLong
      val n = Multimodal.ResizedSide * Multimodal.ResizedSide
      assert(r.getInt(1) == Multimodal.ResizedSide)
      assert(r.getLong(3) == n * b(0) && r.getLong(4) == n * b(1) &&
        r.getLong(5) == n * b(2))
    }
  }
}
