package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** The batched model-inference seam — the ONE contract real model
  * weights drop into (sentence-transformer embeddings, reference
  * `src/database/weaviate_interface_v4.py:289` `_create_query_vector`;
  * cross-encoder scoring, reference `src/reranker.py:27`
  * `_cross_encoder_score`). The engine ships deterministic stand-ins
  * ([[Embedder.embed]], [[Reranker]]'s lexical scorer); this seam fixes
  * the SHAPE a served model plugs into, spec-proven so the swap is
  * mechanical:
  *
  *   - per PARTITION, the model closure initializes once (session /
  *     weights load amortize over the partition, exactly like
  *     [[Multimodal.extractFeatures]]'s codec slot);
  *   - rows feed the model in bounded batches of `maxBatch` (GPU-sized
  *     micro-batches — never one call per row, never the whole
  *     partition in memory);
  *   - the model returns EXACTLY one output per input (asserted), and
  *     within a partition output order equals input order, so results
  *     re-attach positionally — no join, no shuffle;
  *   - the output column is appended to the input schema unchanged.
  */
object Inference {

  /** Append `outCol: array<float>` by running `model` over batches of
    * the string column `inCol`. `model` is called once per ≤`maxBatch`
    * inputs; `init` runs once per partition and its result is passed to
    * every batch call (the model-session slot).
    */
  def embedBatched[S](df: DataFrame, inCol: String, outCol: String,
                      maxBatch: Int)
                     (init: () => S)
                     (model: (S, Seq[String]) => Seq[Array[Float]]): DataFrame = {
    val idx = df.schema.fieldIndex(inCol)
    batched[S, String](df, outCol, ArrayType(FloatType, containsNull = false),
      maxBatch)(_.getString(idx))(init)((s, xs) => model(s, xs).map(_.toSeq))
  }

  /** Append `outCol: double` cross-scores for (query, document) string
    * pair columns — the cross-encoder slot.
    */
  def scorePairsBatched[S](df: DataFrame, queryCol: String, docCol: String,
                           outCol: String, maxBatch: Int)
                          (init: () => S)
                          (model: (S, Seq[(String, String)]) => Seq[Double]): DataFrame = {
    val qi = df.schema.fieldIndex(queryCol)
    val di = df.schema.fieldIndex(docCol)
    batched[S, (String, String)](df, outCol, DoubleType, maxBatch)(
      r => (r.getString(qi), r.getString(di)))(init)(model)
  }

  /** The ONE batching core both seams share: extract per-row inputs,
    * feed the model in bounded batches, reattach outputs positionally.
    */
  private def batched[S, A](df: DataFrame, outCol: String,
                            outType: DataType, maxBatch: Int)
                           (extract: Row => A)
                           (init: () => S)
                           (model: (S, Seq[A]) => Seq[Any]): DataFrame = {
    require(maxBatch >= 1, "maxBatch must be >= 1")
    val spark = df.sparkSession
    val schema = df.schema.add(StructField(outCol, outType, nullable = false))
    val rows = df.rdd.mapPartitions { it =>
      val session = init()
      it.grouped(maxBatch).flatMap { batch =>
        val outs = model(session, batch.map(extract))
        require(outs.length == batch.length,
          s"model returned ${outs.length} outputs for ${batch.length} inputs")
        batch.lazyZip(outs).map { (r, o) => Row.fromSeq(r.toSeq :+ o) }
      }
    }
    spark.createDataFrame(rows, schema)
  }

  /** Pure-Scala replica of the [[Embedder.embed]] hashing featurizer —
    * the default occupant of the embedding slot. The spec pins it
    * bit-equal to the column-expression form, proving the seam preserves
    * the engine's oracle-checked semantics until real weights replace it.
    */
  def hashingModel(dim: Int = Embedder.Dim): Seq[String] => Seq[Array[Float]] = {
    val mdHex: String => String = { s =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    texts => texts.map { t =>
      val h = mdHex(t)
      Array.tabulate(dim) { j =>
        val hex = mdHex(h + "#" + j).substring(0, 15)
        ((java.lang.Long.parseLong(hex, 16) % 1000000L).toDouble / 1000000.0 - 0.5).toFloat
      }
    }
  }
}
