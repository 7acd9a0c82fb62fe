package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{CosineSimilarity, DotProduct, Shims}

/** Vector primitives for similarity search, IVF indexing and near-dup.
  *
  * `cosineSim` is the codegen'd Catalyst expression ([[CosineSimilarity]]);
  * `cosineSimHof` is the pure-`functions` composition kept as a reference
  * implementation and for benchmarking the expression against the
  * higher-order-function path.
  */
object VectorFunctions {

  /** Codegen'd cosine similarity (primary, hot path). */
  def cosineSim(a: Column, b: Column): Column =
    Shims.column(CosineSimilarity(Shims.expression(a), Shims.expression(b)))

  /** Codegen'd dot product — the pair kernel for pre-normalized vectors
    * (all-pairs workloads: 3x fewer FLOPs than re-deriving both norms
    * per pair inside [[cosineSim]]).
    */
  def dotNative(a: Column, b: Column): Column =
    Shims.column(DotProduct(Shims.expression(a), Shims.expression(b)))

  /** Codegen'd multi-table random-hyperplane LSH signature: one fused
    * pass emits `array<long>` of `planes.length / bits` bucket ids
    * (plane `g*bits+b` contributes bit `b` of bucket `g`). Bit-identical
    * to the interpreted zip_with/aggregate form it replaces.
    */
  def lshBuckets(emb: Column, planes: Seq[Seq[Double]], bits: Int): Column = {
    import org.apache.spark.sql.graftshim.LshHyperplaneBuckets
    Shims.column(LshHyperplaneBuckets(Shims.expression(emb), planes, bits))
  }

  /** Codegen'd symmetric int8 scalar quantization:
    * `struct(scale, qv: array<int>)` in one fused pass. Bit-identical to
    * the three-`transform` HOF form it replaces.
    */
  def sq8Quantize(emb: Column): Column = {
    import org.apache.spark.sql.graftshim.Sq8Quantize
    Shims.column(Sq8Quantize(Shims.expression(emb)))
  }

  /** Dot product via zip_with/aggregate (no custom expression needed). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Bounded per-group top-k aggregate ([[TopKByScore]]): returns
    * `array<struct<score,id>>` best-first, keeping only k candidates per
    * partition map-side.
    */
  def topKByScore(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.graftshim.TopKByScore
    Shims.column(TopKByScore(Shims.expression(score), Shims.expression(id), k)
      .toAggregateExpression())
  }

  /** As [[topKByScore]], with an opaque long payload carried per winner
    * (struct field `payload`) — avoids a corpus re-join to recover
    * per-neighbor attributes after the heap aggregation.
    */
  def topKByScore(score: Column, id: Column, k: Int, payload: Column): Column = {
    import org.apache.spark.sql.graftshim.TopKByScore
    Shims.column(TopKByScore(Shims.expression(score), Shims.expression(id), k,
      Shims.expression(payload)).toAggregateExpression())
  }

  /** Reference/fallback cosine using only built-in functions. */
  def cosineSimHof(a: Column, b: Column): Column = {
    val ad = transform(a, x => x.cast("double"))
    val bd = transform(b, x => x.cast("double"))
    val denom = l2Norm(ad) * l2Norm(bd)
    when(denom === 0.0d, 0.0d).otherwise(dot(ad, bd) / denom)
  }
}
