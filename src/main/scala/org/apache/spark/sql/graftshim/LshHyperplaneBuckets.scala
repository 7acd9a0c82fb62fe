package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd random-hyperplane LSH signatures: ALL table buckets of a
  * vector in one fused pass over the embedding.
  *
  * Replaces the `zip_with` + `aggregate` higher-order formulation in
  * [[graft.operators.Dedup]], which is interpreted per element — at
  * 16 planes x 64 dims that was ~1k lambda dispatches per row and
  * dominated the embedding-LSH near-dup runtime. Here the plane matrix
  * is a codegen reference object and the signature is
  * `planes.length x dim` fused multiply-adds.
  *
  * Bit-for-bit identical to the HOF form (cross-checked in
  * DedupSpec): per plane, `dot = sum_i (double)emb[i] * plane[i]` in
  * index order over the common prefix; bucket `g` packs planes
  * `[g*bits, (g+1)*bits)` as `dot >= 0 ? 1L << bitInBucket : 0` summed.
  * Returns `array<long>` of `planes.length / bits` buckets.
  */
case class LshHyperplaneBuckets(child: Expression, planes: Seq[Seq[Double]],
    bits: Int) extends UnaryExpression with ExpectsInputTypes {

  require(bits > 0 && planes.nonEmpty && planes.length % bits == 0,
    s"planes (${planes.length}) must be a positive multiple of bits ($bits)")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_hyperplane_buckets"

  @transient private lazy val planeMatrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  private def getter(arr: String, i: String): String = child.dataType match {
    case ArrayType(FloatType, _) => s"(double) $arr.getFloat($i)"
    case _ => s"$arr.getDouble($i)"
  }

  private def evalGet(arr: ArrayData, i: Int): Double = child.dataType match {
    case ArrayType(FloatType, _) => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val nb = planeMatrix.length / bits
    val out = new Array[Long](nb)
    var g = 0
    while (g < nb) {
      var bucket = 0L; var b = 0
      while (b < bits) {
        val p = planeMatrix(g * bits + b)
        val n = math.min(x.numElements(), p.length)
        var dot = 0.0; var i = 0
        while (i < n) { dot += evalGet(x, i) * p(i); i += 1 }
        if (dot >= 0) bucket += (1L << b)
        b += 1
      }
      out(g) = bucket; g += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pm = ctx.addReferenceObj("planes", planeMatrix, "double[][]")
      val out = ctx.freshName("out"); val g = ctx.freshName("g")
      val b = ctx.freshName("b"); val p = ctx.freshName("p")
      val n = ctx.freshName("n"); val dot = ctx.freshName("dot")
      val i = ctx.freshName("i"); val bucket = ctx.freshName("bucket")
      val nb = planeMatrix.length / bits
      s"""
         |long[] $out = new long[$nb];
         |for (int $g = 0; $g < $nb; $g++) {
         |  long $bucket = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    final double[] $p = $pm[$g * $bits + $b];
         |    final int $n = java.lang.Math.min($a.numElements(), $p.length);
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += ${getter(a, i)} * $p[$i];
         |    }
         |    if ($dot >= 0) $bucket += (1L << $b);
         |  }
         |  $out[$g] = $bucket;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
