package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd cosine similarity over `array<float>` / `array<double>`
  * / `array<int>` / `array<byte>` (int/byte arrays serve the
  * SQ8-quantized path — cosine is scale-invariant, so quantized codes
  * score without dequantization; the byte form is the 1-byte/dim
  * MATERIALIZED hot copy).
  *
  * This is the hot-path primitive behind vector search
  * (reference `src/database/weaviate_interface_v4.py:246` near_vector
  * semantics: cosine distance ranking) — at 100 TB the dot product runs
  * once per (query, row), so it must live inside whole-stage codegen: a
  * single fused loop, no per-row lambda dispatch, no array copies (reads
  * straight from Tungsten's unsafe array format, preserving float inputs
  * without an upcast-copy of the column).
  *
  * Semantics: sum over the common prefix of both arrays; returns 0.0 when
  * either norm is zero (instead of NaN) so downstream top-k stays total.
  * Null elements inside vectors are not supported (corpus vectors are
  * dense).
  *
  * Lives in this package (not `graft.plans`) because `AbstractDataType` /
  * `TypeCollection` are `private[sql]`; exposed to graft code via
  * [[graft.functions.VectorFunctions.cosineSim]].
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType),
      ArrayType(IntegerType), ArrayType(ByteType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType),
      ArrayType(IntegerType), ArrayType(ByteType)))

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  private def getter(e: Expression, arr: String, i: String): String = e.dataType match {
    case ArrayType(FloatType, _) => s"(double) $arr.getFloat($i)"
    case ArrayType(IntegerType, _) => s"(double) $arr.getInt($i)"
    case ArrayType(ByteType, _) => s"(double) $arr.getByte($i)"
    case _ => s"$arr.getDouble($i)"
  }

  private def evalGet(e: Expression, arr: ArrayData, i: Int): Double = e.dataType match {
    case ArrayType(FloatType, _) => arr.getFloat(i).toDouble
    case ArrayType(IntegerType, _) => arr.getInt(i).toDouble
    case ArrayType(ByteType, _) => arr.getByte(i).toDouble
    case _ => arr.getDouble(i)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xv = evalGet(left, x, i)
      val yv = evalGet(right, y, i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny"); val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val getX = getter(left, a, i)
      val getY = getter(right, b, i)
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $xv = $getX;
         |  final double $yv = $getY;
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |    ? 0.0 : $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
