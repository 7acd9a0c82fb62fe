package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd symmetric int8 scalar quantization:
  * `struct(scale, qv)` with `scale = max(max_i |e_i|, 1e-30)` and
  * `qv_i = (int) floor(e_i * 127 / scale + 0.5)` — one fused pass.
  *
  * Replaces the three interpreted `transform` lambdas in
  * [[graft.operators.VectorSearch.quantize]] (abs-max, double cast,
  * floor-scale), which dispatched ~3 x dim interpreted calls per row and
  * dominated the quantized-search runtime. Arithmetic is bit-for-bit the
  * HOF form's (and the DuckDB oracle's): elementwise
  * `(double)e * 127.0 / scale + 0.5`, `Math.floor`, truncating int cast,
  * abs-max folded in index order.
  */
case class Sq8Quantize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("qv", ArrayType(IntegerType, containsNull = false), nullable = false)))

  override def prettyName: String = "sq8_quantize"

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
    val n = x.numElements()
    var mx = 0.0; var i = 0
    while (i < n) { mx = math.max(mx, math.abs(evalGet(x, i))); i += 1 }
    val scale = math.max(mx, 1e-30)
    val qv = new Array[Int](n)
    i = 0
    while (i < n) {
      qv(i) = math.floor(evalGet(x, i) * 127.0 / scale + 0.5).toInt; i += 1
    }
    new GenericInternalRow(Array[Any](scale, UnsafeArrayData.fromPrimitiveArray(qv)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val mx = ctx.freshName("mx"); val scale = ctx.freshName("scale")
      val qv = ctx.freshName("qv")
      s"""
         |final int $n = $a.numElements();
         |double $mx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $mx = java.lang.Math.max($mx, java.lang.Math.abs(${getter(a, i)}));
         |}
         |final double $scale = java.lang.Math.max($mx, 1e-30);
         |int[] $qv = new int[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $qv[$i] = (int) java.lang.Math.floor(${getter(a, i)} * 127.0 / $scale + 0.5);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ $scale,
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($qv) });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
