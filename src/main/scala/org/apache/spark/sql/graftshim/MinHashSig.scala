package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** MinHash signature over a shingle array in ONE native pass — each
  * shingle is portable-hashed once ([[GraftHash.md5Prefix15]]) and fed
  * through every permutation's running minimum in registers: no
  * explode, no 16-column aggregate, no shuffle. Bit-for-bit identical
  * to the exploded groupBy form (cross-checked in DedupSpec):
  * `m_i = min over shingles of (a_i * (h % p) + b_i) % p`.
  *
  * Returns null for an empty or all-null shingle array (the exploded form emits no
  * row) — in practice the shingler always yields at least one shingle.
  */
case class MinHashSig(child: Expression, perms: Seq[(Long, Long)], p: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(perms.nonEmpty && p > 0)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  @transient private lazy val aArr: Array[Long] = perms.map(_._1).toArray
  @transient private lazy val bArr: Array[Long] = perms.map(_._2).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val sh = input.asInstanceOf[ArrayData]
    val n = sh.numElements()
    if (n == 0) return null
    val k = aArr.length
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      // null elements are skipped (shinglers never emit them; guard for
      // direct callers)
      if (!sh.isNullAt(i)) {
        any = true
        val h = GraftHash.md5Prefix15(sh.getUTF8String(i)) % p
        var j = 0
        while (j < k) {
          val v = (aArr(j) * h + bArr(j)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) null else UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
      val n = ctx.freshName("n"); val mins = ctx.freshName("mins")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val v = ctx.freshName("v")
      val any = ctx.freshName("any")
      val k = aArr.length
      s"""
         |final int $n = $a.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |boolean $any = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) continue;
         |  $any = true;
         |  final long $h = org.apache.spark.sql.graftshim.GraftHash.md5Prefix15(
         |    $a.getUTF8String($i)) % ${p}L;
         |  for (int $j = 0; $j < $k; $j++) {
         |    final long $v = ($aRef[$j] * $h + $bRef[$j]) % ${p}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |if (!$any) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
