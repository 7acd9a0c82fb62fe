package org.apache.spark.sql.graftshim

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The portable 60-bit hash as a JVM helper: identical to the column
  * form `conv(substring(md5(s), 1, 15), 16, 10)` — the first 15 hex
  * chars of the md5 digest are bytes 0..6 plus the high nibble of
  * byte 7, assembled big-endian.
  */
object GraftHash {
  private val digests = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  def md5Prefix15(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }
}

/** Whole-document SimHash in ONE pass over the token array — no
  * explode, no 32-column aggregate, no shuffle. Bit-for-bit identical
  * to the exploded groupBy form it replaces (cross-checked in
  * DedupSpec): every token occurrence votes +1/-1 per bit position of
  * its portable hash; bit `b` of the result is set when the vote sum
  * is positive.
  *
  * Returns null for an empty or all-null token array — the exploded form emits no
  * row for a tokenless doc, so callers filter those out identically.
  */
case class SimHash(child: Expression, bits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(bits > 0 && bits <= 64, s"bits must be in 1..64, got $bits")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n == 0) return null
    val votes = new Array[Int](bits)
    var any = false
    var i = 0
    while (i < n) {
      // null elements cast no votes (tokenizers never emit them; guard
      // for direct SQL callers)
      if (!toks.isNullAt(i)) {
        any = true
        val h = GraftHash.md5Prefix15(toks.getUTF8String(i))
        var b = 0
        while (b < bits) {
          votes(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1); b += 1
        }
      }
      i += 1
    }
    if (!any) return null
    var out = 0L
    var b = 0
    while (b < bits) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val votes = ctx.freshName("votes")
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val h = ctx.freshName("h"); val out = ctx.freshName("out")
      val any = ctx.freshName("any")
      s"""
         |final int $n = $a.numElements();
         |int[] $votes = new int[$bits];
         |boolean $any = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) continue;
         |  $any = true;
         |  final long $h = org.apache.spark.sql.graftshim.GraftHash.md5Prefix15(
         |    $a.getUTF8String($i));
         |  for (int $b = 0; $b < $bits; $b++) {
         |    $votes[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |if (!$any) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $out = 0L;
         |  for (int $b = 0; $b < $bits; $b++) {
         |    if ($votes[$b] > 0) $out |= (1L << $b);
         |  }
         |  ${ev.value} = $out;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
