package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Count of the most frequent adjacent token PAIR (word bigram) in a
  * token array — fused shingle+count in one exact O(n) pass, with no
  * bigram-string materialization at all.
  *
  * Two passes over the row, both linear: (1) intern each distinct token
  * to a dense int id; (2) count pairs keyed by the two ids packed into
  * one long (exact — no hash-collision risk), tracking the running max.
  * Compared to `shingles(toks, 2)` + [[ModeCount]] this skips allocating
  * n−1 concatenated strings per row, which is most of the remaining cost
  * on long docs.
  *
  * Arrays shorter than 2 yield 0 (no bigram exists). Null elements are
  * interned like any other key (the tokenizer never emits them).
  */
case class TopBigramCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "top_bigram_count"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return 0L
    val ids = new Array[Int](n)
    val intern = new java.util.HashMap[UTF8String, Integer](Math.max(16, n / 4))
    var next = 0
    var i = 0
    while (i < n) {
      val tok = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
      var id = intern.get(tok)
      if (id == null) { id = Integer.valueOf(next); intern.put(tok, id); next += 1 }
      ids(i) = id.intValue()
      i += 1
    }
    val counts = new java.util.HashMap[java.lang.Long, Long](Math.max(16, n / 4))
    var best = 0L
    i = 0
    while (i < n - 1) {
      val key = java.lang.Long.valueOf((ids(i).toLong << 32) | (ids(i + 1).toLong & 0xffffffffL))
      val c = counts.merge(key, 1L, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
