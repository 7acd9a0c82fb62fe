package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word k-shingles over a token array as one compact JVM loop.
  *
  * Semantics identical to the `transform(sequence)+slice+array_join`
  * composition in [[graft.functions.TextFunctions.shingles]]'s reference
  * form: for n >= k tokens emit the n-k+1 space-joined windows; shorter
  * docs emit their whole token list as a single shingle.
  *
  * Exists for throughput: the higher-order-function composition evaluates
  * three interpreted lambdas and allocates a sliced array per element
  * (~13 µs/shingle measured); this loop concatenates UTF8Strings directly
  * (two orders of magnitude less overhead), which matters when MinHash
  * shingles 10^11 documents. Row-at-a-time eval (CodegenFallback) is fine
  * here — string construction dominates, not dispatch.
  */
case class WordShingles(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(k >= 1, "shingle size must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  private val sep = UTF8String.fromString(" ")

  private def join(arr: ArrayData, start: Int, len: Int): UTF8String = {
    val parts = new Array[UTF8String](len)
    var i = 0
    while (i < len) { parts(i) = arr.getUTF8String(start + i); i += 1 }
    UTF8String.concatWs(sep, parts: _*)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) {
      new GenericArrayData(Array[Any](join(arr, 0, n)))
    } else {
      val out = new Array[Any](n - k + 1)
      var i = 0
      while (i <= n - k) { out(i) = join(arr, i, k); i += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
