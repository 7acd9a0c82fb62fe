package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Document length + query-term frequencies in ONE pass over the token
  * array: output is `array<long>` `[dl, tf(terms(0)), ..., tf(terms(k-1))]`.
  *
  * This is the map-side half of BM25 scoring as a single expression:
  * with it, per-document statistics need NO explode and NO doc-keyed
  * shuffle at all — the whole keyword-search pipeline reduces to a scan
  * (this expression) + a one-row corpus aggregate re-joined as a
  * broadcast + a top-k heap. Replaces the explode+groupBy formulation of
  * `KeywordSearch.termStats`, whose shuffle (one row per doc) was the
  * only exchange in the BM25 family; also dodges the projection-collapse
  * hazard of the column-per-tf form (tokenization re-evaluated once per
  * tf column — measured 14 `split` evaluations in the executed plan).
  *
  * Query-term lists are a handful of words, so the inner match loop is a
  * linear scan (k ≤ ~8 beats any hash map at this size).
  */
case class TermFrequencies(child: Expression, terms: Seq[String])
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "term_frequencies"

  @transient private lazy val utf8Terms: Array[UTF8String] =
    terms.map(UTF8String.fromString).toArray

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](utf8Terms.length + 1)
    out(0) = n
    var i = 0
    while (i < n) {
      val tok = arr.getUTF8String(i)
      var j = 0
      while (j < utf8Terms.length) {
        if (utf8Terms(j).equals(tok)) { out(j + 1) += 1; j = utf8Terms.length }
        else j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
