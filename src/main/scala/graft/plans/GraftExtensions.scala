package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.{CosineSimilarity, DotProduct, SimHash, Sq8Quantize, TermFrequencies, WordShingles}

/** Registers graft's custom Catalyst expressions as SQL functions, so the
  * Text2SQL surface (and any `spark.sql` user) can call them directly:
  *
  * {{{
  *   SELECT cosine_sim(embedding, q) FROM embeddings
  *   SELECT word_shingles(toks, 3) FROM corpus
  * }}}
  *
  * Wired into every graft session via
  * `spark.sql.extensions=graft.plans.GraftExtensions`
  * ([[graft.GraftSession.configure]]) — the standard public extension
  * mechanism, no session-internal APIs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_sim(arrayA, arrayB)")
        CosineSimilarity(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) => {
        require(children.length == 2 && children(1).foldable &&
          children(1).eval() != null,
          "word_shingles(tokenArray, k) with non-null literal k")
        WordShingles(children.head,
          children(1).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "dot_product(arrayA, arrayB)")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash"),
      new ExpressionInfo(classOf[SimHash].getName, "simhash"),
      (children: Seq[Expression]) => {
        require(children.length == 2 && children(1).foldable &&
          children(1).eval() != null,
          "simhash(tokenArray, bits) with non-null literal bits")
        SimHash(children.head,
          children(1).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      new FunctionIdentifier("sq8_quantize"),
      new ExpressionInfo(classOf[Sq8Quantize].getName, "sq8_quantize"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "sq8_quantize(array)")
        Sq8Quantize(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("term_frequencies"),
      new ExpressionInfo(classOf[TermFrequencies].getName, "term_frequencies"),
      (children: Seq[Expression]) => {
        // foldable alone admits a NULL literal whose eval() is null —
        // fail analysis with a clear message instead of NPE at plan time
        require(children.length >= 2 &&
          children.tail.forall(c => c.foldable && c.eval() != null),
          "term_frequencies(tokenArray, term1, term2, ...) with non-null literal terms")
        TermFrequencies(children.head,
          children.tail.map(_.eval().toString))
      }))
  }
}
