package graft

import graft.operators.{CorpusOps, IndexRefresh}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** The sparse-regime recut gate (r13 verdict task #4): 13h's core claim
  * is cost ∝ touched vocabulary, but the synthetic 65-term corpus makes
  * every refresh touch every term — `kw_index_recut` measures only the
  * worst case. `kw_index_recut_sparse` widens the vocabulary per block
  * and restricts the refresh batch to one block; this spec pins the
  * REGIME (touched ≤ 10% of the widened vocabulary) and the exactness
  * invariant the isolation row rides on.
  */
class RecutSparseSpec extends SparkSpec {

  private val dir = TestSpark.Sf0001

  test("the widened corpus preserves dl and per-doc tf while multiplying the vocabulary") {
    val docs = Tables.documents(spark, dir)
    val blocks = IndexRefresh.sparseBlocks(docs)
    assert(blocks >= 10)
    val wide = IndexRefresh.widenVocab(docs, blocks)
    val toks = (c: org.apache.spark.sql.Column) =>
      filter(split(lower(c), "[^a-z0-9]+"), t => t =!= "")
    val cmp = docs.select(col("doc_id"), size(toks(col("text"))).as("dl0"))
      .join(wide.select(col("doc_id"), size(toks(col("text"))).as("dl1")),
        Seq("doc_id"))
    assert(cmp.filter(col("dl0") =!= col("dl1")).isEmpty, "dl must be preserved")
    val vocab0 = docs.select(explode(toks(col("text"))).as("t"))
      .distinct().count()
    val vocab1 = wide.select(explode(toks(col("text"))).as("t"))
      .distinct().count()
    assert(vocab1 > vocab0 * (blocks / 2),
      s"widening must multiply the vocabulary (got $vocab0 -> $vocab1 at $blocks blocks)")
  }

  test("the sparse recut's touched vocabulary is <=10% of the widened vocabulary") {
    val docs = Tables.documents(spark, dir)
    val blocks = IndexRefresh.sparseBlocks(docs)
    val curr = IndexRefresh.widenVocab(CorpusOps.currSnapshot(docs), blocks)
    val prev = IndexRefresh.widenVocab(CorpusOps.prevSnapshot(docs), blocks)
    val diff = CorpusOps.snapshotDiff(curr, prev)
      .filter(pmod(col("doc_id"), lit(blocks)) === 0)
    assert(diff.count() > 0, "the one-block refresh batch must be non-empty")
    val touched = curr.join(
        diff.filter(col("status").isin("added", "changed")).select("doc_id"),
        Seq("doc_id"), "semi")
      .unionByName(prev.join(
        diff.filter(col("status").isin("removed", "changed")).select("doc_id"),
        Seq("doc_id"), "semi"))
      .select(explode(filter(split(lower(col("text")), "[^a-z0-9]+"),
        t => t =!= "")).as("t"))
      .distinct().count()
    val vocab = prev.unionByName(curr)
      .select(explode(filter(split(lower(col("text")), "[^a-z0-9]+"),
        t => t =!= "")).as("t"))
      .distinct().count()
    assert(touched > 0 && touched.toDouble / vocab <= 0.10,
      s"sparse regime broken: touched=$touched of vocab=$vocab " +
        s"(${touched * 100.0 / vocab}%)")
  }

  test("the sparse recut rows carry only touched terms and respect the champion bound") {
    val page = IndexRefresh.qIndexRecutSparse(spark, dir)
    assert(page.columns.toSeq == Seq("term", "doc_id", "tf", "dl"))
    val rows = page.collect()
    assert(rows.nonEmpty)
    // champion bound: <= M rows per term
    val perTerm = rows.groupBy(_.getString(0)).view.mapValues(_.length)
    assert(perTerm.values.forall(_ <= IndexRefresh.M))
    // every term is a widened token of the one-block batch (the 'q0q'
    // block-0 prefix — the batch is doc_id % blocks = 0)
    assert(rows.forall(_.getString(0).startsWith("q0q")),
      "a non-block-0 term in the recut means the batch restriction leaked")
  }

  test("above-cap recuts (term pushdown disabled) produce byte-identical output") {
    // the touched-term In-predicate pushdown is capped (TermPushdownCap,
    // default 4096): a refresh whose touched vocabulary exceeds the cap
    // falls back to bucket pruning + the broadcast semi-join only. The
    // fallback is a PERFORMANCE regime, never a semantic one — forcing
    // the cap to 0 must reproduce the pushed-down recut bit-for-bit
    // (same rows, same scores), or the cap would silently change
    // results right when a bulk backfill crosses it.
    def rowsOf() = IndexRefresh.qIndexRecutSparse(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.get(2), r.get(3)))
      .sortBy(t => (t._1, t._2))
    val pushed = rowsOf()
    sys.props("graft.refresh.termPushdownCap") = "0"
    try {
      val fallback = rowsOf()
      assert(fallback.length == pushed.length && fallback.sameElements(pushed),
        "bucket-pruning-only recut diverged from the pushed-down recut")
    } finally sys.props.remove("graft.refresh.termPushdownCap")
  }
}
