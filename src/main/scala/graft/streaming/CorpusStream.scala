package graft.streaming

import graft.functions.TextFunctions.tokens
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the corpus-side batch operators
  * ([[graft.operators.Chunker.pack]]): documents arrive continuously,
  * packing state persists across micro-batches.
  *
  * At scale this is the ingest-side packing job: per-source state is ONE
  * long (the running token total), so the state store holds |sources|
  * longs — bins assigned on arrival, no global re-sort, exactly-once via
  * checkpoint like every graft stream.
  */
object CorpusStream {

  case class Doc(doc_id: Long, source: String, n_tokens: Long)
  case class PackedDoc(doc_id: Long, source: String, n_tokens: Long, bin_id: Long)

  case class CleanDoc(doc_id: Long, source: String, text: String)

  /** Streaming clean-corpus ingest — the continuous twin of
    * [[graft.operators.Pipeline.cleanPack]]'s shape: quality filter
    * (stateless column predicates, same rules as
    * [[graft.operators.TextAnalysis.quality]]) → near-dup probe against
    * the STANDING materialized band index (the streaming twin of
    * [[graft.operators.Dedup.incremental]] — one stream-static equi-join
    * per band, all stateless) → greedy token-budget packing ([[pack]],
    * the only stateful stage: ONE long per source).
    *
    * At scale: signatures are ONE native pass per doc
    * ([[org.apache.spark.sql.graftshim.MinHashSig]], behind a Generate
    * barrier so the four band extracts share it); each band probe reads
    * only that band's partition of the index; nothing shuffles except
    * the per-source packing state.
    */
  def cleanPack(docs: Dataset[CleanDoc], bandIndex: DataFrame,
                budget: Int): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    val toks = tokens(col("text"))
    val qual = docs.toDF().filter(size(toks) >= 10 && size(toks) <= 1000 &&
      size(filter(toks, t => t.isin(TextAnalysis.StopEn.map(lit): _*))) > 0)
    val sigs = qual
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).as("n_tokens"),
        explode(array(graft.functions.TextFunctions.minhashSig(
          graft.functions.TextFunctions.shingles(tokens(col("text")), Dedup.ShingleK),
          Dedup.Perms, Dedup.P))).as("sig"))
      .select(Seq(col("doc_id"), col("source"), col("n_tokens")) ++
        (0 until Dedup.Bands).map(b =>
          Dedup.bandSigFromSignature(col("sig"), b).as(s"sig_$b")): _*)
    val survived = (0 until Dedup.Bands).foldLeft(sigs) { case (df, b) =>
      df.join(
        bandIndex.filter(col("band_id") === b)
          .select(col("band_sig").as(s"sig_$b")).distinct()
          .withColumn(s"hit_$b", lit(true)),
        Seq(s"sig_$b"), "left")
    }.filter((0 until Dedup.Bands).map(b => col(s"hit_$b").isNull).reduce(_ && _))
    pack(survived.select(col("doc_id"), col("source"),
      col("n_tokens").cast("long").as("n_tokens")).as[Doc], budget)
  }

  /** Greedy token-budget packing with per-source running state: a doc's
    * bin is `floor(preceding-total / budget)` — identical arithmetic to
    * the batch window form, so feeding the stream in (source, doc_id)
    * order reproduces the batch bins bit-for-bit (spec-verified).
    */
  def pack(docs: Dataset[Doc], budget: Int): Dataset[PackedDoc] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[Long, PackedDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, it: Iterator[Doc], state: GroupState[Long]) =>
          var total = state.getOption.getOrElse(0L)
          val out = it.toSeq.sortBy(_.doc_id).map { d =>
            val bin = total / budget
            total += d.n_tokens
            PackedDoc(d.doc_id, src, d.n_tokens, bin)
          }
          state.update(total)
          out.iterator
      }
  }
}
