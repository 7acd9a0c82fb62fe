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
