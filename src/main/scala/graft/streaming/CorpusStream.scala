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

  /** Parquet file-stream of the documents table. */
  private def readDocs(spark: org.apache.spark.sql.SparkSession,
                       dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/documents.parquet").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
  }

  /** Driver query: streaming sequence packing (40c) under the oracle
    * gate — token counting runs inside the stream (same expression as
    * the batch form) and the per-source packing state assigns bins on
    * arrival; the result must hash-match the batch window-form packing
    * ([[graft.operators.Chunker.packOracle]]).
    */
  def qStreamPack(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = readDocs(s, dir)
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens")).as[Doc]
    EventsStream.runToFrame(s,
      pack(docs, graft.operators.Chunker.PackBudget).toDF(),
      "stream_pack_drv", "append")
  }

  /** Driver query: streaming clean-corpus ingest (40d) under the oracle
    * gate — the interleaved "new batch" (doc_id % NewMod == NewMod-1)
    * streams through [[cleanPack]] probing the SAME standing band index
    * the incremental batch dedup uses; the packed survivors must
    * hash-match the quality→probe→pack composition in one DuckDB
    * statement ([[cleanPackOracle]]).
    */
  def qStreamCleanPack(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import graft.operators.Dedup
    import s.implicits._
    val indexPath = graft.operators.IndexCache.getOrBuild("band_idx", dir) { p =>
      Dedup.writeBandIndex(graft.sources.Tables.documents(s, dir).filter(
        pmod(col("doc_id"), lit(Dedup.NewMod)) =!= Dedup.NewMod - 1), p)
    }
    val newDocs = readDocs(s, dir)
      .filter(pmod(col("doc_id"), lit(Dedup.NewMod)) === Dedup.NewMod - 1)
      .select(col("doc_id"), col("source"), col("text")).as[CleanDoc]
    val packed = cleanPack(newDocs, s.read.parquet(indexPath),
      graft.operators.Chunker.PackBudget)
    EventsStream.runToFrame(s, packed.toDF(), "stream_clean_drv", "append")
  }

  /** Oracle for [[qStreamCleanPack]]: quality gate + any-band collision
    * drop against the old-corpus band signatures + window-form packing,
    * composed from the SAME SQL fragments as the batch oracles
    * ([[graft.operators.Dedup.bandsCtesSql]],
    * [[graft.operators.Pipeline.qualityGateSql]],
    * [[graft.operators.Chunker.packSql]]'s arithmetic).
    */
  val cleanPackOracle: String = {
    import graft.operators.{Chunker, Dedup, Pipeline}
    val newSel = s"doc_id % ${Dedup.NewMod} = ${Dedup.NewMod - 1}"
    s"""WITH ${Dedup.bandsCtesSql},
       |old_bands AS (
       |  SELECT DISTINCT band_id, band_sig FROM bands
       |  WHERE NOT ($newSel)),
       |collide AS (
       |  SELECT DISTINCT b.doc_id FROM bands b
       |  JOIN old_bands o ON b.band_id = o.band_id AND b.band_sig = o.band_sig
       |  WHERE b.$newSel),
       |clean AS (
       |  SELECT t.doc_id, t.source, len(t.toks) AS n_tokens
       |  FROM toked t
       |  WHERE t.$newSel
       |    AND ${Pipeline.qualityGateSql.replace("len(toks)", "len(t.toks)")
                  .replace("list_filter(toks", "list_filter(t.toks")}
       |    AND t.doc_id NOT IN (SELECT doc_id FROM collide))
       |SELECT doc_id, source, n_tokens,
       |  CAST(floor((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
       |    / ${Chunker.PackBudget}) AS BIGINT) AS bin_id
       |FROM clean
       |ORDER BY source, doc_id""".stripMargin
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
