package graft.operators

import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTALLY-REFRESHABLE keyword index — the standing-artifact
  * refresh path a deployed corpus needs: the reference's indexing entry
  * is repeatedly callable on new batches (`batch_index_data`, reference
  * `src/database/weaviate_interface_v4.py:409-492` — Weaviate merges
  * each batch into its live inverted index), while the engine's other
  * keyword artifacts ([[IndexCache]]) are build-once per source dir. A
  * 100 TB deployment appends/changes documents daily and cannot full-
  * rebuild its index per batch; this operator gives the postings /
  * dictionary / champion / corpus-stats artifact family an append
  * path whose PER-BATCH COST IS INDEPENDENT OF CORPUS SIZE, driven by
  * exactly the added∪changed∪removed classification
  * [[CorpusOps.snapshotDiff]] (op 34i) computes.
  *
  * Design — the log-structured segment layout every production engine
  * uses (Lucene segments + deletes; LSM trees):
  *
  *   path/seg=0/{postings,docstats,dict,champions,stats}   base build
  *   path/seg=r/{...}                                      refresh r
  *   path/tombstones/seg=r                                 kills for refresh r
  *
  * - `postings(doc_id, dl, term, tf)`, term_bucket-partitioned: a
  *   refresh WRITES only the delta docs' rows; rows of replaced doc
  *   versions are killed by tombstones `(doc_id, dl, asof_seg)` — a
  *   postings row in segment s is live iff no tombstone for its doc has
  *   `asof_seg > s`. The merged live multiset is bitwise the full
  *   rebuild's postings (spec-pinned).
  * - `dict(term, df, cf)`: re-derived at refresh ONLY for touched terms
  *   (terms of added/changed/removed docs) over their merged live
  *   postings — a bucket-pruned read of |touched terms| buckets, never
  *   the corpus. Serving reads each term's LATEST segment row; a row
  *   with df = 0 (term vanished with its last doc) masks older
  *   segments. df is term-local, so untouched terms' rows stay exact.
  * - `champions(term, doc_id, tf, dl)`: per-term top-[[M]] candidates
  *   cut by `(tf DESC, dl ASC, doc_id ASC)` — the TEXTBOOK champion
  *   list (Manning, Raghavan & Schütze, *IIR* §7.1.3: "the r docs with
  *   the highest tf values for term t"). The cut is deliberately free
  *   of corpus-level statistics: [[ChampionIndex]]'s impact-ordered cut
  *   depends on avgdl, so ANY corpus change would stale EVERY term's
  *   list; the tf cut depends only on the term's own postings, so
  *   touched-terms-only recutting reproduces the full rebuild BITWISE.
  *   Scoring happens at probe time with CURRENT stats (below), so
  *   scores carry no staleness at all — only list membership is the
  *   (deterministic, stats-free) pruning heuristic.
  * - `stats(n_docs, sum_dl)`: per-segment partials. dl is an integral
  *   token count, so segment sums are EXACT in double arithmetic and
  *   merged `avgdl = (Σ sum_dl − Σ tombstone dl) / (Σ n − |tombs|)` is
  *   bit-identical to the full rebuild's average. `docstats` keeps a
  *   row per doc INCLUDING dl = 0 (the [[QueryLikelihood]] shortest-
  *   closure convention).
  *
  * Probe ([[search]]): query terms' champion rows (≤ |terms|·M, read
  * bucket-pruned) scored with exact current BM25 — idf from the merged
  * dict, length norm from merged stats — per-term contributions rounded
  * at 6 decimals (the [[ChampionIndex.ImpactDecimals]] determinism
  * contract), summed per doc, top-k by (score DESC, doc_id).
  *
  * Scale notes: the tombstone liveness join broadcasts the tombstone
  * set (bounded by delta volume between compactions; at larger delete
  * volumes it becomes a shuffle semi-join or a bloom pre-filter), and
  * compaction — folding segments + tombstones into a new base — is the
  * standard background task that bounds segment count; both are the
  * documented Lucene/LSM trade, not new machinery.
  */
object IndexRefresh {
  /** Champion depth per term (the [[ChampionIndex.M]] recall knob). */
  val M = ChampionIndex.M
  val NumBuckets = 64
  /** dl bound for the exact composite heap score (tf·2²⁴ − dl). */
  private val DlBound = 1 << 24

  import KeywordSearch.{K1, B}

  // --- segment construction -------------------------------------------------

  /** One tokenize pass per batch: (doc_id, dl, term, tf) with the
    * Generate barrier keeping the tokenizer single-evaluated (the
    * [[KeywordSearch.buildBatchPostings]] lesson), plus the bucket key.
    */
  private def segPostings(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(array(tokens(col("text")))).as("tk"))
      .select(col("doc_id"), size(col("tk")).cast("double").as("dl"),
        explode(col("tk")).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
      .withColumn("term_bucket", pmod(portableHash(col("term")), lit(NumBuckets)))

  /** Per-doc lengths INCLUDING dl = 0 rows for token-free docs. */
  private def segDocStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("double").as("dl"))

  /** Textbook tf-ordered champion cut via the bounded heap: composite
    * score `tf·2²⁴ − dl` makes (score DESC, doc_id ASC) ≡
    * (tf DESC, dl ASC, doc_id ASC) exactly (both integral, dl < 2²⁴),
    * so the map-side-combining [[topKByScore]] heap replaces a
    * vocabulary-wide window at build time. tf is recovered from the
    * composite; dl rides as the payload.
    */
  private[graft] def cutChampions(postings: DataFrame, m: Int = M): DataFrame = {
    import graft.functions.VectorFunctions.topKByScore
    val composite = col("tf").cast("double") * lit(DlBound.toDouble) - col("dl")
    postings
      .groupBy("term")
      .agg(topKByScore(composite, col("doc_id"), m, col("dl").cast("long")).as("top"))
      .select(col("term"), explode(col("top")).as("t"))
      .select(col("term"), col("t.id").as("doc_id"),
        ((col("t.score") + col("t.payload").cast("double")) / DlBound)
          .cast("long").as("tf"),
        col("t.payload").cast("double").as("dl"))
      .withColumn("term_bucket", pmod(portableHash(col("term")), lit(NumBuckets)))
  }

  /** partitionBy write that stays READABLE when the frame is empty: an
    * empty partitioned write lands no data files at all and the
    * read-back then fails schema inference — a pure-removal refresh
    * batch (empty delta) or a touched-vocabulary extinction would
    * otherwise poison every later full-layout read (found by the r9
    * random multi-refresh property sweep). Empty frames land as ONE
    * unpartitioned empty file carrying the partition column as a data
    * column — same merged schema after the union's type widening;
    * bucket pruning on an empty segment is moot.
    */
  private[graft] def writePartitionedSafe(df: DataFrame, partCol: String,
                                          path: String): Unit =
    if (df.isEmpty) df.write.mode("overwrite").parquet(path)
    else df.write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** Per-segment commit marker, written LAST by [[writeSegment]] (and
    * cleared FIRST by a replay at the same id): a segment directory
    * without it is a failed attempt's partial write. [[segmentIds]]
    * refuses to build on one — a refresh attempt that dies between its
    * tombstone write and its segment commit would otherwise leave docs
    * killed whose replacement delta never landed, and the next
    * auto-incrementing [[refresh]] would silently build above the
    * corruption.
    */
  private[graft] val CommitMarker = "_graft_committed"

  /** Cap on collecting a touched-term set for scan pushdown: below it
    * the set ships as an `In` predicate into the postings scan (pages
    * prune by term range — see the clustered write in [[writeSegment]]);
    * above it only bucket pruning + the broadcast semi-join apply. A
    * refresh batch's vocabulary is bounded by its text volume, so real
    * batches sit far below this. Overridable via
    * `-Dgraft.refresh.termPushdownCap` so the ABOVE-cap fallback regime
    * is testable (RecutSparseSpec pins byte-identical recut output with
    * the cap forced to 0) and measurable (SCALE.md's above-cap cell)
    * without a synthetic 4096-term vocabulary.
    */
  private def TermPushdownCap: Long =
    sys.props.get("graft.refresh.termPushdownCap").map(_.toLong).getOrElse(4096L)

  /** The touched-term list when bounded (one cheap count over the
    * already-checkpointed frame), else None.
    */
  private def collectTermsIfBounded(touched: DataFrame): Option[Seq[String]] =
    if (touched.count() <= TermPushdownCap)
      Some(touched.select("term").collect().map(_.getString(0)).toSeq)
    else None

  private[graft] def commitSegment(segDir: String): Unit =
    new java.io.File(segDir, CommitMarker).createNewFile()

  private[graft] def uncommitSegment(segDir: String): Unit =
    new java.io.File(segDir, CommitMarker).delete()

  private def writeSegment(segDir: String, postings: DataFrame,
                           docstats: DataFrame, dict: DataFrame,
                           champs: DataFrame): Unit = {
    // clear-first/commit-last for EVERY writer (not just refreshAt's
    // replay): a buildBase or compact replayed over an already-committed
    // segment directory must not keep the old marker through the
    // overwrites — a crash mid-replay would otherwise leave a
    // committed-looking segment with mixed old/new files, exactly the
    // corruption the marker exists to expose
    uncommitSegment(segDir)
    // term-keyed files land CLUSTERED BY TERM within each bucket file
    // (Lucene's sorted term dictionary, as a parquet layout property):
    // rows sorted by term give every page a tight term min/max, so a
    // touched-terms read with a pushed term predicate prunes at the
    // PAGE level inside a bucket — bucket-grain pruning alone cannot
    // help a touched set whose ~|vocab-per-batch| terms hash across
    // most of the 64 buckets (the r14 sparse-recut finding: r100 = 18
    // bucket-pruned only). Leading the sort with term_bucket satisfies
    // the partitioned writer's required ordering, so no second sort.
    def clustered(df: DataFrame) =
      df.sortWithinPartitions(col("term_bucket"), col("term"))
    writePartitionedSafe(clustered(postings), "term_bucket", s"$segDir/postings")
    docstats.write.mode("overwrite").parquet(s"$segDir/docstats")
    writePartitionedSafe(clustered(dict), "term_bucket", s"$segDir/dict")
    writePartitionedSafe(clustered(champs), "term_bucket", s"$segDir/champions")
    docstats.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
      .write.mode("overwrite").parquet(s"$segDir/stats")
    commitSegment(segDir)
  }

  /** Base build (segment 0) over a full corpus snapshot. */
  def buildBase(docs: DataFrame, path: String): Unit = {
    val p = segPostings(docs).localCheckpoint()
    val dict = p.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").cast("long").as("cf"))
      .withColumn("term_bucket", pmod(portableHash(col("term")), lit(NumBuckets)))
    writeSegment(s"$path/seg=0", p, segDocStats(docs), dict, cutChampions(p))
    Checkpoints.release(p) // fully consumed by the segment write
  }

  // --- refresh --------------------------------------------------------------

  /** Apply one refresh batch. `deltaDocs` = added ∪ changed docs with
    * their CURRENT text; `removedDocs` = removed ∪ changed docs with
    * the text of the version being replaced (exactly what the previous
    * snapshot holds — the [[CorpusOps.snapshotDiff]] consumption
    * contract). Work done: one tokenize pass over the batch, one
    * bucket-pruned read of the touched terms' live postings for the
    * dict/champion recut, and the delta-segment writes — nothing
    * proportional to corpus size.
    */
  def refresh(spark: SparkSession, path: String, deltaDocs: DataFrame,
              removedDocs: DataFrame): Unit =
    refreshAt(spark, path, segmentIds(path).max + 1, deltaDocs, removedDocs)

  /** [[refresh]] at an EXPLICIT segment id — the exactly-once form for
    * micro-batch drivers: a Structured Streaming retry re-invokes
    * `foreachBatch` with the SAME batchId, and replaying a refresh at
    * the same segment id is idempotent BY OVERWRITE (every write lands
    * at a deterministic path in mode overwrite with identical content),
    * where the auto-incrementing [[refresh]] would land the same delta
    * in a SECOND live segment and double its postings. The recut reads
    * only segments BELOW `r` from disk (plus the in-memory delta), so a
    * partially-written failed attempt at `r` can never leak into its
    * own replay's statistics. `r` must be above every COMMITTED
    * segment; gaps are fine (batchId-derived ids).
    */
  def refreshAt(spark: SparkSession, path: String, r: Int,
                deltaDocs: DataFrame, removedDocs: DataFrame): Unit = {
    // a replay over a COMPLETED attempt re-overwrites the segment's
    // files; clear its marker first so a failure mid-replay leaves the
    // segment visibly uncommitted instead of committed-with-mixed-files
    uncommitSegment(s"$path/seg=$r")
    // tombstones first: the recut below must see the batch's kills
    segDocStats(removedDocs).withColumn("asof_seg", lit(r))
      .write.mode("overwrite").parquet(s"$path/tombstones/seg=$r")
    val deltaPost = segPostings(deltaDocs).localCheckpoint()
    // touched terms: everything the batch's new OR replaced versions use
    val touched = deltaPost.select("term")
      .union(segPostings(removedDocs).select("term"))
      .distinct().localCheckpoint()
    val touchedBuckets = touched
      .select(pmod(portableHash(col("term")), lit(NumBuckets)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq // ≤ NumBuckets values
    // merged live postings of the touched terms: bucket-pruned AND
    // (for a bounded batch vocabulary) term-pushdown-pruned scan of
    // every segment below r (including the delta written below in view
    // form; a failed prior attempt at r stays invisible to its replay)
    val liveTouched = livePostings(spark, path,
        bucketFilter = Some(touchedBuckets), extraSeg = Some((r, deltaPost)),
        belowSeg = Some(r), termFilter = collectTermsIfBounded(touched))
      .join(broadcast(touched), Seq("term"))
    // dict rows for ALL touched terms, df = 0 when the term vanished —
    // the zero row masks older segments in the serving view
    val dict = liveTouched.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").cast("long").as("cf"))
      .join(touched, Seq("term"), "right")
      .na.fill(0L, Seq("df", "cf"))
      .withColumn("term_bucket", pmod(portableHash(col("term")), lit(NumBuckets)))
    writeSegment(s"$path/seg=$r", deltaPost, segDocStats(deltaDocs), dict,
      cutChampions(liveTouched))
    // both batch-scoped checkpoints are fully consumed by the writes
    Checkpoints.release(deltaPost); Checkpoints.release(touched)
  }

  // --- compaction -----------------------------------------------------------

  /** Fold every segment + the tombstones into a fresh single-segment
    * artifact at `outPath` — the LSM/Lucene background task that bounds
    * segment count (and the point where staleness policies reset:
    * [[VectorRefresh]] re-clusters here). The compacted artifact's
    * views are BITWISE the pre-compaction merged views (spec-pinned):
    * postings = the live multiset; docstats/stats = live versions only;
    * dict and champions re-derive from the live postings, which equals
    * the serving views exactly BECAUSE the champion cut is stats-free
    * and dict rows are term-local (the same argument that makes
    * touched-terms-only refresh exact). Cost: one pass over the live
    * artifact — amortized over the refreshes it absorbs, never on the
    * serving path.
    */
  def compact(spark: SparkSession, path: String, outPath: String): Unit = {
    val live = livePostings(spark, path)
      .select("doc_id", "dl", "term", "tf", "term_bucket").localCheckpoint()
    val dict = live.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").cast("long").as("cf"))
      .withColumn("term_bucket", pmod(portableHash(col("term")), lit(NumBuckets)))
    writeSegment(s"$outPath/seg=0", live, liveDocStats(spark, path), dict,
      cutChampions(live))
    Checkpoints.release(live) // fully consumed by the fold's writes
    // the source generation is retired once the fold commits — release
    // its cached serving views (they'd otherwise pin checkpoint blocks
    // for the JVM lifetime)
    evictViews(path)
  }

  /** Live per-doc lengths across segments (dl = 0 rows included) — the
    * [[livePostings]] tombstone rule on the docstats files.
    */
  private[graft] def liveDocStats(spark: SparkSession, path: String,
                                  asOf: Option[Int] = None): DataFrame = {
    val all = segmentIds(path).filter(s => asOf.forall(s <= _)).map { s =>
      spark.read.parquet(s"$path/seg=$s/docstats").withColumn("seg", lit(s))
    }.reduce(_.unionByName(_))
    val kills = tombstones(spark, path, asOf).groupBy("doc_id")
      .agg(max("asof_seg").as("dead_after"))
    all.join(broadcast(kills), Seq("doc_id"), "left")
      .filter(col("dead_after").isNull || col("seg") >= col("dead_after"))
      .select("doc_id", "dl")
  }

  // --- merged serving views -------------------------------------------------

  /** Committed segment ids under `path`, FAIL-FAST on corruption: a
    * seg dir without its [[CommitMarker]] is a failed refresh attempt's
    * partial write, and a tombstone batch whose segment never committed
    * has killed docs whose replacement delta never landed — building on
    * either silently loses documents, so both throw with the remedy
    * (replay the batch with [[refreshAt]] at the SAME id; overwrite
    * makes the replay exact). `inFlight` is the id the CURRENT
    * [[refreshAt]] call is writing — its (by-design) uncommitted state
    * is invisible to its own recut reads.
    */
  private[graft] def segmentIds(path: String,
                                inFlight: Option[Int] = None): Seq[Int] = {
    def ids(dir: java.io.File): Array[Int] =
      Option(dir.list()).getOrElse(Array.empty[String])
        .filter(_.startsWith("seg=")).map(_.stripPrefix("seg=").toInt)
    val (committed, partial) = ids(new java.io.File(path)).partition(s =>
      new java.io.File(s"$path/seg=$s/$CommitMarker").exists())
    val badSegs = partial.filterNot(inFlight.contains).sorted
    require(badSegs.isEmpty,
      s"partially-written segment(s) ${badSegs.mkString(", ")} under $path " +
        "(no commit marker — a failed refresh attempt); replay the batch " +
        "with refreshAt at the same segment id, or compact from a " +
        "known-good snapshot, before building further")
    val orphanTombs = ids(new java.io.File(s"$path/tombstones"))
      .filterNot(t => committed.contains(t) || inFlight.contains(t)).sorted
    require(orphanTombs.isEmpty,
      s"orphan tombstone batch(es) ${orphanTombs.mkString(", ")} under " +
        s"$path — kills whose replacement segment never committed; replay " +
        "each batch with refreshAt at the same segment id")
    require(committed.nonEmpty, s"no segments under $path — buildBase first")
    committed.sorted.toSeq
  }

  private def tombstones(spark: SparkSession, path: String,
                         asOf: Option[Int] = None): DataFrame = {
    val d = new java.io.File(s"$path/tombstones")
    val segs = Option(d.list()).getOrElse(Array.empty[String])
    val all =
      if (segs.isEmpty)
        spark.range(0).select(col("id").as("doc_id"),
          lit(0.0).as("dl"), lit(0).as("asof_seg"))
      else spark.read.parquet(segs.map(s => s"$path/tombstones/$s").toSeq: _*)
    asOf.fold(all)(a => all.filter(col("asof_seg") <= a))
  }

  private def readSegFile(spark: SparkSession, path: String, file: String,
                          bucketFilter: Option[Seq[Long]],
                          belowSeg: Option[Int] = None,
                          asOf: Option[Int] = None,
                          termFilter: Option[Seq[String]] = None): DataFrame = {
    // belowSeg: the exactly-once recut reads only segments below the
    // id being replayed — a failed attempt's partial (possibly
    // unreadable) directory there is skipped at the listing level and
    // exempted from the completeness check (it IS the in-flight write).
    // asOf: the time-travel read — only segments committed at or before
    // the pinned id participate (nothing is exempted: every listed
    // segment must still be complete).
    val dfs = segmentIds(path, inFlight = belowSeg)
      .filter(s => belowSeg.forall(s < _))
      .filter(s => asOf.forall(s <= _)).map { s =>
      val df = spark.read.parquet(s"$path/seg=$s/$file")
      val bucketed =
        bucketFilter.fold(df)(bs => df.filter(col("term_bucket").isin(bs: _*)))
      // a BOUNDED touched-term set pushes to the parquet scan: pages
      // prune by term min/max (the clustered write above makes ranges
      // tight); above ~10 values Spark pushes In as a [min,max] range
      termFilter.fold(bucketed)(ts => bucketed.filter(col("term").isin(ts: _*)))
        .withColumn("seg", lit(s))
    }
    dfs.reduce(_.unionByName(_))
  }

  /** Live postings across all segments: tombstones kill every row of a
    * doc's replaced versions (segments older than the kill), current-
    * version rows survive. `extraSeg` lets [[refresh]] include its
    * not-yet-written delta in the merge.
    */
  private[graft] def livePostings(spark: SparkSession, path: String,
                                      bucketFilter: Option[Seq[Long]] = None,
                                      extraSeg: Option[(Int, DataFrame)] = None,
                                      belowSeg: Option[Int] = None,
                                      asOf: Option[Int] = None,
                                      termFilter: Option[Seq[String]] = None): DataFrame = {
    val stored = readSegFile(spark, path, "postings", bucketFilter, belowSeg,
      asOf, termFilter)
    val all = extraSeg.fold(stored) { case (s, df) =>
      val bucketed =
        bucketFilter.fold(df)(bs => df.filter(col("term_bucket").isin(bs: _*)))
      stored.unionByName(
        termFilter.fold(bucketed)(ts => bucketed.filter(col("term").isin(ts: _*)))
          .withColumn("seg", lit(s)))
    }
    val kills = tombstones(spark, path, asOf).groupBy("doc_id")
      .agg(max("asof_seg").as("dead_after"))
    all.join(broadcast(kills), Seq("doc_id"), "left")
      .filter(col("dead_after").isNull || col("seg") >= col("dead_after"))
      .drop("dead_after")
  }

  /** Latest dict row per term (the version authority): df = 0 rows mask
    * older segments and then drop from the merged dictionary.
    */
  private[graft] def dictView(spark: SparkSession, path: String,
                                  bucketFilter: Option[Seq[Long]] = None,
                                  asOf: Option[Int] = None): DataFrame = {
    val all = readSegFile(spark, path, "dict", bucketFilter, asOf = asOf)
    val latest = all.groupBy("term").agg(max("seg").as("seg"))
    all.join(latest, Seq("term", "seg")).filter(col("df") > 0)
      .select("term", "df", "cf")
  }

  /** Serving champion lists: each term's lists come from its latest
    * dict segment (so a vanished term's empty recut masks older lists).
    * Invariant (asserted in the spec): no live champion row references
    * a tombstoned doc version — a replaced doc's terms are by
    * definition touched, hence recut in the replacing segment.
    */
  private[graft] def champsView(spark: SparkSession, path: String,
                                    bucketFilter: Option[Seq[Long]] = None,
                                    asOf: Option[Int] = None): DataFrame = {
    val dictAll = readSegFile(spark, path, "dict", bucketFilter, asOf = asOf)
    val latest = dictAll.groupBy("term").agg(max("seg").as("seg"))
    readSegFile(spark, path, "champions", bucketFilter, asOf = asOf)
      .join(latest, Seq("term", "seg"))
      .select("term", "doc_id", "tf", "dl")
  }

  /** Exact current corpus stats from the per-segment partials: integral
    * token counts make every sum exact, so the merged average is
    * bitwise the full rebuild's.
    */
  private[graft] def statsView(spark: SparkSession, path: String,
                               asOf: Option[Int] = None): DataFrame = {
    val segStats = segmentIds(path)
      .filter(s => asOf.forall(s <= _))
      .map(s => spark.read.parquet(s"$path/seg=$s/stats"))
      .reduce(_.unionByName(_))
      .agg(sum("n_docs").as("n"), sum("sum_dl").as("sdl"))
    val tomb = tombstones(spark, path, asOf)
      .agg(count(lit(1)).as("tn"), coalesce(sum("dl"), lit(0.0)).as("tdl"))
    segStats.join(tomb)
      .select((col("n") - col("tn")).as("n_docs"),
        ((col("sdl") - col("tdl")) / (col("n") - col("tn")).cast("double"))
          .as("avgdl"),
        // total live token count (Σ dl ≡ Σ tf ≡ Σ cf) — integral, so the
        // merged value is exact; the collection-LM denominator for the
        // refreshed QL probe
        (col("sdl") - col("tdl")).as("sum_dl"))
  }

  // --- epoch-cached serving views --------------------------------------------

  /** Process-local cache of MERGED serving views, keyed by the layout's
    * EPOCH (committed segment ids + tombstone batch ids): the
    * deployment pattern of a warm segment reader — Lucene reopens its
    * IndexReader only when a new segment commits; between commits every
    * probe reuses the same merged view. Here a view is materialized
    * once per epoch (localCheckpoint — the segment union + tombstone
    * anti-join and latest-per-term resolution are paid once, not per
    * micro-batch), and a refresh landing a new segment or tombstone
    * batch changes the epoch so the NEXT probe rebuilds — serving can
    * never read a stale merge (spec-pinned). At cluster scale the same
    * role is played by materializing the merged views to storage (what
    * [[compact]] does); the JVM checkpoint is the single-process form.
    * `-Dgraft.refresh.nocache` disables it (the per-batch re-merge
    * form, kept for in-JVM A/B measurement).
    */
  private val viewCache =
    new java.util.concurrent.ConcurrentHashMap[String, (String, DataFrame)]()

  /** The one RETIRED frame per view key — release of a rolled epoch's
    * view is DEFERRED by one roll: a concurrent reader that fetched
    * the old frame from [[viewCache]] just before a refresh committed
    * may still be executing its plan after the roll, and an eager
    * unpersist of a localCheckpoint is unrecoverable (lineage was
    * truncated — the read fails with checkpoint-block-not-found). One
    * epoch of grace is the serving contract: a fetched view stays
    * readable until the NEXT refresh/compact commits (readers that
    * could span two commits must refetch per probe — the
    * CheckpointsSpec rule). Bounded residency: ≤1 retired frame per
    * key, all of the bounded warm-reader artifact class.
    */
  private val retiredViews =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /** Park a rolled frame for one epoch; release the one it displaces. */
  private def retire(key: String, rolled: DataFrame): Unit = {
    val prev = retiredViews.put(key, rolled)
    if (prev != null) Checkpoints.release(prev)
  }

  /** The layout's serving epoch: every state change lands a new
    * `seg=`/tombstone directory, so the id lists identify the merge.
    */
  private[graft] def epochOf(path: String): String = {
    def list(d: String) = Option(new java.io.File(d).list())
      .getOrElse(Array.empty[String]).sorted.mkString(",")
    s"${segmentIds(path).mkString(",")}|${list(s"$path/tombstones")}"
  }

  private[graft] def cachedView(kind: String, path: String)
                               (build: => DataFrame): DataFrame = {
    val key = s"$kind:$path"
    val ep = epochOf(path)
    val hit = viewCache.get(key)
    if (hit != null && hit._1 == ep) hit._2
    else {
      // build OUTSIDE the map's bucket lock — localCheckpoint runs an
      // eager Spark job, and compute() would block every concurrent
      // caller colliding on the bucket for its whole duration. The
      // check-then-swap below keeps the first finished builder; a
      // racing loser's checkpoint and any epoch-rolled predecessor are
      // released EXPLICITLY ([[Checkpoints.release]]) — dropping the
      // strong reference alone leaves their blocks pinned until the
      // ContextCleaner's next GC-driven pass, which in a long-lived
      // serving JVM is unboundedly far away (the r13 session-state
      // latency-growth mechanism)
      val fresh = build.localCheckpoint()
      var rolled: DataFrame = null
      val out = viewCache.compute(key, (_, cur) =>
        if (cur != null && cur._1 == ep) cur
        else if (cur != null && cur._1 == epochOf(path)) cur
        // ^ a builder that read the epoch BEFORE a concurrent refresh
        // rolled it must not overwrite the newer entry a post-roll
        // builder installed — re-check cur against the LIVE epoch (two
        // dir listings under the bucket lock) and keep it when current;
        // install (ep, fresh) only when neither entry matches
        else { rolled = if (cur != null) cur._2 else null; (ep, fresh) })._2
      // the losing racer's copy was never visible to any reader —
      // immediate release is safe; a ROLLED epoch's frame may still
      // back a pre-roll reader's in-flight plan, so it parks in
      // [[retiredViews]] and is released on the NEXT roll instead
      if (out ne fresh) Checkpoints.release(fresh)
      else if (rolled != null) retire(key, rolled)
      out
    }
  }

  /** Drop a RETIRED layout's cached views — a fold's old generation
    * ([[compact]] calls this on its source), a test's tmp artifact.
    * The checkpoint blocks are unpersisted EXPLICITLY, not left for
    * the ContextCleaner: a dead path would otherwise pin its last
    * merged views' blocks until the next full GC (30-minute periodic
    * default), growing block-manager residency for the JVM lifetime
    * of a long-lived serving process.
    */
  private[graft] def evictViews(path: String): Unit = {
    val it = viewCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.endsWith(s":$path")) {
        Checkpoints.release(e.getValue._2)
        it.remove()
      }
    }
    val rit = retiredViews.entrySet().iterator()
    while (rit.hasNext) {
      val e = rit.next()
      if (e.getKey.endsWith(s":$path")) {
        Checkpoints.release(e.getValue)
        rit.remove()
      }
    }
  }

  /** Drop EVERY cached view — the session-recreation path: a harness
    * that replaces a dead SparkContext (ScaleBench's OOM-recovery loop)
    * must not serve checkpoint frames bound to the old one. Release is
    * attempted per view ([[Checkpoints.release]] no-ops on a stopped
    * context).
    */
  def clearViewCache(): Unit = {
    viewCache.values().forEach(v => Checkpoints.release(v._2))
    viewCache.clear()
    retiredViews.values().forEach(Checkpoints.release)
    retiredViews.clear()
  }

  private[graft] def servingCacheDisabled: Boolean =
    sys.props.contains("graft.refresh.nocache")

  // ONLY bounded, index-artifact-sized views are cached — dictionary
  // (vocab), champions (vocab·M), stats (1 row), shortest closure
  // (k+1), centroids (nlist·dim): exactly what a warm reader holds in
  // RAM. Corpus-sized frames (live postings, live vectors) are NEVER
  // pinned in the JVM — at deployment scale they live on disk and each
  // probe scans them partition-pruned; pinning one was measured to
  // poison every later query's memory budget at 100× (r10).
  private[graft] def cachedDictView(spark: SparkSession, path: String): DataFrame =
    cachedView("kw_dict", path)(dictView(spark, path))
  private[graft] def cachedChampsView(spark: SparkSession, path: String): DataFrame =
    cachedView("kw_champs", path)(champsView(spark, path))
  private[graft] def cachedStatsView(spark: SparkSession, path: String): DataFrame =
    cachedView("kw_stats", path)(statsView(spark, path))
  /** The QL k+1-shortest-live-docs closure (corpus-wide sort, k+1 rows). */
  private[graft] def cachedShortest(spark: SparkSession, path: String,
                                    k: Int): DataFrame =
    cachedView(s"kw_shortest_$k", path)(
      liveDocStats(spark, path).orderBy(col("dl").asc, col("doc_id").asc)
        .limit(k + 1))

  // Serving views picked by state (r15): epoch-cached latest merge
  // (asOf = None), epoch-cached PINNED view keyed by the pinned segment
  // id (asOf = Some — a pinned view is an immutable function of
  // (path, asOf), the same bounded index-artifact class as the latest
  // views, so it caches under the same cachedView contract and rolls
  // with the epoch), or the uncached bucket-pruned read when the cache
  // is disabled. Before this every as-of probe re-derived its pinned
  // views per run (guide §2.4 — the pinned dict/champion/stats merges
  // were each a multi-exchange subtree executed per query).
  private[graft] def servingDictView(spark: SparkSession, path: String,
                                     buckets: => Option[Seq[Long]],
                                     asOf: Option[Int]): DataFrame =
    if (servingCacheDisabled) dictView(spark, path, buckets, asOf)
    else asOf.fold(cachedDictView(spark, path))(a =>
      cachedView(s"kw_dict@$a", path)(dictView(spark, path, None, Some(a))))

  private[graft] def servingChampsView(spark: SparkSession, path: String,
                                       buckets: => Option[Seq[Long]],
                                       asOf: Option[Int]): DataFrame =
    if (servingCacheDisabled) champsView(spark, path, buckets, asOf)
    else asOf.fold(cachedChampsView(spark, path))(a =>
      cachedView(s"kw_champs@$a", path)(champsView(spark, path, None, Some(a))))

  private[graft] def servingStatsView(spark: SparkSession, path: String,
                                      asOf: Option[Int]): DataFrame =
    if (servingCacheDisabled) statsView(spark, path, asOf)
    else asOf.fold(cachedStatsView(spark, path))(a =>
      cachedView(s"kw_stats@$a", path)(statsView(spark, path, Some(a))))

  private[graft] def servingShortest(spark: SparkSession, path: String,
                                     k: Int, asOf: Option[Int]): DataFrame =
    if (servingCacheDisabled)
      liveDocStats(spark, path, asOf)
        .orderBy(col("dl").asc, col("doc_id").asc).limit(k + 1)
    else asOf.fold(cachedShortest(spark, path, k))(a =>
      cachedView(s"kw_shortest_$k@$a", path)(
        liveDocStats(spark, path, Some(a))
          .orderBy(col("dl").asc, col("doc_id").asc).limit(k + 1)))

  // --- probe ----------------------------------------------------------------

  private[graft] def termBucket(t: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % NumBuckets
  }

  /** One request's champion-candidate BM25 scores over the refreshed
    * artifact — (doc_id, raw_score = Σ 6dp-rounded contributions from
    * EXACT current statistics), bucket-pruned reads; the pre-ranking
    * stage of [[search]] and the keyword leg of the facade's refreshed
    * hybrid route. The per-doc sum is the EXACT fixed-point form
    * ([[KeywordSearch.fixedPointSum6]]) — 6dp-rounded contributions
    * land a doc's total ON 4dp half-way boundaries ~1% of the time,
    * where an unordered parallel float sum's reassociation flips the
    * rank round (r10's `kw_search_asof` red row); summing the integer
    * numerators is associative, so the total is order-free
    * deterministic AND keeps map-side partial aggregation.
    */
  private[graft] def requestScored(spark: SparkSession, path: String,
                                   terms: Seq[String],
                                   asOf: Option[Int] = None): DataFrame =
    requestContribs(spark, path, terms, asOf)
      .groupBy("doc_id")
      .agg(KeywordSearch.fixedPointSum6(col("contrib")).as("raw_score"))

  /** Per-(term, doc) 6dp-rounded BM25 contributions from the request
    * terms' champion rows — the probe [[requestScored]] sums, exposed
    * term-wise for weighted consumers (the refreshed RM3 second round
    * multiplies each term's contribution by its RM3 weight).
    */
  private[graft] def requestContribs(spark: SparkSession, path: String,
                                     terms: Seq[String],
                                     asOf: Option[Int] = None): DataFrame = {
    lazy val buckets = terms.map(termBucket).distinct
    val champs = servingChampsView(spark, path, Some(buckets), asOf)
      .filter(col("term").isin(terms: _*))
    val dict = servingDictView(spark, path, Some(buckets), asOf)
      .filter(col("term").isin(terms: _*))
    val tfD = col("tf").cast("double")
    val idf = log(lit(1.0) + (col("n_docs").cast("double") - col("df").cast("double") + 0.5) /
      (col("df").cast("double") + 0.5))
    val contrib = round(idf * (tfD * (K1 + 1)) /
      (tfD + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / col("avgdl"))), 6)
    champs
      .join(broadcast(dict), Seq("term"))
      .join(broadcast(servingStatsView(spark, path, asOf)))
      .select(col("term"), col("doc_id"), contrib.as("contrib"))
  }

  /** BM25 top-k over the refreshed artifact: candidates from the query
    * terms' champion lists (bucket-pruned read), scored with EXACT
    * current statistics — per-term contributions rounded at 6dp (the
    * champion determinism contract), per-doc sum rounded at 4. An
    * optional metadata filter restricts the candidate domain during
    * the walk (the [[IvfIndex.searchPrunedWithQuery]] convention —
    * selective filters shrink the served page, M is the recall knob).
    */
  def search(spark: SparkSession, path: String, docs: DataFrame,
             terms: Seq[String], topK: Int = KeywordSearch.TopK,
             docFilter: Column = lit(true),
             asOf: Option[Int] = None): DataFrame = {
    val filtered = docs.filter(docFilter)
    val topk = requestScored(spark, path, terms, asOf)
      .join(filtered.select(col("doc_id")), Seq("doc_id"), "semi")
      .select(col("doc_id"), round(col("raw_score"), 4).as("score"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(topK)
    topk.join(filtered.select(col("doc_id"), col("source"), col("lang")), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("lang"), col("score"))
      .orderBy(desc("score"), asc("doc_id"))
  }

  /** BATCH multi-query BM25 over the refreshed artifact — the serving
    * WORKLOAD against the refreshable index, closing the refresh→serve
    * loop: the benchmark query set (every [[KeywordSearch.BatchStride]]-th
    * current-snapshot doc, its [[KeywordSearch.BatchTerms]] rarest terms
    * by the MERGED dictionary's df) probes the champion serving views,
    * scored with exact current statistics. Per-batch work: ONE doc-keyed
    * probe of the live postings for the query docs' terms (request-sized
    * in a real deployment, where query text arrives with the request),
    * then dictionary + champion reads partition-pruned to the query
    * vocabulary's ≤ [[NumBuckets]] term buckets, a bounded collect. The
    * scoring domain is champion candidates only (terms·M per query
    * regardless of corpus size) — the [[ChampionIndex]] pruning contract
    * carried over to the refreshed layout.
    */
  def batchSearch(spark: SparkSession, path: String, docs: DataFrame,
                  stride: Int = KeywordSearch.BatchStride,
                  nTerms: Int = KeywordSearch.BatchTerms,
                  k: Int = KeywordSearch.BatchK,
                  asOf: Option[Int] = None): DataFrame =
    batchSearchSel(spark, path, docs,
      _.filter(col("doc_id") % stride === 0), nTerms, k, asOf)

  /** [[batchSearch]] over an arbitrary query selector — the micro-batch
    * serving entry ([[graft.streaming.ServeStream.refreshServe]] passes
    * the batch's id frame as a broadcast semi-join). Every score input
    * is a global artifact of the refreshed layout (merged dictionary,
    * exactly-merged stats, champion views), so a query's results are
    * identical whichever micro-batch it arrives in.
    */
  private[graft] def batchSearchSel(spark: SparkSession, path: String,
                                    docs: DataFrame,
                                    selectQueries: DataFrame => DataFrame,
                                    nTerms: Int = KeywordSearch.BatchTerms,
                                    k: Int = KeywordSearch.BatchK,
                                    asOf: Option[Int] = None): DataFrame =
    KeywordSearch.rankKwScored(
      batchScoredSel(spark, path, docs, selectQueries, nTerms, asOf), k)

  /** The pre-ranking stage of [[batchSearchSel]] — (q_id, doc_id,
    * raw_score = Σ 6dp-rounded contributions); shared with the
    * refreshed hybrid fusion's keyword leg.
    */
  private[graft] def batchScoredSel(spark: SparkSession, path: String,
                                    docs: DataFrame,
                                    selectQueries: DataFrame => DataFrame,
                                    nTerms: Int = KeywordSearch.BatchTerms,
                                    asOf: Option[Int] = None): DataFrame = {
    val qdocs = selectQueries(docs).select(col("doc_id").as("q_id"))
    // query terms = the query docs' OWN distinct tokens (docs is the
    // snapshot the layout indexes — pinned callers pass the pinned
    // snapshot — so this equals the live postings' term set for those
    // docs exactly). The previous form joined livePostings on doc_id,
    // which scanned the whole bucket-partitioned postings artifact per
    // batch (no doc_id pruning exists in that layout): O(corpus) per
    // micro-batch where tokenizing the ≤|Q| query docs is O(batch) —
    // measured ~1.7 s of the fused serve's per-batch constant at sf0.1.
    val qtoks = docs.join(broadcast(qdocs), col("doc_id") === col("q_id"))
      .select(col("q_id"), explode(array_distinct(tokens(col("text")))).as("term"))
    // cache-disabled form only: the query vocabulary's buckets
    // (≤ NumBuckets values), collected so every dict/champion segment
    // read partition-prunes; the cached forms' views are already merged
    // and the term joins below restrict them
    lazy val buckets = qtoks
      .select(pmod(portableHash(col("term")), lit(NumBuckets)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val dictV = servingDictView(spark, path, Some(buckets), asOf)
    val champsV = servingChampsView(spark, path, Some(buckets), asOf)
    val statsV = servingStatsView(spark, path, asOf)
    val qdict = dictV
      .join(broadcast(qtoks.select("term").distinct()), Seq("term"))
      .select(col("term"), col("df"))
    val qterms = KeywordSearch.batchQueryTermsFrom(qtoks, qdict, nTerms)
    val tfD = col("tf").cast("double")
    val idf = log(lit(1.0) + (col("n_docs").cast("double") - col("df").cast("double") + 0.5) /
      (col("df").cast("double") + 0.5))
    // idf + avgdl folded into the tiny (q_id, term) frame before the
    // champion probe — one broadcast hash probe on the candidate stream
    // instead of two term probes plus a 1-row nested-loop join (guide
    // §2.3/§3.1; same expressions over the same values, so every
    // contribution double is bit-identical — the r15 exact-chain fold
    // applied to the refreshed layout's serving probe)
    val qpre = qterms.join(broadcast(qdict), Seq("term"))
      .join(broadcast(statsV))
      .select(col("q_id"), col("term"), idf.as("idf"), col("avgdl"))
    val contrib = round(col("idf") * (tfD * (K1 + 1)) /
      (tfD + lit(K1) * (lit(1 - B) + lit(B) * col("dl") / col("avgdl"))), 6)
    champsV
      .join(broadcast(qpre), Seq("term"))
      .filter(col("doc_id") =!= col("q_id"))
      .select(col("q_id"), col("doc_id"), contrib.as("s"))
      .groupBy("q_id", "doc_id")
      .agg(KeywordSearch.fixedPointSum6(col("s")).as("raw_score"))
  }

  /** BATCH Dirichlet-QL over the refreshed artifact — the LM scoring
    * family served from the SAME refreshable layout as [[batchSearch]]:
    * the tf-cut champion rows carry (tf, dl), the merged dictionary
    * carries cf, and [[statsView]]'s exact Σdl is the collection-LM
    * denominator — so the query-independent QL impact
    * ln(tf + μp) − ln(μp) is computed AT PROBE TIME from current
    * merged statistics (zero score staleness, the same argument as
    * BM25's probe-time idf). Score chain = [[QueryLikelihood]]'s dense
    * decomposition: corr + qconst − |q|·ln(dl + μ) over champion
    * candidates ∪ the k+1 shortest LIVE docs (dl = 0 rows included via
    * [[liveDocStats]]). List membership is the layout's stats-free
    * tf-cut — the refresh-exactness trade — which equals the impact
    * order within a term (impact is monotone in tf for fixed term);
    * the oracle replays exactly this contract on a full rebuild.
    */
  def qlBatchSearch(spark: SparkSession, path: String, docs: DataFrame,
                    stride: Int = KeywordSearch.BatchStride,
                    nTerms: Int = KeywordSearch.BatchTerms,
                    k: Int = KeywordSearch.BatchK,
                    mu: Double = QueryLikelihood.Mu,
                    asOf: Option[Int] = None): DataFrame =
    qlBatchSearchSel(spark, path, docs,
      _.filter(col("doc_id") % stride === 0), nTerms, k, mu, asOf)

  /** [[qlBatchSearch]] over an arbitrary query selector (the
    * micro-batch serving entry; all score inputs are global artifacts
    * ⇒ batch-split invariant).
    */
  private[graft] def qlBatchSearchSel(spark: SparkSession, path: String,
                                      docs: DataFrame,
                                      selectQueries: DataFrame => DataFrame,
                                      nTerms: Int = KeywordSearch.BatchTerms,
                                      k: Int = KeywordSearch.BatchK,
                                      mu: Double = QueryLikelihood.Mu,
                                      asOf: Option[Int] = None): DataFrame = {
    val qdocs = selectQueries(docs).select(col("doc_id").as("q_id"))
    // query terms from the query docs' own tokens — the batchScoredSel
    // O(batch)-not-O(corpus) argument, same snapshot-equivalence proof
    val qtoks = docs.join(broadcast(qdocs), col("doc_id") === col("q_id"))
      .select(col("q_id"), explode(array_distinct(tokens(col("text")))).as("term"))
    lazy val buckets = qtoks
      .select(pmod(portableHash(col("term")), lit(NumBuckets)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val dictV = servingDictView(spark, path, Some(buckets), asOf)
    val champsV = servingChampsView(spark, path, Some(buckets), asOf)
    val statsV = servingStatsView(spark, path, asOf)
    val dictQ = dictV
      .join(broadcast(qtoks.select("term").distinct()), Seq("term"))
    val qterms = KeywordSearch.batchQueryTermsFrom(
      qtoks, dictQ.select(col("term"), col("df")), nTerms)
    val qp = qterms.join(broadcast(dictQ.select(col("term"), col("cf"))), Seq("term"))
      .join(broadcast(statsV.select(col("sum_dl").as("c_total"))))
      .select(col("q_id"), col("term"),
        (col("cf").cast("double") / col("c_total")).as("p"))
    val qconsts = qp.groupBy("q_id")
      .agg(collect_list(struct(col("term"),
        log(lit(mu) * col("p")).as("lp"))).as("ls"))
      .select(col("q_id"),
        aggregate(transform(array_sort(col("ls")), x => x.getField("lp")),
          lit(0.0), (a, x) => a + x).as("qconst"),
        size(col("ls")).as("nq"))
    // probe-time impacts over the query terms' champion rows, summed in
    // term order (the QueryLikelihood determinism convention)
    val imp = round(
      log(col("tf").cast("double") + lit(mu) * col("p")) - log(lit(mu) * col("p")),
      ChampionIndex.ImpactDecimals)
    val corr = champsV
      .join(broadcast(qp), Seq("term"))
      .select(col("q_id"), col("doc_id"), col("dl"),
        struct(col("term"), imp.as("imp")).as("tc"))
      .groupBy("q_id", "doc_id")
      .agg(first("dl").as("dl"), collect_list(col("tc")).as("cs"))
      .select(col("q_id"), col("doc_id"), col("dl"),
        aggregate(transform(array_sort(col("cs")), x => x.getField("imp")),
          lit(0.0), (a, x) => a + x).as("corr"))
    val shortest = servingShortest(spark, path, k, asOf)
    val cand = corr
      .unionByName(qconsts.select("q_id").crossJoin(broadcast(shortest))
        .withColumn("corr", lit(0.0)))
      .groupBy("q_id", "doc_id")
      .agg(max("corr").as("corr"), first("dl").as("dl"))
    val scored = cand
      .filter(col("doc_id") =!= col("q_id"))
      .join(broadcast(qconsts), Seq("q_id"))
      .select(col("q_id"), col("doc_id"),
        (col("corr") + col("qconst") -
          col("nq").cast("double") * log(col("dl") + lit(mu))).as("raw_score"))
    KeywordSearch.rankKwScored(scored, k)
  }

  // --- driver wiring: base on the PREVIOUS snapshot, one refresh batch ------

  /** The refreshed standing artifact for a source dir: base build on
    * the previous snapshot ([[CorpusOps]]'s stride-carved versions),
    * then ONE refresh applying exactly the added/changed/removed batch
    * [[CorpusOps.snapshotDiff]] classifies. Every query below must then
    * be indistinguishable from a full rebuild on the CURRENT snapshot —
    * which is precisely what the oracles replay.
    */
  private[graft] def refreshedArtifact(s: SparkSession, dir: String): String =
    IndexCache.getOrBuild("kw_refresh", dir) { p =>
      val docs = Tables.documents(s, dir)
      val curr = CorpusOps.currSnapshot(docs)
      val prev = CorpusOps.prevSnapshot(docs)
      buildBase(prev, p)
      val diff = CorpusOps.snapshotDiff(curr, prev)
      val deltaDocs = curr.join(
        diff.filter(col("status").isin("added", "changed")).select("doc_id"),
        Seq("doc_id"), "semi")
      val removedDocs = prev.join(
        diff.filter(col("status").isin("removed", "changed")).select("doc_id"),
        Seq("doc_id"), "semi")
      refresh(s, p, deltaDocs, removedDocs)
    }

  /** Driver query: champion search over the refreshed artifact — the
    * oracle runs the same tf-cut champion search on the post-refresh
    * corpus from scratch, so base+delta ≡ full rebuild is checked at
    * the search-result level.
    */
  def qRefreshSearch(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    search(s, refreshedArtifact(s, dir), CorpusOps.currSnapshot(docs),
      KeywordSearch.QueryTerms)
  }

  /** Driver query: the merged dictionary of the refreshed artifact —
    * the postings-level bitwise proof (df/cf for EVERY term must equal
    * a from-scratch tokenization of the current snapshot).
    */
  def qRefreshDict(s: SparkSession, dir: String): DataFrame =
    dictView(s, refreshedArtifact(s, dir)).orderBy("term")

  /** Driver query: the batch serving workload over the refreshed
    * artifact — the oracle replays the same tf-champion pruned batch
    * BM25 on the post-refresh corpus from scratch, so refresh→serve is
    * checked at the multi-query result level.
    */
  def qRefreshBatchSearch(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    batchSearch(s, refreshedArtifact(s, dir), CorpusOps.currSnapshot(docs))
  }

  /** Driver query: the batch Dirichlet-QL serving workload over the
    * refreshed artifact — probe-time impacts from merged statistics;
    * oracle replays the tf-cut-champion QL on a full rebuild of the
    * current snapshot.
    */
  def qRefreshQlSearch(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    qlBatchSearch(s, refreshedArtifact(s, dir), CorpusOps.currSnapshot(docs))
  }

  /** Driver query: TIME-TRAVEL read — the same search probing the SAME
    * standing refreshed artifact pinned AS OF segment 0 (the state
    * before the refresh landed). The log-structured layout makes every
    * past commit a readable snapshot for free — segments at or below
    * the pinned id, tombstone batches at or below it — exactly the
    * point-in-time read a deployment uses for reproducible serving and
    * incident replay (Delta/Iceberg time travel; a Lucene commit
    * point). Oracle: a full rebuild on the PREVIOUS corpus snapshot —
    * the as-of-0 read must reproduce pre-refresh serving bitwise while
    * the artifact it reads has already moved on.
    */
  def qSearchAsOf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    search(s, refreshedArtifact(s, dir), CorpusOps.prevSnapshot(docs),
      KeywordSearch.QueryTerms, asOf = Some(0))
  }

  /** Driver query: the QL batch workload TIME-TRAVELED — the LM family
    * readable at any commit like BM25 (13l) and the fusion (15h);
    * oracle replays the tf-cut-champion QL chain on the PREVIOUS
    * snapshot.
    */
  def qQlSearchAsOf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    qlBatchSearch(s, refreshedArtifact(s, dir), CorpusOps.prevSnapshot(docs),
      asOf = Some(0))
  }

  /** Driver query: the TOUCHED-TERMS-ONLY champion recut in isolation —
    * 13h's core cost claim as its own measurable row. A refresh batch
    * recuts champion lists for exactly the terms the batch's new or
    * replaced versions use ([[refreshAt]]'s `liveTouched` stage); its
    * cost is the touched terms' live-postings volume (bucket-pruned
    * scan) plus the bounded per-term heap — never the corpus. This
    * query re-derives the batch's touched vocabulary from the standing
    * snapshot diff and performs that recut against the standing
    * refreshed artifact's live postings, returning the recut champion
    * rows. By the refresh-exactness invariant (the champion cut is
    * stats-free and term-local) the recut rows equal a full-rebuild
    * tf-cut on the current snapshot restricted to the touched terms —
    * which is exactly what the oracle replays, so the isolation row is
    * also a correctness gate on the invariant itself.
    */
  def qIndexRecut(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val path = refreshedArtifact(s, dir)
    val curr = CorpusOps.currSnapshot(docs)
    val prev = CorpusOps.prevSnapshot(docs)
    val diff = CorpusOps.snapshotDiff(curr, prev)
    val deltaDocs = curr.join(
      diff.filter(col("status").isin("added", "changed")).select("doc_id"),
      Seq("doc_id"), "semi")
    val removedDocs = prev.join(
      diff.filter(col("status").isin("removed", "changed")).select("doc_id"),
      Seq("doc_id"), "semi")
    val touched = Checkpoints.transient_(
      segPostings(deltaDocs).select("term")
        .union(segPostings(removedDocs).select("term"))
        .distinct()) // backs the RETURNED plan — query-scoped release
    val touchedBuckets = touched
      .select(pmod(portableHash(col("term")), lit(NumBuckets)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq // ≤ NumBuckets values
    val liveTouched = livePostings(s, path,
        bucketFilter = Some(touchedBuckets),
        termFilter = collectTermsIfBounded(touched))
      .join(broadcast(touched), Seq("term"))
    cutChampions(liveTouched)
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
  }

  // --- sparse-regime recut (touched-vocab ≪ vocabulary) ----------------------

  /** Docs-per-block target for the vocabulary-widened recut gate: block
    * count = max(10, n_docs / [[SparseBlockDocs]]), so per-block volume
    * — which IS the touched postings volume of the one-block refresh
    * batch — stays ~constant as the corpus scales, and the batch
    * touches ≤10% of the widened vocabulary at every scale (1/blocks).
    */
  val SparseBlockDocs = 500L

  private[graft] def sparseBlocks(docs: DataFrame): Int =
    math.max(10L, docs.count() / SparseBlockDocs).toInt

  /** Vocabulary widening: PREFIX every token with its doc's block id
    * (`tok` → `q<doc_id mod blocks>q<tok>`). The synthetic corpus has a
    * ~65-term vocabulary, which makes EVERY refresh touch every term —
    * the worst case for 13h's ∝-touched-vocab claim, and the only case
    * [[qIndexRecut]] can measure. Widening makes the vocabulary
    * 65·blocks terms while preserving dl and per-doc tf exactly; a
    * refresh batch restricted to one block then touches 1/blocks of
    * the vocabulary — the regime a real corpus's refresh lives in
    * (touched ≪ vocab). The block id leads (prefix, not suffix) so one
    * block's terms are lexicographically CONTIGUOUS: the pushed
    * touched-term range then prunes the term-clustered postings pages
    * to ~1/blocks of each bucket file — the locality a real ingest
    * batch's vocabulary approximates.
    */
  private[graft] def widenVocab(docs: DataFrame, blocks: Int): DataFrame =
    docs.withColumn("text",
      array_join(
        transform(
          filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= ""),
          t => concat(lit("q"),
            pmod(col("doc_id"), lit(blocks.toLong)).cast("string"),
            lit("q"), t)),
        " "))

  /** The widened-vocabulary refreshed artifact: base = widened previous
    * snapshot, one refresh applying ONLY block 0's diff (added/changed/
    * removed docs with `doc_id % blocks = 0`) — the bounded-batch
    * ingest shape whose recut cost the sparse gate isolates.
    */
  private[graft] def sparseArtifact(s: SparkSession, dir: String): String = {
    val docs = Tables.documents(s, dir)
    val blocks = sparseBlocks(docs)
    IndexCache.getOrBuild("kw_refresh_sparse", dir) { p =>
      // full-corpus widening happens ONCE here (the artifact build);
      // the batch derivation widens only the one block's docs — the
      // diff of block-0 docs depends only on block-0 rows
      buildBase(widenVocab(CorpusOps.prevSnapshot(docs), blocks), p)
      val (deltaDocs, removedDocs) = sparseBatch(docs, blocks)
      refresh(s, p, deltaDocs, removedDocs)
    }
  }

  /** The one-block refresh batch (widened): snapshots filtered to the
    * block BEFORE the diff join, so deriving the batch costs one cheap
    * corpus filter + a 1/blocks-sized diff — never a corpus-wide
    * widening pass (the first sparse SCALE cells measured exactly that
    * mistake: 36 s at 100×, all of it tokenizing 2×500k docs per run).
    */
  private def sparseBatch(docs: DataFrame, blocks: Int): (DataFrame, DataFrame) = {
    val c0 = CorpusOps.currSnapshot(docs)
      .filter(pmod(col("doc_id"), lit(blocks.toLong)) === 0)
    val p0 = CorpusOps.prevSnapshot(docs)
      .filter(pmod(col("doc_id"), lit(blocks.toLong)) === 0)
    val diff = CorpusOps.snapshotDiff(c0, p0)
    (widenVocab(c0.join(
        diff.filter(col("status").isin("added", "changed")).select("doc_id"),
        Seq("doc_id"), "semi"), blocks),
      widenVocab(p0.join(
        diff.filter(col("status").isin("removed", "changed")).select("doc_id"),
        Seq("doc_id"), "semi"), blocks))
  }

  /** Driver query: [[qIndexRecut]] in the REALISTIC regime — touched
    * vocabulary ≪ total vocabulary (r13 verdict: the 65-term corpus
    * makes the plain recut row a whole-vocabulary worst-case bound;
    * this row isolates the touched ≪ vocab case 13h's ∝-delta claim
    * actually describes). The corpus is vocabulary-widened per block
    * (65·blocks terms), the refresh batch is ONE block's diff (≤10% of
    * the vocabulary by construction), and the recut probes the standing
    * sparse artifact bucket-pruned to the touched terms — so its cost
    * tracks the touched postings volume (~one block, constant as the
    * corpus scales), not the corpus. Oracle: full-rebuild tf-cut on the
    * artifact's live corpus (prev everywhere except block 0's applied
    * diff) restricted to the touched terms.
    */
  def qIndexRecutSparse(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val blocks = sparseBlocks(docs)
    val path = sparseArtifact(s, dir)
    val (deltaDocs, removedDocs) = sparseBatch(docs, blocks)
    val touched = Checkpoints.transient_(
      segPostings(deltaDocs).select("term")
        .union(segPostings(removedDocs).select("term"))
        .distinct()) // backs the RETURNED plan — query-scoped release
    val touchedBuckets = touched
      .select(pmod(portableHash(col("term")), lit(NumBuckets)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq // ≤ NumBuckets values
    val liveTouched = livePostings(s, path,
        bucketFilter = Some(touchedBuckets),
        termFilter = collectTermsIfBounded(touched))
      .join(broadcast(touched), Seq("term"))
    cutChampions(liveTouched)
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
  }

  /** Oracle for [[qIndexRecutSparse]]: block count from the same
    * n_docs policy, per-block token suffixing, block-0-restricted
    * delta/removed, live corpus = prev with block 0's diff applied,
    * then the touched-restricted full-rebuild tf-cut.
    */
  def indexRecutSparseSql(m: Int = M): String = {
    val toks = TextAnalysis.sqlToks
    // widened token list for a (doc_id, text) row, given scalar b
    def wtoks(rel: String) =
      s"list_transform($toks, t -> 'q' || CAST($rel.doc_id % b AS VARCHAR) || 'q' || t)"
    s"""WITH blocks AS (
       |  SELECT greatest(10, count(*) // $SparseBlockDocs) AS b
       |  FROM documents),
       |curr AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE doc_id % ${CorpusOps.DiffRemoveStride} <> 3),
       |prev AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % ${CorpusOps.DiffChangeStride} = 4
       |      THEN text || ' rev1' ELSE text END AS text
       |  FROM documents WHERE doc_id % ${CorpusOps.DiffAddStride} <> 5),
       |delta AS (
       |  SELECT c.doc_id, c.text FROM curr c, blocks
       |  WHERE c.doc_id % b = 0
       |    AND (c.doc_id NOT IN (SELECT doc_id FROM prev)
       |         OR c.doc_id % ${CorpusOps.DiffChangeStride} = 4)),
       |removed AS (
       |  SELECT p.doc_id, p.text FROM prev p, blocks
       |  WHERE p.doc_id % b = 0
       |    AND (p.doc_id NOT IN (SELECT doc_id FROM curr)
       |         OR p.doc_id % ${CorpusOps.DiffChangeStride} = 4)),
       |live AS (
       |  SELECT c.doc_id, c.text FROM curr c, blocks WHERE c.doc_id % b = 0
       |  UNION ALL
       |  SELECT p.doc_id, p.text FROM prev p, blocks WHERE p.doc_id % b <> 0),
       |touched AS (
       |  SELECT DISTINCT term FROM (
       |    SELECT unnest(${wtoks("d")}) AS term FROM delta d, blocks
       |    UNION ALL
       |    SELECT unnest(${wtoks("r")}) AS term FROM removed r, blocks)),
       |toked AS (
       |  SELECT l.doc_id, unnest(${wtoks("l")}) AS term FROM live l, blocks),
       |postings AS (
       |  SELECT term, doc_id, count(*) AS tf FROM toked GROUP BY 1, 2),
       |docstats AS (
       |  SELECT doc_id, CAST(len($toks) AS DOUBLE) AS dl FROM live)
       |SELECT term, doc_id, tf, dl FROM (
       |  SELECT p.term, p.doc_id, p.tf, d.dl,
       |    row_number() OVER (PARTITION BY p.term
       |      ORDER BY p.tf DESC, d.dl ASC, p.doc_id ASC) AS crn
       |  FROM postings p
       |  JOIN docstats d USING (doc_id)
       |  JOIN touched t USING (term))
       |WHERE crn <= $m""".stripMargin
  }

  val indexRecutSparseOracle: String = indexRecutSparseSql()

  /** Per-segment index-health report — the monitoring surface a
    * deployed LSM index exposes (Lucene's segment infos; a compaction
    * scheduler's inputs): each segment's document and token volume plus
    * the kill volume its tombstone batch carries. Read-amplification
    * and dead-fraction policies (when to [[compact]]) are decided from
    * exactly these rows. Bounded output: |segments| rows, from the
    * per-segment stats files and a tombstone rollup — never a corpus
    * scan.
    */
  def indexStats(spark: SparkSession, path: String): DataFrame = {
    val segs = segmentIds(path).map { s =>
      spark.read.parquet(s"$path/seg=$s/stats").withColumn("seg", lit(s))
    }.reduce(_.unionByName(_))
    val tombs = tombstones(spark, path)
      .groupBy(col("asof_seg").as("seg"))
      .agg(count(lit(1)).as("t_docs"), sum("dl").as("t_dl"))
    segs.join(tombs, Seq("seg"), "left")
      .select(col("seg").cast("int").as("seg"),
        col("n_docs").cast("long").as("n_docs"),
        coalesce(col("sum_dl"), lit(0.0)).cast("long").as("sum_dl"),
        coalesce(col("t_docs"), lit(0L)).cast("long").as("tomb_docs"),
        coalesce(col("t_dl"), lit(0.0)).cast("long").as("tomb_dl"))
      .orderBy("seg")
  }

  /** Driver query: the health report of the standing refreshed
    * artifact — oracle re-derives every segment's volumes from the
    * snapshot-diff convention on the documents table (segment 0 = the
    * previous snapshot, segment 1 = the added∪changed delta, its
    * tombstone batch = the removed∪changed prior versions).
    */
  def qIndexStats(s: SparkSession, dir: String): DataFrame =
    indexStats(s, refreshedArtifact(s, dir))

  /** Compaction depth threshold: more live segments than this and the
    * read-amplification (one union arm + one dict mask per segment, per
    * probe) is worth folding away.
    */
  val MaxSegments = 4
  /** Dead-fraction threshold: tombstoned doc versions / written doc
    * versions — past this, probes and the tombstone broadcast carry
    * more dead weight than a fold costs (Lucene's deletes-pct trigger;
    * RocksDB's space-amp trigger).
    */
  val MaxDeadFrac = 0.2

  /** The compaction DECISION from the health report — the policy half
    * of [[compact]], derived arithmetic over [[indexStats]] (bounded
    * rows, never a corpus scan): fold when the layout exceeds
    * `maxSegments` live segments OR its dead fraction passes
    * `maxDeadFrac`. One row: segment count, written/tombstoned doc
    * versions, the fraction, and the decision.
    */
  def compactionPlan(spark: SparkSession, path: String,
                     maxSegments: Int = MaxSegments,
                     maxDeadFrac: Double = MaxDeadFrac): DataFrame =
    indexStats(spark, path)
      .agg(count(lit(1)).cast("int").as("n_segments"),
        sum("n_docs").as("written_docs"),
        sum("tomb_docs").as("tomb_docs"))
      .select(col("n_segments"), col("written_docs"), col("tomb_docs"),
        round(col("tomb_docs").cast("double") / col("written_docs"), 4)
          .as("dead_frac"),
        (col("n_segments") > maxSegments ||
          col("tomb_docs").cast("double") / col("written_docs") >= maxDeadFrac)
          .as("compact"))

  /** Driver query: the standing refreshed artifact's compaction
    * decision — oracle aggregates the [[indexStatsSql]] chain.
    */
  def qCompactionPlan(s: SparkSession, dir: String): DataFrame =
    compactionPlan(s, refreshedArtifact(s, dir))

  // --- oracles --------------------------------------------------------------

  private[graft] def currCte: String =
    s"curr AS (SELECT * FROM documents WHERE doc_id % ${CorpusOps.DiffRemoveStride} <> 3)"

  /** The PREVIOUS snapshot as a CTE under the same name — swapping it
    * into any oracle chain replays that oracle on the pre-refresh
    * corpus (the [[qSearchAsOf]] gate).
    */
  private[graft] def prevCte: String =
    s"""curr AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % ${CorpusOps.DiffChangeStride} = 4
       |      THEN text || ' rev1' ELSE text END AS text,
       |    source, lang
       |  FROM documents WHERE doc_id % ${CorpusOps.DiffAddStride} <> 5)""".stripMargin

  def refreshDictSql: String =
    s"""WITH $currCte,
       |toked AS (
       |  SELECT doc_id, unnest(${TextAnalysis.sqlToks}) AS term FROM curr),
       |postings AS (
       |  SELECT term, doc_id, count(*) AS tf FROM toked GROUP BY 1, 2)
       |SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
       |FROM postings
       |GROUP BY term
       |ORDER BY term""".stripMargin

  def refreshSearchSql(terms: Seq[String], topK: Int = KeywordSearch.TopK,
                       m: Int = M, prevSnapshot: Boolean = false): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH ${if (prevSnapshot) prevCte else currCte},
       |toked AS (
       |  SELECT doc_id, unnest(${TextAnalysis.sqlToks}) AS term FROM curr),
       |postings AS (
       |  SELECT term, doc_id, count(*) AS tf FROM toked GROUP BY 1, 2),
       |docstats AS (
       |  SELECT doc_id, CAST(len(${TextAnalysis.sqlToks}) AS DOUBLE) AS dl
       |  FROM curr),
       |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM docstats),
       |dict AS (SELECT term, count(*) AS df FROM postings GROUP BY 1),
       |champs AS (
       |  SELECT term, doc_id, tf, dl FROM (
       |    SELECT p.term, p.doc_id, p.tf, d.dl,
       |      row_number() OVER (PARTITION BY p.term
       |        ORDER BY p.tf DESC, d.dl ASC, p.doc_id ASC) AS crn
       |    FROM postings p JOIN docstats d USING (doc_id))
       |  WHERE crn <= $m),
       |topk AS (
       |  SELECT doc_id, round(CAST(sum(CAST(floor(
       |      round(ln(1 + (CAST(n_docs AS DOUBLE) - CAST(dict.df AS DOUBLE) + 0.5) / (CAST(dict.df AS DOUBLE) + 0.5))
       |        * (CAST(tf AS DOUBLE) * ${K1 + 1})
       |        / (CAST(tf AS DOUBLE) + $K1 * (1 - $B + $B * dl / avgdl)), 6)
       |      * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0, 4) AS score
       |  FROM champs
       |  JOIN dict USING (term), stats
       |  WHERE term IN ($termList)
       |  GROUP BY doc_id
       |  ORDER BY score DESC, doc_id
       |  LIMIT $topK)
       |SELECT t.doc_id, d.source, d.lang, t.score
       |FROM topk t JOIN curr d USING (doc_id)
       |ORDER BY score DESC, doc_id""".stripMargin
  }

  /** SQL replay of [[qRefreshBatchSearch]]: full rebuild of the
    * tf-champion index over the current snapshot, the rarest-term batch
    * query assembly (the [[KeywordSearch.batchKwRawSqlCtes]] padded-sort
    * idiom against the rebuilt dictionary), champion-candidate scoring
    * with the 6dp contribution round, rounded-rank top-k.
    */
  def refreshBatchSearchSql(stride: Int = KeywordSearch.BatchStride,
                            nTerms: Int = KeywordSearch.BatchTerms,
                            k: Int = KeywordSearch.BatchK,
                            m: Int = M): String =
    s"""WITH $currCte,
       |toked AS (
       |  SELECT doc_id, unnest(${TextAnalysis.sqlToks}) AS term FROM curr),
       |postings AS (
       |  SELECT term, doc_id, count(*) AS tf FROM toked GROUP BY 1, 2),
       |docstats AS (
       |  SELECT doc_id, CAST(len(${TextAnalysis.sqlToks}) AS DOUBLE) AS dl
       |  FROM curr),
       |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM docstats),
       |dict AS (SELECT term, count(*) AS df FROM postings GROUP BY 1),
       |champs AS (
       |  SELECT term, doc_id, tf, dl FROM (
       |    SELECT p.term, p.doc_id, p.tf, d.dl,
       |      row_number() OVER (PARTITION BY p.term
       |        ORDER BY p.tf DESC, d.dl ASC, p.doc_id ASC) AS crn
       |    FROM postings p JOIN docstats d USING (doc_id))
       |  WHERE crn <= $m),
       |qtoks AS (
       |  SELECT doc_id AS q_id, unnest(list_distinct(${TextAnalysis.sqlToks})) AS term
       |  FROM curr WHERE doc_id % $stride = 0),
       |qterms AS (
       |  SELECT q_id, substring(p, 12, 1000) AS term
       |  FROM (
       |    SELECT q_id, unnest(
       |      (list_sort(list(lpad(CAST(df AS VARCHAR), 10, '0') || '#' || term)))[1:$nTerms]) AS p
       |    FROM qtoks JOIN dict USING (term)
       |    GROUP BY q_id)),
       |scored AS (
       |  SELECT q_id, c.doc_id,
       |    round(CAST(sum(CAST(floor(
       |      round(ln(1 + (CAST(n_docs AS DOUBLE) - CAST(dict.df AS DOUBLE) + 0.5) / (CAST(dict.df AS DOUBLE) + 0.5))
       |        * (CAST(tf AS DOUBLE) * ${K1 + 1})
       |        / (CAST(tf AS DOUBLE) + $K1 * (1 - $B + $B * dl / avgdl)), 6)
       |      * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0, 4) AS score
       |  FROM champs c
       |  JOIN qterms USING (term)
       |  JOIN dict USING (term), stats
       |  WHERE c.doc_id <> q_id
       |  GROUP BY q_id, c.doc_id),
       |ranked AS (
       |  SELECT q_id, doc_id, score,
       |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, doc_id) AS rn
       |  FROM scored
       |  QUALIFY rn <= $k)
       |SELECT q_id, rn, doc_id, score
       |FROM ranked
       |ORDER BY q_id, rn""".stripMargin

  /** SQL replay of [[qRefreshQlSearch]]: full rebuild over the current
    * snapshot — tf-cut champion lists, probe-time QL impacts from the
    * rebuilt collection LM (p = cf / Σdl), the dense-decomposition
    * score chain with the k+1-shortest closure (dl = 0 docs included).
    */
  def refreshQlSearchSql(stride: Int = KeywordSearch.BatchStride,
                         nTerms: Int = KeywordSearch.BatchTerms,
                         k: Int = KeywordSearch.BatchK,
                         mu: Double = QueryLikelihood.Mu,
                         m: Int = M, prevSnapshot: Boolean = false): String =
    s"""WITH ${if (prevSnapshot) prevCte else currCte},
       |toked AS (
       |  SELECT doc_id, unnest(${TextAnalysis.sqlToks}) AS term FROM curr),
       |postings AS (
       |  SELECT term, doc_id, count(*) AS tf FROM toked GROUP BY 1, 2),
       |docstats AS (
       |  SELECT doc_id, CAST(len(${TextAnalysis.sqlToks}) AS DOUBLE) AS dl
       |  FROM curr),
       |dict AS (SELECT term, count(*) AS df FROM postings GROUP BY 1),
       |totals AS (SELECT CAST(sum(dl) AS DOUBLE) AS c_total FROM docstats),
       |ctf AS (SELECT term, CAST(sum(tf) AS BIGINT) AS cf FROM postings GROUP BY 1),
       |pt AS (
       |  SELECT term, CAST(cf AS DOUBLE) / c_total AS p FROM ctf, totals),
       |champs AS (
       |  SELECT term, doc_id, tf, dl FROM (
       |    SELECT p.term, p.doc_id, p.tf, d.dl,
       |      row_number() OVER (PARTITION BY p.term
       |        ORDER BY p.tf DESC, d.dl ASC, p.doc_id ASC) AS crn
       |    FROM postings p JOIN docstats d USING (doc_id))
       |  WHERE crn <= $m),
       |qtoks AS (
       |  SELECT doc_id AS q_id, unnest(list_distinct(${TextAnalysis.sqlToks})) AS term
       |  FROM curr WHERE doc_id % $stride = 0),
       |qterms AS (
       |  SELECT q_id, substring(p, 12, 1000) AS term
       |  FROM (
       |    SELECT q_id, unnest(
       |      (list_sort(list(lpad(CAST(df AS VARCHAR), 10, '0') || '#' || term)))[1:$nTerms]) AS p
       |    FROM qtoks JOIN dict USING (term)
       |    GROUP BY q_id)),
       |qp AS (SELECT q_id, qterms.term, pt.p FROM qterms JOIN pt USING (term)),
       |qconsts AS (
       |  SELECT q_id, sum(ln($mu * p) ORDER BY term) AS qconst,
       |    count(*) AS nq
       |  FROM qp GROUP BY q_id),
       |corr AS (
       |  SELECT qp.q_id, c.doc_id, any_value(c.dl) AS dl,
       |    sum(round(ln(CAST(c.tf AS DOUBLE) + $mu * qp.p) - ln($mu * qp.p),
       |      ${ChampionIndex.ImpactDecimals}) ORDER BY c.term) AS corr
       |  FROM champs c JOIN qp ON c.term = qp.term
       |  GROUP BY 1, 2),
       |shortest AS (SELECT doc_id, dl FROM docstats ORDER BY dl, doc_id LIMIT ${k + 1}),
       |cand AS (
       |  SELECT q_id, doc_id, max(corr) AS corr, any_value(dl) AS dl FROM (
       |    SELECT q_id, doc_id, corr, dl FROM corr
       |    UNION ALL
       |    SELECT q.q_id, s.doc_id, 0.0 AS corr, s.dl
       |    FROM (SELECT q_id FROM qconsts) q, shortest s)
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT c.q_id, c.doc_id,
       |    c.corr + qc.qconst - CAST(qc.nq AS DOUBLE) * ln(c.dl + $mu) AS raw_score
       |  FROM cand c
       |  JOIN qconsts qc USING (q_id)
       |  WHERE c.doc_id <> c.q_id),
       |ranked AS (
       |  SELECT q_id, doc_id, raw_score,
       |    row_number() OVER (PARTITION BY q_id ORDER BY round(raw_score, 4) DESC, doc_id) AS rn
       |  FROM scored
       |  QUALIFY rn <= $k)
       |SELECT q_id, rn, doc_id, round(raw_score, 4) AS score
       |FROM ranked
       |ORDER BY q_id, rn""".stripMargin

  /** Oracle for [[qIndexRecut]]: the touched vocabulary re-derived from
    * the snapshot-diff stride convention (each version's OWN text —
    * removed versions carry the pre-refresh text), then a full-rebuild
    * tf-cut on the current snapshot restricted to those terms.
    */
  def indexRecutSql(m: Int = M): String = {
    val toks = TextAnalysis.sqlToks
    s"""WITH curr AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE doc_id % ${CorpusOps.DiffRemoveStride} <> 3),
       |prev AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % ${CorpusOps.DiffChangeStride} = 4
       |      THEN text || ' rev1' ELSE text END AS text
       |  FROM documents WHERE doc_id % ${CorpusOps.DiffAddStride} <> 5),
       |delta AS (
       |  SELECT c.doc_id, c.text FROM curr c
       |  WHERE c.doc_id NOT IN (SELECT doc_id FROM prev)
       |     OR c.doc_id % ${CorpusOps.DiffChangeStride} = 4),
       |removed AS (
       |  SELECT p.doc_id, p.text FROM prev p
       |  WHERE p.doc_id NOT IN (SELECT doc_id FROM curr)
       |     OR p.doc_id % ${CorpusOps.DiffChangeStride} = 4),
       |touched AS (
       |  SELECT DISTINCT term FROM (
       |    SELECT unnest($toks) AS term FROM delta
       |    UNION ALL
       |    SELECT unnest($toks) AS term FROM removed)),
       |toked AS (
       |  SELECT doc_id, unnest($toks) AS term FROM curr),
       |postings AS (
       |  SELECT term, doc_id, count(*) AS tf FROM toked GROUP BY 1, 2),
       |docstats AS (
       |  SELECT doc_id, CAST(len($toks) AS DOUBLE) AS dl FROM curr)
       |SELECT term, doc_id, tf, dl FROM (
       |  SELECT p.term, p.doc_id, p.tf, d.dl,
       |    row_number() OVER (PARTITION BY p.term
       |      ORDER BY p.tf DESC, d.dl ASC, p.doc_id ASC) AS crn
       |  FROM postings p
       |  JOIN docstats d USING (doc_id)
       |  JOIN touched t USING (term))
       |WHERE crn <= $m""".stripMargin
  }

  val indexRecutOracle: String = indexRecutSql()

  /** Oracle for [[qIndexStats]]: every segment's volumes re-derived in
    * SQL from the snapshot-diff stride convention — segment 0 is the
    * previous snapshot, segment 1 the added∪changed delta, its
    * tombstone batch the removed∪changed prior versions (token lengths
    * from each version's OWN text).
    */
  def indexStatsSql: String = {
    val toks = TextAnalysis.sqlToks
    s"""WITH prev AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % ${CorpusOps.DiffChangeStride} = 4
       |      THEN text || ' rev1' ELSE text END AS text
       |  FROM documents WHERE doc_id % ${CorpusOps.DiffAddStride} <> 5),
       |currs AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE doc_id % ${CorpusOps.DiffRemoveStride} <> 3),
       |delta AS (
       |  SELECT c.doc_id, c.text FROM currs c
       |  WHERE c.doc_id NOT IN (SELECT doc_id FROM prev)
       |     OR c.doc_id % ${CorpusOps.DiffChangeStride} = 4),
       |removed AS (
       |  SELECT p.doc_id, p.text FROM prev p
       |  WHERE p.doc_id NOT IN (SELECT doc_id FROM currs)
       |     OR p.doc_id % ${CorpusOps.DiffChangeStride} = 4)
       |SELECT CAST(0 AS INTEGER) AS seg,
       |  count(*) AS n_docs,
       |  CAST(coalesce(sum(len($toks)), 0) AS BIGINT) AS sum_dl,
       |  CAST(0 AS BIGINT) AS tomb_docs, CAST(0 AS BIGINT) AS tomb_dl
       |FROM prev
       |UNION ALL
       |SELECT CAST(1 AS INTEGER),
       |  (SELECT count(*) FROM delta),
       |  CAST(coalesce((SELECT sum(len($toks)) FROM delta), 0) AS BIGINT),
       |  (SELECT count(*) FROM removed),
       |  CAST(coalesce((SELECT sum(len($toks)) FROM removed), 0) AS BIGINT)
       |ORDER BY seg""".stripMargin
  }

  val refreshSearchOracle: String = refreshSearchSql(KeywordSearch.QueryTerms)
  val refreshDictOracle: String = refreshDictSql
  val refreshBatchSearchOracle: String = refreshBatchSearchSql()
  val refreshQlSearchOracle: String = refreshQlSearchSql()
  /** Oracle for [[qSearchAsOf]]: the refresh-search chain replayed on
    * the PREVIOUS snapshot — pre-refresh serving, from scratch.
    */
  val searchAsOfOracle: String =
    refreshSearchSql(KeywordSearch.QueryTerms, prevSnapshot = true)
  val qlSearchAsOfOracle: String = refreshQlSearchSql(prevSnapshot = true)
  val indexStatsOracle: String = indexStatsSql
  /** Oracle for [[qCompactionPlan]]: the decision arithmetic over the
    * [[indexStatsSql]] rows.
    */
  def compactionPlanSql(maxSegments: Int = MaxSegments,
                        maxDeadFrac: Double = MaxDeadFrac): String =
    s"""WITH stats AS ($indexStatsSql)
       |SELECT CAST(count(*) AS INTEGER) AS n_segments,
       |  CAST(sum(n_docs) AS BIGINT) AS written_docs,
       |  CAST(sum(tomb_docs) AS BIGINT) AS tomb_docs,
       |  round(CAST(sum(tomb_docs) AS DOUBLE) / sum(n_docs), 4) AS dead_frac,
       |  (count(*) > $maxSegments
       |    OR CAST(sum(tomb_docs) AS DOUBLE) / sum(n_docs) >= $maxDeadFrac)
       |    AS compact
       |FROM stats""".stripMargin
  val compactionPlanOracle: String = compactionPlanSql()
}
