package graft.operators

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication suite for training-data pipelines — exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design (100 TB): nothing here is O(n²) over the corpus —
  *  - exact dedup is one hash aggregate;
  *  - MinHash-LSH reduces near-dup candidate generation to an equi-join
  *    on (band_id, band_signature) — only same-bucket pairs are verified;
  *  - SimHash is a per-row expression + aggregation by doc;
  *  - n-gram Jaccard joins on (block, shingle) — the inverted-index
  *    formulation — never a cross join;
  *  - embedding near-dup keeps the brute-force form only as the
  *    correctness baseline; the scale path is LSH bucketing
  *    ([[lshBucketStats]] shows the bucket histogram machinery).
  *
  * All hashing uses the md5-prefix portable hash so the DuckDB oracle
  * replays the exact pipeline.
  */
object Dedup {

  // --- exact ---------------------------------------------------------------

  def exact(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprint(col("text")).as("content_hash"))
      .groupBy("content_hash")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("keeper_doc_id"))
      .orderBy("content_hash")

  val exactOracle: String =
    s"""SELECT md5(array_to_string(${TextAnalysis.sqlToks}, ' ')) AS content_hash,
       |  count(*) AS n_docs, min(doc_id) AS keeper_doc_id
       |FROM documents
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  // --- MinHash + LSH -------------------------------------------------------

  val NumHashes = 16
  val Bands = 4
  val RowsPerBand: Int = NumHashes / Bands
  val P = 2147483647L // 2^31 - 1
  val ShingleK = 3
  val JaccardThreshold = 0.2

  /** Deterministic permutation constants (shared with the SQL oracle). */
  val Perms: Seq[(Long, Long)] = (0 until NumHashes).map { i =>
    val a = (1103515245L * (2 * i + 1) + 12345L) % P
    val b = (69069L * (i + 1) * 104729L + 362437L) % P
    (if (a == 0) 1L else a, b)
  }

  /** doc_id → minhash signature (array of NumHashes longs): shingle →
    * portable hash → min over (a*h + b) mod p per permutation — ONE
    * native pass over the shingle array
    * ([[graft.functions.TextFunctions.minhashSig]]): each shingle is
    * hashed exactly once and every permutation's minimum runs in
    * registers. Map-side only — NO explode, NO aggregate, NO shuffle
    * (measured equal to the exploded groupBy form at sf0.1 locally;
    * at scale it removes the signature shuffle entirely and serves the
    * streaming ingest path). The Generate barrier stops CollapseProject
    * from re-evaluating the signature once per consuming band column.
    */
  def minhashSignature(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(array(minhashSig(shingles(tokens(col("text")), ShingleK),
          Perms, P))).as("sig"))
      .filter(col("sig").isNotNull)

  /** Exploded groupBy formulation of [[minhashSignature]] — kept for
    * the spec cross-check against the codegen'd single-pass form.
    */
  private[graft] def minhashSignatureExploded(docs: DataFrame): DataFrame = {
    val hs = docs
      .select(col("doc_id"), explode(shingles(tokens(col("text")), ShingleK)).as("sh"))
      .select(col("doc_id"), (portableHash(col("sh")) % P).as("h"))
    val mins = Perms.zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * col("h") + lit(b)) % P).as(s"m_$i")
    }
    hs.groupBy("doc_id").agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until NumHashes).map(i => col(s"m_$i")): _*).as("sig"))
  }

  /** Banded LSH signatures: one row per (doc, band) with the band's
    * md5-compressed minhash slice — the join key of every LSH pairing
    * and the record layout of the materialized band index.
    */
  def bandSignatures(docs: DataFrame): DataFrame =
    minhashSignature(docs).select(col("doc_id"),
      explode(array((0 until Bands).map { b =>
        struct(lit(b).as("band_id"),
          bandSigFromSignature(col("sig"), b).as("band_sig"))
      }: _*)).as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_sig"))

  /** Band signature `b` (md5 over the band's minhash slice) from a
    * materialized signature column — the shared arithmetic of
    * [[bandSignatures]] and the streaming ingest path.
    */
  def bandSigFromSignature(sig: Column, b: Int): Column =
    md5(concat_ws("-",
      (0 until RowsPerBand).map(r => element_at(sig, b * RowsPerBand + r + 1)): _*))

  /** Hot-bucket guard: a (band, signature) bucket larger than this is
    * excluded from pairwise verification. Within-bucket candidate pairs
    * grow as C(n,2), so one degenerate bucket (boilerplate, replicated
    * spam, a template) can dominate the whole job — the standard
    * production guard routes oversized buckets straight to cluster
    * handling ([[hotBuckets]] reports them; members of such a bucket
    * already agree on a full minhash band, i.e. are near-certain
    * duplicates) instead of verifying every pair. Sized far above any
    * bucket the benchmark corpora produce (max observed: 3 at sf0.01,
    * 6 at sf0.1 — the guarded output is bitwise the exact output there),
    * while the 100× duplicate-replicated SCALE run trips it and stays
    * bounded. A pair sharing BOTH a hot and a normal bucket is still
    * verified via the normal one. The SQL oracles ([[minhashLshOracle]],
    * [[incrementalOracle]]) encode the SAME cap, so driver query and
    * oracle agree even on a degenerate corpus; the spec separately pins
    * guarded ≡ unguarded where no bucket trips the cap.
    */
  val MaxBucket = 64

  /** Report threshold for [[hotBuckets]] — low enough to surface real
    * clusters at benchmark scale; the guard itself cuts at
    * [[MaxBucket]].
    */
  val HotReportMin = 3

  /** Candidate pairs via banded LSH + exact Jaccard verification,
    * hot-bucket-guarded at `maxBucket` (pass `Int.MaxValue` for the
    * unguarded exact form — the spec pins guarded ≡ unguarded on
    * non-degenerate corpora).
    */
  def minhashLsh(docs: DataFrame, maxBucket: Int = MaxBucket): DataFrame = {
    val bands = bandSignatures(docs)
    val sizes = bands.groupBy("band_id", "band_sig")
      .agg(count(lit(1)).as("bucket_n"))
    val normal = bands.join(sizes.filter(col("bucket_n") <= maxBucket),
      Seq("band_id", "band_sig"))
    val cands = normal.as("l").join(normal.as("r"),
        col("l.band_id") === col("r.band_id") &&
          col("l.band_sig") === col("r.band_sig") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("d1"), col("r.doc_id").as("d2"))
      .distinct()
    val sets = docs.select(col("doc_id"),
      array_distinct(shingles(tokens(col("text")), ShingleK)).as("sset"))
    cands
      .join(sets.select(col("doc_id").as("d1"), col("sset").as("s1")), Seq("d1"))
      .join(sets.select(col("doc_id").as("d2"), col("sset").as("s2")), Seq("d2"))
      .select(col("d1"), col("d2"),
        round(size(array_intersect(col("s1"), col("s2"))).cast("double") /
          size(array_union(col("s1"), col("s2"))).cast("double"), 4).as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
      .orderBy("d1", "d2")
  }

  /** The hot-bucket CLUSTER report — the "skip-with-report" half of the
    * [[MaxBucket]] guard: every bucket at or past the report threshold,
    * with its size and representative (minimum) doc — exactly the units
    * the guard routes away from pairwise verification and toward the
    * cluster resolver ([[DedupClusters]]). At degenerate duplicate
    * densities this report (|hot buckets| rows) replaces C(n,2) verify
    * pairs per bucket.
    */
  def hotBuckets(docs: DataFrame, minSize: Int = HotReportMin): DataFrame =
    bandSignatures(docs).groupBy("band_id", "band_sig")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("rep_doc"))
      .filter(col("n_docs") >= minSize)
      .orderBy("band_id", "band_sig")

  def hotBucketsSql(minSize: Int = HotReportMin): String =
    s"""WITH $bandsCtesSql
       |SELECT band_id, band_sig, count(*) AS n_docs, min(doc_id) AS rep_doc
       |FROM bands
       |GROUP BY band_id, band_sig
       |HAVING count(*) >= $minSize
       |ORDER BY band_id, band_sig""".stripMargin

  /** The word-shingle list over a `toks` column — shared SQL fragment. */
  private[graft] val shingleSql: String =
    s"""CASE WHEN len(toks) >= $ShingleK
       |  THEN list_transform(range(1, len(toks) - ${ShingleK - 2}), i -> array_to_string(list_slice(toks, i, i + ${ShingleK - 1}), ' '))
       |  ELSE [array_to_string(toks, ' ')] END""".stripMargin

  /** Shared CTE chain `toked → hashed → sigs → bands` over `documents` —
    * the SQL twin of [[bandSignatures]], composed by [[minhashLshOracle]]
    * and the streaming clean-ingest oracle
    * ([[graft.streaming.CorpusStream.cleanPackOracle]]). `toked` carries
    * `source` so pack-shaped consumers can reuse it.
    */
  private[graft] val bandsCtesSql: String = {
    val sigCols = Perms.zipWithIndex.map { case ((a, b), i) =>
      s"list_min(list_transform(hs, h -> ($a * h + $b) % $P)) AS m_$i"
    }.mkString(",\n    ")
    val bandRows = (0 until Bands).map { b =>
      val parts = (0 until RowsPerBand)
        .map(r => s"CAST(m_${b * RowsPerBand + r} AS VARCHAR)")
        .mkString(" || '-' || ")
      s"SELECT doc_id, $b AS band_id, md5($parts) AS band_sig FROM sigs"
    }.mkString("\n  UNION ALL\n  ")
    s"""toked AS (SELECT doc_id, source, ${TextAnalysis.sqlToks} AS toks FROM documents),
       |hashed AS (
       |  SELECT doc_id,
       |    list_transform($shingleSql,
       |      s -> CAST('0x' || substring(md5(s), 1, 15) AS BIGINT) % $P) AS hs
       |  FROM toked),
       |sigs AS (
       |  SELECT doc_id,
       |    $sigCols
       |  FROM hashed),
       |bands AS (
       |  $bandRows)""".stripMargin
  }

  /** Carries the SAME [[MaxBucket]] hot-bucket guard as the Spark
    * default — the driver query and its oracle agree on degenerate
    * corpora too, not just where no bucket trips the cap.
    */
  val minhashLshOracle: String = {
    s"""WITH $bandsCtesSql,
       |sized AS (
       |  SELECT band_id, band_sig FROM bands
       |  GROUP BY band_id, band_sig HAVING count(*) <= $MaxBucket),
       |normal AS (
       |  SELECT b.doc_id, b.band_id, b.band_sig
       |  FROM bands b JOIN sized s
       |    ON b.band_id = s.band_id AND b.band_sig = s.band_sig),
       |cands AS (
       |  SELECT DISTINCT l.doc_id AS d1, r.doc_id AS d2
       |  FROM normal l JOIN normal r
       |    ON l.band_id = r.band_id AND l.band_sig = r.band_sig AND l.doc_id < r.doc_id),
       |sets AS (
       |  SELECT doc_id, list_distinct($shingleSql) AS sset FROM toked)
       |SELECT d1, d2,
       |  round(CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE)
       |        / CAST(len(list_distinct(list_concat(a.sset, b.sset))) AS DOUBLE), 4) AS jaccard
       |FROM cands JOIN sets a ON cands.d1 = a.doc_id JOIN sets b ON cands.d2 = b.doc_id
       |WHERE round(CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE)
       |        / CAST(len(list_distinct(list_concat(a.sset, b.sset))) AS DOUBLE), 4) >= $JaccardThreshold
       |ORDER BY d1, d2""".stripMargin
  }

  // --- incremental near-dup (new batch vs materialized band index) --------

  /** Fraction selector for the synthetic "new batch": doc_id % 5 == 4
    * (an interleaved 20% — id-ranges would make the split degenerate).
    */
  val NewMod = 5

  /** Materialize a corpus's band signatures, band-partitioned — the
    * standing index a daily-batch dedup probes instead of re-minhashing
    * 100 TB. Append-able: each ingested batch lands its own signatures.
    */
  def writeBandIndex(docs: DataFrame, path: String): Unit =
    bandSignatures(docs).write.mode("overwrite")
      .partitionBy("band_id").parquet(path)

  /** Incremental near-dup: ONLY the new batch is tokenized, shingled and
    * minhashed; the existing corpus participates through its band index
    * (narrow (doc_id, band_sig) rows, no text). Candidates = new docs
    * colliding with an indexed doc or an earlier new doc; verification
    * re-reads text for candidate ids only. At 100 TB the per-batch cost
    * is O(|batch| + collisions), independent of corpus size — the full
    * [[minhashLsh]] would re-shingle the whole corpus every day.
    */
  def incremental(docs: DataFrame, indexBands: DataFrame,
                  maxBucket: Int = MaxBucket): DataFrame = {
    val newDocs = docs.filter(pmod(col("doc_id"), lit(NewMod)) === NewMod - 1)
    val batchBands = bandSignatures(newDocs)
    // the same MaxBucket hot-bucket guard as [[minhashLsh]], measured
    // over index ∪ batch (= the full corpus's buckets, so the probe
    // verifies exactly the pairs the guarded full run would) but
    // counted ONLY for buckets the batch touches — the guard costs one
    // extra pass over the collision rows, never a corpus-wide rollup
    val touched = batchBands.select("band_id", "band_sig").distinct()
    val touchedRows = indexBands.select("doc_id", "band_id", "band_sig")
      .union(batchBands)
      .join(touched, Seq("band_id", "band_sig"))
    val bucketOk = touchedRows.groupBy("band_id", "band_sig")
      .agg(count(lit(1)).as("bucket_n"))
      .filter(col("bucket_n") <= maxBucket)
      .select("band_id", "band_sig")
    val probed = touchedRows.join(bucketOk, Seq("band_id", "band_sig"))
    val newBands = batchBands.join(bucketOk, Seq("band_id", "band_sig"))
    val cands = newBands.as("n").join(probed.as("o"),
        col("n.band_id") === col("o.band_id") &&
          col("n.band_sig") === col("o.band_sig") &&
          (pmod(col("o.doc_id"), lit(NewMod)) =!= NewMod - 1 ||
            col("o.doc_id") < col("n.doc_id")))
      .select(col("n.doc_id").as("new_id"), col("o.doc_id").as("dup_of"))
      .distinct()
    val sets = docs.select(col("doc_id"),
      array_distinct(shingles(tokens(col("text")), ShingleK)).as("sset"))
    cands
      .join(sets.select(col("doc_id").as("new_id"), col("sset").as("s1")), Seq("new_id"))
      .join(sets.select(col("doc_id").as("dup_of"), col("sset").as("s2")), Seq("dup_of"))
      .select(col("new_id"), col("dup_of"),
        round(size(array_intersect(col("s1"), col("s2"))).cast("double") /
          size(array_union(col("s1"), col("s2"))).cast("double"), 4).as("jaccard"))
      .filter(col("jaccard") >= JaccardThreshold)
      .orderBy("new_id", "dup_of")
  }

  /** Oracle: the full-corpus verified pair set, symmetrized and filtered
    * to (new ← existing-or-earlier-new) — band collision and Jaccard are
    * symmetric, so incremental probing must surface exactly these rows.
    */
  val incrementalOracle: String =
    s"""WITH pairs AS (SELECT d1, d2, jaccard FROM ($minhashLshOracle)),
       |sym AS (
       |  SELECT d1 AS new_id, d2 AS dup_of, jaccard FROM pairs
       |  UNION ALL
       |  SELECT d2 AS new_id, d1 AS dup_of, jaccard FROM pairs)
       |SELECT new_id, dup_of, jaccard FROM sym
       |WHERE new_id % $NewMod = ${NewMod - 1}
       |  AND (dup_of % $NewMod <> ${NewMod - 1} OR dup_of < new_id)
       |ORDER BY new_id, dup_of""".stripMargin

  // --- SimHash -------------------------------------------------------------

  val SimHashBits = 32

  /** 32-bit SimHash per document — ONE native pass over the token
    * array ([[graft.functions.TextFunctions.simhashNative]]): map-side
    * only, NO explode and NO shuffle (the exploded 32-column groupBy
    * form is kept below for the cross-check spec). A tokenless doc
    * hashes to null and is dropped, matching the exploded form which
    * emits no row for it.
    */
  def simhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        simhashNative(tokens(col("text")), SimHashBits).as("simhash"))
      .filter(col("simhash").isNotNull)
      .orderBy("doc_id")

  /** Exploded groupBy formulation of [[simhash]] — kept for the spec
    * cross-check against the codegen'd single-pass form.
    */
  private[graft] def simhashExploded(docs: DataFrame): DataFrame = {
    val toked = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .withColumn("h", portableHash(col("tok")))
    val bitSums = (0 until SimHashBits).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s_$b")
    }
    val hashVal = (0 until SimHashBits).map { b =>
      when(col(s"s_$b") > 0, 1L << b).otherwise(0L)
    }.reduce(_ + _)
    toked.groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), hashVal.as("simhash"))
      .orderBy("doc_id")
  }

  val simhashOracle: String = {
    val bitSums = (0 until SimHashBits).map(b =>
      s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s_$b").mkString(",\n    ")
    val hashVal = (0 until SimHashBits).map(b =>
      s"(CASE WHEN s_$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
    s"""WITH toked AS (
       |  SELECT doc_id, unnest(${TextAnalysis.sqlToks}) AS tok FROM documents),
       |hashed AS (
       |  SELECT doc_id, CAST('0x' || substring(md5(tok), 1, 15) AS BIGINT) AS h FROM toked),
       |sums AS (
       |  SELECT doc_id,
       |    $bitSums
       |  FROM hashed GROUP BY doc_id)
       |SELECT doc_id, $hashVal AS simhash
       |FROM sums
       |ORDER BY doc_id""".stripMargin
  }

  val HammingThreshold = 3
  val SimHashBlocks = 4

  /** Near-dup pairs by SimHash hamming distance ≤ [[HammingThreshold]].
    *
    * Candidate generation is the 4-piece pigeonhole scheme: split the
    * 32-bit hash into 4 bytes and equi-join on any equal byte — with at
    * most 3 differing bits, at least one byte must match exactly, so the
    * block join provably loses no pair while cutting the cross product to
    * same-block buckets. The oracle is the NAIVE all-pairs spec —
    * equality of the two is the exactness proof of the optimization.
    */
  def simhashPairs(docs: DataFrame): DataFrame = {
    val hashes = simhash(docs)
    val blocks = hashes.select(col("doc_id"), col("simhash"),
      explode(array((0 until SimHashBlocks).map { b =>
        struct(lit(b).as("block_id"),
          shiftright(col("simhash"), b * 8).bitwiseAND(255).as("block_val"))
      }: _*)).as("blk"))
      .select(col("doc_id"), col("simhash"), col("blk.block_id"), col("blk.block_val"))
    // A pair colliding in several blocks would surface once per collision;
    // instead of a (d1, d2)-distinct over the ~|buckets| x |bucket|^2
    // candidate stream (a full extra shuffle), keep a pair only at its
    // FIRST matching block — bytes 0..k-1 of the XOR must be nonzero —
    // which emits each pair exactly once, map-side.
    val xorH = col("l.simhash").bitwiseXOR(col("r.simhash"))
    def byteDiffers(j: Int) =
      shiftright(xorH, j * 8).bitwiseAND(255) =!= 0
    val firstMatch = (0 until SimHashBlocks).map { k =>
      (0 until k).map(byteDiffers)
        .foldLeft(col("l.block_id") === k)(_ && _)
    }.reduce(_ || _)
    blocks.as("l").join(blocks.as("r"),
        col("l.block_id") === col("r.block_id") &&
          col("l.block_val") === col("r.block_val") &&
          col("l.doc_id") < col("r.doc_id"))
      .filter(firstMatch)
      .select(col("l.doc_id").as("d1"), col("r.doc_id").as("d2"),
        bit_count(xorH).as("hamming"))
      .filter(col("hamming") <= HammingThreshold)
      .orderBy("d1", "d2")
  }

  val simhashPairsOracle: String = {
    val base = simhashOracle.replace("\nORDER BY doc_id", "")
    s"""WITH sh AS ($base)
       |SELECT l.doc_id AS d1, r.doc_id AS d2,
       |  bit_count(xor(l.simhash, r.simhash)) AS hamming
       |FROM sh l JOIN sh r ON l.doc_id < r.doc_id
       |WHERE bit_count(xor(l.simhash, r.simhash)) <= $HammingThreshold
       |ORDER BY d1, d2""".stripMargin
  }

  // --- n-gram (unigram) Jaccard -------------------------------------------

  val JaccardN = 1
  val NgramThreshold = 0.6

  /** Set-similarity self-join within `source` blocks — ADAPTIVE:
    *
    *  - general path ([[prefixSetPairs]]): PREFIX FILTERING
    *    (AllPairs/SSJoin family): order every doc's tokens by global
    *    rarity (df asc, tok), index only the first
    *    `|d| - ceil(tau*|d|) + 1` tokens — any pair with Jaccard >= tau
    *    provably shares an indexed token — then verify candidates
    *    exactly with an intersect/union over the full sets;
    *  - tiny-vocabulary path ([[maskDocPairs]], distinct corpus
    *    vocabulary <= 64 terms — one cheap driver-side probe decides):
    *    every token SET is one 64-bit mask and Jaccard is
    *    `popcount(and)/popcount(or)` — O(1) per pair, no candidate
    *    distinct, no token-array shuffles, no materialization.
    *    Result-identical to the prefix path (spec-cross-checked): same
    *    integer intersection/union arithmetic, same rounding.
    *
    * The registered oracle stays the NAIVE full inverted-index spec:
    * hash-equality of the two is the exactness proof. The synthetic
    * corpus has a 31-word vocabulary, so the mask path carries the
    * benchmark; real (sparse-vocabulary) corpora take the prefix path,
    * whose candidate cut over naive grows unboundedly.
    */
  def ngramJaccard(docs: DataFrame): DataFrame = {
    // Path chosen by ONE bounded driver-side probe (the driver-side
    // pattern of the PQ codebook fit): pull at most 65 distinct terms —
    // the shuffle is map-side-deduped to <=65 rows/partition however
    // large the corpus — and take the mask path iff the whole
    // vocabulary fit in 64.
    val vocabProbe = docs
      .select(explode(array_distinct(tokens(col("text")))).as("tok"))
      .distinct().limit(65).collect().map(_.getString(0))
    if (vocabProbe.length <= 64) return maskDocPairs(docs, vocabProbe.sorted.toIndexedSeq)
    // General path: canonicalize by token SET — similarity is a function
    // of the set, so compute per distinct set, not per doc (exact-dup-
    // heavy corpora collapse dramatically). Materialized ONCE
    // (localCheckpoint — the DedupClusters frontier pattern): three
    // consumers (members, sets, prefix build) would otherwise each
    // re-tokenize the corpus.
    val docSets = docs.select(col("doc_id"), col("source"),
      array_sort(array_distinct(tokens(col("text")))).as("tset"))
      .withColumn("set_key", md5(array_join(col("tset"), "\u0001")))
      .transform(Checkpoints.transient_) // query-scoped release
    val members = docSets.select("doc_id", "source", "set_key")
    val sets = docSets.select("source", "set_key", "tset")
      .dropDuplicates("source", "set_key")
      .withColumn("tsize", size(col("tset")))
    // identical-set doc pairs: Jaccard is exactly 1.0, no join needed.
    val sameSet = members.as("l").join(members.as("r"),
        col("l.source") === col("r.source") &&
          col("l.set_key") === col("r.set_key") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("d1"), col("r.doc_id").as("d2"),
        lit(1.0).as("jaccard"))
    // distinct-set pairs with exact verification, expanded to doc pairs.
    val crossSet = prefixSetPairs(sets)
      .join(members.select(col("source"), col("set_key").as("k1"), col("doc_id").as("da")),
        Seq("source", "k1"))
      .join(members.select(col("source"), col("set_key").as("k2"), col("doc_id").as("db")),
        Seq("source", "k2"))
      .select(least(col("da"), col("db")).as("d1"),
        greatest(col("da"), col("db")).as("d2"), col("jaccard"))
    sameSet.unionByName(crossSet)
      .orderBy(desc("jaccard"), asc("d1"), asc("d2"))
  }

  /** Tiny-vocabulary FULL pipeline, fused and materialization-free: the
    * per-doc token set folds to one 64-bit mask in the scan itself
    * (`aggregate` over the token array — a map-only column expression,
    * no explode, no groupBy, no checkpoint). Masks are bijective with
    * token sets under a fixed <=64-term vocabulary, so identical-mask
    * doc pairs ARE the Jaccard-1.0 pairs, and distinct masks stand in
    * for distinct sets — intersection/union are two popcounts computed
    * IN the pair join over |distinct masks| rows. The tiny mask-pair
    * frame broadcasts back onto the per-doc frame for expansion, so no
    * corpus-sized shuffle or block-manager write exists anywhere in the
    * plan. (r4 postmortem: the previous shared localCheckpoint of the
    * corpus-wide token-set frame wrote corpus-sized MEMORY_AND_DISK
    * blocks on EVERY query construction; under the bench harness's 4
    * executions/query — immediately after dedup_clusters' per-round
    * checkpoints — the loaded gate machine paid block-eviction + disk
    * I/O per run, inflating a 1.1 s quiet-machine query to a 12.4 s
    * gate median. The mask path now touches the block manager zero
    * times.)
    */
  private[graft] def maskDocPairs(docs: DataFrame, vocab: Seq[String]): DataFrame = {
    val bitOf = typedLit(vocab.zipWithIndex.toMap)
    val maskCol = aggregate(array_distinct(tokens(col("text"))), lit(0L),
      (acc, t) => acc.bitwiseOR(
        call_function("shiftleft", lit(1L), element_at(bitOf, t))))
    val members = docs.select(col("doc_id"), col("source"), maskCol.as("mask"))
    val sets = members.select("source", "mask").distinct()
      .withColumn("tsize", bit_count(col("mask")))
    // identical-mask doc pairs: Jaccard exactly 1.0.
    val sameSet = members.as("l").join(members.as("r"),
        col("l.source") === col("r.source") && col("l.mask") === col("r.mask") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("d1"), col("r.doc_id").as("d2"),
        lit(1.0).as("jaccard"))
    // distinct-mask pairs: O(1) popcount verification in the join, with
    // the PPJoin size filter as the in-join prune.
    val nInter = bit_count(col("l.mask").bitwiseAND(col("r.mask")))
    val nUnion = bit_count(col("l.mask").bitwiseOR(col("r.mask")))
    val maskPairs = sets.as("l").join(sets.as("r"),
        col("l.source") === col("r.source") && col("l.mask") < col("r.mask") &&
          col("r.tsize") * lit(NgramThreshold) <= col("l.tsize") &&
          col("l.tsize") * lit(NgramThreshold) <= col("r.tsize"))
      .select(col("l.source").as("source"),
        col("l.mask").as("m1"), col("r.mask").as("m2"),
        round(nInter.cast("double") / nUnion.cast("double"), 4).as("jaccard"))
      .filter(col("jaccard") >= NgramThreshold)
    val crossSet = maskPairs
      .join(members.select(col("source"), col("mask").as("m1"), col("doc_id").as("da")),
        Seq("source", "m1"))
      .join(members.select(col("source"), col("mask").as("m2"), col("doc_id").as("db")),
        Seq("source", "m2"))
      .select(least(col("da"), col("db")).as("d1"),
        greatest(col("da"), col("db")).as("d2"), col("jaccard"))
    sameSet.unionByName(crossSet)
      .orderBy(desc("jaccard"), asc("d1"), asc("d2"))
  }

  /** Tiny-vocabulary verification: one bitmask per distinct set (term →
    * bit via a LITERAL map — the vocabulary was already probed driver-
    * side, so no dictionary job, no join), pairs verified IN the join
    * with two popcounts. The masked side is |distinct sets| narrow rows,
    * so the whole pair stage is one self-join with an O(1) residual and
    * no array data on the wire; the PPJoin size filter stays as the
    * in-join prune.
    */
  private[graft] def maskSetPairs(sets: DataFrame, vocab: Seq[String]): DataFrame = {
    val bitOf = typedLit(vocab.zipWithIndex.toMap)
    val masked = sets
      .select(col("source"), col("set_key"), col("tsize"),
        explode(col("tset")).as("tok"))
      .withColumn("bit", element_at(bitOf, col("tok")))
      .groupBy("source", "set_key", "tsize")
      .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), bit)")).as("mask"))
    val nInter = bit_count(col("l.mask").bitwiseAND(col("r.mask")))
    val nUnion = bit_count(col("l.mask").bitwiseOR(col("r.mask")))
    masked.as("l").join(masked.as("r"),
        col("l.source") === col("r.source") &&
          col("l.set_key") < col("r.set_key") &&
          col("r.tsize") * lit(NgramThreshold) <= col("l.tsize") &&
          col("l.tsize") * lit(NgramThreshold) <= col("r.tsize"))
      .select(col("l.source").as("source"),
        col("l.set_key").as("k1"), col("r.set_key").as("k2"),
        round(nInter.cast("double") / nUnion.cast("double"), 4).as("jaccard"))
      .filter(col("jaccard") >= NgramThreshold)
  }

  /** General verification: exact prefix filtering (rarity order) with
    * PPJoin size + positional in-join prunes, then intersect/union over
    * the full sets for surviving candidates.
    */
  private[graft] def prefixSetPairs(sets: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val inv = sets.select(col("source"), col("set_key"), col("tsize"),
      explode(col("tset")).as("tok"))
    val tokDf = inv.groupBy("tok").agg(count(lit(1)).as("df"))
    val prefixLen = (col("tsize") - ceil(col("tsize") * NgramThreshold) + 1).cast("int")
    val prefix = inv.join(tokDf, "tok")
      .withColumn("rk", row_number().over(
        Window.partitionBy("source", "set_key").orderBy(asc("df"), asc("tok"))))
      .filter(col("rk") <= prefixLen)
      .select(col("source"), col("set_key"), col("tsize"), col("rk"), col("tok"))
    // Two exact in-join prunes (PPJoin family) before the dedup shuffle:
    //  - size filter: J >= tau implies |x∩y| >= tau*max(|x|,|y|) and
    //    |x∩y| <= min(|x|,|y|), hence min >= tau*max;
    //  - positional filter: tokens are ranked by one global (df, tok)
    //    order, so for the FIRST shared token at ranks (i, j) the overlap
    //    is at most 1 + min(n1-i, n2-j); a qualifying pair needs overlap
    //    >= ceil(tau/(1+tau) * (n1+n2)). OR-semantics over matched tokens
    //    keeps this exact: the bound is valid at the first match, so a
    //    true pair always passes through at least that token.
    val alpha = ceil(lit(NgramThreshold / (1 + NgramThreshold)) *
      (col("l.tsize") + col("r.tsize")))
    val cands = prefix.as("l").join(prefix.as("r"),
        col("l.source") === col("r.source") && col("l.tok") === col("r.tok") &&
          col("l.set_key") < col("r.set_key") &&
          col("r.tsize") * lit(NgramThreshold) <= col("l.tsize") &&
          col("l.tsize") * lit(NgramThreshold) <= col("r.tsize") &&
          lit(1) + least(col("l.tsize") - col("l.rk"),
            col("r.tsize") - col("r.rk")) >= alpha)
      .select(col("l.source").as("source"),
        col("l.set_key").as("k1"), col("r.set_key").as("k2"))
      .distinct()
    cands
      .join(sets.select(col("source"), col("set_key").as("k1"),
        col("tset").as("s1"), col("tsize").as("n1")), Seq("source", "k1"))
      .join(sets.select(col("source"), col("set_key").as("k2"),
        col("tset").as("s2"), col("tsize").as("n2")), Seq("source", "k2"))
      .withColumn("n_inter", size(array_intersect(col("s1"), col("s2"))))
      .select(col("source"), col("k1"), col("k2"),
        round(col("n_inter").cast("double") /
          (col("n1") + col("n2") - col("n_inter")).cast("double"), 4).as("jaccard"))
      .filter(col("jaccard") >= NgramThreshold)
  }

  val ngramJaccardOracle: String =
    s"""WITH sets AS (
       |  SELECT doc_id, source, list_distinct(${TextAnalysis.sqlToks}) AS tset
       |  FROM documents),
       |inv AS (
       |  SELECT doc_id, source, len(tset) AS tsize, unnest(tset) AS tok FROM sets),
       |inter AS (
       |  SELECT l.doc_id AS d1, r.doc_id AS d2, l.tsize AS n1, r.tsize AS n2,
       |    count(*) AS n_inter
       |  FROM inv l JOIN inv r
       |    ON l.source = r.source AND l.tok = r.tok AND l.doc_id < r.doc_id
       |  GROUP BY 1, 2, 3, 4)
       |SELECT d1, d2,
       |  round(CAST(n_inter AS DOUBLE) / CAST(n1 + n2 - n_inter AS DOUBLE), 4) AS jaccard
       |FROM inter
       |WHERE round(CAST(n_inter AS DOUBLE) / CAST(n1 + n2 - n_inter AS DOUBLE), 4) >= $NgramThreshold
       |ORDER BY jaccard DESC, d1, d2""".stripMargin

  // --- embedding cosine near-dup ------------------------------------------

  val CosineDupThreshold = 0.45

  /** Correctness baseline: all-pairs cosine above threshold. Kept
    * deliberately as the oracle-checkable exact form; production path at
    * scale is LSH-bucketed ([[lshBucketStats]]) or IVF-cell-blocked.
    *
    * Formulated as normalize-once + dot-only pair kernel: each vector is
    * L2-normalized in ONE narrow pass (struct barrier so the norm isn't
    * re-evaluated per element), and the n² pair loop is the fused
    * [[graft.functions.VectorFunctions.dotNative]] multiply-add — 3x
    * fewer FLOPs than re-deriving both norms per pair. The oracle
    * replays the same normalize-then-dot arithmetic.
    */
  def embeddingNearDup(embs: DataFrame): DataFrame = {
    val d = transform(col("embedding"), x => x.cast("double"))
    val normed = embs
      .select(col("vec_id"),
        // clamp the norm: a zero vector would give 0/0 = NaN, and NaN
        // sorts ABOVE the threshold in both Spark and DuckDB — the clamp
        // makes zero vectors score 0.0 against everything instead
        explode(array(struct(
          greatest(sqrt(aggregate(d, lit(0.0d), (acc, v) => acc + v * v)),
            lit(1e-30d)).as("nrm"),
          d.as("ed")))).as("s"))
      .select(col("vec_id"),
        transform(col("s.ed"), x => x / col("s.nrm")).as("en"))
    // the corpus arrives as ONE file locally → the nested-loop stream side
    // would run single-task; spread it so the n² pair loop parallelizes
    // (at real scale the scan is already thousands of splits — this
    // pre-join repartition of n tiny rows is noise either way)
    normed.repartition(col("vec_id"))
      .select(col("vec_id").as("v1"), col("en").as("e1")).as("l")
      .join(normed.select(col("vec_id").as("v2"), col("en").as("e2")).as("r"),
        col("v1") < col("v2"))
      .select(col("v1"), col("v2"),
        round(dotNative(col("e1"), col("e2")), 4).as("cosine"))
      .filter(col("cosine") >= CosineDupThreshold)
      .orderBy(desc("cosine"), asc("v1"), asc("v2"))
  }

  /** lazy: references [[Dim]], declared in the LSH section below —
    * eager init would capture 0 (object vals initialize in order).
    */
  lazy val embeddingNearDupOracle: String = {
    val norm = "greatest(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 1e-30)"
    s"""WITH normed AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE) / $norm) AS en
       |  FROM embeddings),
       |pairs AS (
       |  SELECT l.vec_id AS v1, r.vec_id AS v2,
       |    round(list_sum(list_transform(range(1, ${Dim + 1}),
       |      i -> l.en[i] * r.en[i])), 4) AS cosine
       |  FROM normed l JOIN normed r ON l.vec_id < r.vec_id)
       |SELECT v1, v2, cosine FROM pairs
       |WHERE cosine >= $CosineDupThreshold
       |ORDER BY cosine DESC, v1, v2""".stripMargin
  }

  // --- LSH bucket machinery ------------------------------------------------

  val LshPlanes = 8
  val LshTables = 4
  val PlanesPerTable = 4
  val Dim = 64

  /** Deterministic ±1 hyperplanes (shared with the SQL oracle). The
    * first [[LshPlanes]] feed the bucket histogram; all
    * [[LshTables]]×[[PlanesPerTable]] feed the multi-table near-dup join.
    */
  val Hyperplanes: Seq[Seq[Int]] =
    (0 until math.max(LshPlanes, LshTables * PlanesPerTable)).map { i =>
      (0 until Dim).map { j =>
        val v = (1103515245L * (i * Dim + j) + 12345L) % 2147483648L
        if (v < 1073741824L) 1 else -1
      }
    }

  /** Interpreted reference form of one plane's sign bit — kept for the
    * spec cross-check against the codegen'd [[lshBuckets]] path.
    */
  private[graft] def planeBitHof(embedding: Column, planeIdx: Int, bit: Int): Column = {
    val dotp = aggregate(
      zip_with(embedding, typedLit(Hyperplanes(planeIdx).map(_.toDouble)),
        (x, y) => x.cast("double") * y),
      lit(0.0d), (acc, v) => acc + v)
    when(dotp >= 0, 1L << bit).otherwise(0L)
  }

  private def doublePlanes(n: Int): Seq[Seq[Double]] =
    Hyperplanes.take(n).map(_.map(_.toDouble))

  /** Random-hyperplane bucket id (sign bit per plane) as a column —
    * codegen'd single pass ([[graft.functions.VectorFunctions.lshBuckets]]).
    */
  def lshBucket(embedding: Column): Column =
    element_at(lshBuckets(embedding, doublePlanes(LshPlanes), LshPlanes), 1)

  /** Random-hyperplane signature histogram: the bucketing primitive for
    * cosine LSH. Near-dup pairs at scale are then joined within buckets
    * instead of all-pairs.
    */
  def lshBucketStats(embs: DataFrame): DataFrame =
    embs.select(lshBucket(col("embedding")).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_vecs"))
      .orderBy("bucket")

  /** The LSH-blocked near-dup path: MULTI-TABLE random-hyperplane LSH
    * (OR-amplification — [[LshTables]] independent tables of
    * [[PlanesPerTable]] sign bits; a pair is a candidate when it
    * collides in ANY table, mirroring MinHash banding), then exact
    * cosine verification. Deterministic hyperplanes make the
    * approximation itself oracle-replayable — the registered oracle runs
    * the SAME blocking, so the correctness gate checks the algorithm,
    * while recall vs the brute-force baseline ([[embeddingNearDup]]) is
    * measured in the spec. At 100 TB the bucket joins replace the
    * quadratic cross product entirely.
    */
  def embeddingNearDupLsh(embs: DataFrame): DataFrame = {
    val sig = embs.select(col("vec_id"),
      posexplode(lshBuckets(col("embedding"),
        doublePlanes(LshTables * PlanesPerTable), PlanesPerTable))
        .as(Seq("table_id", "bucket")))
    val cands = sig.as("l").join(sig.as("r"),
        col("l.table_id") === col("r.table_id") &&
          col("l.bucket") === col("r.bucket") &&
          col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("v1"), col("r.vec_id").as("v2"))
      .distinct()
    cands
      .join(embs.select(col("vec_id").as("v1"), col("embedding").as("e1")), Seq("v1"))
      .join(embs.select(col("vec_id").as("v2"), col("embedding").as("e2")), Seq("v2"))
      .select(col("v1"), col("v2"),
        round(cosineSim(col("e1"), col("e2")), 4).as("cosine"))
      .filter(col("cosine") >= CosineDupThreshold)
      .orderBy(desc("cosine"), asc("v1"), asc("v2"))
  }

  private def lshBucketSql(emb: String): String =
    (0 until LshPlanes).map(i => planeBitSql(emb, i, i)).mkString("\n    + ")

  private def planeBitSql(emb: String, planeIdx: Int, bit: Int): String = {
    val lits = Hyperplanes(planeIdx).map(v => s"$v.0").mkString("[", ", ", "]")
    s"""(CASE WHEN list_sum(list_transform(range(1, ${Dim + 1}),
       |    k -> CAST($emb[k] AS DOUBLE) * ($lits)[k])) >= 0
       |  THEN ${1L << bit} ELSE 0 END)""".stripMargin
  }

  val embeddingNearDupLshOracle: String = {
    val tableRows = (0 until LshTables).map { t =>
      val bucket = (0 until PlanesPerTable)
        .map(j => planeBitSql("embedding", t * PlanesPerTable + j, j))
        .mkString("\n    + ")
      s"SELECT vec_id, $t AS table_id,\n    $bucket AS bucket FROM embeddings"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH sig AS (
       |  $tableRows),
       |cands AS (
       |  SELECT DISTINCT l.vec_id AS v1, r.vec_id AS v2
       |  FROM sig l JOIN sig r
       |    ON l.table_id = r.table_id AND l.bucket = r.bucket AND l.vec_id < r.vec_id),
       |pairs AS (
       |  SELECT v1, v2,
       |    round(${VectorSearch.cosineSql("a.embedding", "b.embedding")}, 4) AS cosine
       |  FROM cands JOIN embeddings a ON cands.v1 = a.vec_id
       |              JOIN embeddings b ON cands.v2 = b.vec_id)
       |SELECT v1, v2, cosine FROM pairs
       |WHERE cosine >= $CosineDupThreshold
       |ORDER BY cosine DESC, v1, v2""".stripMargin
  }

  val lshBucketStatsOracle: String =
    s"""SELECT ${lshBucketSql("embedding")} AS bucket, count(*) AS n_vecs
       |FROM embeddings
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  // --- semantic dedup (cluster-blocked, SemDeDup-style) --------------------

  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space, compare pairs only
    * WITHIN a cluster, and drop every vector that has a higher-priority
    * (lower-id) semantic duplicate in its cluster. The third blocking
    * strategy in the near-dup family — k-means-cell blocking here,
    * hyperplane-LSH buckets in [[embeddingNearDupLsh]], brute force as
    * the correctness baseline — chosen when duplicates are SEMANTIC
    * (same meaning, different surface) rather than near-identical.
    *
    * Scale design: centroids are a tiny broadcast (nlist × dim); the
    * assignment is a map-side argmax per vector (no shuffle); the only
    * shuffle is the within-cell self-join, O(Σ|cell|²) pair work instead
    * of O(n²) — with nlist ∝ √n this is the published SemDeDup recipe at
    * web scale. Keep-rule is per-pair lowest-id (deterministic; the
    * paper's keep-farthest-from-centroid variant swaps one ORDER BY).
    */
  def semanticDedup(embs: DataFrame): DataFrame = {
    val d = transform(col("embedding"), x => x.cast("double"))
    val normed = embs
      .select(col("vec_id"),
        explode(array(struct(
          greatest(sqrt(aggregate(d, lit(0.0d), (acc, v) => acc + v * v)),
            lit(1e-30d)).as("nrm"),
          d.as("ed")))).as("s"))
      .select(col("vec_id"),
        transform(col("s.ed"), x => x / col("s.nrm")).as("en"))
    // nearest-centroid assignment: broadcast nlist centroids, keep the
    // best (sim, lowest-cell) per vector in ONE partial-aggregable max
    val sims = normed.join(broadcast(IvfIndex.centroidArrays(embs)))
      .select(col("vec_id"), col("en"), col("cell"),
        round(graft.functions.VectorFunctions.cosineSim(
          col("en"), col("centroid")), 6).as("sim"))
    val assigned = sims
      .groupBy("vec_id")
      .agg(max(struct(col("sim"), (-col("cell")).as("nc"), col("en").as("en"))).as("m"))
      .select(col("vec_id"), (-col("m.nc")).cast("long").as("cell"),
        col("m.en").as("en"))
    val dups = assigned.select(col("cell"), col("vec_id").as("v1"), col("en").as("e1"))
      .join(assigned.select(col("cell"), col("vec_id").as("v2"), col("en").as("e2")),
        Seq("cell"))
      .filter(col("v1") < col("v2"))
      .filter(round(graft.functions.VectorFunctions.dotNative(
        col("e1"), col("e2")), 4) >= CosineDupThreshold)
      .select(col("v2")).distinct()
    assigned.join(dups, col("vec_id") === col("v2"), "left")
      .select(col("vec_id"), col("cell"), col("v2").isNull.as("is_kept"))
      .orderBy("vec_id")
  }

  /** Oracle: centroids re-derived in SQL (same CTE shape as the IVF
    * search oracle), argmax assignment via a deterministic
    * (sim DESC, cell) window, within-cell pair cosines over the
    * normalized lists.
    */
  lazy val semanticDedupOracle: String = {
    val norm = "greatest(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 1e-30)"
    s"""WITH cent_long AS (
       |  SELECT label AS cell, generate_subscripts(embedding, 1) AS dim,
       |    CAST(unnest(embedding) AS DOUBLE) AS e
       |  FROM embeddings),
       |cent AS (
       |  SELECT cell, list(c ORDER BY dim) AS centroid
       |  FROM (SELECT cell, dim, avg(e) AS c FROM cent_long GROUP BY 1, 2)
       |  GROUP BY cell),
       |normed AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(x AS DOUBLE) / $norm) AS en
       |  FROM embeddings),
       |sims AS (
       |  SELECT n.vec_id, c.cell,
       |    round(${VectorSearch.cosineSql("en", "centroid")}, 6) AS sim
       |  FROM normed n, cent c),
       |assigned AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
       |    FROM sims) WHERE rn = 1),
       |dups AS (
       |  SELECT DISTINCT r.vec_id AS v2
       |  FROM assigned l JOIN assigned r ON l.cell = r.cell AND l.vec_id < r.vec_id
       |  JOIN normed nl ON nl.vec_id = l.vec_id
       |  JOIN normed nr ON nr.vec_id = r.vec_id
       |  WHERE round(list_sum(list_transform(range(1, ${Dim + 1}),
       |    i -> nl.en[i] * nr.en[i])), 4) >= $CosineDupThreshold)
       |SELECT a.vec_id, a.cell, (d.v2 IS NULL) AS is_kept
       |FROM assigned a LEFT JOIN dups d ON a.vec_id = d.v2
       |ORDER BY a.vec_id""".stripMargin
  }

  def qSemanticDedup(s: SparkSession, dir: String): DataFrame =
    semanticDedup(Tables.embeddings(s, dir))

  // --- decontamination -----------------------------------------------------

  val BenchStride = 50

  /** Train/test decontamination: flag corpus documents that collide with
    * a benchmark document (every [[BenchStride]]-th doc stands in for the
    * held-out eval set) on either signal real pipelines use —
    * `exact`  : normalized content fingerprint equality;
    * `ngram`  : shared minimum 3-shingle hash (1-perm MinHash — the
    *            n-gram-overlap decontamination of GPT-3-style corpus
    *            builds, at candidate granularity).
    * At scale the benchmark signature set is tiny next to the corpus —
    * it broadcasts, and decontamination is a map-side hash probe over
    * one corpus scan (never a corpus-corpus shuffle).
    */
  def decontaminate(docs: DataFrame): DataFrame = {
    val sigs = docs.select(col("doc_id"),
      fingerprint(col("text")).as("fp"),
      array_min(transform(shingles(tokens(col("text")), 3), s => portableHash(s)))
        .as("msh"))
    val bench = sigs.filter(col("doc_id") % BenchStride === 0)
      .select(col("doc_id").as("bench_id"), col("fp").as("bfp"), col("msh").as("bmsh"))
    sigs.join(broadcast(bench),
        col("fp") === col("bfp") || col("msh") === col("bmsh"))
      .filter(col("doc_id") =!= col("bench_id"))
      .select(col("doc_id"), col("bench_id"),
        when(col("fp") === col("bfp"), "exact").otherwise("ngram").as("match_type"))
      .orderBy("doc_id", "bench_id")
  }

  val decontaminateOracle: String = {
    val shingleSql =
      s"""CASE WHEN len(toks) >= 3
         |  THEN list_transform(range(1, len(toks) - 1), i -> array_to_string(list_slice(toks, i, i + 2), ' '))
         |  ELSE [array_to_string(toks, ' ')] END""".stripMargin
    s"""WITH toked AS (SELECT doc_id, ${TextAnalysis.sqlToks} AS toks FROM documents),
       |sigs AS (
       |  SELECT doc_id, md5(array_to_string(toks, ' ')) AS fp,
       |    list_min(list_transform($shingleSql,
       |      s -> CAST('0x' || substring(md5(s), 1, 15) AS BIGINT))) AS msh
       |  FROM toked),
       |bench AS (
       |  SELECT doc_id AS bench_id, fp AS bfp, msh AS bmsh FROM sigs
       |  WHERE doc_id % $BenchStride = 0)
       |SELECT doc_id, bench_id,
       |  CASE WHEN fp = bfp THEN 'exact' ELSE 'ngram' END AS match_type
       |FROM sigs JOIN bench ON fp = bfp OR msh = bmsh
       |WHERE doc_id <> bench_id
       |ORDER BY doc_id, bench_id""".stripMargin
  }

  /** Bloom-filtered decontamination — the 100 TB form of
    * [[decontaminate]]. The broadcast-everything probe ships EVERY
    * benchmark signature to every task; at web-benchmark scale (tens of
    * millions of signatures) that broadcast is the bottleneck. Here the
    * benchmark side folds into two fixed-size bloom sketches (one per
    * signal — Spark's own runtime-filter `BloomFilterAggregate`), the
    * corpus probes them MAP-SIDE (`might_contain` over `xxhash64`, no
    * false negatives), and only the surviving sliver pays the exact
    * verification join that removes bloom false positives. Output is
    * bit-identical to [[decontaminate]] — the registered oracle IS the
    * exact form's SQL, so the hash match proves the equivalence.
    */
  def decontaminateBloom(docs: DataFrame,
                         expectedBenchItems: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.graftshim.BloomShim
    val sigs = docs.select(col("doc_id"),
      fingerprint(col("text")).as("fp"),
      array_min(transform(shingles(tokens(col("text")), 3), s => portableHash(s)))
        .as("msh"))
    val bench = sigs.filter(col("doc_id") % BenchStride === 0)
      .select(col("doc_id").as("bench_id"), col("fp").as("bfp"), col("msh").as("bmsh"))
    // the scalar-subquery step: two fixed-size sketches built in one
    // tiny aggregation over the benchmark side
    val blooms = bench.agg(
      BloomShim.bloomAgg(xxhash64(col("bfp")), expectedBenchItems).as("bf_fp"),
      BloomShim.bloomAgg(xxhash64(col("bmsh")), expectedBenchItems).as("bf_msh"))
      .collect()(0)
    val bfFp = blooms.getAs[Array[Byte]]("bf_fp")
    val bfMsh = blooms.getAs[Array[Byte]]("bf_msh")
    if (bfFp == null || bfMsh == null) decontaminate(docs) // empty bench
    else sigs
      .filter(BloomShim.mightContain(bfFp, xxhash64(col("fp"))) ||
        BloomShim.mightContain(bfMsh, xxhash64(col("msh"))))
      .join(broadcast(bench),
        col("fp") === col("bfp") || col("msh") === col("bmsh"))
      .filter(col("doc_id") =!= col("bench_id"))
      .select(col("doc_id"), col("bench_id"),
        when(col("fp") === col("bfp"), "exact").otherwise("ngram").as("match_type"))
      .orderBy("doc_id", "bench_id")
  }

  // --- cross-document repeated spans (boilerplate profile) -----------------

  /** Span length (tokens) for the repeated-span profile. */
  val SpanK = 8
  /** Keep threshold: documents above this duplicated-span fraction are
    * flagged for removal.
    */
  val SpanDupRatioMax = 0.5

  /** Cross-document repeated-span profile — the span-level exact-dedup
    * signal of the C4 / "Deduplicating Training Data" (Lee et al. 2021)
    * family: doc-level near-dup (MinHash et al.) misses boilerplate that
    * recurs INSIDE otherwise-distinct documents, so pipelines also count,
    * per document, how many of its token k-grams appear verbatim in other
    * documents. Output per doc: distinct span count, spans shared with
    * ≥1 other doc, the duplicated fraction, and the keep flag at
    * [[SpanDupRatioMax]].
    *
    * Scale design: spans are hashed to 60-bit longs map-side (the
    * portable md5 hash — only 8-byte keys shuffle, never span text); the
    * global span→doc-count is one partial-aggregated groupBy, re-joined
    * to the span stream by the SAME key — both sides arrive
    * hash-partitioned on `h`, so AQE plans the second hop without an
    * extra exchange of the aggregate. Nothing is quadratic: cost is
    * O(total tokens) rows through two hash shuffles.
    */
  def spanProfile(docs: DataFrame, k: Int = SpanK): DataFrame = {
    val spans = docs.select(col("doc_id"),
        explode(array_distinct(shingles(tokens(col("text")), k))).as("span"))
      .select(col("doc_id"), portableHash(col("span")).as("h"))
      // explicit repartition so the span→count aggregate AND the
      // count-join read the SAME exchange (ReusedExchange): without it
      // the agg branch column-prunes doc_id and partial-aggregates
      // before its shuffle, so the exploded+hashed stream is computed
      // twice (measured 2x). A count-over-partition window would also
      // evaluate once, but it must BUFFER each h-partition in one task —
      // a corpus-wide boilerplate span (the exact thing this operator
      // detects) would serialize; the join form lets AQE skew-split the
      // probe side.
      .repartition(col("h"))
    // count(doc_id), not count(*): doc_id is never null so the result is
    // identical, but the reference keeps doc_id in the aggregate's input
    // projection — otherwise column pruning gives this branch an
    // (h)-only exchange that can't unify with the join branch's
    // (doc_id, h) exchange and the reuse above never happens
    val counts = spans.groupBy("h").agg(count(col("doc_id")).as("n_docs"))
    spans.join(counts, Seq("h"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum((col("n_docs") >= 2).cast("long")).as("n_dup_spans"))
      .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
        round(col("n_dup_spans").cast("double") / col("n_spans"), 4).as("dup_ratio"))
      .withColumn("keep", col("dup_ratio") <= SpanDupRatioMax)
      .orderBy("doc_id")
  }

  val spanProfileOracle: String = {
    val shingleSql =
      s"""CASE WHEN len(toks) >= $SpanK
         |    THEN list_transform(range(1, len(toks) - ${SpanK - 2}), i -> array_to_string(list_slice(toks, i, i + ${SpanK - 1}), ' '))
         |    ELSE [array_to_string(toks, ' ')] END""".stripMargin
    s"""WITH toked AS (SELECT doc_id, ${TextAnalysis.sqlToks} AS toks FROM documents),
       |spans AS (
       |  SELECT DISTINCT doc_id,
       |    CAST('0x' || substring(md5(span), 1, 15) AS BIGINT) AS h
       |  FROM (SELECT doc_id, unnest($shingleSql) AS span FROM toked)),
       |counts AS (SELECT h, count(*) AS n_docs FROM spans GROUP BY 1),
       |profiled AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       |    CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans
       |  FROM spans JOIN counts USING (h)
       |  GROUP BY doc_id)
       |SELECT doc_id, n_spans, n_dup_spans,
       |  round(CAST(n_dup_spans AS DOUBLE) / n_spans, 4) AS dup_ratio,
       |  round(CAST(n_dup_spans AS DOUBLE) / n_spans, 4) <= $SpanDupRatioMax AS keep
       |FROM profiled
       |ORDER BY doc_id""".stripMargin
  }

  def qSpanProfile(s: SparkSession, dir: String): DataFrame =
    spanProfile(Tables.documents(s, dir))

  // --- wiring --------------------------------------------------------------

  def qExact(s: SparkSession, dir: String): DataFrame = exact(Tables.documents(s, dir))

  /** Build the existing-corpus band index (transient, like the keyword
    * index query), then probe it with the interleaved new batch.
    */
  def qIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val path = IndexCache.getOrBuild("band_idx", dir) { p =>
      writeBandIndex(docs.filter(
        pmod(col("doc_id"), lit(NewMod)) =!= NewMod - 1), p)
    }
    incremental(docs, s.read.parquet(path))
  }
  def qDecontaminate(s: SparkSession, dir: String): DataFrame = decontaminate(Tables.documents(s, dir))
  def qDecontaminateBloom(s: SparkSession, dir: String): DataFrame = decontaminateBloom(Tables.documents(s, dir))
  def qMinhashLsh(s: SparkSession, dir: String): DataFrame = minhashLsh(Tables.documents(s, dir))
  def qSimhash(s: SparkSession, dir: String): DataFrame = simhash(Tables.documents(s, dir))
  def qNgramJaccard(s: SparkSession, dir: String): DataFrame = ngramJaccard(Tables.documents(s, dir))
  def qEmbeddingNearDup(s: SparkSession, dir: String): DataFrame = embeddingNearDup(Tables.embeddings(s, dir))
  def qLshBucketStats(s: SparkSession, dir: String): DataFrame = lshBucketStats(Tables.embeddings(s, dir))
  def qEmbeddingNearDupLsh(s: SparkSession, dir: String): DataFrame = embeddingNearDupLsh(Tables.embeddings(s, dir))
}
