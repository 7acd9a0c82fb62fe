package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory with graft's scale-oriented defaults.
  *
  * Defaults chosen for the local[32] test harness but expressed the way a
  * 1000-executor deployment would set them: AQE on (runtime re-plan, skew
  * join handling), shuffle partitions sized to the cluster (32 locally),
  * UTC session time. Parquet NANOS timestamps read losslessly as longs
  * (`nanosAsLong`); µs TIMESTAMP/_NTZ event files are widened to the same
  * nanos-long contract by [[graft.sources.Tables.normalizeTs]] — the
  * engine is robust to either physical encoding of `events.ts`.
  */
object GraftSession {

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession =
    configure(SparkSession.builder().master(s"local[$cores]").appName("graft"))
      .getOrCreate()

  // Every unpartitioned window in graft (Reranker, PromptAssembly,
  // ContextPruner) runs over an already-top-k-bounded candidate set
  // (≤ ~50 rows by construction), where a single-partition window is the
  // RIGHT plan — WindowExec's blanket "No Partition Defined" warning is a
  // false alarm there and floods benchmark logs, so it's raised to ERROR.
  // Corpus-scale windows (sessionize, per-query ranking) are all keyed.
  org.apache.logging.log4j.core.config.Configurator.setLevel(
    "org.apache.spark.sql.execution.window.WindowExec",
    org.apache.logging.log4j.Level.ERROR)

  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    // Text/vector stages are CPU-dense per shuffled byte (array intersects,
    // cosine loops over tiny md5/id rows): AQE's byte-based partition
    // coalescing serializes them (observed: a 500k-pair verify stage
    // squeezed into ONE task). Lowering the coalesce floor keeps small
    // CPU-heavy shuffles parallel; at real scale partitions are far above
    // either floor and behavior is unchanged.
    .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
    // Every batch-serving ranking ends in a TypedImperativeAggregate
    // heap (TopKByScore) planned as ObjectHashAggregate. Its DEFAULT
    // sort-based fallback threshold is 128 in-memory groups — a batch
    // workload has |queries| groups per task (thousands), so every
    // serving tail silently abandoned hashing, SORTED the full
    // candidate fan-out and spilled it (measured: the batch IVF-PQ
    // probe spent ~58µs/candidate in UnsafeExternalSorter.spill at
    // 100×). The buffers are bounded k-entry heaps (~a few hundred
    // bytes each), so 128k of them is ≤ tens of MB per task — hashing
    // must win at any realistic query-batch size.
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      (1 << 17).toString)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Backstop for block-manager residency growth in a long-lived JVM:
    // the ContextCleaner reclaims dropped-reference checkpoint/broadcast
    // blocks only after a GC enqueues their weak refs, and the default
    // periodic-GC interval (30min) is longer than an entire benchmark
    // suite — residency then grows monotonically and later queries pay
    // LRU disk-eviction writes for earlier queries' garbage (the r13
    // "latency depends on session history" finding). Engine-owned
    // frames are released deterministically ([[graft.operators
    // .Checkpoints]]); this bounds whatever isn't.
    .config("spark.cleaner.periodicGC.interval", "5min")
    .config("spark.ui.enabled", "false")

  /** Text2SQL execution surface (reference notebook 8-Text2SQL_Week3): the
    * generated SQL string runs directly against registered graft tables.
    */
  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)
}
