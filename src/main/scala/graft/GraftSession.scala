package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * One place that encodes the engine's execution posture (SURVEY.md §4):
  * rely on Catalyst + AQE for plan optimization; pin UTC for oracle
  * parity; size shuffle partitions for the local[32] test harness while
  * keeping every operator shuffle/broadcast-correct for a real cluster
  * (the same builder is what a cluster deploy would tune via spark-submit
  * conf, so nothing here hard-codes single-node assumptions into the
  * operators themselves).
  */
object GraftSession {

  /** Graft's standard configuration. NOTE: later .config calls win, so
    * callers apply their own overrides (shuffle partitions, master) AFTER
    * configure(...) — never before. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    .config("spark.sql.parquet.filterPushdown", "true")
    .config("spark.sql.files.maxPartitionBytes", (128L << 20).toString)
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false")
    // The engine declares ~140 distinct query shapes; the default
    // 100-entry codegen class cache (StaticSQLConf
    // CODEGEN_CACHE_MAX_ENTRIES) thrashes across them, so every query
    // pays Janino recompile + cold JIT for classes it compiled minutes
    // earlier — single-threaded work that dominates wall time on a
    // contended host. Static conf: must be set before the session
    // exists, i.e. exactly here. ~4k entries ≈ a few hundred MB of
    // metaspace worst-case, well inside the harness heap.
    .config("spark.sql.codegen.cache.maxEntries", "4096")
    // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    // reader rejects; read as long nanos, Tables.events converts to
    // microsecond timestamps (same truncation DuckDB applies).
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Spark 4.1's checkpoint file-checksum manager stalls waiting on its
    // async checksum writes on the local filesystem (observed with both
    // HDFS-backed and RocksDB state stores) — disable locally.
    .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    // FileContext-based checkpointing creates every file with an explicit
    // permission, which without native Hadoop forks a chmod per file; the
    // FileSystem-based manager uses default-permission creates (no fork).
    .config("spark.sql.streaming.checkpointFileManagerClass",
      "org.apache.spark.sql.execution.streaming.checkpointing.FileSystemBasedCheckpointFileManager")
  // State store: default HDFS-backed provider locally. A cluster deploy
  // sets spark.sql.streaming.stateStore.providerClass to
  // RocksDBStateStoreProvider for large keyed state (the 100 TB posture).

  /** Local session for tests / ad-hoc runs. */
  def local(threads: Int = 4): SparkSession = {
    val s = configure(SparkSession.builder())
      .master(s"local[$threads]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", threads.toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
