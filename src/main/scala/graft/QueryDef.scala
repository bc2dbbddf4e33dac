package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: a Spark-first implementation plus (usually)
  * a DuckDB oracle twin (SURVEY.md §2.2 "the t2 contract").
  *
  * Contract notes (driver semantics):
  *  - Output column names must match the oracle's exactly (the driver
  *    sorts columns by name before hashing values).
  *  - Every query ends in an ORDER BY over a unique key in BOTH dialects.
  *  - Doubles are rounded to 4 decimals; timestamps rendered as strings.
  *  - `oracle = None` ⇒ driver records a weaker rows-only check (used for
  *    approximate/hash-implementation-specific operators only).
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object Q {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, Some(oracle.stripMargin.trim), run)

  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, None, run)
}

/** Per-query session scoping. Iterative operators (CC, PageRank,
  * k-means) and the streaming replays size `spark.sql.shuffle.partitions`
  * to their own frame volume, far below the session's batch default.
  * Mutating the SHARED session conf (set / try / finally restore) is
  * correct single-threaded but races if queries ever run concurrently on
  * one session — so the override lives on a session CLONE instead:
  * `newSession()` shares the SparkContext, shared state and injected
  * extensions but owns its SQLConf, making the override invisible to
  * every other query. The clone costs one SessionState build (~ms) per
  * query — noise against the loop's shuffles. */
object Sessions {
  def withShufflePartitions(s: SparkSession, n: Int): SparkSession = {
    val clone = s.newSession()
    // newSession re-applies only BUILDER-time options; conf set at
    // runtime on the parent (e.g. the RocksDB state-store provider a
    // query arms before calling a streaming helper) would silently drop.
    // Carry the parent's effective SQL conf over, then override the
    // shuffle sizing. Static/immutable entries refuse the set — skip.
    s.conf.getAll.foreach { case (k, v) =>
      try clone.conf.set(k, v) catch { case _: Throwable => () }
    }
    clone.conf.set("spark.sql.shuffle.partitions", n.toString)
    clone
  }
}
