package graft.queries

import graft.{SparkEntry, SparkSpec}
import java.sql.Timestamp

/** AS-OF join edge semantics: inclusive equal-timestamp match, highest
  * event_id tie-break among equal-ts build rows, null when nothing
  * precedes, and the tolerance variant's staleness cut-off. */
class TemporalQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("asofev").toString
    Seq(
      // user 1: two clicks at the SAME instant (tie), purchase at that
      // instant (inclusive match), purchase before any click (null),
      // stale signup (7h before the purchase)
      (1L, ts("2024-01-01 10:00:00"), 1L, "click", 10.0, "{}"),
      (2L, ts("2024-01-01 10:00:00"), 1L, "click", 20.0, "{}"),
      (3L, ts("2024-01-01 10:00:00"), 1L, "purchase", 1.0, "{}"),
      (4L, ts("2024-01-01 09:00:00"), 1L, "purchase", 2.0, "{}"),
      (5L, ts("2024-01-01 03:00:00"), 1L, "signup", 0.0, "{}"),
      // user 2: fresh signup 30 min before the purchase
      (6L, ts("2024-01-01 08:00:00"), 2L, "click", 30.0, "{}"),
      (7L, ts("2024-01-01 15:30:00"), 2L, "signup", 0.0, "{}"),
      (8L, ts("2024-01-01 16:00:00"), 2L, "purchase", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("as-of: inclusive equal-ts match, max-id tie-break, null if none prior") {
    val out = SparkEntry.queries("join_asof")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out(3L) == Some(2L))  // equal-ts clicks visible; id 2 beats id 1
    assert(out(4L) == None)      // 09:00 purchase precedes every click
    assert(out(8L) == Some(6L))  // latest click, hours earlier — no bound
  }

  test("as-of tolerance: stale matches (>6h) are nulled, fresh ones kept") {
    val out = SparkEntry.queries("join_asof_tolerance")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(out(3L) == None)      // signup at 03:00 is 7h stale
    assert(out(8L) == Some(7L))  // signup 30 min before
  }
}
