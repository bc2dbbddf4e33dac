package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** One replayed changelog row: an event stream read as CDC (change-data-
  * capture) — each row is an upsert for its user key, `event_type =
  * 'error'` acts as the tombstone marker. */
final case class CdcRec(event_id: Long, ts: java.sql.Timestamp,
    user_id: Long, event_type: String, value: Double)

/** CDC APPLY on the v2 state API: maintain, per key, the latest change
  * by EVENT TIME (ts, then event_id as the uniquifier) and emit only
  * rows that advance it — late/out-of-order changelog entries are
  * dropped instead of clobbering newer state, which is the correctness
  * property that separates "apply the changelog" from "take the last
  * arrival". The emitted stream is therefore a strictly-increasing
  * sequence of snapshots per key; the final snapshot (and tombstone
  * filtering) is the serving-layer cut the query applies on the
  * completed table. State is one (micros, event_id) pair per key —
  * constant-size, RocksDB/TTL-ready at 100 TB key cardinality.
  */
class CdcApplyProcessor extends StatefulProcessor[Long, CdcRec, CdcRec] {

  @transient private var last: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    last = getHandle.getValueState[(Long, Long)]("lastChange",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

  /** Microsecond-exact epoch for ordering: Timestamp.getTime is millis
    * (micros truncated), so rebuild from getNanos — two changes inside
    * the same millisecond must still order correctly. */
  private def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  override def handleInputRows(key: Long, rows: Iterator[CdcRec],
      timerValues: TimerValues): Iterator[CdcRec] = {
    var cur: (Long, Long) =
      if (last.exists()) last.get() else (Long.MinValue, Long.MinValue)
    // In-batch ordering: ascending event time, so a coarse replay batch
    // emits the same increasing-snapshot sequence as row-at-a-time
    // arrival (same law as RunningMaxProcessor).
    val out = rows.toSeq
      .sortBy(r => (micros(r.ts), r.event_id))
      .flatMap { r =>
        val k = (micros(r.ts), r.event_id)
        if (Ordering[(Long, Long)].gt(k, cur)) { cur = k; Some(r) }
        else None
      }
    if (cur._1 != Long.MinValue) last.update(cur)
    out.iterator
  }
}
