package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** One replayed event row (events.parquet subset) for stateful
  * processing. */
final case class EventRec(event_id: Long, ts: java.sql.Timestamp,
    user_id: Long, value: Double)

/** Monotone high-water filter on the v2 state API: per user, emit only
  * events whose value strictly exceeds every previously-seen value
  * (in (ts, event_id) order). The streaming twin of a running-max
  * window filter — final state over a replay equals the batch window
  * query, which is exactly what the stream_monotone_tws oracle checks.
  * In-batch rows are sorted by event time so a coarse replay batch
  * produces the same emission set as row-at-a-time arrival. */
class RunningMaxProcessor extends StatefulProcessor[Long, EventRec, EventRec] {

  @transient private var maxV: ValueState[Double] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    maxV = getHandle.getValueState[Double]("maxValue",
      Encoders.scalaDouble, TTLConfig.NONE)

  /** Spark SQL's `>` over doubles, not Java's: NaN sorts above every
    * other double (and equals itself), and -0.0 equals 0.0 — a NaN event
    * must be emitted exactly once and a -0.0 after a 0.0 must not be,
    * or the final state diverges from the batch window oracle. */
  private def sqlGt(a: Double, b: Double): Boolean = {
    def norm(x: Double) = if (x == 0.0) 0.0 else x // -0.0 == 0.0 in SQL
    java.lang.Double.compare(norm(a), norm(b)) > 0
  }

  override def handleInputRows(key: Long, rows: Iterator[EventRec],
      timerValues: TimerValues): Iterator[EventRec] = {
    var seen = maxV.exists()
    var cur = if (seen) maxV.get() else 0.0
    val out = rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id)).flatMap { r =>
      // First row per key always emits (the oracle's prior_max IS NULL
      // arm) — a guard of `value > -Infinity` would wrongly drop a first
      // row that IS -Infinity.
      if (!seen || sqlGt(r.value, cur)) { seen = true; cur = r.value; Some(r) }
      else None
    }
    if (seen) maxV.update(cur)
    out.iterator
  }
}
