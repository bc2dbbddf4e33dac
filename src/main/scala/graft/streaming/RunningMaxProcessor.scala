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

  override def handleInputRows(key: Long, rows: Iterator[EventRec],
      timerValues: TimerValues): Iterator[EventRec] = {
    var cur = if (maxV.exists()) maxV.get() else Double.NegativeInfinity
    val out = rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id)).flatMap { r =>
      if (r.value > cur) { cur = r.value; Some(r) } else None
    }
    if (cur != Double.NegativeInfinity) maxV.update(cur)
    out.iterator
  }
}
