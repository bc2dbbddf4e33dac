package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** Input record for the v2-state SCD2/funnel processors: event time is
  * pre-extracted micros so state carries no Timestamp boxing. */
final case class Scd2Rec(user_id: Long, tsu: Long, event_id: Long,
    event_type: String)

/** One CLOSED dimension interval (the only thing SCD2 ever emits —
  * the open current-state interval lives in state). */
final case class Scd2Iv(user_id: Long, event_type: String,
    valid_from: Long, valid_to: Long)

/** Streaming SCD2 on the v2 state API (`transformWithState`) — the
  * twin of the fMGWS `scd2Stream` transform with the same contract:
  * per-user ValueState holds (current type, since); a type change
  * emits the closed interval and re-arms. Assumes chronological
  * arrival per user ACROSS batches (an ordered log / the quartile
  * replay); within a batch rows sort by (tsu, event_id) — the oracle's
  * tie-break. Final emission set over a replay equals the batch
  * lag-window build's closed intervals (valid_to IS NOT NULL cut),
  * which is exactly what the stream_scd2_tws oracle checks. State is
  * one (string, long) pair per user on the RocksDB provider — the
  * 100 TB-cardinality posture (reference analog: the dimension cache,
  * k8sclient.go:19-21, except versioned instead of TTL'd). */
class Scd2Processor extends StatefulProcessor[Long, Scd2Rec, Scd2Iv] {

  @transient private var cur: ValueState[(String, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cur = getHandle.getValueState[(String, Long)]("current",
      Encoders.product[(String, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Scd2Rec],
      timerValues: TimerValues): Iterator[Scd2Iv] = {
    val out = scala.collection.mutable.ListBuffer.empty[Scd2Iv]
    var state = if (cur.exists()) Some(cur.get()) else None
    rows.toSeq.sortBy(r => (r.tsu, r.event_id)).foreach { r =>
      state match {
        case None => state = Some((r.event_type, r.tsu))
        case Some((ct, since)) if ct != r.event_type =>
          out += Scd2Iv(key, ct, since, r.tsu)
          state = Some((r.event_type, r.tsu))
        case _ => ()
      }
    }
    state.foreach(cur.update)
    out.iterator
  }
}

/** Per-user funnel snapshot: the three monotone step timestamps
  * (micros), None while the step is unreached. */
final case class FunnelSnap(user_id: Long, t1: Option[Long],
    t2: Option[Long], t3: Option[Long])

/** Streaming 3-step funnel on the v2 state API — the twin of the
  * fMGWS `funnelStream` transform: per-user monotone (t1, t2, t3)
  * slots (view → click → purchase, strictly increasing event time),
  * set once and never cleared; every batch that touches a user emits
  * that user's current snapshot (update-mode semantics — downstream
  * recovers the final state with max() per slot, which is exact
  * because the slots are monotone). State is three longs per user
  * (sentinel -1 = unset) on the RocksDB provider. In-batch rows sort
  * by (tsu, event_type), matching the fMGWS twin, and same-ts events
  * can't chain transitions anyway — the strict > guards. */
class FunnelProcessor extends StatefulProcessor[Long, Scd2Rec, FunnelSnap] {

  @transient private var slots: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    slots = getHandle.getValueState[(Long, Long, Long)]("slots",
      Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Scd2Rec],
      timerValues: TimerValues): Iterator[FunnelSnap] = {
    var (t1, t2, t3) =
      if (slots.exists()) slots.get() else (-1L, -1L, -1L)
    rows.toSeq.sortBy(r => (r.tsu, r.event_type)).foreach { r =>
      if (t1 < 0) { if (r.event_type == "view") t1 = r.tsu }
      else if (t2 < 0) {
        if (r.event_type == "click" && r.tsu > t1) t2 = r.tsu
      } else if (t3 < 0) {
        if (r.event_type == "purchase" && r.tsu > t2) t3 = r.tsu
      }
    }
    slots.update((t1, t2, t3))
    def opt(v: Long): Option[Long] = if (v < 0) None else Some(v)
    Iterator(FunnelSnap(key, opt(t1), opt(t2), opt(t3)))
  }
}
