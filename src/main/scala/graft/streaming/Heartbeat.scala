package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Heartbeat / remote-kill analog (SURVEY.md §2.1 X2; reference
  * io/heartbeat.go:17-60): the reference pings a hook every interval and
  * self-kills on HTTP 426. Spark-side, the natural shape is a
  * StreamingQueryListener — `hook` receives each progress report (JSON,
  * carrying query id, batch id, rates) and returning false requests a
  * graceful stop of that query (the 426 path). Stop runs on a separate
  * thread: listeners must never block the event bus.
  */
class Heartbeat(spark: SparkSession, hook: String => Boolean)
    extends StreamingQueryListener {

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    if (!hook(e.progress.json)) {
      val id = e.progress.id
      new Thread(() => {
        val q = spark.streams.get(id)
        if (q != null) q.stop()
      }, s"graft-heartbeat-kill-$id").start()
    }
  }
}

object Heartbeat {
  /** Attach a heartbeat to the session; returns the listener (detach with
    * spark.streams.removeListener). */
  def attach(spark: SparkSession, hook: String => Boolean): Heartbeat = {
    val h = new Heartbeat(spark, hook)
    spark.streams.addListener(h)
    h
  }
}
