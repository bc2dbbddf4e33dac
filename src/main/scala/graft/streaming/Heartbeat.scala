package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Heartbeat / remote-kill analog (SURVEY.md §2.1 X2; reference
  * io/heartbeat.go:17-60): the reference pings a hook every interval and
  * self-kills on HTTP 426. Spark-side, the natural shape is a
  * StreamingQueryListener — `hook` receives each progress report (JSON,
  * carrying query id, batch id, rates) and returning false requests a
  * graceful stop of that query (the 426 path). The hook is by design a
  * network call, so the WHOLE handling — hook plus stop — runs on a
  * dedicated single thread: listeners must never block the shared
  * listener bus (a slow endpoint would otherwise fill the bounded event
  * queue and Spark would drop progress events for every listener,
  * including the one carrying the kill signal). Single-threaded, so
  * progress reports still reach the hook in order.
  */
class Heartbeat(spark: SparkSession, hook: String => Boolean)
    extends StreamingQueryListener {

  private val exec = java.util.concurrent.Executors.newSingleThreadExecutor(
    (r: Runnable) => {
      val t = new Thread(r, "graft-heartbeat")
      t.setDaemon(true)
      t
    })

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val json = e.progress.json
    val id = e.progress.id
    exec.execute(() =>
      if (!hook(json)) {
        val q = spark.streams.get(id)
        if (q != null) q.stop()
      })
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
