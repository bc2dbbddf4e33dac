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

  /** The reference's HTTP heartbeat as a hook fn (io/heartbeat.go:35-57):
    * GET `hookUrl` with `uid` and `version` query params, per-request
    * timeout, and HTTP 426 (Upgrade Required) as the remote-kill signal —
    * 426 returns false (the listener stops the query, our analog of the
    * reference's SIGQUIT-self); any transport error or other status
    * returns true (the reference logs and continues, io/heartbeat.go:46-49).
    * Pure function of its config — HeartbeatSpec drives it against a local
    * stub server the way the reference tests do (io/heartbeat_test.go). */
  def httpHook(hookUrl: String, uid: String, version: String,
      timeoutMs: Int = 300): String => Boolean = {
    val sep = if (hookUrl.contains("?")) "&" else "?"
    def enc(s: String) =
      java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
    val uri = java.net.URI.create(
      s"$hookUrl${sep}uid=${enc(uid)}&version=${enc(version)}")
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs.toLong))
      .build()
    _ => try {
      val req = java.net.http.HttpRequest.newBuilder(uri)
        .timeout(java.time.Duration.ofMillis(timeoutMs.toLong))
        .GET().build()
      val resp = client.send(req,
        java.net.http.HttpResponse.BodyHandlers.discarding())
      resp.statusCode() != 426
    } catch { case _: Exception => true } // log-and-continue semantics
  }

  /** Interval-driven heartbeat with the reference's exact cadence
    * semantics (a ticker, io/heartbeat.go:33-36) rather than the
    * per-progress-report cadence of the listener: pings every
    * `heartbeatIntervalSec` independent of query progress, and on 426
    * stops EVERY active query (the analog of the reference's
    * process-wide SIGQUIT). No-op when the hook is unset, like the
    * reference (io/heartbeat.go:18-20). Returns a handle; close() stops
    * the ticker. */
  def startPeriodic(spark: SparkSession, conf: graft.k8s.GraftConfig,
      version: String): AutoCloseable = {
    if (conf.heartbeatHook.isEmpty) return () => ()
    val hook = httpHook(conf.heartbeatHook, conf.uid, version,
      conf.heartbeatTimeoutMs)
    val exec = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val t = new Thread(r, "graft-heartbeat-ticker")
        t.setDaemon(true)
        t
      })
    exec.scheduleAtFixedRate(() =>
      if (!hook("")) spark.streams.active.foreach { q =>
        try q.stop() catch { case _: Exception => () }
      },
      conf.heartbeatIntervalSec.toLong, conf.heartbeatIntervalSec.toLong,
      java.util.concurrent.TimeUnit.SECONDS)
    () => exec.shutdownNow()
  }
}
