package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** X2: heartbeat pings per progress report; hook returning false stops
  * the query (the reference's HTTP-426 remote-kill path). */
class HeartbeatSpec extends SparkSpec {
  import spark.implicits._
  implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("hook gets progress JSON; returning false stops the query") {
    val pings = new AtomicInteger(0)
    val listener = Heartbeat.attach(spark, { json =>
      assert(json.contains("\"id\""))
      pings.incrementAndGet() < 2  // kill on the 2nd ping
    })
    try {
      val in = MemoryStream[(String, Timestamp)]
      val q = in.toDF().toDF("k", "ts")
        .writeStream.format("memory").queryName("hbout")
        .trigger(Trigger.ProcessingTime(100))
        .start()
      // progress events only fire for batches with work — feed two
      in.addData(("a", Timestamp.valueOf("2024-01-01 10:00:00")))
      q.processAllAvailable()
      in.addData(("b", Timestamp.valueOf("2024-01-01 10:01:00")))
      try q.processAllAvailable() catch { case _: Throwable => () } // may race the stop
      val stopped = q.awaitTermination(30000)
      assert(stopped, "query should have been stopped by the heartbeat")
      assert(pings.get() >= 2)
    } finally spark.streams.removeListener(listener)
  }

  // ---- the HTTP hook itself, against a local stub server (the shape of
  // the reference's own heartbeat test, io/heartbeat_test.go:16-67) ----

  /** One-endpoint stub: records each request URI, answers `status`. */
  private def withStubServer(status: Int)(
      body: (String, java.util.concurrent.ConcurrentLinkedQueue[String]) => Unit): Unit = {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/hook", { ex =>
      seen.add(ex.getRequestURI.toString)
      ex.sendResponseHeaders(status, -1)
      ex.close()
    })
    srv.start()
    try body(s"http://127.0.0.1:${srv.getAddress.getPort}/hook", seen)
    finally srv.stop(0)
  }

  test("httpHook GETs hook?uid&version; non-426 continues") {
    withStubServer(200) { (url, seen) =>
      val hook = Heartbeat.httpHook(url, "uid-1", "v0.9", timeoutMs = 2000)
      assert(hook("ignored"), "200 must mean keep running")
      val uri = seen.poll()
      assert(uri != null && uri.contains("uid=uid-1") && uri.contains("version=v0.9"),
        s"hook must carry uid+version query params, got $uri")
    }
  }

  test("httpHook returns false on HTTP 426 (remote kill)") {
    withStubServer(426) { (url, _) =>
      val hook = Heartbeat.httpHook(url, "uid-1", "v0.9", timeoutMs = 2000)
      assert(!hook(""), "426 is the kill signal")
    }
  }

  test("httpHook survives an unreachable endpoint (log-and-continue)") {
    // bind-then-close yields a port nothing listens on
    val sock = new java.net.ServerSocket(0)
    val deadPort = sock.getLocalPort
    sock.close()
    val hook = Heartbeat.httpHook(
      s"http://127.0.0.1:$deadPort/hook", "u", "v", timeoutMs = 500)
    assert(hook(""), "transport errors must not kill the pipeline")
  }

  test("startPeriodic pings on the ticker and 426 stops active queries") {
    withStubServer(426) { (url, seen) =>
      val conf = graft.k8s.GraftConfig(uid = "hb-per",
        heartbeatHook = url, heartbeatIntervalSec = 1, heartbeatTimeoutMs = 2000)
      val in = MemoryStream[(String, Timestamp)]
      val q = in.toDF().toDF("k", "ts")
        .writeStream.format("memory").queryName("hbper")
        .trigger(Trigger.ProcessingTime(100))
        .start()
      val ticker = Heartbeat.startPeriodic(spark, conf, "v1")
      try {
        in.addData(("a", Timestamp.valueOf("2024-01-01 10:00:00")))
        val stopped = q.awaitTermination(30000)
        assert(stopped, "426 on the periodic hook should stop the query")
        assert(!seen.isEmpty, "the ticker should have pinged the hook")
      } finally { ticker.close(); if (q.isActive) q.stop() }
    }
  }

  test("startPeriodic is a no-op when the hook is unset") {
    val conf = graft.k8s.GraftConfig(uid = "hb-off")
    val h = Heartbeat.startPeriodic(spark, conf, "v1")
    h.close() // must not throw; nothing scheduled
  }
}
