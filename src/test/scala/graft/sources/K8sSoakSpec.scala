package graft.sources

import graft.SparkSpec

/** Long-haul soak of the live watch path (round-9 stretch): one scripted
  * stub API server drives 200 watch lines through the full
  * source → WatchedService → tagged-versioned-gate pipeline, across
  * every lifecycle phase the reference's informer sees —
  * adds, updates, deletes, same-uid recreates — interleaved with the
  * reconnect flavors (clean server-side watch close after every
  * delivery, two forced 410 Gone → re-LIST recoveries redelivering the
  * live set at stale rvs). The invariant under all of it: the sink
  * holds EXACTLY ONE tagged record per (uid, rv), with the lifecycle
  * tag the reference's handler would emit (handler.go:26-69), and
  * re-lists/reconnects inject zero duplicates.
  */
class K8sSoakSpec extends SparkSpec {

  private def svcJson(rv: Long, uid: String, name: String): String =
    s"""{"metadata":{"uid":"$uid","resourceVersion":"$rv","name":"$name",
       |  "namespace":"default","labels":{"app":"$name"}},
       | "spec":{"selector":{"app":"$name"}}}""".stripMargin
      .replaceAll("\n\\s*", "")

  /** Scripted stub: WATCH serves the type-tagged script tail above the
    * requested rv then closes (every delivery = one reconnect); LIST
    * serves the LIVE object set (deletes removed) at current rvs — what
    * a periodic resync redelivers; `arm410` makes the next WATCH answer
    * 410 Gone (rv-loss recovery mid-soak). */
  private class ScriptedServer {
    import scala.jdk.CollectionConverters._
    val script = new java.util.concurrent.ConcurrentSkipListMap[Long, String]()
    private val live =
      new java.util.concurrent.ConcurrentSkipListMap[String, (Long, String)]()
    val watchRequests = new java.util.concurrent.atomic.AtomicInteger(0)
    val listRequests = new java.util.concurrent.atomic.AtomicInteger(0)
    private val next410 = new java.util.concurrent.atomic.AtomicBoolean(false)
    def arm410(): Unit = next410.set(true)

    def add(rv: Long, uid: String, name: String): Unit = {
      val j = svcJson(rv, uid, name)
      script.put(rv, s"""{"type":"ADDED","object":$j}""")
      live.put(uid, (rv, j))
    }
    def mod(rv: Long, uid: String, name: String): Unit = {
      val j = svcJson(rv, uid, name)
      script.put(rv, s"""{"type":"MODIFIED","object":$j}""")
      live.put(uid, (rv, j))
    }
    def del(rv: Long, uid: String, name: String): Unit = {
      val j = svcJson(rv, uid, name)
      script.put(rv, s"""{"type":"DELETED","object":$j}""")
      live.remove(uid)
    }

    private val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/api/v1/services", { ex =>
      val query = Option(ex.getRequestURI.getQuery).getOrElse("")
      if (query.contains("watch=true")) {
        watchRequests.incrementAndGet()
        if (next410.compareAndSet(true, false)) {
          ex.sendResponseHeaders(410, -1); ex.close()
        } else {
          val fromRv = query.split("&").collectFirst {
            case kv if kv.startsWith("resourceVersion=") =>
              kv.substring("resourceVersion=".length).toLong
          }.getOrElse(0L)
          val lines = script.tailMap(fromRv, false).values.asScala.mkString("\n")
          val body = (if (lines.isEmpty) "" else lines + "\n").getBytes("UTF-8")
          ex.sendResponseHeaders(200, if (body.isEmpty) -1 else body.length)
          if (body.nonEmpty) ex.getResponseBody.write(body)
          ex.close()
        }
      } else {
        listRequests.incrementAndGet()
        val maxRv = if (script.isEmpty) 0L else script.lastKey()
        val body =
          s"""{"kind":"ServiceList","metadata":{"resourceVersion":"$maxRv"},
             |"items":[${live.values.asScala.map(_._2).mkString(",")}]}"""
            .stripMargin.getBytes("UTF-8")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
        ex.close()
      }
    })
    srv.start()
    def url: String = s"http://127.0.0.1:${srv.getAddress.getPort}"
    def stop(): Unit = srv.stop(0)
  }

  private def awaitTrue(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (!cond && System.nanoTime() < deadline) Thread.sleep(25)
    cond
  }

  test("soak: 200 watch lines, >=2 reconnects, two 410 re-LIST recoveries — " +
    "exactly one tagged record per (uid, rv), reference lifecycle tags") {
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val srv = new ScriptedServer
    val src = spark.readStream
      .format("graft.sources.k8s.K8sServiceSource")
      .option("endpoint", srv.url)
      .load()
      .as(org.apache.spark.sql.Encoders.product[graft.k8s.WatchedService])
    val tagged = graft.streaming.StreamPipeline.dedupServicesWatchedTagged(src)
    val q = tagged.toDF()
      .select("service.uid", "service.resource_version", "tag")
      .writeStream.format("memory").queryName("soak")
      .outputMode("append").start()
    def drainTo(n: Long): Unit =
      assert(awaitTrue(60000) {
        q.processAllAvailable()
        spark.table("soak").count() == n
      }, s"expected $n rows, got ${spark.table("soak").count()}")
    // Force an rv-loss resync at a QUIESCENT point and wait for the
    // recovery LIST to finish before scripting more: a re-list that
    // races in-flight deletes can legitimately miss their watch lines
    // (the informer-vs-plain-HTTP list-diff divergence, noted in the
    // HttpWatchClient scaladoc) — at a phase boundary the redelivered
    // live set is wholly stale, so the gate must drop ALL of it.
    def forceRelist(): Unit = {
      val before = srv.listRequests.get()
      srv.arm410()
      assert(awaitTrue(30000)(srv.listRequests.get() > before),
        "410-triggered recovery LIST did not happen")
    }
    try {
      // Phase A — 60 first-ever adds (rv 1..60).
      for (i <- 1 to 60) srv.add(i.toLong, s"s$i", s"svc$i")
      drainTo(60)
      // Phase B — 60 modifications (rv 61..120).
      for (i <- 1 to 60) srv.mod(60L + i, s"s$i", s"svc$i-v2")
      drainTo(120)
      forceRelist() // rv loss #1: live set redelivered, all stale
      drainTo(120)  // ...and the gate dropped every redelivered row
      // Phase C — 30 deletes (rv 121..150).
      for (i <- 1 to 30) srv.del(120L + i, s"s$i", s"svc$i-v2")
      drainTo(150)
      // Phase D — the 30 deleted uids RECREATED (rv 151..180): state
      // was dropped at delete, so these must tag as adds again.
      for (i <- 1 to 30) srv.add(150L + i, s"s$i", s"svc$i-v3")
      drainTo(180)
      forceRelist() // rv loss #2, after deletes+recreates
      drainTo(180)
      // Phase E — 20 more modifications on survivors (rv 181..200).
      for (i <- 31 to 50) srv.mod(150L + i, s"s$i", s"svc$i-v3")
      drainTo(200)

      val rows = spark.table("soak").collect()
        .map(r => (r.getString(0), r.getString(1).toLong, r.getString(2)))
      // Exactly one record per (uid, rv) — across clean reconnects, the
      // 410 re-list, and every periodic resync redelivery.
      assert(rows.length == 200)
      assert(rows.map(r => (r._1, r._2)).distinct.length == 200,
        "duplicate (uid, rv) records leaked through a reconnect/relist")
      // Reference lifecycle tags, phase by phase (rv encodes the phase).
      val byRv = rows.map(r => r._2 -> (r._1, r._3)).toMap
      for (i <- 1 to 60)
        assert(byRv(i.toLong) == (s"s$i", "addedService"), s"rv=$i")
      for (i <- 1 to 60)
        assert(byRv(60L + i) == (s"s$i", "updatedService"), s"rv=${60 + i}")
      for (i <- 1 to 30)
        assert(byRv(120L + i) == (s"s$i", "deletedService"), s"rv=${120 + i}")
      for (i <- 1 to 30)
        assert(byRv(150L + i) == (s"s$i", "addedService"), s"rv=${150 + i}")
      for (i <- 31 to 50)
        assert(byRv(150L + i) == (s"s$i", "updatedService"), s"rv=${150 + i}")
      // The soak genuinely exercised the reconnect machinery.
      assert(srv.watchRequests.get() >= 2,
        s"expected >=2 watch connections, got ${srv.watchRequests.get()}")
      assert(srv.listRequests.get() >= 3, // initial + two 410 recoveries
        s"expected >=3 LISTs, got ${srv.listRequests.get()}")
    } finally { q.stop(); srv.stop() }
  }
}
