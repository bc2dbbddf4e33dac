package graft.tools

import graft.k8s.{GraftConfig, KubeNode, KubeObject, KubePod}
import graft.streaming.{Heartbeat, StreamPipeline}
import org.apache.spark.sql.SparkSession

/** Live-HTTP soak harness for BOTH halves of the watch pipeline — the
  * datapoints file replay cannot produce, as a library-scope runner so
  * [[graft.Bench]] can record them machine-readably every round
  * (`live_eps` / `service_eps` in BENCH_DETAIL.json) instead of a
  * prose row in COVERAGE.md.
  *
  * Event half (reference main.go:88-90 event informer): stub API
  * server → HttpWatchClient LIST+WATCH → K8sEventSource micro-batches
  * (admission-controlled) → eligible filter → watermarked dedup →
  * enrich → L9 projection → memory sink.
  *
  * Service half (reference main.go service informer → handler.go:95-115
  * version gate → event_service.go projection): stub server →
  * K8sServiceSource (WatchedService carrier) → fMGWS tagged version
  * gate → P4 projection with the selector-matched pod map → sink.
  *
  * The stub server is the same scripted LIST/WATCH shape as
  * K8sSourceSpec's: WATCH streams buffered lines above the requested
  * rv in ≤50k-line chunks then closes (the client's resync loop
  * reconnects — included in the measured path); LIST returns the full
  * store with its max rv. Metric = SUSTAINED events/s from query start
  * to last eligible record landed while a feeder thread keeps
  * appending at far-above-consumption offered load.
  */
object LiveSoak {

  /** `secs` is wall time from query start to last record landed;
    * `firstN`/`firstSecs` snapshot the first moment ANY record had
    * landed. `eps` divides by the whole wall — it carries the one-time
    * ramp (stream start, LIST, first-batch codegen/JIT: ~8 s on this
    * harness, profiled round 15), so it is N-dependent and understates
    * the pipeline on small soaks. `sustainedEps` is the steady-state
    * rate over the first-landed → last-landed window — the number the
    * BASELINE.md §B.1 floor is pinned against. */
  final case class SoakResult(landed: Long, offered: Int, secs: Double,
      heartbeats: Int, firstN: Long = 0L, firstSecs: Double = 0.0) {
    def eps: Long = if (secs > 0) (landed / secs).toLong else 0L
    def sustainedEps: Long =
      if (secs > firstSecs && landed > firstN)
        ((landed - firstN) / (secs - firstSecs)).toLong
      else eps
  }

  /** Scripted LIST+WATCH stub serving /api/v1/events and
    * /api/v1/services from rv-keyed (watchType, objectJson) stores. */
  final class StubApiServer {
    import scala.jdk.CollectionConverters._
    type Store = java.util.concurrent.ConcurrentSkipListMap[Long, (String, String)]
    val events: Store = new Store
    val services: Store = new Store
    private val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    private val pool = java.util.concurrent.Executors.newFixedThreadPool(4,
      r => { val t = new Thread(r, "soak-stub-http"); t.setDaemon(true); t })
    srv.setExecutor(pool)

    private def handler(store: Store, listKind: String)
        : com.sun.net.httpserver.HttpHandler = { ex =>
      val query = Option(ex.getRequestURI.getQuery).getOrElse("")
      if (query.contains("watch=true")) {
        val fromRv = query.split("&").collectFirst {
          case kv if kv.startsWith("resourceVersion=") =>
            kv.substring("resourceVersion=".length).toLong
        }.getOrElse(0L)
        // Chunked watch responses (a real API server chunks too) — the
        // client reconnects for the rest, so the resync loop is
        // exercised continuously and no response materializes the
        // whole backlog as one string.
        val lines = store.tailMap(fromRv, false).values.asScala
          .take(50000)
          .map { case (t, j) => s"""{"type":"$t","object":$j}""" }
          .mkString("\n")
        val body = (if (lines.isEmpty) "" else lines + "\n").getBytes("UTF-8")
        ex.sendResponseHeaders(200, if (body.isEmpty) -1 else body.length)
        if (body.nonEmpty) ex.getResponseBody.write(body)
        ex.close()
      } else {
        val maxRv = if (store.isEmpty) 0L else store.lastKey()
        val body =
          s"""{"kind":"$listKind","metadata":{"resourceVersion":"$maxRv"},
             |"items":[${store.values.asScala.map(_._2).mkString(",")}]}"""
            .stripMargin.getBytes("UTF-8")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
        ex.close()
      }
    }
    srv.createContext("/api/v1/events", handler(events, "EventList"))
    srv.createContext("/api/v1/services", handler(services, "ServiceList"))
    srv.start()
    def url: String = s"http://127.0.0.1:${srv.getAddress.getPort}"
    def stop(): Unit = { srv.stop(0); pool.shutdownNow() }
  }

  def eventJson(rv: Long, uid: String, ns: String): String =
    s"""{"metadata":{"uid":"$uid","resourceVersion":"$rv","name":"e$rv",
       |  "namespace":"$ns","creationTimestamp":"2024-01-01T10:00:00Z"},
       | "involvedObject":{"apiVersion":"v1","kind":"Pod","name":"w",
       |  "namespace":"$ns","resourceVersion":"1","uid":"o1"},
       | "reason":"Scheduled","message":"m-$uid","type":"Normal","count":1,
       | "lastTimestamp":"2024-01-01T10:00:00Z",
       | "source":{"component":"kubelet","host":"n1"}}""".stripMargin
      .replaceAll("\n\\s*", "")

  def serviceJson(rv: Long, uid: String, ns: String): String =
    s"""{"metadata":{"uid":"$uid","resourceVersion":"$rv","name":"svc-$uid",
       |  "namespace":"$ns","labels":{"app":"w"}},
       | "spec":{"selector":{"app":"w"}}}""".stripMargin
      .replaceAll("\n\\s*", "")

  /** EVENT-half soak: returns when all eligible events have landed on
    * the memory sink (or the 600 s deadline passes — then it throws). */
  def runEvents(spark: SparkSession, total: Int,
      chunk: Int = 5000): SoakResult = {
    // Isolated sub-session (shared SparkContext, own SQL conf): the
    // stateful stages' shuffle-partition count is fixed at query start
    // from the session conf, and 32 state partitions per ≤20k-row
    // micro-batch spend more wall time on per-partition state-store
    // commits than on rows (profiled round 15: 8 partitions sustain
    // 11.6k eps where 32 sustain 9.0k on the same host). 8 is the
    // control-plane-volume tune a production deploy would set; the
    // outer session's conf is untouched.
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    import ss.implicits._
    val srv = new StubApiServer
    try {
      // ~5% in a blacklisted namespace so the eligibility filter
      // genuinely filters; the rest enrich against the dims below.
      val expectEligible = (1 to total).count(_ % 20 != 0)
      val lines = (1 to total).map { i =>
        val ns = if (i % 20 == 0) "kube-system" else "default"
        (i.toLong, ("ADDED", eventJson(i.toLong, s"u$i", ns)))
      }
      val objects = Seq(KubeObject("o1", "Pod", "default", "w",
        Map("app" -> "w"), Map(),
        """{"uid":"o1","name":"w","namespace":"default","start_time":"2024-01-01T09:00:00","ip":"1.2.3.4","host_ip":"5.6.7.8"}""")).toDF()
      val nodes = Seq(KubeNode("n1", Seq("5.6.7.8"))).toDF()
      val conf = GraftConfig(uid = "soak", sink = "memory",
        batchSize = 1000000, dedupTtlSec = 86400)
      val heartbeats = new java.util.concurrent.atomic.AtomicInteger(0)
      Heartbeat.attach(ss, { _ => heartbeats.incrementAndGet(); true })
      graft.sinks.MemoryBatchSink.clear("soak")
      val ckpt = java.nio.file.Files.createTempDirectory("soakckpt").toString
      val stream = ss.readStream
        .format(classOf[graft.sources.k8s.K8sEventSource].getName)
        .option("endpoint", srv.url)
        // reconnect fast after each watch close: measure the pipeline's
        // ceiling, not the reconnect backoff
        .option("resyncBackoffMs", "50")
        // a catch-up batch must not swallow the whole backlog in one
        // plan — state-store memory scales with batch size. 20k also
        // forces the soak into ≥5 micro-batches even though the stream's
        // ~8 s startup outlasts the feeder: with an uncapped trigger the
        // whole backlog lands as ONE batch and there is no steady state
        // to measure (profiled round 15).
        .option("maxEventsPerTrigger", "20000")
        .load()
      val q = StreamPipeline.run(stream, objects, nodes, conf, ckpt,
        triggerMs = Some(100))
      def landed(): Long = graft.sinks.MemoryBatchSink.batches("soak")
        .iterator.flatMap(_._2).map(_.size.toLong).sum
      val t0 = System.nanoTime()
      val feeder = feed(lines, srv.events, chunk)
      val (secs, firstN, firstSecs) =
        await(q, () => landed(), expectEligible, t0)
      feeder.join(1000)
      SoakResult(expectEligible, total, secs, heartbeats.get(),
        firstN, firstSecs)
    } finally srv.stop()
  }

  /** SERVICE-half soak: `uids` distinct services each receiving
    * total/uids MODIFIED updates with globally increasing rv — every
    * update passes the per-uid numeric version gate and lands one L9
    * record via the P4 projection (selector pod map included). ~5% of
    * updates hit a skip-listed namespace and are filtered at
    * projection, so the filter is genuinely exercised. */
  def runServices(spark: SparkSession, total: Int, uids: Int = 500,
      chunk: Int = 5000): SoakResult = {
    // Same sub-session state-partition tune as runEvents.
    val ss = spark.newSession()
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    import ss.implicits._
    val srv = new StubApiServer
    try {
      val expectEligible = (1 to total).count(_ % 20 != 0)
      val lines = (1 to total).map { i =>
        val ns = if (i % 20 == 0) "kube-system" else "default"
        (i.toLong, ("MODIFIED", serviceJson(i.toLong, s"s${i % uids}", ns)))
      }
      val pods = Seq(KubePod("p1", "web-0", "default", Map("app" -> "w"),
        java.sql.Timestamp.valueOf("2024-01-01 09:00:00"),
        "1.2.3.4", "5.6.7.8")).toDF()
      val conf = GraftConfig(uid = "svcsoak", sink = "memory",
        batchSize = 1000000, dedupTtlSec = 86400)
      val heartbeats = new java.util.concurrent.atomic.AtomicInteger(0)
      Heartbeat.attach(ss, { _ => heartbeats.incrementAndGet(); true })
      graft.sinks.MemoryBatchSink.clear("svcsoak")
      val ckpt = java.nio.file.Files.createTempDirectory("svcsoakckpt").toString
      val stream = ss.readStream
        .format(classOf[graft.sources.k8s.K8sServiceSource].getName)
        .option("endpoint", srv.url)
        .option("resyncBackoffMs", "50")
        // multi-batch steady state for the sustained metric (see the
        // event half's cap note)
        .option("maxEventsPerTrigger", "10000")
        .load()
        .as[graft.k8s.WatchedService]
      val q = StreamPipeline.runServicesWatched(stream, pods, conf, ckpt,
        triggerMs = Some(100))
      def landed(): Long = graft.sinks.MemoryBatchSink.batches("svcsoak")
        .iterator.flatMap(_._2).map(_.size.toLong).sum
      val t0 = System.nanoTime()
      val feeder = feed(lines, srv.services, chunk)
      val (secs, firstN, firstSecs) =
        await(q, () => landed(), expectEligible, t0)
      feeder.join(1000)
      SoakResult(expectEligible, total, secs, heartbeats.get(),
        firstN, firstSecs)
    } finally srv.stop()
  }

  /** Sustained drip at offered load far above consumption. */
  private def feed(lines: Seq[(Long, (String, String))],
      store: java.util.concurrent.ConcurrentSkipListMap[Long, (String, String)],
      chunk: Int): Thread = {
    val t = new Thread(() => {
      lines.grouped(chunk).foreach { g =>
        g.foreach { case (rv, v) => store.put(rv, v) }
        Thread.sleep(25)
      }
    }, "soak-feeder")
    t.setDaemon(true)
    t.start()
    t
  }

  /** Returns (totalSecs, firstLandedCount, firstLandedSecs): the first-
    * landed snapshot bounds the one-time ramp so sustainedEps measures
    * the steady state. The snapshot comes from a dedicated 20 ms-grained
    * monitor thread — the main loop's processAllAvailable() can block
    * through the entire run when the feeder outpaces consumption, so
    * sampling inside the loop would observe only the final count. */
  private def await(q: org.apache.spark.sql.streaming.StreamingQuery,
      landed: () => Long, expect: Long, t0: Long): (Double, Long, Double) = {
    val first = new java.util.concurrent.atomic.AtomicReference[(Long, Double)](null)
    val stopMon = new java.util.concurrent.atomic.AtomicBoolean(false)
    val mon = new Thread(() => {
      while (!stopMon.get() && first.get() == null) {
        // landed() iterates the live sink map — tolerate a concurrent-
        // modification race instead of silently losing the monitor
        val n = try landed() catch { case _: Throwable => 0L }
        if (n > 0) first.compareAndSet(null, (n, (System.nanoTime() - t0) / 1e9))
        else Thread.sleep(20)
      }
    }, "soak-first-landed-monitor")
    mon.setDaemon(true)
    mon.start()
    val deadline = System.nanoTime() + 600L * 1000000000L
    var done = landed()
    while (done < expect && System.nanoTime() < deadline) {
      q.processAllAvailable()
      done = landed()
      if (done < expect) Thread.sleep(50)
    }
    val secs = (System.nanoTime() - t0) / 1e9
    stopMon.set(true)
    mon.join(1000)
    q.stop()
    require(done == expect,
      s"soak incomplete: landed $done of $expect eligible records")
    val (firstN, firstSecs) = Option(first.get()).getOrElse((0L, 0.0))
    (secs, firstN, firstSecs)
  }
}
