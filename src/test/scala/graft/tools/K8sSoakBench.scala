package graft.tools

import graft.k8s.{GraftConfig, KubeNode, KubeObject}
import graft.streaming.{Heartbeat, StreamPipeline}
import org.apache.spark.sql.SparkSession

/** Soak-mode throughput bench for the LIVE Kubernetes watch path — the
  * datapoint file replay cannot produce: events flow through a real
  * HTTP LIST+WATCH loop (stub API server → HttpWatchClient →
  * K8sEventSource micro-batches → eligible filter → watermarked dedup →
  * enrich → L9 projection → memory sink) with the periodic heartbeat
  * listener attached, and the metric is SUSTAINED events/s from query
  * start to last event landed while a feeder thread keeps appending.
  *
  * Test scope on purpose: the scripted stub server is test
  * infrastructure (K8sSourceSpec's), and a bench that needs a fake API
  * server is a soak harness, not a library entry point.
  *
  *   sbt "Test/runMain graft.tools.K8sSoakBench [totalEvents]"
  *
  * Prints one JSON line: {"metric":"k8s_live_soak_eps",...}. Recorded
  * in COVERAGE.md next to the file-replay throughput row.
  */
object K8sSoakBench {

  private def eventJson(rv: Long, uid: String, ns: String): String =
    s"""{"metadata":{"uid":"$uid","resourceVersion":"$rv","name":"e$rv",
       |  "namespace":"$ns","creationTimestamp":"2024-01-01T10:00:00Z"},
       | "involvedObject":{"apiVersion":"v1","kind":"Pod","name":"w",
       |  "namespace":"$ns","resourceVersion":"1","uid":"o1"},
       | "reason":"Scheduled","message":"m-$uid","type":"Normal","count":1,
       | "lastTimestamp":"2024-01-01T10:00:00Z",
       | "source":{"component":"kubelet","host":"n1"}}""".stripMargin
      .replaceAll("\n\\s*", "")

  /** Same LIST/WATCH stub as K8sSourceSpec: WATCH streams the script
    * above the requested rv then closes (the client's resync loop
    * reconnects — included in the measured path). */
  private final class StubApiServer {
    import scala.jdk.CollectionConverters._
    val store = new java.util.concurrent.ConcurrentSkipListMap[Long, String]()
    private val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    private val pool = java.util.concurrent.Executors.newFixedThreadPool(2,
      r => { val t = new Thread(r, "soak-stub-http"); t.setDaemon(true); t })
    srv.setExecutor(pool)
    srv.createContext("/api/v1/events", { ex =>
      val query = Option(ex.getRequestURI.getQuery).getOrElse("")
      if (query.contains("watch=true")) {
        val fromRv = query.split("&").collectFirst {
          case kv if kv.startsWith("resourceVersion=") =>
            kv.substring("resourceVersion=".length).toLong
        }.getOrElse(0L)
        // Cap each watch response (a real API server chunks watch
        // streams too) — the client reconnects for the rest, so the
        // resync loop is exercised continuously, and no single response
        // materializes the whole backlog as one string.
        val lines = store.tailMap(fromRv, false).values.asScala
          .take(50000)
          .map(j => s"""{"type":"ADDED","object":$j}""").mkString("\n")
        val body = (if (lines.isEmpty) "" else lines + "\n").getBytes("UTF-8")
        ex.sendResponseHeaders(200, if (body.isEmpty) -1 else body.length)
        if (body.nonEmpty) ex.getResponseBody.write(body)
        ex.close()
      } else {
        val maxRv = if (store.isEmpty) 0L else store.lastKey()
        val body =
          s"""{"kind":"EventList","metadata":{"resourceVersion":"$maxRv"},
             |"items":[${store.values.asScala.mkString(",")}]}""".stripMargin
            .getBytes("UTF-8")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
        ex.close()
      }
    })
    srv.start()
    def url: String = s"http://127.0.0.1:${srv.getAddress.getPort}"
    def stop(): Unit = { srv.stop(0); pool.shutdownNow() }
  }

  def main(args: Array[String]): Unit = {
    val total = args.headOption.map(_.toInt).getOrElse(200000)
    val chunk = 5000
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val srv = new StubApiServer
    // ~5% of events land in a blacklisted namespace (kube-system) so the
    // eligibility filter genuinely filters; the rest enrich against the
    // object/node dims below. Pre-generate all JSON off the clock.
    val expectEligible = (1 to total).count(_ % 20 != 0)
    val lines = (1 to total).map { i =>
      val ns = if (i % 20 == 0) "kube-system" else "default"
      (i.toLong, eventJson(i.toLong, s"u$i", ns))
    }

    val objects = Seq(KubeObject("o1", "Pod", "default", "w",
      Map("app" -> "w"), Map(),
      """{"uid":"o1","name":"w","namespace":"default","start_time":"2024-01-01T09:00:00","ip":"1.2.3.4","host_ip":"5.6.7.8"}""")).toDF()
    val nodes = Seq(KubeNode("n1", Seq("5.6.7.8"))).toDF()
    val conf = GraftConfig(uid = "soak", sink = "memory",
      batchSize = 1000000, dedupTtlSec = 86400)
    val heartbeats = new java.util.concurrent.atomic.AtomicInteger(0)
    Heartbeat.attach(spark, { _ => heartbeats.incrementAndGet(); true })

    graft.sinks.MemoryBatchSink.clear("soak")
    val ckpt = java.nio.file.Files.createTempDirectory("soakckpt").toString
    val stream = spark.readStream
      .format(classOf[graft.sources.k8s.K8sEventSource].getName)
      .option("endpoint", srv.url)
      // high-churn pacing: reconnect fast after each watch close so the
      // measured ceiling is the pipeline's, not the reconnect backoff
      .option("resyncBackoffMs", "50")
      // bound each micro-batch's admitted volume: a catch-up batch must
      // not swallow the whole backlog in one plan (state-store memory
      // scales with batch size, not backlog size)
      .option("maxEventsPerTrigger", "100000")
      .load()
    val q = StreamPipeline.run(stream, objects, nodes, conf, ckpt,
      triggerMs = Some(100))

    def landed(): Long = graft.sinks.MemoryBatchSink.batches("soak")
      .iterator.flatMap(_._2).map(_.size.toLong).sum

    val t0 = System.nanoTime()
    // Feeder: sustained drip, ~chunk events per 25 ms offered load —
    // far above any plausible consumption rate, so the measured eps is
    // the pipeline's, not the feeder's.
    val feeder = new Thread(() => {
      lines.grouped(chunk).foreach { g =>
        g.foreach { case (rv, j) => srv.store.put(rv, j) }
        Thread.sleep(25)
      }
    }, "soak-feeder")
    feeder.setDaemon(true)
    feeder.start()

    val deadline = System.nanoTime() + 600L * 1000000000L
    var done = landed()
    while (done < expectEligible && System.nanoTime() < deadline) {
      q.processAllAvailable()
      done = landed()
      if (done < expectEligible) Thread.sleep(50)
    }
    val secs = (System.nanoTime() - t0) / 1e9
    q.stop(); srv.stop()
    require(done == expectEligible,
      s"soak incomplete: landed $done of $expectEligible eligible events")
    println(s"""{"metric":"k8s_live_soak_eps","value":${
        (done / secs).round},"unit":"events/sec","events":$done,""" +
      s""""offered":$total,"secs":${math.round(secs * 10) / 10.0},""" +
      s""""heartbeats":${heartbeats.get()}}""")
    spark.stop()
  }
}
