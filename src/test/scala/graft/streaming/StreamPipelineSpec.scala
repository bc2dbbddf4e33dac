package graft.streaming

import graft.SparkSpec
import graft.k8s._
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Incremental streaming behavior that final-state equivalence can't see
  * (SURVEY.md §5.2 item 4): per-micro-batch dedup, versioned state (D2),
  * watermark late-data drop. */
class StreamPipelineSpec extends SparkSpec {
  import spark.implicits._
  implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
  implicit val sp: org.apache.spark.sql.SparkSession = spark

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("D1 streaming: duplicate uid across micro-batches emits once") {
    val in = MemoryStream[(String, Timestamp)]
    val df = in.toDF().toDF("uid", "creationTimestamp")
    val q = StreamPipeline.dedupStream(df, "1 hour")
      .writeStream.format("memory").queryName("d1out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(("a", ts("2024-01-01 10:00:00")), ("b", ts("2024-01-01 10:01:00")))
      q.processAllAvailable()
      in.addData(("a", ts("2024-01-01 10:02:00")), ("c", ts("2024-01-01 10:03:00")))
      q.processAllAvailable()
      val got = spark.table("d1out").select("uid").as[String].collect().sorted
      assert(got.toSeq == Seq("a", "b", "c"))
    } finally q.stop()
  }

  test("D2 streaming: only strictly newer resourceVersions pass (numeric)") {
    val in = MemoryStream[KubeService]
    // NoTimeout here: an armed processing-time TTL makes the query fire on
    // every trigger (even data-less), which in this environment costs
    // dozens of chmod forks per empty batch (no native Hadoop lib →
    // Shell fallback) — pathological for a unit test. The TTL path is
    // production configuration; the version-compare logic is identical.
    val out = StreamPipeline.dedupServicesVersioned(in.toDS(), ttl = None)
    val q = out.writeStream.format("memory").queryName("d2out")
      .outputMode(OutputMode.Append).start()
    def svc(v: String) = KubeService("s1", v, "svc", "default", Map(), Map(), Map())
    try {
      in.addData(svc("2"))
      q.processAllAvailable()
      in.addData(svc("1"))          // stale → dropped
      q.processAllAvailable()
      in.addData(svc("10"))         // numerically newer ("10" < "2" lexically!)
      q.processAllAvailable()
      in.addData(svc("10"))         // equal → dropped
      q.processAllAvailable()
      val got = spark.table("d2out").select("resource_version").as[String].collect()
      assert(got.toSeq == Seq("2", "10"))
    } finally q.stop()
  }

  test("watermark: late data beyond the delay is dropped from window aggs") {
    val in = MemoryStream[(String, Timestamp)]
    val df = in.toDF().toDF("k", "ts")
    val agg = df.withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wmout")
      .outputMode(OutputMode.Update).start()
    try {
      in.addData(("a", ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      // advance watermark far past the 10:00 window
      in.addData(("b", ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      // late arrival for the 10:00 window — watermark is 11:50, dropped
      in.addData(("late", ts("2024-01-01 10:06:00")))
      q.processAllAvailable()
      val rows = spark.table("wmout")
        .groupBy("ws").agg(max("n").as("n"))
        .as[(Timestamp, Long)].collect().toMap
      assert(rows(ts("2024-01-01 10:00:00")) == 1)  // late row NOT counted
    } finally q.stop()
  }

  test("streaming session windows: merged sessions emit once the watermark passes") {
    val in = MemoryStream[(Long, Timestamp)]
    val agg = in.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("session_window.start").as("ws"), col("n"))
    val q = agg.writeStream.format("memory").queryName("sessout")
      .outputMode(OutputMode.Append).start()
    try {
      // session A: two events 10 min apart (merge); then a far-future
      // event pushes the watermark past A's end → A emits
      in.addData((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:10:00")))
      q.processAllAvailable()
      in.addData((1L, ts("2024-01-01 14:00:00")))
      q.processAllAvailable()
      val rows = spark.table("sessout")
        .as[(Long, Timestamp, Long)].collect()
      assert(rows.toSeq == Seq((1L, ts("2024-01-01 10:00:00"), 2L)))
    } finally q.stop()
  }

  test("full pipeline: filter → dedup → enrich → project → NDJSON sink") {
    val tmp = java.nio.file.Files.createTempDirectory("pipe").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val in = MemoryStream[KubeEvent]
    val objects = Seq(KubeObject("o1", "Pod", "default", "w",
      Map("app" -> "w"), Map(),
      """{"uid":"o1","name":"w","namespace":"default","start_time":"2024-01-01T09:00:00","ip":"1.2.3.4","host_ip":"5.6.7.8"}""")).toDF()
    val nodes = Seq(KubeNode("n1", Seq("5.6.7.8"))).toDF()
    val conf = GraftConfig(uid = "pipe", batchSize = 2, fileSinkDir = tmp)
    val q = StreamPipeline.run(in.toDF(), objects, nodes, conf, ckpt, triggerMs = Some(100))
    def ev(uid: String, ns: String) = KubeEvent(uid, ts("2024-01-01 10:00:00"),
      uid, ns, "Scheduled", s"m-$uid", "Normal", Some(1),
      ObjectRef("v1", "Pod", "w", ns, "1", "o1"), EventSource("kubelet", "n1"))
    try {
      in.addData(ev("a", "default"), ev("b", "default"), ev("c", "kube-system"))
      q.processAllAvailable()
    } finally q.stop()
    val written = spark.read.json(s"$tmp/pipe_*")
    assert(written.count() == 2)  // c filtered out
    val cols = written.columns.toSet
    assert(Set("id", "timestamp", "labels", "address", "pod", "version").subsetOf(cols))
    val a = written.filter(col("id") === "a")
      .select("labels.app", "address", "version").collect().head
    assert(a.getString(0) == "w")
    assert(a.getSeq[String](1) == Seq("5.6.7.8"))
    assert(a.getString(2) == L9Event.Version)
    // K1/K2 contract: the sink files carry the reference's .log
    // extension, not the text sink's .txt default.
    val names = new java.io.File(tmp).listFiles().flatMap(d =>
      Option(d.listFiles()).getOrElse(Array.empty)).map(_.getName)
    assert(names.exists(n => n.startsWith("part-") && n.endsWith(".log")),
      s"expected part-*.log files, got ${names.mkString(",")}")
  }

  test("full pipeline through the DSv2 streaming sink (runV2): " +
    "same records, epoch-committed gzip files, count cap holds") {
    val tmp = java.nio.file.Files.createTempDirectory("pipe2").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt2").toString
    val in = MemoryStream[KubeEvent]
    val objects = Seq(KubeObject("o1", "Pod", "default", "w",
      Map("app" -> "w"), Map(),
      """{"uid":"o1","name":"w","namespace":"default","start_time":"2024-01-01T09:00:00","ip":"1.2.3.4","host_ip":"5.6.7.8"}""")).toDF()
    val nodes = Seq(KubeNode("n1", Seq("5.6.7.8"))).toDF()
    val conf = GraftConfig(uid = "pipe2", batchSize = 2, fileSinkDir = tmp)
    val q = StreamPipeline.runV2(in.toDF(), objects, nodes, conf, ckpt,
      triggerMs = Some(100))
    def ev(uid: String, ns: String) = KubeEvent(uid, ts("2024-01-01 10:00:00"),
      uid, ns, "Scheduled", s"m-$uid", "Normal", Some(1),
      ObjectRef("v1", "Pod", "w", ns, "1", "o1"), EventSource("kubelet", "n1"))
    try {
      // 3 eligible events with cap 2 → the connector must roll chunks.
      in.addData(ev("a", "default"), ev("b", "default"),
        ev("d", "default"), ev("c", "kube-system"))
      q.processAllAvailable()
    } finally q.stop()
    val outDir = s"$tmp/pipe2"
    val written = spark.read.json(outDir)
    assert(written.count() == 3) // c filtered out (kube-system)
    assert(written.filter(col("id") === "a")
      .select("labels.app").as[String].head() == "w")
    val names = new java.io.File(outDir).listFiles().map(_.getName)
      .filter(_.startsWith("part-"))
    assert(names.forall(_.endsWith(".log.gz")), names.mkString(","))
    // batch_size law inside the connector: no file exceeds 2 records.
    for (n <- names) {
      val c = spark.read.json(s"$outDir/$n").count()
      assert(c <= 2, s"$n holds $c rows > batchSize cap")
    }
  }

  test("service-side pipeline (runServices): versioned gate tags " +
    "added/updated lifecycle, P4 projection lands L9 service events") {
    val ckpt = java.nio.file.Files.createTempDirectory("ckpts").toString
    val in = MemoryStream[KubeService]
    val pods = Seq(KubePod("p1", "web-0", "default", Map("app" -> "web"),
      ts("2024-01-01 09:00:00"), "1.2.3.4", "5.6.7.8")).toDF()
    val conf = GraftConfig(uid = "svcuid", sink = "memory", batchSize = 10)
    graft.sinks.MemoryBatchSink.clear("svcuid")
    def svc(rv: String) = KubeService("s1", rv, "web", "default",
      Map("app" -> "web"), Map(), Map("app" -> "web"))
    val q = StreamPipeline.runServices(in.toDS(), pods, conf, ckpt,
      triggerMs = Some(100))
    try {
      in.addData(svc("2"))
      q.processAllAvailable() // first sight of s1 → addedService
      in.addData(svc("1"), svc("7")) // stale dropped; newer → updated
      q.processAllAvailable()
    } finally q.stop()
    val lines = graft.sinks.MemoryBatchSink.batches("svcuid")
      .flatMap(_._2).flatten
    assert(lines.size == 2, s"added + updated expected, got $lines")
    assert(lines.exists(l => l.contains("\"id\":\"s1-2\"") &&
      l.contains("\"reason\":\"addedService\"")), lines.mkString("\n"))
    assert(lines.exists(l => l.contains("\"id\":\"s1-7\"") &&
      l.contains("\"reason\":\"updatedService\"")), lines.mkString("\n"))
    // the selector-matched pod map rides in the P4 projection
    assert(lines.forall(_.contains("\"web-0\"")), "pod map missing")
  }

  test("live service pipeline (runServicesWatched): a DELETED watch line " +
    "yields exactly one deletedService L9 record; re-add after delete " +
    "tags as addedService again") {
    val ckpt = java.nio.file.Files.createTempDirectory("ckptw").toString
    val in = MemoryStream[WatchedService]
    val pods = Seq(KubePod("p1", "web-0", "default", Map("app" -> "web"),
      ts("2024-01-01 09:00:00"), "1.2.3.4", "5.6.7.8")).toDF()
    val conf = GraftConfig(uid = "wsvcuid", sink = "memory", batchSize = 10)
    graft.sinks.MemoryBatchSink.clear("wsvcuid")
    def svc(rv: String, watchType: String) = WatchedService("s1", rv, "web",
      "default", Map("app" -> "web"), Map(), Map("app" -> "web"), watchType)
    val q = StreamPipeline.runServicesWatched(in.toDS(), pods, conf, ckpt,
      triggerMs = Some(100))
    try {
      in.addData(svc("2", "ADDED"))
      q.processAllAvailable()
      in.addData(svc("5", "MODIFIED"), svc("5", "MODIFIED")) // dup rv dropped
      q.processAllAvailable()
      in.addData(svc("9", "DELETED"), svc("9", "DELETED")) // gate: emit ONCE
      q.processAllAvailable()
      // OnDelete dropped the state: the recreated service is an add again
      in.addData(svc("12", "ADDED"))
      q.processAllAvailable()
    } finally q.stop()
    val lines = graft.sinks.MemoryBatchSink.batches("wsvcuid")
      .flatMap(_._2).flatten
    def reasons(r: String) = lines.count(_.contains(s""""reason":"$r""""))
    assert(lines.size == 4, s"add/update/delete/re-add expected, got $lines")
    assert(reasons("deletedService") == 1, lines.mkString("\n"))
    assert(reasons("addedService") == 2, lines.mkString("\n"))
    assert(reasons("updatedService") == 1, lines.mkString("\n"))
    assert(lines.exists(l => l.contains("\"id\":\"s1-9\"") &&
      l.contains("\"reason\":\"deletedService\"")), lines.mkString("\n"))
  }

  test("runFromConfig: JSON config file drives the full pipeline end-to-end") {
    val ckpt = java.nio.file.Files.createTempDirectory("ckptc").toString
    val cfg = java.nio.file.Files.createTempFile("graft", ".json")
    java.nio.file.Files.write(cfg,
      """{"config": {"uid": "cfguid", "sink": "memory", "batch_size": 2,
        |  "batch_interval": 30}, "namespaces": ["default"]}"""
        .stripMargin.getBytes("UTF-8"))
    val in = MemoryStream[KubeEvent]
    val objects = Seq(KubeObject("o1", "Pod", "default", "w",
      Map("app" -> "w"), Map(), "{}")).toDF()
    val nodes = Seq(KubeNode("n1", Seq("5.6.7.8"))).toDF()
    graft.sinks.MemoryBatchSink.clear("cfguid")
    val q = StreamPipeline.runFromConfig(cfg.toString, in.toDF(), objects,
      nodes, ckpt, triggerMs = Some(100))
    def ev(uid: String, ns: String) = KubeEvent(uid, ts("2024-01-01 10:00:00"),
      uid, ns, "Scheduled", s"m-$uid", "Normal", Some(1),
      ObjectRef("v1", "Pod", "w", ns, "1", "o1"), EventSource("kubelet", "n1"))
    try {
      // the config's namespace whitelist must reach the filter
      in.addData(ev("a", "default"), ev("b", "other"))
      q.processAllAvailable()
    } finally q.stop()
    val lines = graft.sinks.MemoryBatchSink.batches("cfguid").flatMap(_._2).flatten
    assert(lines.size == 1, s"whitelist should pass only ns=default, got $lines")
    assert(lines.head.contains("\"id\":\"a\""))
    // an invalid file surfaces the collected validation errors
    java.nio.file.Files.write(cfg, """{"config": {"sink": "nope"}}""".getBytes("UTF-8"))
    val e = intercept[GraftConfigException] {
      StreamPipeline.runFromConfig(cfg.toString, in.toDF(), objects, nodes, ckpt)
    }
    assert(e.errors.size == 2) // missing uid + unknown sink
  }

  test("sink=memory dispatches batches to the driver-held memory sink (K3)") {
    val ckpt = java.nio.file.Files.createTempDirectory("ckptm").toString
    val in = MemoryStream[KubeEvent]
    val objects = Seq(KubeObject("o1", "Pod", "default", "w",
      Map("app" -> "w"), Map(), "{}")).toDF()
    val nodes = Seq(KubeNode("n1", Seq("5.6.7.8"))).toDF()
    val conf = GraftConfig(uid = "memuid", sink = "memory", batchSize = 2)
    graft.sinks.MemoryBatchSink.clear("memuid")
    val q = StreamPipeline.run(in.toDF(), objects, nodes, conf, ckpt, triggerMs = Some(100))
    def ev(uid: String) = KubeEvent(uid, ts("2024-01-01 10:00:00"),
      uid, "default", "Scheduled", s"m-$uid", "Normal", Some(1),
      ObjectRef("v1", "Pod", "w", "default", "1", "o1"), EventSource("kubelet", "n1"))
    try {
      in.addData(ev("a"), ev("b"), ev("c"))
      q.processAllAvailable()
    } finally q.stop()
    val got = graft.sinks.MemoryBatchSink.batches("memuid")
    val lines = got.flatMap(_._2).flatten
    assert(lines.size == 3, s"expected 3 NDJSON lines, got ${lines.size}")
    // W1 count cap applies to the memory sink's chunks too.
    assert(got.flatMap(_._2).forall(_.size <= 2))
    assert(lines.forall(_.contains("\"version\":\"" + L9Event.Version + "\"")))
  }

  test("checkpoint restart: dedup state survives stop/start (X1 recovery, no re-emit)") {
    // File source + file sink: both are checkpoint-recoverable (the
    // memory sink is not), so this exercises the real X1 story — state
    // AND source progress recovered, duplicate seen after restart
    // suppressed by the recovered dedup store.
    val srcDir = java.nio.file.Files.createTempDirectory("rsrc").toString
    val outDir = java.nio.file.Files.createTempDirectory("rout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("rckpt").toString
    def writeBatch(tag: String, rows: Seq[(String, String)]): Unit = {
      val lines = rows.map { case (u, t) => s"""{"uid":"$u","creationTimestamp":"$t"}""" }
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$srcDir/$tag.json"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    def startQuery() = {
      val src = spark.readStream
        .schema("uid STRING, creationTimestamp TIMESTAMP").json(srcDir)
      StreamPipeline.dedupStream(src, "1 hour")
        .writeStream.format("json").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
    }
    writeBatch("b1", Seq("a" -> "2024-01-01T10:00:00", "b" -> "2024-01-01T10:01:00"))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    // Restart from the same checkpoint; the new file replays uid "a".
    writeBatch("b2", Seq("a" -> "2024-01-01T10:02:00", "c" -> "2024-01-01T10:03:00"))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val uids = spark.read
      .schema("uid STRING, creationTimestamp TIMESTAMP").json(outDir)
      .select("uid").as[String].collect().sorted.toSeq
    assert(uids == Seq("a", "b", "c"),
      s"expected the restarted query to suppress the replayed uid: $uids")
  }
}
