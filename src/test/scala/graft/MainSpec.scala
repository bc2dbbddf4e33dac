package graft

import graft.k8s.{EventSource, KubeEvent, ObjectRef}
import graft.sources.k8s.FileWatchClient
import java.nio.file.Files

/** The executable entry end-to-end: config file + watch file in, NDJSON
  * records out of the configured sink — the `k8stream --config` run a
  * migrating user performs first. */
class MainSpec extends SparkSpec {

  test("Main.run: config + watch replay lands filtered events in the memory sink") {
    val cfg = Files.createTempFile("graft-main", ".json")
    Files.write(cfg,
      """{"config": {"uid": "mainuid", "sink": "memory", "batch_size": 5,
        |  "batch_interval": 30}, "namespaces": ["default"]}"""
        .stripMargin.getBytes("UTF-8"))
    val watch = Files.createTempDirectory("mainwatch").resolve("w.ndjson")
    def ev(uid: String, ns: String) = KubeEvent(uid,
      java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), uid, ns,
      "Scheduled", s"m-$uid", "Normal", Some(1),
      ObjectRef("v1", "Pod", "p", ns, "1", s"o-$uid"),
      EventSource("kubelet", "n1"))
    Files.write(watch, Seq(
      FileWatchClient.toLine(1, ev("a", "default")),
      FileWatchClient.toLine(2, ev("b", "kube-system")), // filtered out
      FileWatchClient.toLine(3, ev("c", "default"))).mkString("\n").getBytes("UTF-8"))

    graft.sinks.MemoryBatchSink.clear("mainuid")
    val q = Main.run(spark, Map(
      "config" -> cfg.toString,
      "watch" -> watch.toString,
      "checkpoint" -> Files.createTempDirectory("mainck").toString))
    try q.processAllAvailable() finally q.stop()

    val lines = graft.sinks.MemoryBatchSink.batches("mainuid").flatMap(_._2).flatten
    assert(lines.size == 2, s"namespace whitelist should keep a+c, got $lines")
    assert(lines.forall(_.contains("\"version\":\"" + graft.k8s.L9Event.Version + "\"")))
    assert(lines.exists(_.contains("\"id\":\"a\"")) &&
      lines.exists(_.contains("\"id\":\"c\"")))
  }

  test("Main.run: missing --config is an argument error; config-only mode " +
    "resolves the live path (missing file / no kubeconfig fail loudly)") {
    intercept[IllegalArgumentException] { Main.run(spark, Map.empty) }
    // config-only is now the live entry: a bad path is a file error
    intercept[java.nio.file.NoSuchFileException] {
      Main.run(spark, Map("config" -> "/tmp/nope.json"))
    }
    // a valid config with no kubeconfig outside a cluster: in-cluster
    // resolution fails loudly (KUBERNETES_SERVICE_HOST unset here)
    val cfg = Files.createTempFile("graft-live-main", ".json")
    Files.write(cfg,
      """{"config": {"uid": "u", "sink": "memory"}}""".getBytes("UTF-8"))
    intercept[IllegalStateException] {
      Main.run(spark, Map("config" -> cfg.toString))
    }
  }
}
