package graft.sources

import graft.SparkSpec
import graft.k8s.{EventSource, KubeEvent, ObjectRef}
import graft.sources.k8s.{FileWatchClient, K8sEventSource}
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.sql.Timestamp

/** The DataSourceV2 K8s watch source: resourceVersion offsets, replay
  * of appended records, stale-rv skipping. */
class K8sSourceSpec extends SparkSpec {

  private def ev(uid: String) = KubeEvent(uid,
    Timestamp.valueOf("2024-01-01 10:00:00"), uid, "default", "Scheduled",
    s"m-$uid", "Normal", Some(1),
    ObjectRef("v1", "Pod", "p", "default", "1", s"o-$uid"),
    EventSource("kubelet", "n1"))

  private def append(path: String, lines: String*): Unit =
    Files.write(Paths.get(path),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  test("micro-batches follow resourceVersion offsets; stale rvs are skipped") {
    val file = Files.createTempDirectory("k8ssrc").resolve("watch.ndjson").toString
    append(file,
      FileWatchClient.toLine(1, ev("a")),
      FileWatchClient.toLine(2, ev("b")),
      FileWatchClient.toLine(3, ev("c")))
    val q = spark.readStream
      .format(classOf[K8sEventSource].getName)
      .option("path", file)
      .load()
      .writeStream.format("memory").queryName("k8ssrc")
      .start()
    try {
      q.processAllAvailable()
      val first = spark.table("k8ssrc").select("uid").collect().map(_.getString(0)).sorted
      assert(first.toSeq == Seq("a", "b", "c"))
      // rv=2 is stale (≤ committed offset 3) → skipped; rv=5 is new
      append(file,
        FileWatchClient.toLine(2, ev("stale")),
        FileWatchClient.toLine(5, ev("d")))
      q.processAllAvailable()
      val all = spark.table("k8ssrc").select("uid").collect().map(_.getString(0)).sorted
      assert(all.toSeq == Seq("a", "b", "c", "d"))
    } finally q.stop()
  }

  test("schema matches the consumed v1.Event subset and fields round-trip") {
    val file = Files.createTempDirectory("k8ssrc2").resolve("watch.ndjson").toString
    append(file, FileWatchClient.toLine(7, ev("x")))
    val q = spark.readStream
      .format(classOf[K8sEventSource].getName)
      .option("path", file)
      .load()
      .writeStream.format("memory").queryName("k8ssrc2")
      .start()
    try {
      q.processAllAvailable()
      val row = spark.table("k8ssrc2").collect().head
      val df = spark.table("k8ssrc2")
      assert(df.columns.toSet == Set("uid", "creationTimestamp", "name",
        "namespace", "reason", "message", "eventType", "count",
        "involvedObject", "source"))
      assert(row.getAs[String]("uid") == "x")
      assert(row.getAs[org.apache.spark.sql.Row]("involvedObject")
        .getAs[String]("kind") == "Pod")
      assert(row.getAs[Timestamp]("creationTimestamp") ==
        Timestamp.valueOf("2024-01-01 10:00:00"))
    } finally q.stop()
  }
}
