package graft.streaming

import graft.k8s.{EventSource, GraftConfig, KubeEvent, KubeNode, KubeObject, ObjectRef}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** End-to-end batch latency probe for BASELINE.md §B: time from one
  * deploy-default batch (10,000 events) being available at the source to
  * its NDJSON sink files being durable, through the full
  * filter→dedup→enrich→project→window→sink pipeline (StreamPipeline.run).
  * The reference's envelope allows 30 s (`batch_interval`,
  * deploy/k8stream_sink_s3.yaml); Bench reports the measured value as
  * `batch_latency_sec`. */
object LatencyProbe {

  def measure(spark: SparkSession, n: Int = 10000): Double = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-lat-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-lat-ckpt").toString
    val in = MemoryStream[KubeEvent]
    val objects = Seq(KubeObject("o1", "Pod", "default", "w",
      Map("app" -> "w"), Map(),
      """{"uid":"o1","name":"w","namespace":"default","start_time":"2024-01-01T09:00:00","ip":"1.2.3.4","host_ip":"5.6.7.8"}""")).toDF()
    val nodes = Seq(KubeNode("n1", Seq("5.6.7.8"))).toDF()
    val conf = GraftConfig(uid = "lat", batchSize = 10000, fileSinkDir = tmp)
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    in.addData((1 to n).map(i => KubeEvent(s"u$i", base, s"u$i", "default",
      "Scheduled", s"m$i", "Normal", Some(1),
      ObjectRef("v1", "Pod", "w", "default", "1", "o1"),
      EventSource("kubelet", "n1"))))
    // Clock starts with the data already waiting (the reference's worst
    // case: a full buffer at flush time) and stops when the sink files
    // are on disk — processAllAvailable returns after the foreachBatch
    // (sink-before-state-commit) completes.
    val t0 = System.nanoTime()
    val q = StreamPipeline.run(in.toDF(), objects, nodes, conf, ckpt,
      triggerMs = Some(100))
    try q.processAllAvailable() finally q.stop()
    val dt = (System.nanoTime() - t0) / 1e9
    // The probe's sink + checkpoint are measurement scratch — delete
    // them, or every bench run leaks a 10k-line sink dir into /tmp.
    for (d <- Seq(tmp, ckpt)) try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(d)).iterator().asScala
        .toSeq.reverse.foreach(p => java.nio.file.Files.deleteIfExists(p))
    } catch { case _: Throwable => () }
    dt
  }
}
