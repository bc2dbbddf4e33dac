package graft.k8s

import graft.{SparkSpec, Tables}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The v1.Event wire shape (FIXTURES.md §A.1 — the reference's
  * testdata/events.log layout, synthesized here, not copied): nested
  * `metadata` / `involvedObject` / `source` docs parsed by the schema'd
  * JSON source and projected into the pipeline's input columns. */
class WireFormatSpec extends SparkSpec {

  // per-item schema of an EventList `items` element (consumed subset +
  // the wire fields the reference ignores)
  private val wireSchema = StructType(Seq(
    StructField("metadata", StructType(Seq(
      StructField("uid", StringType), StructField("name", StringType),
      StructField("namespace", StringType),
      StructField("resourceVersion", StringType),
      StructField("creationTimestamp", TimestampType)))),
    StructField("involvedObject", StructType(Seq(
      StructField("apiVersion", StringType), StructField("kind", StringType),
      StructField("name", StringType), StructField("namespace", StringType),
      StructField("resourceVersion", StringType), StructField("uid", StringType)))),
    StructField("reason", StringType), StructField("message", StringType),
    StructField("type", StringType), StructField("count", IntegerType),
    StructField("source", StructType(Seq(
      StructField("component", StringType), StructField("host", StringType))))))

  private val lines = Seq(
    """{"metadata":{"uid":"w1","name":"e1","namespace":"default","resourceVersion":"101","creationTimestamp":"2024-01-01T10:00:00Z"},"involvedObject":{"apiVersion":"v1","kind":"Pod","name":"web","namespace":"default","resourceVersion":"50","uid":"pod-9"},"reason":"Scheduled","message":"ok","type":"Normal","count":1,"source":{"component":"scheduler","host":""}}""",
    """{"metadata":{"uid":"w2","name":"e2","namespace":"kube-system","resourceVersion":"102","creationTimestamp":"2024-01-01T10:01:00Z"},"involvedObject":{"apiVersion":"apps/v1","kind":"Deployment","name":"dns","namespace":"kube-system","resourceVersion":"51","uid":"dep-1"},"reason":"ScalingReplicaSet","message":"scaled","type":"Normal","count":2,"source":{"component":"deployment-controller","host":"n1"}}""")

  /** Wire doc → the pipeline's flat input columns. */
  private def project(wire: DataFrame): DataFrame =
    wire.select(
      col("metadata.uid").as("uid"),
      col("metadata.creationTimestamp").as("creationTimestamp"),
      col("metadata.name").as("name"),
      col("metadata.namespace").as("namespace"),
      col("reason"), col("message"),
      col("type").as("eventType"), col("count"),
      col("involvedObject"), col("source"))

  test("events.log-shaped NDJSON parses and flows through the pipeline") {
    val dir = Files.createTempDirectory("wire")
    Files.write(dir.resolve("events.ndjson"),
      lines.mkString("\n").getBytes("UTF-8"))
    val wire = spark.read.schema(wireSchema).json(dir.toString)
    assert(wire.count() == 2)
    val out = EventPipeline.events(project(wire),
      spark.emptyDataFrame.select(lit("").as("uid"), lit("").as("kind"),
        typedLit(Map.empty[String, String]).as("labels"),
        typedLit(Map.empty[String, String]).as("annotations"),
        lit("").as("pod_json")).limit(0),
      spark.emptyDataFrame.select(lit("").as("name"),
        typedLit(Seq.empty[String]).as("addresses")).limit(0),
      GraftConfig(uid = "wire"))
      .collect()
    // kube-system record filtered (F2); the default-ns one projects fully
    assert(out.map(_.id).toSeq == Seq("w1"))
    val e = out.head
    assert(e.reason == "Scheduled")
    assert(e.component == "scheduler")
    assert(e.reference_kind == "Pod" && e.reference_uid == "pod-9")
    assert(e.timestamp == 1704103200L) // 2024-01-01T10:00:00Z
  }
}
