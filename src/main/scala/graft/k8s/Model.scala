package graft.k8s

import java.sql.Timestamp

/** Data model of the k8stream semantic layer (SURVEY.md §1).
  *
  * [[L9Event]] is the engine's one fixed output record — 18 fields, names
  * fixed by the reference's json tags (reference event.go:12-31). The
  * heterogeneous `pod` column (§1.2: typed mini-map for pod events,
  * podName→json for service events) is modeled as Map[String,String] with
  * JSON-string values — lossless for both shapes, `from_json` at query
  * time (reference event.go:89-98, event_service.go:88-96).
  */
final case class L9Event(
    id: String,
    timestamp: Long,
    component: String,
    host: String,
    message: String,
    namespace: String,
    reason: String,
    reference_uid: String,
    reference_name: String,
    reference_version: String,
    reference_namespace: String,
    reference_kind: String,
    object_uid: String,
    labels: Map[String, String],
    annotations: Map[String, String],
    address: Seq[String],
    pod: Map[String, String],
    version: String)

object L9Event {
  /** Engine version stamped on every record (reference main.go:18). */
  val Version = "0.1.0"
}

/** Consumed subset of a Kubernetes core/v1 Event (reference event.go:49-63
  * plus the wire fields the reference ignores but analytics wants —
  * FIXTURES.md §A.1). */
final case class ObjectRef(
    apiVersion: String,
    kind: String,
    name: String,
    namespace: String,
    resourceVersion: String,
    uid: String)

final case class EventSource(component: String, host: String)

final case class KubeEvent(
    uid: String,
    creationTimestamp: Timestamp,
    name: String,
    namespace: String,
    reason: String,
    message: String,
    eventType: String,
    count: Option[Int],
    involvedObject: ObjectRef,
    source: EventSource)

/** Dimension rows for the enrichment joins (FIXTURES.md §A.2). */
final case class KubeObject(
    uid: String,
    kind: String,
    namespace: String,
    name: String,
    labels: Map[String, String],
    annotations: Map[String, String],
    pod_json: String)

final case class KubeNode(name: String, addresses: Seq[String])

final case class KubeService(
    uid: String,
    resource_version: String,
    name: String,
    namespace: String,
    labels: Map[String, String],
    annotations: Map[String, String],
    selector: Map[String, String])

final case class KubePod(
    uid: String,
    name: String,
    namespace: String,
    labels: Map[String, String],
    start_time: Timestamp,
    ip: String,
    host_ip: String)

/** Engine config twin of the reference's L9K8streamConfig
  * (reference config.go:11-17, io/config.go:22-32). */
final case class GraftConfig(
    uid: String,
    sink: String = "file",             // s3 | file | memory (reference
                                       // requires it; file matches the
                                       // fileSinkDir default below)
    batchSize: Int = 10000,            // reference deploy default
    batchIntervalSec: Int = 30,
    namespaces: Seq[String] = Nil,     // whitelist; empty = all
    events: Seq[String] = Nil,         // reason whitelist; empty = all
    fileSinkDir: String = "/tmp/graft-sink",
    gzip: Boolean = false,
    dedupTtlSec: Int = 3600)           // reference objectCacheExpiry
