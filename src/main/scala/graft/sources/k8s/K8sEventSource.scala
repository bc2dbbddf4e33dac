package graft.sources.k8s

import graft.k8s.{EventSource => L9Source, KubeEvent, ObjectRef}
import java.sql.Timestamp
import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import scala.jdk.CollectionConverters._

/** Kubernetes event-watch source as a DataSourceV2 `MicroBatchStream`
  * (SURVEY.md §2.1 S1/S2 live mode, §4.3 "only genuinely novel physical
  * component").
  *
  * Offsets are the Kubernetes **resourceVersion** (monotonic per watch):
  * micro-batch N covers resourceVersions (startRv, endRv]. Replays after
  * restart re-read from the last committed rv — the analog of the
  * reference's informer resync (config.go:8 `resync_interval`, README
  * "Resync allows to catch up"): at-least-once, with D1 dedup downstream
  * absorbing re-delivery, exactly like the reference's contract.
  *
  * The watch client is pluggable, two ship:
  *  - [[FileWatchClient]] (`option("path", file)`) — NDJSON watch-record
  *    replay, offline-testable, the fixture shape;
  *  - [[HttpWatchClient]] (`option("endpoint", "https://apiserver")`,
  *    optional `token` / `namespace` options) — the LIVE path against
  *    the Kubernetes LIST+WATCH API (the reference's informer role,
  *    main.go:88-90). The client buffers on the driver; partitions carry
  *    their planned slice (the socket/rate-source pattern — correct for
  *    event volumes, which are control-plane-scale, not data-scale).
  *
  * Usage: spark.readStream.format("graft.sources.k8s.K8sEventSource")
  *          .option("path", watchFile).load()            // replay
  *        spark.readStream.format("graft.sources.k8s.K8sEventSource")
  *          .option("endpoint", apiServerUrl).load()     // live
  */
class K8sEventSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    K8sEventSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // Fail at source construction, not with an NPE from Paths.get deep
    // inside the first poll.
    val path = properties.get("path")
    val endpoint = properties.get("endpoint")
    require((path != null && path.nonEmpty) ||
      (endpoint != null && endpoint.nonEmpty),
      "K8sEventSource requires .option(\"path\", <watch file>) or " +
        ".option(\"endpoint\", <api-server url>)")
    new K8sEventTable(path, endpoint,
      Option(properties.get("token")).filter(_.nonEmpty),
      Option(properties.get("namespace")).filter(_.nonEmpty),
      Option(properties.get("relistIntervalMs")).filter(_.nonEmpty)
        .map(_.toLong).getOrElse(Long.MaxValue),
      // watch reconnect pacing: 1 s default matches the reference
      // informer's steady backoff; soak/high-churn deployments tune it
      Option(properties.get("resyncBackoffMs")).filter(_.nonEmpty)
        .map(_.toLong).getOrElse(1000L),
      // admission control: cap how many buffered events one micro-batch
      // may admit (Kafka's maxOffsetsPerTrigger analog). Unset = drain
      // all available — correct for steady state, but a catch-up batch
      // after downtime then swallows the whole backlog in one plan.
      Option(properties.get("maxEventsPerTrigger")).filter(_.nonEmpty)
        .map(_.toInt))
  }
  override def supportsExternalMetadata(): Boolean = false
}

object K8sEventSource {
  /** Output schema = the consumed v1.Event subset (FIXTURES.md §A.1),
    * i.e. the encoder schema of [[KubeEvent]]. */
  val schema: StructType = Encoders.product[KubeEvent].schema
}

private[k8s] class K8sEventTable(path: String, endpoint: String,
    token: Option[String], namespace: Option[String],
    relistIntervalMs: Long = Long.MaxValue,
    resyncBackoffMs: Long = 1000L,
    maxEventsPerTrigger: Option[Int] = None)
    extends Table with SupportsRead {
  override def name(): String =
    if (endpoint != null && endpoint.nonEmpty) s"k8s_events($endpoint)"
    else s"k8s_events($path)"
  override def schema(): StructType = K8sEventSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = K8sEventSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          if (endpoint != null && endpoint.nonEmpty)
            new K8sHttpMicroBatchStream(endpoint, token, namespace,
              relistIntervalMs, resyncBackoffMs, maxEventsPerTrigger)
          else new K8sMicroBatchStream(path)
      }
    }
}

/** Offset = highest resourceVersion included so far. */
case class K8sOffset(rv: Long) extends Offset {
  override def json: String = rv.toString
}

private[k8s] class K8sMicroBatchStream(path: String) extends MicroBatchStream {
  override def initialOffset(): Offset = K8sOffset(0L)
  override def latestOffset(): Offset = K8sOffset(FileWatchClient.latestRv(path))
  override def deserializeOffset(json: String): Offset = K8sOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    Array(K8sInputPartition(path,
      start.asInstanceOf[K8sOffset].rv, end.asInstanceOf[K8sOffset].rv))
  override def createReaderFactory(): PartitionReaderFactory = K8sReaderFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[k8s] case class K8sInputPartition(path: String, fromRv: Long, toRv: Long)
  extends InputPartition

private[k8s] object K8sReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[K8sInputPartition]
    new PartitionReader[InternalRow] {
      private val serializer =
        ExpressionEncoder[KubeEvent]().createSerializer()
      private val it = FileWatchClient.fetch(p.path, p.fromRv, p.toRv).iterator
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { current = serializer(it.next()).copy(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

/** Live micro-batch stream over [[HttpWatchClient]]. The client (and its
  * watch thread + buffer) lives on the DRIVER where latestOffset runs;
  * each planned partition carries its event slice to the executor (the
  * socket-source pattern — a v1.Event feed is control-plane volume, and
  * the slice is one micro-batch, not history). Offset commit trims the
  * buffer, so memory holds only the uncommitted replay window. */
private[k8s] class K8sHttpMicroBatchStream(endpoint: String,
    token: Option[String], namespace: Option[String],
    relistIntervalMs: Long = Long.MaxValue,
    resyncBackoffMs: Long = 1000L,
    maxEventsPerTrigger: Option[Int] = None)
    extends MicroBatchStream with SupportsAdmissionControl {
  private val client = HttpWatchClient.events(endpoint, token, namespace,
    resyncBackoffMs = resyncBackoffMs, relistIntervalMs = relistIntervalMs)
  override def initialOffset(): Offset = K8sOffset(0L)
  // With SupportsAdmissionControl mixed in, the engine resolves offsets
  // through the 2-arg overload below (same contract as the Kafka source).
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead of this")
  override def getDefaultReadLimit: ReadLimit =
    maxEventsPerTrigger.map(n => ReadLimit.maxRows(n.toLong))
      .getOrElse(ReadLimit.allAvailable())
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[K8sOffset].rv
    limit match {
      case mr: ReadMaxRows => K8sOffset(client.rvAfter(from, mr.maxRows().toInt))
      case _ => K8sOffset(client.latestRv())
    }
  }
  override def deserializeOffset(json: String): Offset = K8sOffset(json.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    Array(K8sBufferPartition(client.fetch(
      start.asInstanceOf[K8sOffset].rv, end.asInstanceOf[K8sOffset].rv)))
  override def createReaderFactory(): PartitionReaderFactory = K8sBufferReaderFactory
  override def commit(end: Offset): Unit =
    client.trimCommitted(end.asInstanceOf[K8sOffset].rv)
  override def stop(): Unit = client.close()
}

private[k8s] case class K8sBufferPartition(events: Seq[KubeEvent])
  extends InputPartition

private[k8s] object K8sBufferReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[K8sBufferPartition]
    new PartitionReader[InternalRow] {
      private val serializer =
        ExpressionEncoder[KubeEvent]().createSerializer()
      private val it = p.events.iterator
      private var current: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { current = serializer(it.next()).copy(); true } else false
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

/** File-backed watch client: one JSON object per line with a `rv` field
  * plus the flat event fields. Append-only — appended lines with higher
  * rv become the next micro-batch; stale rvs (≤ committed) are skipped,
  * exactly as a resumed watch skips already-seen resourceVersions. */
object FileWatchClient {
  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m.configure(com.fasterxml.jackson.databind.DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  /** Wire record (flat; ts = epoch MILLIS — seconds truncation destroyed
    * sub-second ordering between duplicates on the round trip; count is
    * nullable so an absent count survives as None instead of becoming
    * Some(0)). */
  case class WireEvent(rv: Long, uid: String, ts: Long, name: String,
      namespace: String, reason: String, message: String, eventType: String,
      count: java.lang.Integer, objApiVersion: String, objKind: String,
      objName: String, objNamespace: String, objRv: String, objUid: String,
      component: String, host: String)

  // Parse cache keyed by (size, mtime): the watch file is append-only
  // and latestOffset() polls every trigger — without the cache, each
  // poll (and each fetch) re-parses the WHOLE history, making cumulative
  // driver work quadratic in file length. Size is the discriminator for
  // same-millisecond appends.
  private val parsed =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Seq[WireEvent])]
  private val warnedMissing = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def readAll(path: String): Seq[WireEvent] = {
    val f = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(f)) {
      // Legitimate for a watch file that appears later, but say so ONCE —
      // a typo'd path otherwise streams nothing forever with no hint.
      if (warnedMissing.add(path))
        System.err.println(s"[graft] K8sEventSource: watch file not found (yet): $path")
      Seq.empty
    } else {
      val size = java.nio.file.Files.size(f)
      val mtime = java.nio.file.Files.getLastModifiedTime(f).toMillis
      val cached = parsed.get(path)
      if (cached != null && cached._1 == size && cached._2 == mtime) cached._3
      else {
        val events = java.nio.file.Files.readAllLines(f).asScala.toSeq
          .filter(_.trim.nonEmpty)
          .map(l => mapper.readValue(l, classOf[WireEvent]))
        parsed.put(path, (size, mtime, events))
        events
      }
    }
  }

  def latestRv(path: String): Long =
    readAll(path).foldLeft(0L)((m, e) => math.max(m, e.rv))

  def fetch(path: String, fromRv: Long, toRv: Long): Seq[KubeEvent] =
    readAll(path)
      .filter(e => e.rv > fromRv && e.rv <= toRv)
      .sortBy(_.rv)
      .map(w => KubeEvent(w.uid, new Timestamp(w.ts), w.name,
        w.namespace, w.reason, w.message, w.eventType,
        Option(w.count).map(_.intValue),
        ObjectRef(w.objApiVersion, w.objKind, w.objName, w.objNamespace,
          w.objRv, w.objUid),
        L9Source(w.component, w.host)))

  /** Serialize an event as a watch line (fixture/test helper). The
    * toLine → fetch round trip is LOSSLESS for every consumed field. */
  def toLine(rv: Long, e: KubeEvent): String = {
    val w = WireEvent(rv, e.uid, e.creationTimestamp.getTime, e.name,
      e.namespace, e.reason, e.message, e.eventType,
      e.count.map(Int.box).orNull,
      e.involvedObject.apiVersion, e.involvedObject.kind, e.involvedObject.name,
      e.involvedObject.namespace, e.involvedObject.resourceVersion,
      e.involvedObject.uid, e.source.component, e.source.host)
    mapper.writeValueAsString(w)
  }
}
