package graft.sources.k8s

import graft.k8s.{EventSource => L9Source, KubeEvent, KubeService, ObjectRef}
import java.sql.Timestamp
import java.util.concurrent.ConcurrentSkipListMap
import java.util.concurrent.atomic.AtomicBoolean
import scala.jdk.CollectionConverters._

/** Live Kubernetes watch client over the public watch API — the HTTP
  * analog of the reference's informer machinery (main.go:88-90 starts
  * informers; k8sclient.go:37-60 builds the clientset). Same contract as
  * [[FileWatchClient]]: two calls, `latestRv` and `fetch`, both served
  * from a driver-side buffer.
  *
  * Protocol (public Kubernetes API semantics):
  *  1. LIST  `GET {base}/api/v1/events?limit=...` — seeds the buffer and
  *     yields the list resourceVersion to start watching from.
  *  2. WATCH `GET {base}/api/v1/events?watch=true&resourceVersion=rv` —
  *     chunked NDJSON of `{"type":"ADDED|MODIFIED|...","object":v1.Event}`
  *     lines, decoded incrementally as they arrive.
  *  3. On stream end / error / HTTP 410 Gone (rv expired): back off and
  *     re-LIST + re-WATCH — the resync loop (reference config.go:8
  *     `resync_interval`, README "Resync allows to catch up"). Re-listed
  *     events overwrite by rv, so the buffer never duplicates; downstream
  *     D1 dedup absorbs redelivery across restarts, exactly the
  *     reference's at-least-once contract.
  *
  * The buffer is a rv-ordered skip-list, trimmed to the newest
  * `bufferCap` entries AFTER the streaming engine commits past them —
  * `trimCommitted(rv)` is called from the MicroBatchStream's
  * `commit(end)`, so planInputPartitions can always re-plan an
  * uncommitted range (restart replay) without hitting a hole.
  *
  * Cluster auth: a bearer token (service-account) rides as the
  * `Authorization` header; TLS is the JVM default trust store — an
  * in-cluster deployment mounts the CA into it. Everything here is the
  * public API-server surface; no client library required.
  */
class HttpWatchClient[T](base: String, resourcePath: String,
    decode: com.fasterxml.jackson.databind.JsonNode => Option[(Long, T)],
    token: Option[String] = None,
    namespace: Option[String] = None, resyncBackoffMs: Long = 1000L,
    bufferCap: Int = 1 << 20) extends AutoCloseable {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  private val buffer = new ConcurrentSkipListMap[Long, T]()
  private val running = new AtomicBoolean(true)
  @volatile private var committedRv = 0L

  private val listUrl = namespace match {
    case Some(ns) => s"$base/api/v1/namespaces/$ns/$resourcePath"
    case None => s"$base/api/v1/$resourcePath"
  }

  private val http = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10)).build()

  private def request(url: String): java.net.http.HttpRequest = {
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url)).GET()
    token.foreach(t => b.header("Authorization", s"Bearer $t"))
    b.build()
  }

  /** One LIST: seed buffer, return the collection rv to watch from. */
  private def list(): Long = {
    val resp = http.send(request(listUrl),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw new java.io.IOException(s"LIST ${resp.statusCode()}")
    val root = mapper.readTree(resp.body())
    val items = root.path("items")
    if (items.isArray)
      items.asScala.foreach(decode(_).foreach { case (rv, e) =>
        buffer.put(rv, e) })
    val listRv =
      try root.path("metadata").path("resourceVersion").asText("0").toLong
      catch { case _: NumberFormatException => 0L }
    math.max(listRv, if (buffer.isEmpty) 0L else buffer.lastKey())
  }

  /** One WATCH connection: stream lines until server close or stop. */
  private def watch(fromRv: Long): Unit = {
    val url = s"$listUrl?watch=true&resourceVersion=$fromRv"
    val resp = http.send(request(url),
      java.net.http.HttpResponse.BodyHandlers.ofInputStream())
    if (resp.statusCode() == 410) return // Gone: rv expired -> re-list
    if (resp.statusCode() != 200)
      throw new java.io.IOException(s"WATCH ${resp.statusCode()}")
    val reader = new java.io.BufferedReader(
      new java.io.InputStreamReader(resp.body(),
        java.nio.charset.StandardCharsets.UTF_8))
    try {
      var line = reader.readLine()
      while (line != null && running.get()) {
        if (line.trim.nonEmpty) {
          // A single malformed line must not tear down the whole watch
          // connection (which would force a full re-LIST): skip it and
          // keep consuming — the stream framing is line-oriented, so
          // the next line is independently parseable.
          try {
            val n = mapper.readTree(line)
            val kind = n.path("type").asText("")
            // ERROR carries a Status object (e.g. 410 Gone mid-stream)
            if (kind == "ERROR") return
            if (kind != "DELETED")
              decode(n.path("object")).foreach { case (rv, e) =>
                buffer.put(rv, e) }
          } catch {
            case _: com.fasterxml.jackson.core.JacksonException => ()
          }
        }
        line = reader.readLine()
      }
    } finally reader.close()
  }

  private val loop = new Thread(() => {
    while (running.get()) {
      try watch(list())
      catch { case _: Exception => () } // transport error -> resync
      if (running.get())
        try Thread.sleep(resyncBackoffMs)
        catch { case _: InterruptedException => () } // close() interrupts
    }
  }, "graft-k8s-watch")
  loop.setDaemon(true)
  loop.start()

  def latestRv(): Long = if (buffer.isEmpty) 0L else buffer.lastKey()

  def fetch(fromRv: Long, toRv: Long): Seq[T] =
    buffer.subMap(fromRv, false, toRv, true).values.asScala.toSeq

  /** Called on offset commit: everything ≤ rv is durably downstream, so
    * the replay window has moved past it; trim to keep the buffer
    * bounded (a watch left running for weeks must not grow without
    * bound — at 100 TB scale the buffer holds a replay window, never
    * history). */
  def trimCommitted(rv: Long): Unit = {
    committedRv = math.max(committedRv, rv)
    buffer.headMap(committedRv, true).clear() // ≤ rv is durable: inclusive
    // Safety valve independent of commits: cap total entries.
    while (buffer.size() > bufferCap) buffer.pollFirstEntry()
  }

  override def close(): Unit = {
    running.set(false)
    loop.interrupt()
  }
}

/** The per-resource decoders + convenience constructors: one generic
  * LIST/WATCH/resync client, one decoder per watched kind — exactly the
  * reference's informer-per-resource layout (main.go:88-90 starts one
  * informer each for events and services). */
object HttpWatchClient {

  def events(base: String, token: Option[String] = None,
      namespace: Option[String] = None, resyncBackoffMs: Long = 1000L)
      : HttpWatchClient[KubeEvent] =
    new HttpWatchClient[KubeEvent](base, "events", decodeEvent,
      token, namespace, resyncBackoffMs)

  def services(base: String, token: Option[String] = None,
      namespace: Option[String] = None, resyncBackoffMs: Long = 1000L)
      : HttpWatchClient[KubeService] =
    new HttpWatchClient[KubeService](base, "services", decodeService,
      token, namespace, resyncBackoffMs)

  private def strMap(n: com.fasterxml.jackson.databind.JsonNode)
      : Map[String, String] =
    if (!n.isObject) Map.empty
    else {
      val b = Map.newBuilder[String, String]
      n.fields().forEachRemaining(e => b += (e.getKey -> e.getValue.asText("")))
      b.result()
    }

  /** v1.Service JSON → KubeService (the S2 consumed subset:
    * event_service.go / FIXTURES.md §A.3). */
  private[sources] def decodeService(
      n: com.fasterxml.jackson.databind.JsonNode)
      : Option[(Long, KubeService)] = {
    val meta = n.path("metadata")
    val uid = meta.path("uid").asText("")
    val rvText = meta.path("resourceVersion").asText("")
    val rv = try rvText.toLong catch { case _: NumberFormatException => -1L }
    if (uid.isEmpty || rv <= 0) return None
    Some(rv -> KubeService(
      uid = uid,
      resource_version = rvText,
      name = meta.path("name").asText(""),
      namespace = meta.path("namespace").asText(""),
      labels = strMap(meta.path("labels")),
      annotations = strMap(meta.path("annotations")),
      selector = strMap(n.path("spec").path("selector"))))
  }

  /** v1.Event JSON → KubeEvent; None when the record is unusable (no
    * uid/rv). Field mapping is the same subset the file client carries
    * (FIXTURES.md §A.1) — the two clients must be interchangeable. */
  private[sources] def decodeEvent(n: com.fasterxml.jackson.databind.JsonNode):
      Option[(Long, KubeEvent)] = {
    val meta = n.path("metadata")
    val uid = meta.path("uid").asText("")
    val rvText = meta.path("resourceVersion").asText("")
    // K8s resourceVersions are opaque strings that are etcd revisions in
    // practice; a non-numeric rv cannot order a micro-batch offset — skip
    // it rather than corrupt the offset sequence.
    val rv = try rvText.toLong catch { case _: NumberFormatException => -1L }
    if (uid.isEmpty || rv <= 0) return None
    def ts(field: String): Option[Timestamp] = {
      val v = n.path(field).asText("")
      if (v.isEmpty) None
      else try Some(Timestamp.from(java.time.Instant.parse(v)))
      catch { case _: Exception => None }
    }
    val when = ts("lastTimestamp").orElse(ts("eventTime"))
      .orElse {
        val v = meta.path("creationTimestamp").asText("")
        if (v.isEmpty) None
        else try Some(Timestamp.from(java.time.Instant.parse(v)))
        catch { case _: Exception => None }
      }
      .getOrElse(new Timestamp(0L))
    val obj = n.path("involvedObject")
    val src = n.path("source")
    Some(rv -> KubeEvent(
      uid = uid,
      creationTimestamp = when,
      name = meta.path("name").asText(""),
      namespace = meta.path("namespace").asText(""),
      reason = n.path("reason").asText(""),
      message = n.path("message").asText(""),
      eventType = n.path("type").asText(""),
      count = { val c = n.path("count"); if (c.isNumber) Some(c.asInt) else None },
      involvedObject = ObjectRef(
        obj.path("apiVersion").asText(""), obj.path("kind").asText(""),
        obj.path("name").asText(""), obj.path("namespace").asText(""),
        obj.path("resourceVersion").asText(""), obj.path("uid").asText("")),
      source = L9Source(
        src.path("component").asText(""), src.path("host").asText(""))))
  }
}
