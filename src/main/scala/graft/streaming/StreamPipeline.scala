package graft.streaming

import graft.k8s._
import graft.sinks.NdjsonSink
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Streaming assembly of the k8stream dataflow (SURVEY.md §3.1 Spark
  * shape): source → eligibility filters → watermarked dedup →
  * stream-static enrichment → L9 projection → count-capped NDJSON sink
  * via foreachBatch.
  *
  * Delivery contract preserved from the reference: at-least-once, sink
  * write happens before state commit (micro-batch N+1 does not start
  * until N's sink completes — the reference's backpressure semantic,
  * flush.go:15-27, is Spark's micro-batch serialization for free).
  */
object StreamPipeline {

  /** D1 streaming: drop duplicate event UIDs within the watermark horizon
    * — the TTL'd dedup table (3600 s ≈ watermark delay; reference
    * handler.go:142-151, flush.go:57-62).
    *
    * At-least-once edge, same as the reference: the live watch decodes
    * DELETED v1.Event lines (event TTL expiry, ~1 h, redelivers the uid
    * with its ORIGINAL timestamp), and dedup state for that uid expires
    * at the same 1-hour horizon — a duplicate can slip out right at the
    * edge. The reference routes event deletes through the same onEvent
    * handler with the same TTL'd cache (handler.go:56-64, 142-151), so
    * the duplicate window is shared behavior, not a divergence; widen
    * `watermarkDelay` past the cluster's event TTL to close it. */
  def dedupStream(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("creationTimestamp", watermarkDelay)
      .dropDuplicatesWithinWatermark(Seq("uid"))

  /** Versioned-dedup state for D2. */
  final case class VersionState(maxVersion: Long)

  /** D2 streaming: per-service-UID "pass only strictly newer
    * resourceVersion" via arbitrary stateful processing (reference
    * handler.go:95-115; versions compared numerically — documented
    * divergence from the reference's lexical compare).
    *
    * `ttl = Some(...)` arms a processing-time timeout reproducing the
    * reference's 3600 s cache expiry; with a timeout armed the query
    * fires on EVERY trigger (even data-less), so pick a real trigger
    * interval. `ttl = None` keeps state forever (NoTimeout) — the right
    * mode when the dedup horizon is handled upstream. */
  def dedupServicesVersioned(services: Dataset[KubeService],
      ttl: Option[String] = Some("3600 seconds"))(
      implicit spark: SparkSession): Dataset[KubeService] = {
    import spark.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    services
      .groupByKey(_.uid)
      .flatMapGroupsWithState[VersionState, KubeService](
        OutputMode.Append, timeoutConf) {
        (_: String, rows: Iterator[KubeService], state: GroupState[VersionState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var maxSeen = state.getOption.map(_.maxVersion).getOrElse(Long.MinValue)
            val out = rows.toSeq.sortBy(_.resource_version.toLong).flatMap { s =>
              val v = s.resource_version.toLong
              if (v > maxSeen) { maxSeen = v; Some(s) } else None
            }
            state.update(VersionState(maxSeen))
            ttl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
  }

  /** D2 + F1 in one stateful pass: the versioned gate ALSO emits the
    * lifecycle tag — a uid seen for the first time is `addedService`,
    * every later strictly-newer version is `updatedService` (the
    * reference's informer add/update callbacks, handler.go:26-69,
    * reconstructed from the same state the version gate already keeps).
    * This overload consumes bare [[KubeService]] rows (file replay /
    * batch fixtures, no watch metadata), so it can never see a delete;
    * the live watch path carries the watch type and goes through
    * [[dedupServicesWatchedTagged]], which adds `deletedService`. */
  final case class TaggedService(service: KubeService, tag: String)

  def dedupServicesVersionedTagged(services: Dataset[KubeService])(
      implicit spark: SparkSession): Dataset[TaggedService] = {
    import spark.implicits._
    services
      .groupByKey(_.uid)
      .flatMapGroupsWithState[VersionState, TaggedService](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[KubeService], state: GroupState[VersionState]) =>
          var maxSeen = state.getOption.map(_.maxVersion).getOrElse(Long.MinValue)
          val firstEver = state.getOption.isEmpty
          var emittedAny = false
          val out = rows.toSeq.sortBy(_.resource_version.toLong).flatMap { s =>
            val v = s.resource_version.toLong
            if (v > maxSeen) {
              maxSeen = v
              val tag = if (firstEver && !emittedAny) "addedService"
                        else "updatedService"
              emittedAny = true
              Some(TaggedService(s, tag))
            } else None
          }
          state.update(VersionState(maxSeen))
          out.iterator
      }
  }

  /** The watch-aware D2 + F1 gate for the LIVE service source
    * ([[graft.sources.k8s.K8sServiceSource]] emits [[WatchedService]]
    * rows carrying the watch line's type): same strictly-newer
    * resourceVersion gate, but the lifecycle tag comes from the watch
    * type itself — the reference's informer callbacks map 1:1
    * (handler.go:26-69: OnAdd → addedService, OnUpdate →
    * updatedService, OnDelete → deletedService). A DELETED line carries
    * a bumped rv, so it passes the gate and emits exactly one
    * `deletedService`; its state is then dropped (the reference's
    * OnDelete removes the uid from the informer cache), so a later
    * re-list of a recreated same-uid service tags as an add again.
    * Rows with no watch type (e.g. a consumer lifting bare
    * KubeService) fall back to the state-derived add/update split of
    * [[dedupServicesVersionedTagged]]. */
  def dedupServicesWatchedTagged(services: Dataset[WatchedService])(
      implicit spark: SparkSession): Dataset[TaggedService] = {
    import spark.implicits._
    services
      .groupByKey(_.uid)
      .flatMapGroupsWithState[VersionState, TaggedService](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[WatchedService], state: GroupState[VersionState]) =>
          var maxSeen = state.getOption.map(_.maxVersion).getOrElse(Long.MinValue)
          // `known` = the uid currently exists in state, i.e. the informer
          // cache already holds this key. A watch type of ADDED is NOT
          // trusted for known keys: LIST items are decoded as ADDED
          // (HttpWatchClient.list), so after any re-list (410 recovery,
          // transport error, periodic relist) a service that changed while
          // disconnected arrives as ADDED — client-go's informer fires
          // OnUpdate → updatedService for known keys on resync
          // (handler.go:41-48); addedService is reserved for first-ever
          // (or post-delete) uids. A DELETED drops the key, so a
          // same-batch recreate tags as an add again.
          var known = state.getOption.isDefined
          val out = rows.toSeq.sortBy(_.resource_version.toLong).flatMap { s =>
            val v = s.resource_version.toLong
            if (v > maxSeen) {
              maxSeen = v
              val tag = s.watch_type match {
                case "DELETED"  => "deletedService"
                case "MODIFIED" => "updatedService"
                case _          => if (known) "updatedService" else "addedService"
              }
              known = tag != "deletedService"
              Some(TaggedService(s.service, tag))
            } else None
          }
          if (known) state.update(VersionState(maxSeen))
          else state.remove()
          out.iterator
      }
  }

  /** Per-micro-batch sink body shared by the service-side queries: one
    * P4 projection per lifecycle tag present (serviceEvents stamps the
    * tag as the L9 reason), unioned into one sink write. */
  private def serviceBatchSink(pods: DataFrame, conf: GraftConfig,
      tags: Seq[String]): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) =>
      import org.apache.spark.sql.functions.col
      val parts = tags.map { t =>
        EventPipeline.serviceEvents(
          batch.filter(col("tag") === t).select("service.*"),
          pods, t).toDF()
      }
      val l9 = parts.reduce(_ unionByName _)
      conf.sink match {
        case "memory" =>
          graft.sinks.MemoryBatchSink.append(conf.uid, batchId,
            l9, conf.batchSize)
        case _ =>
          NdjsonSink.write(l9, conf.fileSinkDir, conf.uid, batchId,
            conf.batchSize, conf.gzip)
      }
      ()
  }

  /** The SERVICE-side streaming query (reference main.go service
    * informer → handler → event_service.go): live/replayed services
    * through the tagged version gate, then per micro-batch the P4
    * projection (selector-matched pod map, service L9 synthesis) lands
    * on the configured sink — the service twin of [[run]]. This
    * overload is the watch-blind replay path (add/update only); the
    * live path is [[runServicesWatched]]. */
  def runServices(stream: Dataset[KubeService], pods: DataFrame,
      conf: GraftConfig, checkpoint: String,
      triggerMs: Option[Long] = None): StreamingQuery = {
    implicit val spark: SparkSession = stream.sparkSession
    val tagged = dedupServicesVersionedTagged(stream)
    val trigger = triggerMs.getOrElse(conf.batchIntervalSec * 1000L)
    tagged.toDF().writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(trigger))
      .foreachBatch(serviceBatchSink(pods, conf,
        Seq("addedService", "updatedService")))
      .start()
  }

  /** The LIVE service-side streaming query: [[WatchedService]] rows
    * (from the live watch source) through the watch-aware tagged gate,
    * so service deletions land as `deletedService` L9 records — the
    * reference's OnDelete path end-to-end (handler.go:56-64 →
    * event_service.go:72-112). */
  def runServicesWatched(stream: Dataset[WatchedService], pods: DataFrame,
      conf: GraftConfig, checkpoint: String,
      triggerMs: Option[Long] = None): StreamingQuery = {
    implicit val spark: SparkSession = stream.sparkSession
    val tagged = dedupServicesWatchedTagged(stream)
    val trigger = triggerMs.getOrElse(conf.batchIntervalSec * 1000L)
    tagged.toDF().writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(trigger))
      .foreachBatch(serviceBatchSink(pods, conf,
        Seq("addedService", "updatedService", "deletedService")))
      .start()
  }

  /** The full event-side streaming query: returns the started query.
    * `objects`/`nodes` are static dimensions re-read per micro-batch
    * (stream-static join = the TTL'd lookup cache, SURVEY.md §2.1 E1/E2).
    *
    * Config twins honored here: the dedup horizon is
    * `conf.dedupTtlSec` (the reference's 3600 s objectCacheExpiry,
    * flush.go:57-62) and the trigger interval is `conf.batchIntervalSec`
    * (the count-or-time window's time half, io/batch.go:15-37).
    * `triggerMs` overrides the trigger for tests only. */
  def run(stream: DataFrame, objects: DataFrame, nodes: DataFrame,
      conf: GraftConfig, checkpoint: String,
      triggerMs: Option[Long] = None): StreamingQuery = {
    val filtered = EventPipeline.eligible(stream, conf)
    val deduped = dedupStream(filtered, s"${conf.dedupTtlSec} seconds")
    val trigger = triggerMs.getOrElse(conf.batchIntervalSec * 1000L)
    deduped.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(trigger))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // E1/E2/P1-P3 run inside the batch (dimensions current per batch),
        // then W1/W2/K1-K3 dispatched on the config twin's `sink` knob
        // (reference io/config.go:27 "s3 | file | memory"): file and s3
        // share the NDJSON writer (an s3 deployment passes an s3a://
        // fileSinkDir), memory is the driver-held test sink.
        val l9 = EventPipeline.projectL9(
          EventPipeline.enrich(batch, objects, nodes))
        conf.sink match {
          case "memory" =>
            graft.sinks.MemoryBatchSink.append(conf.uid, batchId,
              l9.toDF(), conf.batchSize)
          case _ =>
            NdjsonSink.write(l9.toDF(), conf.fileSinkDir, conf.uid, batchId,
              conf.batchSize, conf.gzip)
        }
        ()
      }
      .start()
  }

  /** The same pipeline landed through the DataSourceV2 streaming sink
    * (graft.sources.ndjson.NdjsonWriteSource) instead of foreachBatch:
    * enrichment/projection move INTO the streaming plan (dimensions
    * join per micro-batch exactly as before — stream-static joins
    * re-read the static side each batch), serialization is one to_json,
    * and the connector provides what foreachBatch had to hand-build —
    * per-epoch staged commit (exactly-once file publish across
    * restarts, vs the reference's documented duplicate window) and the
    * batch_size count cap via maxRecordsPerFile. The W1 time half is
    * the trigger; the count half is the writer's rolling cap. */
  def runV2(stream: DataFrame, objects: DataFrame, nodes: DataFrame,
      conf: GraftConfig, checkpoint: String,
      triggerMs: Option[Long] = None): StreamingQuery = {
    import org.apache.spark.sql.functions._
    val filtered = EventPipeline.eligible(stream, conf)
    val deduped = dedupStream(filtered, s"${conf.dedupTtlSec} seconds")
    val l9 = EventPipeline.projectL9(
      EventPipeline.enrich(deduped, objects, nodes)).toDF()
    val lines = l9.select(
      to_json(struct(l9.columns.map(col): _*)).as("value"))
    val trigger = triggerMs.getOrElse(conf.batchIntervalSec * 1000L)
    lines.writeStream
      .format("graft.sources.ndjson.NdjsonWriteSource")
      .outputMode(OutputMode.Append)
      .option("path", s"${conf.fileSinkDir}/${conf.uid}")
      .option("checkpointLocation", checkpoint)
      .option("maxRecordsPerFile", conf.batchSize.toString)
      .trigger(Trigger.ProcessingTime(trigger))
      .start()
  }

  /** The reference's process entry (`k8stream --config file.json`,
    * main.go:20-60) re-expressed: load + validate the JSON config
    * (GraftConfig.load — throws GraftConfigException listing every
    * violation), start the periodic heartbeat when a hook is configured
    * (the reference's StartHeartbeat goroutine, io/heartbeat.go:17-60;
    * ours is a daemon ticker with process lifetime, like theirs), then
    * dispatch on the sink knob: the memory sink runs through the
    * foreachBatch path (driver-held, test double), file/s3 through the
    * DSv2 connector with its exactly-once epoch commit. */
  def runFromConfig(configPath: String, stream: DataFrame, objects: DataFrame,
      nodes: DataFrame, checkpoint: String, version: String = "graft",
      triggerMs: Option[Long] = None): StreamingQuery = {
    val conf = GraftConfig.load(configPath)
    Heartbeat.startPeriodic(stream.sparkSession, conf, version)
    if (conf.sink == "memory") run(stream, objects, nodes, conf, checkpoint, triggerMs)
    else runV2(stream, objects, nodes, conf, checkpoint, triggerMs)
  }

  // ----------------------------------------- config → live source plumbing

  /** Resolve the live API endpoint the way the reference does
    * (k8sclient.go:37-60): the config's `kubeconfig` file when set,
    * the in-cluster service account otherwise (config.go:11-17 — "" =
    * in-cluster). */
  def liveContext(conf: GraftConfig): graft.sources.k8s.Kubeconfig.KubeContext =
    if (conf.kubeconfig.nonEmpty)
      graft.sources.k8s.Kubeconfig.load(conf.kubeconfig)
    else graft.sources.k8s.Kubeconfig.inCluster()

  /** The live EVENT watch stream built entirely from config:
    * endpoint/token/namespace from `kubeconfig` (or in-cluster), and
    * `resync_interval` → the client's periodic-relist knob (the
    * reference hands the same value to its informer factory,
    * main.go:82-90, config.go:20-24). */
  def liveEventStream(spark: SparkSession, conf: GraftConfig): DataFrame = {
    val kc = liveContext(conf)
    var r = spark.readStream.format("graft.sources.k8s.K8sEventSource")
      .option("endpoint", kc.server)
      .option("relistIntervalMs", (conf.resyncIntervalSec * 1000L).toString)
    kc.token.foreach(t => r = r.option("token", t))
    kc.namespace.foreach(ns => r = r.option("namespace", ns))
    r.load()
  }

  /** The live SERVICE (or deployments, E5) watch stream from config —
    * feeds [[runServicesWatched]]. */
  def liveServiceStream(spark: SparkSession, conf: GraftConfig,
      resource: String = "services"): Dataset[WatchedService] = {
    val kc = liveContext(conf)
    var r = spark.readStream.format("graft.sources.k8s.K8sServiceSource")
      .option("endpoint", kc.server)
      .option("resource", resource)
      .option("relistIntervalMs", (conf.resyncIntervalSec * 1000L).toString)
    kc.token.foreach(t => r = r.option("token", t))
    kc.namespace.foreach(ns => r = r.option("namespace", ns))
    r.load().as(org.apache.spark.sql.Encoders.product[WatchedService])
  }

  /** The reference's PRIMARY entry contract (`k8stream --config
    * file.json`, main.go:28-97): the config file alone stands up the
    * live path — kubeconfig/in-cluster resolution, watch client knobs,
    * heartbeat, sink dispatch. Dimensions stay caller-supplied
    * snapshots (the reference's GetObject side-lookups,
    * k8sclient.go:124-159; empty = enrich-with-nulls). */
  def runLive(configPath: String, spark: SparkSession, objects: DataFrame,
      nodes: DataFrame, checkpoint: String, version: String = "graft",
      triggerMs: Option[Long] = None): StreamingQuery = {
    val conf = GraftConfig.load(configPath)
    Heartbeat.startPeriodic(spark, conf, version)
    val stream = liveEventStream(spark, conf)
    if (conf.sink == "memory") run(stream, objects, nodes, conf, checkpoint, triggerMs)
    else runV2(stream, objects, nodes, conf, checkpoint, triggerMs)
  }
}
