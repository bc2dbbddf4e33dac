package graft.sources.ndjson

import java.util
import java.util.zip.GZIPOutputStream

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 BATCH WRITE connector for gzip NDJSON — the engine-native
  * twin of the reference's S3 flusher (io/flush_s3.go:45-84: gzip NDJSON
  * objects under a prefix), upgraded with Spark's task-commit protocol.
  *
  * Where the reference appends to S3 with at-least-once semantics
  * (README.md "Limitations": duplicates possible after restart), this
  * connector writes every task to `_temporary/` and publishes files only
  * in the driver-side job commit — a failed/speculative task attempt
  * leaves nothing visible, and `abort()` removes all staged output. The
  * foreachBatch path (graft.sinks.NdjsonSink) keeps the count-capped
  * micro-batch layout; this connector is the planner-integrated form:
  * `df.write.format("graft.sources.ndjson.NdjsonWriteSource")`.
  *
  * Contract: input schema is exactly ONE string column (serialize with
  * to_json upstream — same discipline as the text/kafka sinks), so the
  * connector never touches Spark-internal JSON machinery. Output:
  * `<path>/part-<partition>.log.gz` + `_SUCCESS` marker.
  *
  * Scale posture: one file per task streamed through GZIPOutputStream —
  * no row buffering; commit is O(files) driver-side renames (on object
  * stores a rename is a copy: production would use a manifest commit,
  * noted on [[NdjsonBatchWrite.commit]]).
  */
class NdjsonWriteSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType().add("value", StringType)

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new NdjsonTable(properties.get("path"))
}

/** Java-serializable Hadoop Configuration carrier (Spark's own
  * SerializableConfiguration is private[spark]): the session's resolved
  * Hadoop conf is captured ONCE on the driver at write-build time and
  * rides inside the writer factories to executors — so spark.hadoop.*,
  * s3a credentials/endpoints, and a custom defaultFS all reach every
  * getFileSystem call on both sides, exactly as Spark's built-in file
  * writers propagate it. `new Configuration()` here would silently
  * drop all of those (fine on local FS, wrong everywhere else). */
private[ndjson] class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit =
    value.write(out)
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    value = new Configuration(false)
    value.readFields(in)
  }
}

private[ndjson] class NdjsonTable(path: String) extends Table with SupportsWrite {
  require(path != null && path.nonEmpty, "option 'path' is required")
  override def name(): String = s"graft-ndjson($path)"
  override def schema(): StructType = new StructType().add("value", StringType)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val s = info.schema()
    require(s.fields.length == 1 && s.fields(0).dataType == StringType,
      s"graft-ndjson expects exactly one STRING column (got ${s.simpleString});" +
        " serialize with to_json(struct(*)) upstream")
    // Session Hadoop conf + write options layered on top (fs.* / s3a
    // overrides per write), mirroring newHadoopConfWithOptions in
    // Spark's file sources. Build time = driver, session available.
    val opts = info.options.asScala.toMap
    val hconf = org.apache.spark.sql.SparkSession.active
      .sessionState.newHadoopConf()
    // Reference S3 object-attribute parity (io/flush_s3.go:76-80 stamps
    // storage class STANDARD_IA and a private ACL on every upload):
    // friendly options map onto the S3A keys the uploader then applies
    // to each object. Raw fs.s3a.* options work too (next line); these
    // two just name the reference's knobs directly.
    opts.get("storageclass").foreach(v =>
      hconf.set("fs.s3a.create.storage.class", v))
    opts.get("acl").foreach(v => hconf.set("fs.s3a.acl.default", v))
    opts.foreach { case (k, v) => hconf.set(k, v) }
    new NdjsonWriteBuilder(path, info.queryId(), opts,
      new SerializableHadoopConf(hconf))
  }
}

private[ndjson] class NdjsonWriteBuilder(path: String, queryId: String,
    opts: Map[String, String], hconf: SerializableHadoopConf)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  // SaveMode.Overwrite arrives as truncate() on the builder.
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new NdjsonBatchWrite(path, queryId, doTruncate, opts, hconf)
    override def toStreaming: streaming.StreamingWrite =
      new NdjsonStreamingWrite(path, queryId, opts, hconf)
  }
}

private[ndjson] case class NdjsonCommitMessage(tempPaths: Seq[String],
    rows: Long) extends WriterCommitMessage

private[ndjson] class NdjsonBatchWrite(path: String, queryId: String,
    truncate: Boolean, opts: Map[String, String],
    hconf: SerializableHadoopConf) extends BatchWrite {

  private val tag = queryId.replaceAll("[^0-9a-zA-Z]", "").take(8)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    // CaseInsensitiveStringMap hands options through with lowercased keys.
    new NdjsonWriterFactory(path, tag, opts.getOrElse("failoncontains", ""),
      opts.getOrElse("maxrecordsperfile", "0").toLong, hconf)

  /** Driver-side publish: optionally clear previous output (truncate =
    * SaveMode.Overwrite), then rename every staged file into place and
    * drop a _SUCCESS marker. On a rename-is-copy object store this loop
    * becomes a manifest write (list of final object names) — the staged
    * layout already supports that, only this method changes. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(hconf.value)
    if (truncate && fs.exists(root))
      fs.listStatus(root).foreach { st =>
        if (st.getPath.getName.startsWith("part-") ||
          st.getPath.getName == "_SUCCESS") fs.delete(st.getPath, false)
      }
    // Final names carry a query-id tag: two APPEND jobs into the same
    // directory must not collide on part indexes (a colliding
    // fs.rename returns false SILENTLY — unchecked, that is data
    // loss, not an error).
    messages.collect { case NdjsonCommitMessage(tmps, rows) if rows > 0 =>
      tmps.foreach { tmp =>
        val src = new Path(tmp)
        // part index from the staged name (part-<pid>-tid<tid>[-c<k>].log.gz)
        val fin = src.getName.replaceAll("-tid\\d+", s"-$tag")
        if (!fs.rename(src, new Path(root, fin)))
          throw new java.io.IOException(s"commit rename failed: $src -> $fin")
      }
    }
    // Staging is scoped per query (_temporary/<tag>), so cleaning up
    // after THIS job can never remove a concurrent append job's
    // staged-but-uncommitted files. The non-recursive delete of
    // _temporary itself succeeds only when no other job is staging —
    // exactly the race-safe cleanup semantics wanted.
    fs.delete(new Path(root, s"_temporary/$tag"), true)
    try fs.delete(new Path(root, "_temporary"), false)
    catch { case _: java.io.IOException => () }
    fs.create(new Path(root, "_SUCCESS"), true).close()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(hconf.value)
    fs.delete(new Path(root, s"_temporary/$tag"), true)
    try fs.delete(new Path(root, "_temporary"), false)
    catch { case _: java.io.IOException => () }
  }
}

private[ndjson] class NdjsonWriterFactory(path: String, tag: String,
    failOnContains: String, maxRecordsPerFile: Long,
    hconf: SerializableHadoopConf) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new NdjsonDataWriter(path, tag, partitionId, taskId, failOnContains,
      maxRecordsPerFile, hconf)
}

/** Streaming form of the same commit protocol, one commit per epoch —
  * the planner-integrated twin of the reference's per-batch S3 flush
  * (flush.go:15-27 flushes one batch at a time; here each micro-batch
  * is an epoch). Staging is scoped per (query, epoch); final names
  * carry both, so epochs never collide. Re-commit of a replayed epoch
  * (restart between sink write and offset commit — the reference's
  * documented duplicate window) is IDEMPOTENT: a rename whose target
  * already exists means this epoch's file was already published, and
  * the staged duplicate is dropped — upgrading the reference's
  * at-least-once to exactly-once file publish. */
private[ndjson] class NdjsonStreamingWrite(path: String, queryId: String,
    opts: Map[String, String], hconf: SerializableHadoopConf)
    extends streaming.StreamingWrite {

  private val tag = queryId.replaceAll("[^0-9a-zA-Z]", "").take(8)

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): streaming.StreamingDataWriterFactory =
    new NdjsonStreamingWriterFactory(path, tag,
      opts.getOrElse("failoncontains", ""),
      opts.getOrElse("maxrecordsperfile", "0").toLong, hconf)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(hconf.value)
    messages.collect { case NdjsonCommitMessage(tmps, rows) if rows > 0 =>
      tmps.foreach { tmp =>
        val src = new Path(tmp)
        val fin = new Path(root,
          src.getName.replaceAll("-tid\\d+", s"-$tag-e$epochId"))
        if (!fs.rename(src, fin)) {
          if (fs.exists(fin)) fs.delete(src, false) // replayed epoch: keep first
          else throw new java.io.IOException(
            s"commit rename failed: $src -> $fin")
        }
      }
    }
    fs.delete(new Path(root, s"_temporary/$tag-e$epochId"), true)
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(hconf.value)
    fs.delete(new Path(root, s"_temporary/$tag-e$epochId"), true)
  }
}

private[ndjson] class NdjsonStreamingWriterFactory(path: String, tag: String,
    failOnContains: String, maxRecordsPerFile: Long,
    hconf: SerializableHadoopConf)
    extends streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new NdjsonDataWriter(path, s"$tag-e$epochId", partitionId, taskId,
      failOnContains, maxRecordsPerFile, hconf)
}

/** One gzip stream per task; rows are never buffered. The staged name
  * carries the task id so concurrent speculative attempts of one
  * partition never collide — only the attempt whose commit message
  * reaches [[NdjsonBatchWrite.commit]] gets published.
  *
  * maxRecordsPerFile > 0 rolls to a new staged chunk every N rows —
  * the reference's `batch_size` count cap (io/batch.go:15-37) enforced
  * INSIDE the connector, so no published file ever exceeds the cap
  * regardless of partition sizes. */
private[ndjson] class NdjsonDataWriter(path: String, tag: String,
    partitionId: Int, taskId: Long, failOnContains: String,
    maxRecordsPerFile: Long = 0L,
    hconf: SerializableHadoopConf = null) extends DataWriter[InternalRow] {

  private def chunkPath(k: Int) = new Path(path,
    f"_temporary/$tag/part-$partitionId%05d-tid$taskId-c$k%03d.log.gz")
  private val fs = chunkPath(0).getFileSystem(
    if (hconf != null) hconf.value else new Configuration())
  private var chunk = 0
  private var temp = chunkPath(0)
  private var out = new GZIPOutputStream(fs.create(temp, true))
  private var rowsInChunk = 0L
  private var total = 0L
  private val done = scala.collection.mutable.ListBuffer.empty[String]

  private def roll(): Unit = {
    out.close()
    if (rowsInChunk == 0) fs.delete(temp, false) else done += temp.toString
    chunk += 1
    temp = chunkPath(chunk)
    out = new GZIPOutputStream(fs.create(temp, true))
    rowsInChunk = 0L
  }

  override def write(record: InternalRow): Unit = {
    val line = record.getUTF8String(0)
    if (failOnContains.nonEmpty && line != null &&
      line.toString.contains(failOnContains))
      throw new RuntimeException(s"injected failure on: $line") // test knob
    if (line != null) {
      if (maxRecordsPerFile > 0 && rowsInChunk >= maxRecordsPerFile) roll()
      out.write(line.getBytes)
      out.write('\n')
      rowsInChunk += 1
      total += 1
    }
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    if (rowsInChunk == 0) fs.delete(temp, false) else done += temp.toString
    NdjsonCommitMessage(done.toList, total)
  }

  override def abort(): Unit = {
    try out.close() catch { case _: Throwable => () }
    (0 to chunk).foreach(k =>
      try fs.delete(chunkPath(k), false) catch { case _: Throwable => () })
  }

  override def close(): Unit = ()
}
