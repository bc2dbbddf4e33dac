package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** K3: the memory sink (reference io/config.go:27 `"memory"`, used by its
  * tests the same way) — batches land on the DRIVER as NDJSON lines,
  * count-capped into chunks exactly like the file sink's W1 law, keyed by
  * instance uid. Driver-side by definition (so is Spark's own memory
  * sink); for anything but tests use `sink = "file"`/`"s3"`. */
object MemoryBatchSink {

  /** uid → ordered (batchId, chunks of ≤ batchSize lines). */
  private val store = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.List[(Long, Seq[Seq[String]])]]

  def append(uid: String, batchId: Long, batch: DataFrame, batchSize: Int): Unit = {
    val lines = batch
      .select(to_json(struct(batch.columns.map(col): _*)).as("value"))
      .collect().map(_.getString(0)).toSeq
    val chunks = lines.grouped(math.max(1, batchSize)).toSeq
    store.computeIfAbsent(uid,
        _ => java.util.Collections.synchronizedList(new java.util.ArrayList()))
      .add((batchId, chunks))
  }

  def batches(uid: String): Seq[(Long, Seq[Seq[String]])] =
    Option(store.get(uid)).map(_.asScala.toSeq).getOrElse(Seq.empty)

  def clear(uid: String): Unit = store.remove(uid)
}
