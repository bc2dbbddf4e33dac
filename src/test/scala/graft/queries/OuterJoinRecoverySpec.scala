package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Checkpoint-restart recovery for the outer stream-stream join: a click
  * whose no-match verdict is only decidable AFTER a restart must still
  * emit its null-padded row — which requires the click to have survived
  * in the recovered join state AND the recovered watermark to resume
  * from the checkpoint, not from zero. File source + file sink +
  * checkpoint (the recoverable trio). */
class OuterJoinRecoverySpec extends SparkSpec {

  test("outer row decided across a restart emits from recovered state") {
    val srcDir = java.nio.file.Files.createTempDirectory("ojsrc").toString
    val outDir = java.nio.file.Files.createTempDirectory("ojout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ojckpt").toString
    def writeWave(tag: String, rows: Seq[(Long, String, Long, String)]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$srcDir/$tag.json"),
        rows.map { case (id, ts, u, et) =>
          s"""{"event_id":$id,"ts":"$ts","user_id":$u,"event_type":"$et"}"""
        }.mkString("\n").getBytes("UTF-8"))
    val schema = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING"
    def startQuery() = {
      def side() = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").json(srcDir)
      StreamingQueries.outerClickPurchaseJoin(side(), side())
        .select(col("click_id"), col("purchase_id"), col("user_id"))
        .writeStream.format("json").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()
    }

    // Wave 1: user 1 clicks and never purchases (outer row pending);
    // user 2 clicks and purchases inside the window (inner row, emits
    // immediately). The watermark after wave 1 sits an hour behind the
    // events — nothing outer can emit yet.
    writeWave("w1", Seq(
      (10L, "2024-01-01T10:00:00Z", 1L, "click"),
      (11L, "2024-01-01T10:00:00Z", 2L, "click"),
      (12L, "2024-01-01T10:10:00Z", 2L, "purchase")))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // Wave 2, AFTER the restart: a far-future sentinel pair advances
    // both watermarks past wave 1, forcing the held outer verdict for
    // user 1 — decidable only if the click and the watermark were
    // recovered from the checkpoint.
    writeWave("w2", Seq(
      (98L, "2024-06-01T00:00:00Z", -1L, "click"),
      (99L, "2024-06-01T00:00:00Z", -1L, "purchase")))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val rows = spark.read
      .schema("click_id BIGINT, purchase_id BIGINT, user_id BIGINT")
      .json(outDir)
      .filter(col("user_id") >= 0)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2)))
      .toSet
    assert(rows == Set(
      (10L, None, 1L),        // the cross-restart outer verdict
      (11L, Some(12L), 2L)))  // the eager inner match from wave 1
  }
}
