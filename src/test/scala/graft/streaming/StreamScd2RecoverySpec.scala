package graft.streaming

import graft.SparkSpec
import graft.queries.StreamingQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Checkpoint-restart recovery for streaming SCD2: a user whose state
  * (current type, since) was armed BEFORE the restart closes that
  * interval correctly only if the state was recovered from the
  * checkpoint — a fresh state would mis-open the interval at the
  * post-restart event. Append mode + foreachBatch parquet (the
  * recoverable sink). */
class StreamScd2RecoverySpec extends SparkSpec {
  import spark.implicits._

  test("scd2 state survives a stop/start; closed intervals equal batch") {
    val srcDir = java.nio.file.Files.createTempDirectory("scdsrc").toString
    val outDir = java.nio.file.Files.createTempDirectory("scdout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("scdckpt").toString

    def writeWave(tag: String, rows: Seq[(Long, Long, String, Long)]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$srcDir/$tag.json"),
        rows.map { case (u, tsSec, tp, eid) =>
          s"""{"user_id":$u,"ts":${tsSec * 1000000L},"event_type":"$tp","event_id":$eid}"""
        }.mkString("\n").getBytes("UTF-8"))

    def startQuery() = {
      val src = spark.readStream
        .schema("user_id BIGINT, ts BIGINT, event_type STRING, event_id BIGINT")
        .json(srcDir)
        .withColumn("ts", expr("timestamp_micros(ts)"))
      StreamingQueries.scd2Stream(spark, src)
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.write.mode("append").parquet(outDir)
        }
        .start()
    }

    val t0 = 1704103200L // 2024-01-01 10:00:00 UTC, epoch seconds
    // wave 1: user 1 arms state A; user 2 arms and closes A->B pre-restart
    writeWave("w1", Seq(
      (1L, t0, "A", 1L),
      (2L, t0, "A", 2L), (2L, t0 + 600, "B", 3L)))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // wave 2 (after restart): user 1's change closes the PRE-restart
    // interval — correct (valid_from = t0) only with recovered state.
    writeWave("w2", Seq(
      (1L, t0 + 3600, "B", 4L),
      (2L, t0 + 3600, "B", 5L))) // same type: no new interval
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(outDir)
      .select("user_id", "event_type", "valid_from", "valid_to")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet

    val expected = Set(
      (1L, "A", t0 * 1000000L, (t0 + 3600) * 1000000L),   // closed across restart
      (2L, "A", t0 * 1000000L, (t0 + 600) * 1000000L))    // closed pre-restart
    assert(got == expected, s"stream $got != expected $expected")
  }
}
