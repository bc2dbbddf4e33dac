package graft.streaming

import graft.SparkSpec
import graft.queries.StreamingQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Checkpoint-restart recovery for the streaming funnel: a user whose
  * view lands BEFORE the restart and whose click+purchase land after
  * completes the funnel only if the (t1,_,_) slot state was recovered
  * from the checkpoint. foreachBatch parquet sink — the recoverable
  * sink for update-mode state output (memory sink refuses recovery). */
class StreamFunnelRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("funnel slots survive a stop/start; completed state equals batch") {
    val srcDir = java.nio.file.Files.createTempDirectory("fnsrc").toString
    val outDir = java.nio.file.Files.createTempDirectory("fnout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("fnckpt").toString

    def writeWave(tag: String, rows: Seq[(Long, String, String)]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$srcDir/$tag.json"),
        rows.map { case (u, ts, tp) =>
          s"""{"user_id":$u,"ts":"$ts","event_type":"$tp"}"""
        }.mkString("\n").getBytes("UTF-8"))

    def startQuery() = {
      val src = spark.readStream
        .schema("user_id BIGINT, ts TIMESTAMP, event_type STRING")
        .json(srcDir)
      StreamingQueries.funnelStream(spark, src)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.write.mode("append").parquet(outDir)
        }
        .start()
    }

    val w1 = Seq(
      (1L, "2024-01-01T10:00:00", "view"),
      (2L, "2024-01-01T10:05:00", "click")) // click before any view: ignored
    writeWave("w1", w1)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    val w2 = Seq(
      (1L, "2024-01-01T11:00:00", "click"),    // valid only if t1 recovered
      (1L, "2024-01-01T12:00:00", "purchase"),
      (2L, "2024-01-01T11:30:00", "view"))     // view after ignored click
    writeWave("w2", w2)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(outDir)
      .groupBy("user_id")
      .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap

    // User 1 completes the funnel across the restart; user 2's early
    // click never counts (it preceded the first view).
    assert(got(1L)._1.isDefined && got(1L)._2.isDefined && got(1L)._3.isDefined,
      s"user 1 incomplete across restart: ${got(1L)}")
    assert(got(2L)._1.isDefined && got(2L)._2.isEmpty, s"user 2: ${got(2L)}")

    // Final state equals the batch fold over the full event set.
    val batch = StreamingQueries.funnelStream(spark,
        (w1 ++ w2).toDF("user_id", "ts", "event_type")
          .withColumn("ts", col("ts").cast("timestamp")))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got == batch, s"stream $got != batch $batch")
  }
}
