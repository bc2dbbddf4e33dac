package graft.streaming

import graft.SparkSpec
import graft.queries.StreamingQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Checkpoint-restart recovery for the v2-state (transformWithState +
  * RocksDB) twins of SCD2 and the funnel — the same cross-restart
  * guarantees StreamScd2RecoverySpec / StreamFunnelRecoverySpec pin
  * for the fMGWS forms: state armed BEFORE the restart must shape what
  * is emitted AFTER it, and the final answer must equal the batch
  * fold over the full event set. foreachBatch parquet sink (the
  * recoverable sink). */
class TwsRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def rocksSession() = {
    val s = graft.Sessions.withShufflePartitions(spark, 4)
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  test("tws scd2 state survives a stop/start; closed intervals equal batch") {
    val srcDir = java.nio.file.Files.createTempDirectory("twsscdsrc").toString
    val outDir = java.nio.file.Files.createTempDirectory("twsscdout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("twsscdckpt").toString
    val ss = rocksSession()

    def writeWave(tag: String, rows: Seq[(Long, Long, String, Long)]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$srcDir/$tag.json"),
        rows.map { case (u, tsSec, tp, eid) =>
          s"""{"user_id":$u,"ts":${tsSec * 1000000L},"event_type":"$tp","event_id":$eid}"""
        }.mkString("\n").getBytes("UTF-8"))

    def startQuery() = {
      val src = ss.readStream
        .schema("user_id BIGINT, ts BIGINT, event_type STRING, event_id BIGINT")
        .json(srcDir)
        .withColumn("ts", expr("timestamp_micros(ts)"))
      StreamingQueries.scd2StreamTws(ss, src)
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

    val got = ss.read.parquet(outDir)
      .select("user_id", "event_type", "valid_from", "valid_to")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3))).toSet

    val expected = Set(
      (1L, "A", t0 * 1000000L, (t0 + 3600) * 1000000L),   // closed across restart
      (2L, "A", t0 * 1000000L, (t0 + 600) * 1000000L))    // closed pre-restart
    assert(got == expected, s"stream $got != expected $expected")
  }

  test("tws funnel slots survive a stop/start; final state equals the " +
    "fMGWS batch fold (cross-API equivalence)") {
    val srcDir = java.nio.file.Files.createTempDirectory("twsfnsrc").toString
    val outDir = java.nio.file.Files.createTempDirectory("twsfnout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("twsfnckpt").toString
    val ss = rocksSession()

    def writeWave(tag: String, rows: Seq[(Long, String, String, Long)]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$srcDir/$tag.json"),
        rows.map { case (u, ts, tp, eid) =>
          s"""{"user_id":$u,"ts":"$ts","event_type":"$tp","event_id":$eid}"""
        }.mkString("\n").getBytes("UTF-8"))

    def startQuery() = {
      val src = ss.readStream
        .schema("user_id BIGINT, ts TIMESTAMP, event_type STRING, event_id BIGINT")
        .json(srcDir)
      StreamingQueries.funnelStreamTws(ss, src)
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, _: Long) =>
          df.write.mode("append").parquet(outDir)
        }
        .start()
    }

    val w1 = Seq(
      (1L, "2024-01-01T10:00:00", "view", 1L),
      (2L, "2024-01-01T10:05:00", "click", 2L)) // click before any view: ignored
    writeWave("w1", w1)
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    val w2 = Seq(
      (1L, "2024-01-01T11:00:00", "click", 3L),    // valid only if t1 recovered
      (1L, "2024-01-01T12:00:00", "purchase", 4L),
      (2L, "2024-01-01T11:30:00", "view", 5L))     // view after ignored click
    writeWave("w2", w2)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val got = ss.read.parquet(outDir)
      .groupBy("user_id")
      .agg(max("t1").as("t1"), max("t2").as("t2"), max("t3").as("t3"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap

    assert(got(1L)._1.isDefined && got(1L)._2.isDefined && got(1L)._3.isDefined,
      s"user 1 incomplete across restart: ${got(1L)}")
    assert(got(2L)._1.isDefined && got(2L)._2.isEmpty, s"user 2: ${got(2L)}")

    // Cross-API law: the v2-state stream's final answer equals the
    // fMGWS transform's batch fold over the full event set, slot
    // values included (both emit micros).
    val batch = StreamingQueries.funnelStream(spark,
        (w1 ++ w2).map(r => (r._1, r._2, r._3))
          .toDF("user_id", "ts", "event_type")
          .withColumn("ts", col("ts").cast("timestamp")))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got == batch, s"tws stream $got != fMGWS batch $batch")
  }
}
