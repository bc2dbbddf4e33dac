package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Trigger.AvailableNow: process everything staged, then STOP — the
  * catch-up/backfill trigger (bounded job over the streaming engine
  * with the same state + checkpoint machinery, unlike a forever
  * ProcessingTime query). A second run with new files resumes from the
  * checkpoint and processes only the delta — the reference's
  * resync_interval replay (config.go:19-23), done as two bounded runs
  * instead of a daemon. */
class AvailableNowSpec extends SparkSpec {
  import spark.implicits._

  test("AvailableNow drains the backlog, terminates, resumes incrementally") {
    val src = java.nio.file.Files.createTempDirectory("an-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("an-ckpt").toString
    def stage(name: String, rows: Seq[Long]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$src/$name.json"),
        rows.map(i => s"""{"id":$i}""").mkString("\n").getBytes("UTF-8"))
    def runOnce(): Long = {
      val q = spark.readStream.schema("id BIGINT").json(src)
        .groupBy().agg(sum("id").as("s"))
        .writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("memory").queryName("an_out").start()
      q.awaitTermination(60000) // AvailableNow terminates on its own
      assert(!q.isActive, "AvailableNow query must stop after draining")
      spark.table("an_out").as[Long].head()
    }
    stage("w1", Seq(1L, 2L, 3L))
    assert(runOnce() == 6L)
    stage("w2", Seq(10L))
    assert(runOnce() == 16L) // resumed from checkpoint, delta included
  }
}
