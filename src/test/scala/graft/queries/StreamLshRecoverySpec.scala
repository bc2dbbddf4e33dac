package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Checkpoint-restart recovery for the continuous-dedup operator: the
  * band-bucket state of stream_lsh_candidates must survive a stop/start,
  * so a near-dup pair whose two documents arrive on OPPOSITE sides of
  * the restart is still found. File source + file sink + checkpoint —
  * the recoverable trio (memory sink is not). The expected set is the
  * same transform run in BATCH mode, where flatMapGroupsWithState
  * degenerates to exactly the LSH self-join. */
class StreamLshRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("near-dup pair spanning a restart is found from recovered state") {
    val srcDir = java.nio.file.Files.createTempDirectory("lshsrc").toString
    val outDir = java.nio.file.Files.createTempDirectory("lshout").toString
    val ckpt = java.nio.file.Files.createTempDirectory("lshckpt").toString
    val dupText = (1 to 12).map(i => s"w$i").mkString(" ")
    def writeWave(tag: String, rows: Seq[(Long, String)]): Unit =
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$srcDir/$tag.json"),
        rows.map { case (id, t) => s"""{"doc_id":$id,"text":"$t"}""" }
          .mkString("\n").getBytes("UTF-8"))
    def startQuery() =
      StreamingQueries.lshCandidateStream(spark,
          spark.readStream.schema("doc_id BIGINT, text STRING").json(srcDir))
        .writeStream.format("json").option("path", outDir)
        .option("checkpointLocation", ckpt).outputMode("append").start()

    writeWave("w1", Seq(
      1L -> dupText,
      2L -> (1 to 12).map(i => s"x$i").mkString(" ")))
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    // Doc 3 duplicates doc 1 but arrives only AFTER the restart: the
    // (1,3) pair exists only if doc 1's bucket membership was recovered.
    writeWave("w2", Seq(
      3L -> dupText,
      4L -> (1 to 12).map(i => s"y$i").mkString(" ")))
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.schema("d1 BIGINT, d2 BIGINT").json(outDir)
      .distinct().as[(Long, Long)].collect().sorted.toSeq
    val expected = StreamingQueries.lshCandidateStream(spark,
        Seq(1L -> dupText, 2L -> (1 to 12).map(i => s"x$i").mkString(" "),
            3L -> dupText, 4L -> (1 to 12).map(i => s"y$i").mkString(" "))
          .toDF("doc_id", "text"))
      .distinct().as[(Long, Long)].collect().sorted.toSeq
    assert(got == expected, s"stream $got != batch $expected")
    assert(got.contains((1L, 3L)), s"cross-restart pair missing: $got")
  }
}
