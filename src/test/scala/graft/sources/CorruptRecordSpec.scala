package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Malformed-input posture for the NDJSON source path (the wire format
  * the whole reference pipeline ingests): one corrupt line must neither
  * kill the scan nor silently vanish — PERMISSIVE parsing NULLs the
  * fields and quarantines the raw line in _corrupt_record, so a 100 TB
  * ingest survives bad records AND can report them. The scalar twin of
  * this posture is scalar_try (try_* functions). */
class CorruptRecordSpec extends SparkSpec {
  import spark.implicits._

  private def stage(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("corrupt").toString
    Files.write(Paths.get(s"$dir/data.json"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  test("PERMISSIVE (default): corrupt lines quarantined, good rows intact") {
    val dir = stage(Seq(
      """{"id":1,"v":10.0}""",
      """{"id":2,"v":""",            // truncated json
      """not json at all""",
      """{"id":3,"v":30.0}"""))
    // Corrupt-column-only queries require the parse be materialized
    // first (Spark disallows filtering raw input solely on
    // _corrupt_record) — cache is the documented pattern.
    val df = spark.read
      .schema("id BIGINT, v DOUBLE, _corrupt_record STRING")
      .json(dir).cache()
    assert(df.count() == 4) // every line surfaces as a row
    assert(df.filter(col("_corrupt_record").isNull).count() == 2)
    assert(df.filter(col("_corrupt_record").isNotNull)
      .filter(col("id").isNull).count() == 2) // corrupt rows carry no fields
    assert(df.agg(sum("v")).as[Double].head() == 40.0)
  }

  test("DROPMALFORMED: corrupt lines removed, survivors exact") {
    val dir = stage(Seq(
      """{"id":1,"v":10.0}""", "garbage", """{"id":3,"v":30.0}"""))
    val df = spark.read.option("mode", "DROPMALFORMED")
      .schema("id BIGINT, v DOUBLE").json(dir)
    assert(df.count() == 2)
  }

  test("FAILFAST: corrupt line is a loud error, not silent data loss") {
    val dir = stage(Seq("""{"id":1,"v":10.0}""", "garbage"))
    val e = intercept[Exception] {
      spark.read.option("mode", "FAILFAST")
        .schema("id BIGINT, v DOUBLE").json(dir).count()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else t.getMessage +: chain(t.getCause)
    val msgs = chain(e).mkString(" ").toLowerCase
    assert(msgs.contains("failfast") || msgs.contains("malformed") ||
      msgs.contains("failed_read_file"), msgs)
  }
}
