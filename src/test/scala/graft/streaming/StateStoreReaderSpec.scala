package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** Operational state OBSERVABILITY: the State Data Source reader
  * (format "statestore") reads a stopped query's checkpoint back as a
  * DataFrame — the Spark-4 ops tool for debugging a 100 TB stateful
  * job's state without replaying it. The law checked here: after a
  * RunningMaxProcessor replay, the checkpoint's `maxValue` state var
  * holds exactly the per-key running max the batch aggregation
  * computes over the same input. */
class StateStoreReaderSpec extends SparkSpec {
  import spark.implicits._
  implicit val sp: org.apache.spark.sql.SparkSession = spark
  implicit lazy val sc: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def ts(h: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")

  test("statestore reader: checkpointed ValueState equals the batch running max") {
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksProvider)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-ssr-ckpt").toString
    try {
      val in = MemoryStream[EventRec]
      val out = in.toDS()
        .groupByKey(_.user_id)
        .transformWithState(new RunningMaxProcessor,
          TimeMode.None(), OutputMode.Append())
      val q = out.writeStream.format("memory").queryName("ssr_out")
        .option("checkpointLocation", ckpt)
        .outputMode(OutputMode.Append).start()
      try {
        in.addData(
          EventRec(1L, ts(1), 10L, 5.0),
          EventRec(2L, ts(2), 10L, 3.0), // below max → no state change
          EventRec(3L, ts(1), 20L, 1.0))
        q.processAllAvailable()
        in.addData(
          EventRec(4L, ts(3), 10L, 9.0), // new max for 10
          EventRec(5L, ts(2), 20L, 0.5), // below → 20 stays at 1.0
          EventRec(6L, ts(1), 30L, 7.0))
        q.processAllAvailable()
      } finally q.stop()

      val state = spark.read.format("statestore")
        .option("stateVarName", "maxValue")
        .load(ckpt)
      // Reader schema: key struct carries the grouping key, value struct
      // the state — flatten both and compare against the expected maxima.
      val flat = state.selectExpr("key.*", "value.*")
      val cols = flat.columns
      val got = flat.collect()
        .map(r => (r.getLong(0), r.getDouble(cols.length - 1)))
        .toMap
      assert(got == Map(10L -> 9.0, 20L -> 1.0, 30L -> 7.0),
        s"state mismatch (cols=${cols.mkString(",")}): $got")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }
}
