package graft.streaming

import graft.SparkSpec
import graft.k8s._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** D2 on the Spark 4 arbitrary-state API (transformWithState): same
  * emission law as the flatMapGroupsWithState form — only strictly
  * newer resourceVersions pass, out-of-order batches emit the
  * ascending prefix. Requires the RocksDB state store provider (the
  * API rejects the HDFS-backed default), set just for this suite. */
class VersionedDedupProcessorSpec extends SparkSpec {
  import spark.implicits._
  implicit val sp: org.apache.spark.sql.SparkSession = spark
  implicit lazy val sc: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val providerKey = "spark.sql.streaming.stateStore.providerClass"
  private val rocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("transformWithState D2: strictly-newer pass, ascending prefix in-batch") {
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey, rocksProvider)
    try {
      val in = MemoryStream[KubeService]
      val out = VersionedDedupProcessor.dedupServicesVersioned(in.toDS())
      val q = out.writeStream.format("memory").queryName("d2tws")
        .outputMode(OutputMode.Append).start()
      def svc(v: String) = KubeService("s1", v, "svc", "default", Map(), Map(), Map())
      try {
        in.addData(svc("2"))
        q.processAllAvailable()
        in.addData(svc("1"))           // stale → dropped
        q.processAllAvailable()
        in.addData(svc("10"), svc("4")) // out of order in one batch:
        q.processAllAvailable()         // ascending prefix → 4 then 10
        in.addData(svc("10"))          // equal → dropped
        q.processAllAvailable()
        val got = spark.table("d2tws")
          .select("resource_version").as[String].collect()
        assert(got.toSeq == Seq("2", "4", "10"))
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None    => spark.conf.unset(providerKey)
      }
    }
  }
}
