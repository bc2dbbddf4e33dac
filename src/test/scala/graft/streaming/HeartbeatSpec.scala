package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** X2: heartbeat pings per progress report; hook returning false stops
  * the query (the reference's HTTP-426 remote-kill path). */
class HeartbeatSpec extends SparkSpec {
  import spark.implicits._
  implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("hook gets progress JSON; returning false stops the query") {
    val pings = new AtomicInteger(0)
    val listener = Heartbeat.attach(spark, { json =>
      assert(json.contains("\"id\""))
      pings.incrementAndGet() < 2  // kill on the 2nd ping
    })
    try {
      val in = MemoryStream[(String, Timestamp)]
      val q = in.toDF().toDF("k", "ts")
        .writeStream.format("memory").queryName("hbout")
        .trigger(Trigger.ProcessingTime(100))
        .start()
      // progress events only fire for batches with work — feed two
      in.addData(("a", Timestamp.valueOf("2024-01-01 10:00:00")))
      q.processAllAvailable()
      in.addData(("b", Timestamp.valueOf("2024-01-01 10:01:00")))
      try q.processAllAvailable() catch { case _: Throwable => () } // may race the stop
      val stopped = q.awaitTermination(30000)
      assert(stopped, "query should have been stopped by the heartbeat")
      assert(pings.get() >= 2)
    } finally spark.streams.removeListener(listener)
  }
}
