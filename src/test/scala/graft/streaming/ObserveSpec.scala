package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dataset.observe — in-flight metric collection without a second scan
  * (the instrumentation sibling of the Heartbeat listener: a production
  * pipeline reports row counts / error rates from the SAME pass that
  * does the work; at 100 TB a separate count() is a second full job). */
class ObserveSpec extends SparkSpec {
  import spark.implicits._

  test("observe reports pipeline metrics from the working pass (no second scan)") {
    val df = (1 to 1000).map(i => (i.toLong, if (i % 10 == 0) "" else s"t$i"))
      .toDF("id", "text")
    val observed = df.observe("ingest",
      count(lit(1)).as("rows"),
      count(when(col("text") === "", 1)).as("empty"),
      sum(col("id")).as("id_sum"))
    val downstream = observed.filter(col("text") =!= "")
    assert(downstream.collect().length == 900)
    // Metrics describe the observed point (pre-filter) and are attached
    // to the execution that actually ran — the downstream one.
    val m = downstream.queryExecution.observedMetrics("ingest")
    assert(m.getAs[Long]("rows") == 1000L)
    assert(m.getAs[Long]("empty") == 100L)
    assert(m.getAs[Long]("id_sum") == (1 to 1000).map(_.toLong).sum)
  }
}
