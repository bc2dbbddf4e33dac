package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning (SURVEY.md §4.2) — Catalyst's
  * semi-join reduction: when one join side carries a selective filter,
  * the optimizer builds a bloom filter over its join keys and applies it
  * to the other side's scan, so probe rows that cannot match never reach
  * the shuffle. At 100 TB this is the difference between shuffling the
  * full fact table and shuffling only the ~matching fraction. join_salted
  * and AqeSkewSpec pin the skew paths; this pins the row-pruning one.
  * Thresholds are lowered because the testdata is far below the
  * production defaults (10 MB creation side / 10 GB probe scan). */
class RuntimeFilterSpec extends SparkSpec {

  test("selective build side injects a bloom filter on the probe-side scan") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = "/root/testdata/sf0.001"
      val li = Tables.lineitem(spark, dir)
      val ord = Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("bloom"),
        s"expected a bloom runtime filter in the optimized plan:\n$optimized")
      // The filter must prune, not change the answer: compare to the
      // plain join with the rule off.
      val n = j.collect().head.getLong(0)
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n")).collect().head.getLong(0)
      assert(n == plain, s"bloom-filtered count $n != plain count $plain")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
