package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec}
import org.apache.spark.sql.functions._

/** AQE runtime re-planning on skewed joins (SURVEY.md §4.2: what Catalyst
  * provides free, verified rather than assumed). join_salted is the
  * manual skew discipline; this pins the AUTOMATIC one — AQE detecting a
  * hot key at runtime and splitting its partition — so both 100 TB skew
  * paths (manual salt, adaptive split) are demonstrated. */
class AqeSkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed join partition at runtime (skew-join read)") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 50k rows on ONE key vs a trickle on 50 others: the hot key's
      // shuffle partition dwarfs the median and must be split.
      val left = ((1 to 50000).map(i => (0L, i.toLong)) ++
        (1 to 50).map(i => (i.toLong, i.toLong))).toDF("k", "lv")
      val right = (0 to 50).map(i => (i.toLong, s"r$i")).toDF("k", "rv")
      val joined = left.join(right, "k")
      // collect() drives joined's OWN queryExecution (count() would plan
      // a separate aggregate query whose adaptive plan we can't inspect).
      assert(joined.collect().length == 50050)
      val adaptive = joined.queryExecution.executedPlan
        .collect { case a: AdaptiveSparkPlanExec => a }
      assert(adaptive.nonEmpty, "expected an adaptive plan")
      // Query stages are leaves to TreeNode.collect — recurse into them.
      def flatten(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          p +: flatten(s.plan)
        case _ => p +: p.children.flatMap(flatten)
      }
      val skewReads = flatten(adaptive.head.executedPlan).collect {
        case r: AQEShuffleReadExec if r.hasSkewedPartition => r
      }
      assert(skewReads.nonEmpty,
        s"expected a skew-split shuffle read in:\n${adaptive.head.executedPlan}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
