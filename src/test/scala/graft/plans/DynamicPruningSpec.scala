package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Dynamic partition pruning (SURVEY.md §4.2): joining a
  * partition-column-keyed fact with a selectively-filtered dimension must
  * prune fact partitions at RUNTIME from the dim's join keys — the
  * partition-level complement of RuntimeFilterSpec's row-level bloom
  * pruning. At 100 TB, a date-partitioned fact joined to "last week's"
  * dim rows reads 7 directories, not 2,500. */
class DynamicPruningSpec extends SparkSpec {
  import spark.implicits._

  test("selective dim filter prunes fact partitions at runtime") {
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString
    // Fact partitioned by k: 10 partitions on disk.
    (1 to 1000).map(i => (i.toLong, i % 10)).toDF("id", "k")
      .write.partitionBy("k").mode("overwrite").parquet(s"$dir/fact")
    (0 until 10).map(i => (i, if (i < 2) "keep" else "drop")).toDF("k", "tag")
      .write.mode("overwrite").parquet(s"$dir/dim")
    val fact = spark.read.parquet(s"$dir/fact")
    val dim = spark.read.parquet(s"$dir/dim").filter(col("tag") === "keep")
    val j = fact.join(dim, Seq("k")).agg(count(lit(1)).as("n"))
    assert(j.collect().head.getLong(0) == 200L) // k ∈ {0,1} → 100 rows each
    val executed = j.queryExecution.executedPlan.toString
    assert(executed.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic partition pruning filter on the fact scan:\n$executed")
  }

  test("indexed-IVF probe prunes posting-list partitions dynamically") {
    val plan = graft.SparkEntry.queries("sim_knn_ivf_indexed")(
        spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected the cell-partitioned postings scan to carry a DPP filter:\n$plan")
  }
}
