package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: prints the formatted physical plan for the named
  * queries (or a pushdown/codegen summary for all).
  *
  *   runMain graft.Explain <sfDir> [query ...]
  *   runMain graft.Explain <sfDir> --summary
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val rest = args.drop(1).toSeq
    val spark = GraftSession.configure(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (rest.contains("--summary")) {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        if (!name.startsWith("stream_")) {
          try {
            // explainString, not executedPlan.toString: AQE's top node
            // hides the subtree until the final plan materializes.
            val plan = fn(spark, sfDir).queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            val pushed = plan.contains("PushedFilters: [") &&
              !plan.split("PushedFilters: ").tail.forall(_.startsWith("[]"))
            val codegen = plan.contains("codegen id")
            val bhj = plan.contains("BroadcastHashJoin")
            val smj = plan.contains("SortMergeJoin")
            // nested-loop joins are the quadratic trap — only join_cross
            // (a deliberate bounded cross) should ever show nlj=true
            val nlj = plan.contains("NestedLoop")
            println(f"$name%-28s codegen=$codegen%-5s pushed=$pushed%-5s bhj=$bhj%-5s smj=$smj%-5s nlj=$nlj")
          } catch { case e: Throwable => println(s"$name ERROR ${e.getMessage}") }
        }
      }
    } else {
      rest.foreach { name =>
        println(s"===== $name =====")
        SparkEntry.queries(name)(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
