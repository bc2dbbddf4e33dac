package graft.plans

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.ExplainMode

/** Scan-hygiene pins: predicates must reach the parquet scan as
  * PushedFilters and projections must prune ReadSchema — the two
  * properties that decide whether a 100 TB scan reads 100 TB or the
  * few columns/row-groups the query actually needs. */
class ScanPruningSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def formatted(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution
      .explainString(ExplainMode.fromString("formatted"))

  test("agg_pricing: shipdate predicate pushed, key columns pruned away") {
    val plan = formatted("agg_pricing")
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("LessThanOrEqual(l_shipdate"),
      s"shipdate filter not pushed:\n$plan")
    // The 4 join-key/line columns are dead for this query; a scan that
    // still reads them ships ~40% extra bytes per row group.
    for (dead <- Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"))
      assert(!plan.split("ReadSchema").last.contains(dead),
        s"$dead survived column pruning")
  }

  test("proj_filter_case: IN/BETWEEN predicates pushed to the scan") {
    val plan = formatted("proj_filter_case")
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("In(") || plan.contains("GreaterThan") ||
      plan.contains("IsNotNull"), s"no pushed predicates:\n$plan")
  }

  test("join_star: fact scan pruned to the 3 needed columns") {
    val plan = formatted("join_star")
    val factRead = plan.split("\n").filter(_.contains("ReadSchema"))
      .find(_.contains("l_")).getOrElse("")
    for (dead <- Seq("l_linenumber", "l_quantity", "l_tax", "l_shipdate",
        "l_returnflag", "l_linestatus"))
      assert(!factRead.contains(dead), s"$dead survived fact-scan pruning")
  }

  test("sink_partitioned: partition filter prunes directories, not rows") {
    val plan = formatted("sink_partitioned")
    // The partitioned read must carry a PartitionFilters entry (pruned
    // listing), not a post-scan Filter on the partition column.
    assert(plan.contains("PartitionFilters: ["),
      s"no partition filters section:\n$plan")
  }

  test("text_winsorize: events scan pruned to (event_type, value) on both branches") {
    val plan = formatted("text_winsorize")
    val reads = plan.split("\n").filter(_.contains("ReadSchema"))
    assert(reads.nonEmpty)
    for (r <- reads; dead <- Seq("event_id", "user_id", "props"))
      assert(!r.contains(dead), s"$dead survived pruning in: $r")
  }

  test("sample_cap_per_source: documents scan pruned to (source, doc_id)") {
    val plan = formatted("sample_cap_per_source")
    val reads = plan.split("\n").filter(_.contains("ReadSchema"))
    assert(reads.nonEmpty)
    for (r <- reads; dead <- Seq("text", "lang", "n_chars"))
      assert(!r.contains(dead), s"$dead survived pruning in: $r")
  }

  test("ts_resample: events scan never reads props") {
    val plan = formatted("ts_resample")
    val reads = plan.split("\n").filter(_.contains("ReadSchema"))
    assert(reads.nonEmpty)
    for (r <- reads)
      assert(!r.contains("props"), s"props survived pruning in: $r")
  }
}
