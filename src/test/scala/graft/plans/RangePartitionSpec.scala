package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Range partitioning — the global-sort / sorted-write building block
  * (repartitionByRange feeds write.sortWithinPartitions for clustered
  * layouts, and is what a 100 TB ORDER BY does under the hood: sample,
  * cut, shuffle into disjoint ranges). Pins the invariant the layout
  * depends on: partitions cover DISJOINT key ranges in partition order. */
class RangePartitionSpec extends SparkSpec {
  import spark.implicits._

  test("repartitionByRange yields disjoint, ordered key ranges per partition") {
    val df = (1 to 10000).map(i => ((i * 7919) % 10007, i))
      .toDF("k", "v").repartition(8) // scrambled input
    val ranged = df.repartitionByRange(5, col("k"))
    val bounds = ranged
      .select(spark_partition_id().as("pid"), col("k"))
      .groupBy(col("pid"))
      .agg(min(col("k")).as("lo"), max(col("k")).as("hi"), count(lit(1)).as("n"))
      .orderBy(col("pid"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    assert(bounds.length == 5)
    // Disjoint + ordered: each partition's min exceeds the previous max.
    bounds.sliding(2).foreach {
      case Array((_, _, hi1, _), (_, lo2, _, _)) =>
        assert(hi1 < lo2, s"overlapping ranges: $bounds")
      case _ =>
    }
    // Balanced enough (sampled cuts): no partition is empty or >3x mean.
    val n = bounds.map(_._4)
    assert(n.sum == 10000)
    assert(n.forall(c => c > 0 && c < 3 * 10000 / 5), s"imbalanced: ${n.toSeq}")
  }
}
