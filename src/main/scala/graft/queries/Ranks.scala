package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — the 100 TB replacement for the
  * single-partition `Window.orderBy(...)` that `ntile`/`row_number`/
  * running-`sum` over an unpartitioned window forces ("No Partition
  * Defined for Window operation" → ALL rows sort on ONE core).
  *
  * Mechanics: range-repartition on the order keys (Spark's own
  * global-sort machinery — contiguous, non-overlapping key ranges per
  * partition, the same exchange a distributed ORDER BY uses), freeze
  * the partitioning with an eager `localCheckpoint`, then
  *
  *   global_rank(row) = rows_in_earlier_partitions(pid) +
  *                      row_number() within its partition
  *
  * The per-partition row counts are a numPartitions-row driver rollup
  * (bounded by config, never by data — the same "bounded collect"
  * contract as AnnIndex's probe cell set), re-broadcast as a tiny
  * offset relation. Every window below partitions by `__gr_pid`, so
  * the sort work is numPartitions-way parallel and each task sorts
  * only its range slice. Semantics are EXACTLY SQL's: given a total
  * order (callers tie-break to uniqueness, DETERMINISM.md §ntile),
  * rank/cumsum/ntile here are pure integer arithmetic on the same row
  * positions the one-partition form would produce — oracle hashes are
  * unchanged by construction.
  *
  * The checkpoint is deliberate: the offset rollup and the ranked
  * output MUST see identical partition contents; localCheckpoint
  * materializes the exchange once so the range boundaries (sampled,
  * but deterministically — RangePartitioner's sketch seeds by
  * partition index) cannot drift between the two jobs, and the main
  * query re-reads shuffle-local blocks instead of recomputing the
  * child plan.
  */
private[queries] object Ranks {

  /** Per-partition (pid, rowCount, valueSum) rollup + grand totals.
    * Value sums ride LONG arithmetic — callers pass integral measures
    * (counts), so offsets and totals are exact and order-free. */
  final case class Layout(parted: DataFrame, offsets: Seq[(Int, Long, Long)],
      nRows: Long, valueTotal: Long)

  /** Size-adaptive partition count for the range exchange (r15, guide
    * §2: derive partitioning from input size instead of pinning a
    * constant): ceil(optimizer size estimate / 64 MB per partition),
    * clamped to [1, max(requested, session shuffle partitions)]. A
    * 10k-row quantile input collapses to one range partition (the 32
    * near-empty sort tasks were pure scheduling overhead), while a
    * cluster run with shuffle.partitions sized to the job scales the
    * same exchange up past the 32 default. Global rank/ntile/cumsum
    * are partitioning-invariant by construction (offset arithmetic on
    * contiguous ranges), so results are identical at any count. */
  private def adaptiveParts(df: DataFrame, requested: Int): Int = {
    val bytes =
      try BigInt(df.queryExecution.optimizedPlan.stats.sizeInBytes.toString)
      catch { case _: Throwable => BigInt(-1) }
    if (bytes <= 0) requested
    else {
      val cap = math.max(requested,
        try df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
        catch { case _: Throwable => requested })
      val want = (bytes / (64L << 20)) + 1
      want.min(BigInt(cap)).max(BigInt(1)).toInt
    }
  }

  private def layout(df: DataFrame, order: Seq[Column], numParts: Int,
      value: Option[Column]): Layout = {
    val parted = df
      .repartitionByRange(adaptiveParts(df, numParts), order: _*)
      .withColumn("__gr_pid", spark_partition_id())
      .localCheckpoint()
    val rolled = parted.groupBy(col("__gr_pid"))
      .agg(count(lit(1)).as("__gr_n"),
        value.map(v => sum(v.cast("long")))
          .getOrElse(lit(0L)).as("__gr_s"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2)))
      .sortBy(_._1)
    Layout(parted, rolled.toSeq, rolled.map(_._2).sum, rolled.map(_._3).sum)
  }

  /** df + a 1-based global row_number (LongType) over `order`, which
    * must be a total order. No single-partition window anywhere. */
  def withGlobalRowNumber(df: DataFrame, order: Seq[Column],
      out: String, numParts: Int = 32): DataFrame = {
    val l = layout(df, order, numParts, None)
    joinRanked(l, order, out).drop("__gr_pid")
  }

  /** df + exact SQL `ntile(k)` (IntegerType) over total order `order`.
    * Bucket bounds are driver-side literals from the offset rollup:
    * base = n/k rows per bucket, the first n%k buckets take one extra
    * — the standard remainder-to-first rule, applied to the
    * distributed rank instead of a one-core window. */
  def withNtile(df: DataFrame, order: Seq[Column], k: Int,
      out: String, numParts: Int = 32): DataFrame = {
    val l = layout(df, order, numParts, None)
    val rk = "__gr_rk_" + out
    // exact INTEGER arithmetic (`div`, never Column `/` which is
    // double division and could round across a bucket boundary at
    // extreme ranks): with n rows, base = n/k and rem = n%k, ranks
    // ≤ rem*(base+1) fall in the first rem (fat) buckets, the rest
    // in base-sized ones — SQL ntile's remainder-to-first rule.
    val n = l.nRows
    val base = n / k
    val rem = n % k
    val cut = rem * (base + 1)
    val baseSafe = math.max(base, 1L)
    joinRanked(l, order, rk)
      .withColumn(out, expr(
        s"""CAST(CASE WHEN $rk <= $cut
           |  THEN ($rk - 1) div ${base + 1} + 1
           |  ELSE $rem + ($rk - $cut - 1) div $baseSafe + 1
           |END AS INT)""".stripMargin))
      .drop(rk, "__gr_pid")
  }

  /** df + global row_number AND running sum(value) (inclusive, over the
    * same total order), plus grand totals as literal columns — the
    * Pareto/cume_dist shape: `sum(v) OVER (ORDER BY ...)`,
    * `sum(v) OVER ()`, `count(*) OVER ()` in one pass, none of them a
    * one-partition window. Running sum adds the partition's value
    * offset to the within-partition running sum. */
  def withRankAndCumSum(df: DataFrame, order: Seq[Column], value: Column,
      rankOut: String, cumOut: String, totalOut: String, nOut: String,
      numParts: Int = 32): DataFrame = {
    val l = layout(df, order, numParts, Some(value))
    var accN = 0L
    var accS = 0L
    val rows = l.offsets.map { case (p, n, sv) =>
      val r = (p, accN, accS); accN += n; accS += sv; r
    }
    val spark = df.sparkSession
    val off = spark.createDataFrame(rows).toDF("__gr_pid", "__gr_off", "__gr_soff")
    val w = Window.partitionBy(col("__gr_pid")).orderBy(order: _*)
    l.parted.join(broadcast(off), Seq("__gr_pid"))
      .withColumn(rankOut,
        row_number().over(w).cast("long") + col("__gr_off"))
      .withColumn(cumOut,
        sum(value.cast("long")).over(w) + col("__gr_soff"))
      .withColumn(totalOut, lit(l.valueTotal))
      .withColumn(nOut, lit(l.nRows))
      .drop("__gr_pid", "__gr_off", "__gr_soff")
  }

  private def joinRanked(l: Layout, order: Seq[Column],
      out: String): DataFrame = {
    var acc = 0L
    val rows = l.offsets.map { case (p, n, _) =>
      val r = (p, acc); acc += n; r
    }
    val spark = l.parted.sparkSession
    val off = spark.createDataFrame(rows).toDF("__gr_pid", "__gr_off")
    val w = Window.partitionBy(col("__gr_pid")).orderBy(order: _*)
    l.parted.join(broadcast(off), Seq("__gr_pid"))
      .withColumn(out, row_number().over(w).cast("long") + col("__gr_off"))
      .drop("__gr_off")
  }

}
