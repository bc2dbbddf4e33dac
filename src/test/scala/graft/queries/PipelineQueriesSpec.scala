package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Laws for the round-5 operators that oracle parity can't express:
  * conservation (packing loses no tokens), structural invariants
  * (posting lists sorted and sized by df; CC labels form a valid
  * partition with self-labeled representatives), and the
  * partition-count invariance that makes a result valid at any cluster
  * size. */
class PipelineQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rowsAt(q: String, parts: Int): Seq[String] = {
    val k = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(k)
    spark.conf.set(k, parts.toString)
    try SparkEntry.queries(q)(spark, dir).collect().map(_.toString).toSeq
    finally {
      spark.conf.set(k, saved)
      spark.catalog.clearCache()
    }
  }

  // Note: dedup_semantic_cc internally pins its iterative contraction
  // phase to 8 partitions (deliberate loop-stage sizing), so for that
  // query this law exercises the edge build, result tail, and sort —
  // the contraction loop's own invariance is covered by cc2 sharing
  // starLabels with ClusterQueriesSpec's edit-chain fixture.
  for (q <- Seq("pack_sequences", "text_postings", "sim_rp_project",
      "dedup_semantic_cc", "agg_mad", "arr_zip_funcs", "arr_explode_outer",
      "ts_gapfill", "dq_audit", "sample_weighted", "skew_profile",
      "agg_histogram_eqdepth", "dedup_incremental"))
    test(s"$q: identical rows at 3 and 29 shuffle partitions") {
      assert(rowsAt(q, 3) == rowsAt(q, 29))
    }

  test("pack_sequences: packing conserves every token of every source") {
    val packed = SparkEntry.queries("pack_sequences")(spark, dir)
      .groupBy(col("source")).agg(sum(col("n_tokens")).as("packed"))
    val direct = graft.Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " "))).as("direct"))
    val mismatched = packed.join(direct, Seq("source"))
      .filter(col("packed") =!= col("direct")).count()
    assert(mismatched == 0)
    // Bins are contiguous from 0 per source (no gaps: the running-total
    // assignment cannot skip a capacity window).
    val bins = SparkEntry.queries("pack_sequences")(spark, dir)
      .select(col("source"), col("bin")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getInt(1)).sorted.toSeq)
    bins.foreach { case (_, bs) => assert(bs == (0 until bs.size)) }
  }

  test("text_postings: df equals posting-list length, lists ascend") {
    val rows = SparkEntry.queries("text_postings")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ids = r.getString(2).split(",").map(_.toLong).toSeq
      assert(ids.size == r.getLong(1))
      assert(ids == ids.sorted)
      assert(ids.distinct.size == ids.size)
    }
  }

  test("dedup_semantic_cc: labels form a partition with min representatives") {
    val rows = SparkEntry.queries("dedup_semantic_cc")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byRep = rows.groupBy(_._2)
    byRep.foreach { case (rep, members) =>
      // the representative is a member and the cluster minimum
      assert(members.map(_._1).min == rep)
      // every member agrees on the cluster size, and it's the real size
      assert(members.map(_._3).distinct.toSeq == Seq(members.size.toLong))
    }
  }

  test("dedup_incremental: history kill, keep-first within batch, pass-through") {
    // The natural corpus has almost no duplicate content, so the oracle
    // parity run barely exercises the dedup paths — this fixture plants
    // all three cases explicitly.
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("incdocs").toString
    Seq(
      (100L, "seen before", "en", "t", 0L),   // history
      (101L, "history only", "en", "t", 0L),  // history
      (400L, "seen before", "en", "t", 0L),   // killed by history
      (401L, "batch dup", "en", "t", 0L),     // kept (first of pair)
      (402L, "batch dup", "en", "t", 0L),     // killed within batch
      (403L, "genuinely new", "en", "t", 0L)) // kept
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val kept = SparkEntry.queries("dedup_incremental")(spark, d)
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(401L, 403L))
  }

  test("arr_explode_outer: empty-array docs survive as null-token rows") {
    val rows = SparkEntry.queries("arr_explode_outer")(spark, dir).collect()
    val nullDocs = rows.filter(_.isNullAt(1)).map(_.getLong(0)).toSet
    val expected = rows.map(_.getLong(0)).toSet.filter(_ % 5 == 0)
    assert(nullDocs == expected)
    assert(nullDocs.nonEmpty)
  }
}
