package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** The train-once/probe-many contract of [[AnnIndex]]:
  *  1. probe() returns the same ranking an unpruned within-cell search
  *     computes (the IN-list cut removes directories, never candidates —
  *     every candidate lives in an assigned cell by construction).
  *  2. The posting scan is PARTITION-PRUNED: its FileSourceScanExec
  *     carries a partition filter on `cell`, and the selected partition
  *     directories are exactly the assigned cells — a strict subset of
  *     the index's cells. This is the property that makes probe cost
  *     ~n_probed/n_cells of the corpus at 100 TB by layout alone.
  */
class AnnIndexSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"
  private lazy val dir: String = {
    val t = java.nio.file.Files.createTempDirectory("annidx").toString
    AnnIndex.build(Tables.embeddings(spark, d), dir = t)
    t
  }

  private def queries = Tables.embeddings(spark, d)
    .filter(col("vec_id") < 4)
    .select(col("vec_id").as("qid"), col("embedding").as("qe"))

  test("probe matches the unpruned within-cell ranking") {
    import graft.functions.GraftFunctions.dot_f
    val got = AnnIndex.probe(spark, dir, queries, 3).collect().toSeq
    // Independent expected: same assignment, but the posting side reads
    // EVERY cell (no IN cut) and relies on the join to select — if the
    // pruning dropped a legitimate candidate, these would diverge.
    val assign = AnnIndex.assignCells(spark, dir, queries)
    val q = assign.join(
      queries.withColumn("qn", sqrt(dot_f(col("qe"), col("qe")))), Seq("qid"))
    val post = spark.read.parquet(s"$dir/postings")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    val expected = post
      .join(broadcast(q), post("cell") === q("cell") && col("vec_id") =!= col("qid"))
      .withColumn("cos", dot_f(col("qe"), col("ev")) / (col("qn") * col("nrm")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("qid"), col("vec_id").as("vid"), col("rk").cast("int").as("rk"),
        round(col("cos"), 4).as("cosine"))
      .orderBy(col("qid"), col("rk"))
      .collect().toSeq
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("nprobe=2 candidates are a superset: per-rank cosine never drops") {
    // Searching MORE cells can only improve the top-k — for every
    // (qid, rk) the nprobe=2 cosine is >= the nprobe=1 cosine. (The
    // FAISS recall-knob law; equality where cell 1 already held the
    // true neighbors.)
    def byRank(np: Int): Map[(Long, Int), Double] =
      AnnIndex.probe(spark, dir, queries, 3, nprobe = np).collect()
        .map(r => (r.getLong(0), r.getInt(2)) -> r.getDouble(3)).toMap
    val one = byRank(1)
    val two = byRank(2)
    assert(one.keySet == two.keySet)
    for ((k, c1) <- one)
      assert(two(k) >= c1 - 1e-9, s"rank $k: nprobe2 ${two(k)} < nprobe1 $c1")
  }

  test("probe's posting scan is partition-pruned to the assigned cells") {
    val assigned = AnnIndex.assignCells(spark, dir, queries)
      .select(col("cell")).distinct().collect().map(_.get(0).toString).toSet
    val totalCells = spark.read.parquet(s"$dir/postings")
      .select(col("cell")).distinct().count()
    assert(assigned.size < totalCells, "fixture must leave unprobed cells")
    val probeDf = AnnIndex.probe(spark, dir, queries, 3)
    val scans = probeDf.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec
          if f.relation.location.rootPaths.exists(_.toString.contains("postings")) => f
    }
    assert(scans.nonEmpty, "no FileSourceScanExec over the postings dir")
    val scan = scans.head
    assert(scan.partitionFilters.exists(_.references.exists(_.name == "cell")),
      s"postings scan carries no cell partition filter: ${scan.partitionFilters}")
    // The pruned listing selects exactly the assigned cell directories.
    val selected = scan.selectedPartitions.partitionCount
    assert(selected == assigned.size,
      s"selected $selected partition dirs, expected ${assigned.size} (of $totalCells)")
  }
}
