package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Recall/precision laws for the MinHash/LSH near-dup pipeline,
  * checked against an INDEPENDENT driver-side all-pairs computation
  * (exact 3-shingle Jaccard from first principles — sliding window +
  * set ops, none of the pipeline's SQL). Catches band-structure or
  * signature bugs the DuckDB oracle can't (the oracle shares the
  * pipeline's formulation):
  *  - recall: every pair with true Jaccard ≥ 0.8 must surface as an
  *    LSH candidate (8 bands of 1 row ⇒ a same-minhash agreement is
  *    essentially certain at that similarity, and deterministic for
  *    this fixed data);
  *  - precision of the verify stage: every emitted exact_j must equal
  *    the independently computed Jaccard. */
class LshRecallSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val truth: Map[(Long, Long), Double] = {
    val docs = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ", -1).toSeq.sliding(3)
          .filter(_.length == 3).map(_.mkString(" ")).toSet)
      .filter(_._2.nonEmpty)
    (for {
      (i, si) <- docs; (j, sj) <- docs if i < j
      inter = si.intersect(sj).size
      if inter > 0
    } yield (i, j) -> inter.toDouble / (si.size + sj.size - inter)).toMap
  }

  private lazy val emitted: Map[(Long, Long), Double] =
    SparkEntry.queries("dedup_minhash_pairs")(spark, dir)
      .select("d1", "d2", "exact_j").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("recall: every pair with true Jaccard >= 0.8 is an LSH candidate") {
    val high = truth.filter(_._2 >= 0.8)
    assert(high.nonEmpty, "fixture has no high-similarity pair — law vacuous")
    val missed = high.keySet.diff(emitted.keySet)
    assert(missed.isEmpty, s"LSH missed high-similarity pairs: $missed")
  }

  test("verify stage: emitted exact_j equals the independent Jaccard") {
    emitted.foreach { case (pair, j) =>
      val expect = BigDecimal(truth(pair))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(j == expect, s"$pair: emitted $j != independent $expect")
    }
  }
}
