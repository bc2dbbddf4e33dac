package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Transitivity test for connected-component dedup clustering: a CHAIN
  * A–B–C (A,B candidates; B,C candidates; A,C share NO shingles) must
  * still collapse to one cluster — the label needs ≥2 propagation
  * rounds to travel A→B→C, which a single candidate-pair pass would
  * miss. Fixture edges verified to be exactly {(1,2),(2,3)}. */
class ClusterQueriesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("chaindocs").toString
    val a = (1 to 20).map(i => s"alpha$i").mkString(" ")
    val c = (1 to 20).map(i => s"gamma$i").mkString(" ")
    val b = ((11 to 20).map(i => s"alpha$i") ++ (1 to 10).map(i => s"gamma$i")).mkString(" ")
    val e = (1 to 20).map(i => s"delta$i").mkString(" ")
    Seq((1L, a, "en", "t", 0L), (2L, b, "en", "t", 0L),
        (3L, c, "en", "t", 0L), (4L, e, "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  for (q <- Seq("dedup_cluster_cc", "dedup_cluster_cc2"))
    test(s"$q: chain A-B-C collapses to one cluster; isolated doc stays alone") {
      val out = SparkEntry.queries(q)(spark, dir)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(out(1L) == ((1L, 3L)))  // rep = min id, component size 3
      assert(out(2L) == ((1L, 3L)))
      assert(out(3L) == ((1L, 3L)))  // 2 hops from its rep
      assert(out(4L) == ((4L, 1L)))  // singleton labels itself
    }

  // A 8-deep edit chain doc1–doc2–…–doc8 (consecutive docs share half
  // their shingles, non-consecutive share none): the worst case for
  // per-hop label propagation and exactly where star contraction's
  // O(log n) bound matters. Both formulations must agree with each
  // other AND collapse the whole chain to rep=1.
  private lazy val chainDir: String = {
    val d = java.nio.file.Files.createTempDirectory("deepchain").toString
    val words = (1 to 9).map(i => (1 to 10).map(j => s"w${i}_$j"))
    val docs = (1 to 8).map { i =>
      (i.toLong, (words(i - 1) ++ words(i)).mkString(" "), "en", "t", 0L)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("deep chain: both CC formulations agree and collapse to one cluster") {
    val a = SparkEntry.queries("dedup_cluster_cc")(spark, chainDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val b = SparkEntry.queries("dedup_cluster_cc2")(spark, chainDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.toSeq == b.toSeq)
    assert(a.forall { case (_, rep, n) => rep == 1L && n == 8L })
  }

  test("skew stress: a planted ~10% hot-band cluster resolves to one rep " +
    "and star contraction still converges in O(log n) rounds") {
    // Real corpus (500 docs at sf0.01) with every 10th doc replaced by a
    // shared base text — the planted giant component funnels ~50 docs
    // into the same LSH band buckets, the worst-case band skew.
    val out = SparkEntry.queries("dedup_cluster_cc_skew")(spark,
      "/root/testdata/sf0.01")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val planted = out.keys.filter(_ % 10 == 0).toSeq
    assert(planted.size == 50)
    // Every planted doc must reach the hub's min id (0): the suffix-only
    // difference leaves ≥1 of 8 bands agreeing with overwhelming margin,
    // and the contraction must carry the label across the whole star.
    assert(planted.forall(id => out(id)._1 == 0L),
      s"planted docs escaping the cluster: ${planted.filterNot(id => out(id)._1 == 0L).take(5)}")
    assert(out(0L)._2 >= 50L, s"hub component size ${out(0L)._2} < 50")
    // The giant star must not degrade convergence: large-star/small-star
    // guarantees O(log n); a near-clique collapses in a handful of
    // rounds. 8 is log2(50)+margin — a quadratic or stalled contraction
    // blows straight past it (cap is 50).
    val rounds = ClusterQueries.lastStarRounds.get()
    assert(rounds >= 1 && rounds <= 8,
      s"star contraction took $rounds rounds on the planted hot band")
  }
}
