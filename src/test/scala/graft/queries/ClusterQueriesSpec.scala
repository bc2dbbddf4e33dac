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

  test("chain A-B-C collapses to one cluster; isolated doc stays alone") {
    val out = SparkEntry.queries("dedup_cluster_cc")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((1L, 3L)))  // rep = min id, component size 3
    assert(out(2L) == ((1L, 3L)))
    assert(out(3L) == ((1L, 3L)))  // 2 hops from its rep
    assert(out(4L) == ((4L, 1L)))  // singleton labels itself
  }
}
