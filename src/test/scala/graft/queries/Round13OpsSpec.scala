package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Laws for the round-13 distributed-rank machinery and the PPJoin
  * candidate filters:
  *
  *  - Ranks.withGlobalRowNumber / withNtile / withRankAndCumSum must be
  *    EXTENSIONALLY EQUAL to the single-partition SQL window forms they
  *    replace, on fixtures big enough to span many range partitions and
  *    gnarly enough to hit ntile's remainder rule (n % k ≠ 0), ties on
  *    the primary order key, and descending orders. The comparison
  *    oracle is Spark's own Window.orderBy (the one-task form) on the
  *    same session — if the distributed form drifts by one position
  *    anywhere, a row differs.
  *  - The plans must contain NO unpartitioned WindowExec (that is the
  *    point), verified on the physical plan string.
  *  - Empty input must yield empty output, not throw.
  *  - The PPJoin length + positional filters must be LOSSLESS: on a
  *    planted corpus every pair the naive all-pairs Jaccard finds at
  *    t = 0.6 must survive candidate generation.
  */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(n: Int) = {
    // keys collide on purpose (k % 7) so the order needs its unique
    // tiebreak; ids descend vs key so per-partition order ≠ input order
    (1 to n).map(i => ((i % 7).toLong, (n - i).toLong, i.toLong))
      .toDF("key", "id", "w")
  }

  test("withGlobalRowNumber equals the one-partition window form") {
    val df = fixture(1000)
    val ord = Seq(col("key"), col("id"))
    val got = Ranks.withGlobalRowNumber(df, ord, "rn", numParts = 8)
    val want = df.withColumn("rn",
      row_number().over(Window.orderBy(ord: _*)).cast("long"))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("windowspecdefinition(key"),
      "window must partition by the range-partition id, not run global")
  }

  test("withNtile matches SQL ntile incl. the remainder-to-first rule") {
    // n = 1003, k = 5 → base 200, rem 3: buckets 1-3 hold 201, 4-5 hold
    // 200 — the exact remainder law; also a descending order.
    val df = fixture(1003)
    val ord = Seq(col("key").desc, col("id"))
    val got = Ranks.withNtile(df, ord, 5, "b", numParts = 8)
    val want = df.withColumn("b", ntile(5).over(Window.orderBy(ord: _*)))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    val sizes = got.groupBy("b").count().orderBy("b")
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(sizes.toSeq == Seq((1, 201L), (2, 201L), (3, 201L),
      (4, 200L), (5, 200L)))
  }

  test("withRankAndCumSum equals rank + running sum + window totals") {
    val df = fixture(500)
    val ord = Seq(col("w").desc, col("id"))
    val got = Ranks.withRankAndCumSum(df, ord, col("w"),
      "rk", "cum", "tot", "n", numParts = 8)
    val wOrd = Window.orderBy(ord: _*)
    val wAll = Window.partitionBy()
    val want = df
      .withColumn("rk", row_number().over(wOrd).cast("long"))
      .withColumn("cum", sum(col("w")).over(wOrd))
      .withColumn("tot", sum(col("w")).over(wAll))
      .withColumn("n", count(lit(1)).over(wAll))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("three CHAINED withNtile cuts equal the chained window form (rfm shape)") {
    val df = fixture(1000).withColumn("m", (col("id") * 7) % 1000)
    val got = Ranks.withNtile(
      Ranks.withNtile(
        Ranks.withNtile(df, Seq(col("key").desc, col("id")), 5, "a", 8),
        Seq(col("w").desc, col("id")), 5, "b", 8),
      Seq(col("m").desc, col("id")), 5, "c", 8)
    val want = df
      .withColumn("a", ntile(5).over(Window.orderBy(col("key").desc, col("id"))))
      .withColumn("b", ntile(5).over(Window.orderBy(col("w").desc, col("id"))))
      .withColumn("c", ntile(5).over(Window.orderBy(col("m").desc, col("id"))))
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("Ranks helpers return empty on empty input (no throw)") {
    val empty = fixture(10).filter(lit(false))
    assert(Ranks.withGlobalRowNumber(empty, Seq(col("id")), "rn").count() == 0)
    assert(Ranks.withNtile(empty, Seq(col("id")), 4, "b").count() == 0)
    assert(Ranks.withRankAndCumSum(empty, Seq(col("id")), col("w"),
      "rk", "cum", "tot", "n").count() == 0)
  }

  test("ntileOf handles n < k (base 0: every row its own fat bucket)") {
    val df = fixture(3)
    val got = Ranks.withNtile(df, Seq(col("id")), 5, "b", numParts = 4)
      .orderBy("id").select("b").as[Int].collect().toSeq
    assert(got == Seq(1, 2, 3))
  }

  test("PPJoin length+positional filters are lossless on a planted corpus") {
    val d = java.nio.file.Files.createTempDirectory("ppj").toString
    // Docs: a near-dup pair (shared 9/10 tokens), an identical-set pair
    // (distinct docs, same shingles), a contained fragment (fails the
    // length filter legitimately: j < 0.6), and unrelated noise.
    val base = (1 to 12).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base, "en", "a", base.length),
      (2L, base.replace("tok12", "zzz"), "en", "a", base.length),
      (3L, "alpha beta gamma delta epsilon zeta", "en", "a", 30),
      (4L, "alpha beta gamma delta epsilon zeta", "en", "a", 30),
      (5L, "alpha beta gamma", "en", "a", 12), // short fragment
      (6L, "one two three four five six seven", "en", "a", 30))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = graft.SparkEntry.queries("dedup_prefix_jaccard")(spark, d)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    // Naive truth at t = 0.6 over word 3-shingles:
    val sh = TextQueries.shingles(spark, d)
      .as[(Long, String)].collect().groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val truth = (for {
      a <- sh.keys; b <- sh.keys if a < b
      i = (sh(a) & sh(b)).size
      u = (sh(a) | sh(b)).size
      if u > 0 && i.toDouble / u >= 0.6
    } yield (a, b)).toSet
    assert(truth.nonEmpty && out == truth,
      s"filtered PPJoin missed/invented pairs: got $out want $truth")
  }
}
