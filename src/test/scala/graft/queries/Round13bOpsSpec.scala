package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Laws for the round-13 second batch — each query re-derived in plain
  * JVM Scala on a planted fixture (closed forms where the arithmetic is
  * small enough to do by hand, brute force where the query's value IS
  * that it avoids brute force):
  *
  *  - sketch_bloom: zero false negatives BY CONSTRUCTION, and the
  *    measured false-positive set must equal a JVM-md5 brute force of
  *    the same k=4 / m=4096 filter.
  *  - eval_wilcoxon_signed: hand-computed W⁺/z on a 5-pair fixture that
  *    exercises the drop-zeros rule AND a tied magnitude.
  *  - eval_cliffs_delta: δ must equal the naive Σ sign(a−b)/(n_A·n_B)
  *    over all cross pairs, with arms re-derived from the same md5 coin.
  *  - pipe_privacy_dp_binomial: noise must equal popcount(first 16 md5
  *    bits) − 8 exactly, clamp at zero must hold, and sub-threshold
  *    groups must be absent from the release.
  */
class Round13bOpsSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("sketch_bloom: no false negatives; FP set equals JVM brute force") {
    val d = tmp("bloom")
    val buildKeys = (1L to 400L).map(_ * 3) // custkeys 3,6,...,1200
    val probeKeys = (1L to 1500L)           // superset
    buildKeys.map(k => (k, k, "O", 1.0)).toDF(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    probeKeys.map(k => (k, s"c$k", 0L)).toDF(
        "c_custkey", "c_name", "c_nationkey")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")

    def positions(k: Long): Set[Long] =
      (0 to 3).map(r =>
        java.lang.Long.parseLong(md5hex(s"$r:$k").substring(0, 3), 16)).toSet
    val bits = buildKeys.flatMap(positions).toSet
    val expectFp = probeKeys
      .filterNot(buildKeys.contains)
      .count(k => positions(k).forall(bits.contains))

    val row = graft.SparkEntry.queries("sketch_bloom")(spark, d).collect()(0)
    assert(row.getAs[Boolean]("no_false_neg"))
    assert(row.getAs[Long]("n_build") == 400L)
    assert(row.getAs[Long]("bits_set") == bits.size.toLong)
    assert(row.getAs[Long]("n_neg") == (1500 - 400).toLong)
    assert(row.getAs[Long]("n_fp") == expectFp.toLong,
      s"fp mismatch: got ${row.getAs[Long]("n_fp")} want $expectFp")
  }

  test("eval_wilcoxon_signed: hand-computed W+/z with drop-zeros and a tie") {
    val d = tmp("wilcox")
    // Pre epoch < 1705363200 (2024-01-16), post >= . Diffs per user:
    // u1 +3, u2 -1, u3 +2, u4 +2, u5 0 (dropped). |d| ranks: 1→1,
    // {2,2}→2.5, 3→4 ⇒ W+ = 4 + 2.5 + 2.5 = 9, n = 4, ties Σ(t³−t)=6.
    val pre = Timestamp.valueOf("2024-01-10 00:00:00")
    val post = Timestamp.valueOf("2024-01-20 00:00:00")
    val rows = Seq(
      (1L, pre, 1L, "purchase", 10.0, "{}"), (2L, post, 1L, "purchase", 13.0, "{}"),
      (3L, pre, 2L, "purchase", 10.0, "{}"), (4L, post, 2L, "purchase", 9.0, "{}"),
      (5L, pre, 3L, "purchase", 10.0, "{}"), (6L, post, 3L, "purchase", 12.0, "{}"),
      (7L, pre, 4L, "purchase", 10.0, "{}"), (8L, post, 4L, "purchase", 12.0, "{}"),
      (9L, pre, 5L, "purchase", 10.0, "{}"), (10L, post, 5L, "purchase", 10.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = graft.SparkEntry.queries("eval_wilcoxon_signed")(spark, d).collect()(0)
    assert(r.getAs[Long]("n_pairs") == 4L)
    assert(r.getAs[Double]("w_plus") == 9.0)
    assert(r.getAs[Double]("z_stat") == 1.4729)
    assert(!r.getAs[Boolean]("significant"))
  }

  test("eval_cliffs_delta equals the naive cross-pair sign mean") {
    val d = tmp("cliffs")
    val pre = Timestamp.valueOf("2024-01-10 00:00:00")
    // users 1..60, one event each, value grows with user id so the
    // hash-assigned arms genuinely differ in location
    val rows = (1L to 60L).map(u => (u, pre, u, "purchase", u * 37.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val byArm = (1L to 60L).groupBy(u => md5hex(u.toString).charAt(0) < '8')
    val va = byArm(true).map(u => math.floor(u * 37.0 / 100).toLong)
    val vb = byArm(false).map(u => math.floor(u * 37.0 / 100).toLong)
    val naive = (for { a <- va; b <- vb }
      yield java.lang.Long.signum(a - b).toDouble).sum / (va.size * vb.size)
    val r = graft.SparkEntry.queries("eval_cliffs_delta")(spark, d).collect()(0)
    assert(r.getAs[Long]("n_a") == va.size.toLong)
    assert(r.getAs[Long]("n_b") == vb.size.toLong)
    assert(math.abs(r.getAs[Double]("delta") -
      math.rint(naive * 10000) / 10000) <= 1e-4)
  }

  test("pipe_privacy_dp_binomial: exact hash noise, clamp, threshold") {
    val d = tmp("dpbin")
    // groups: (en,web) 10 docs, (en,books) 5 docs, (de,web) 4 docs
    // (suppressed), (fr,web) 6 docs
    val docs =
      (1 to 10).map(i => (i.toLong, s"t$i", "en", "web", 2L)) ++
      (11 to 15).map(i => (i.toLong, s"t$i", "en", "books", 2L)) ++
      (16 to 19).map(i => (i.toLong, s"t$i", "de", "web", 2L)) ++
      (20 to 25).map(i => (i.toLong, s"t$i", "fr", "web", 2L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    def noise(lang: String, source: String): Long =
      java.lang.Long.bitCount(
        java.lang.Long.parseLong(
          md5hex(s"$lang|$source|dp1").substring(0, 4), 16)).toLong - 8
    val got = graft.SparkEntry.queries("pipe_privacy_dp_binomial")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val want = Set(
      ("en", "web", math.max(10 + noise("en", "web"), 0L)),
      ("en", "books", math.max(5 + noise("en", "books"), 0L)),
      ("fr", "web", math.max(6 + noise("fr", "web"), 0L)))
    assert(got == want, s"got $got want $want")
  }

  test("ts_holt tracks an exactly linear series (level=y_n, trend=slope)") {
    val d = tmp("holt")
    // y_t = 10 + 2t events on day t, t = 1..10: Holt with the
    // two-point init reproduces a linear series EXACTLY — level y_10
    // = 30, trend 2, forecast_7 = 44 (closed form, no tolerance).
    var id = 0L
    val rows = for {
      t <- 1 to 10
      _ <- 1 to (10 + 2 * t)
    } yield {
      id += 1
      (id, Timestamp.valueOf(f"2024-01-$t%02d 12:00:00"), id % 5,
        "linear", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = graft.SparkEntry.queries("ts_holt")(spark, d).collect()(0)
    assert(r.getAs[String]("event_type") == "linear")
    assert(r.getAs[Long]("n_days") == 10L)
    assert(r.getAs[Double]("level") == 30.0)
    assert(r.getAs[Double]("trend") == 2.0)
    assert(r.getAs[Double]("forecast_7") == 44.0)
  }

  test("text_dup_kgram_coverage: interval union, cross-doc-only grams") {
    val d = tmp("kgram")
    // doc1 ≡ doc4 (all 4 grams duplicated → coverage 1.0, covered 6
    // NOT 12 — the distinct-position union law); doc2 shares only
    // "a b c" (one gram → 3/6); doc3 untouched.
    val docs = Seq(
      (1L, "a b c d e f", "en", "s", 11L),
      (2L, "x y a b c z", "en", "s", 11L),
      (3L, "p q r s", "en", "s", 7L),
      (4L, "a b c d e f", "en", "s", 11L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = graft.SparkEntry.queries("text_dup_kgram_coverage")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == Seq(
      (1L, 6L, 4L, 6L, 1.0),
      (2L, 6L, 1L, 3L, 0.5),
      (3L, 4L, 0L, 0L, 0.0),
      (4L, 6L, 4L, 6L, 1.0)), s"got $got")
  }

  test("eval_cmh equals the JVM brute force on planted strata") {
    val d = tmp("cmh")
    val pre = Timestamp.valueOf("2024-01-10 00:00:00")
    // 200 events over 2 strata; value pattern varies by user so both
    // outcomes appear in every (arm, stratum) cell
    val rows = (1L to 200L).map { i =>
      val stratum = if (i % 2 == 0) "click" else "purchase"
      (i, pre, i % 37, stratum, ((i * 13) % 190).toDouble, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    // brute force
    val cells = rows.groupBy(r => (r._4,
      md5hex((r._3).toString).charAt(0) < '8', r._5 >= 100))
      .map { case (k, v) => k -> v.size.toLong }
    def cell(s: String, a: Boolean, p: Boolean) =
      cells.getOrElse((s, a, p), 0L)
    val strata = rows.map(_._4).distinct
    var sa = 0L; var se = 0.0; var sv = 0.0; var sad = 0.0; var sbc = 0.0
    def q12(x: Double) = math.rint(x * 1e12) / 1e12
    for (s0 <- strata) {
      val (a, b, c, dd) = (cell(s0, true, true), cell(s0, true, false),
        cell(s0, false, true), cell(s0, false, false))
      val n = (a + b + c + dd).toDouble
      sa += a
      se += q12((a + b).toDouble * (a + c) / n)
      sv += q12((a + b).toDouble * (c + dd) * (a + c) * (b + dd) /
        (n * n * (n - 1)))
      sad += q12(a.toDouble * dd / n)
      sbc += q12(b.toDouble * c / n)
    }
    val dev = math.abs(sa - se) - 0.5
    val chi2 = dev * dev / sv
    val r = graft.SparkEntry.queries("eval_cmh")(spark, d).collect()(0)
    assert(r.getAs[Long]("n_strata") == strata.size.toLong)
    assert(r.getAs[Long]("sum_a") == sa)
    assert(math.abs(r.getAs[Double]("chi2_cmh") - chi2) < 1e-3)
    assert(math.abs(r.getAs[Double]("or_mh") - sad / sbc) < 1e-3)
  }
}
