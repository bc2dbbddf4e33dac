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

  test("sim_mih_topk equals a full JVM reimplementation (bands+verify+rank)") {
    val d = tmp("mih")
    // clusters of docs sharing most tokens → small hamming distances;
    // singletons → no neighbors
    val base = (1 to 40).map(i => s"w$i")
    def doc(drop: Int*) =
      base.zipWithIndex.collect { case (w, i) if !drop.contains(i) => w }
        .mkString(" ")
    val docs = Seq(
      (1L, doc(), "en", "s", 100L), (2L, doc(0), "en", "s", 100L),
      (3L, doc(1), "en", "s", 100L), (4L, doc(0, 1), "en", "s", 100L),
      (5L, (1 to 40).map(i => s"x$i").mkString(" "), "en", "s", 100L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    // JVM simhash60 (independent reimplementation)
    def sh60(text: String): Long = {
      val votes = Array.fill(60)(0)
      for (tok <- text.split(" ")) {
        val v = java.lang.Long.parseLong(md5hex(tok).substring(0, 15), 16)
        for (b <- 0 until 60)
          votes(b) += (if (((v >> b) & 1L) == 1L) 1 else -1)
      }
      (0 until 60).map(b => if (votes(b) > 0) 1L << b else 0L).sum
    }
    val hs = docs.map(r => r._1 -> sh60(r._2)).toMap
    def band(h: Long, k: Int): Long = (h >> (15 * k)) & 32767L
    val want = (for {
      a <- hs.keys; b <- hs.keys if a != b
      if (0 until 4).exists(k => band(hs(a), k) == band(hs(b), k))
      ham = java.lang.Long.bitCount(hs(a) ^ hs(b))
      if ham <= 7
    } yield (a, b, ham)).toSeq
      .groupBy(_._1)
      .flatMap { case (q, ns) =>
        ns.sortBy(t => (t._3, t._2)).take(3).zipWithIndex
          .map { case ((_, n, h), i) => (q, i + 1, n, h) }
      }.toSet
    val got = graft.SparkEntry.queries("sim_mih_topk")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(got == want, s"got $got want $want")
  }

  test("dedup_cdc_chunks: JVM brute force + shift-resilience property") {
    val d = tmp("cdc")
    val rng = new scala.util.Random(7)
    val a = (1 to 400).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val b = "PREFIX-SHIFT " + a // same content, shifted offsets
    Seq((1L, a, "en", "s", a.length.toLong),
        (2L, b, "en", "s", b.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    def chunks(text: String): Seq[String] = {
      val tx = text.take(512)
      val pow3 = Array(1L, 3L, 9L, 27L, 81L, 243L, 729L, 2187L)
      val cutsAt = 1L +: (2 to tx.length - 7).collect {
        case i if (0 until 8).map(j =>
            tx.charAt(i - 1 + j).toLong * pow3(j)).sum % 64 == 0 =>
          i.toLong
      }
      val ps = cutsAt.sorted
      ps.zip(ps.drop(1) :+ (tx.length + 1).toLong).collect {
        case (p, np) if np > p => md5hex(tx.substring(p.toInt - 1, np.toInt - 1))
      }
    }
    val all = chunks(a) ++ chunks(b)
    val r = graft.SparkEntry.queries("dedup_cdc_chunks")(spark, d).collect()(0)
    assert(r.getAs[Long]("n_docs") == 2L)
    assert(r.getAs[Long]("n_chunks") == all.size.toLong)
    assert(r.getAs[Long]("n_distinct_chunks") == all.distinct.size.toLong)
    // content-defined boundaries re-sync after the shifted prefix:
    // at least one chunk is shared between the two documents
    assert(all.size > all.distinct.size,
      "CDC must re-sync chunk identities across the shifted copy")
  }

  test("mm_video_scene_cut: planted luma jump fires exactly one cut") {
    val d = tmp("scene")
    val jump = "a" * 128 + " " * 128 // frames 0-1 luma 6208, 2-3 luma 2048
    val flat = "b" * 256
    Seq((1L, jump, "en", "s", 256L), (2L, flat, "en", "s", 256L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = graft.SparkEntry.queries("mm_video_scene_cut")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1 else r.getInt(4))).toSeq
    assert(got == Seq((1L, 4L, 1L, 2L, 2), (2L, 4L, 0L, 1L, -1)),
      s"got $got")
  }

  test("eval_ips_offpolicy equals the JVM brute force") {
    val d = tmp("ips")
    val pre = Timestamp.valueOf("2024-01-10 00:00:00")
    val rows = (1L to 120L).map { i =>
      val act = Seq("purchase", "click", "view")((i % 3).toInt)
      (i, pre, i % 41, act, (i % 17).toDouble, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val nn = rows.size.toDouble
    val na = rows.groupBy(_._4).map { case (k, v) => k -> v.size }
    def q10(x: Double) = math.rint(x * 1e10) / 1e10
    var swr = 0.0; var sw = 0.0; var sw2 = 0.0
    for (r <- rows) {
      val pi = if (md5hex((r._3).toString).charAt(0) < '8') "purchase"
               else "click"
      val wt = if (r._4 == pi) nn / na(r._4) else 0.0
      swr += q10(wt * r._5); sw += q10(wt); sw2 += q10(wt * wt)
    }
    val row = graft.SparkEntry.queries("eval_ips_offpolicy")(spark, d)
      .collect()(0)
    assert(row.getAs[Long]("n_events") == 120L)
    assert(math.abs(row.getAs[Double]("ips") - swr / nn) < 1e-3)
    assert(math.abs(row.getAs[Double]("snips") - swr / sw) < 1e-3)
    assert(math.abs(row.getAs[Double]("eff_sample_size") - sw * sw / sw2)
      < 0.02)
  }

  test("eval_dr_offpolicy equals the JVM brute force (DM + DR + IPS)") {
    val d = tmp("dr")
    val pre = Timestamp.valueOf("2024-01-10 00:00:00")
    val rows = (1L to 150L).map { i =>
      val act = Seq("purchase", "click", "view")((i % 3).toInt)
      (i, pre, i % 43, act, (i % 23).toDouble, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    def q6(x: Double) = math.rint(x * 1e6) / 1e6
    def q10(x: Double) = math.rint(x * 1e10) / 1e10
    val nn = rows.size.toDouble
    val byAct = rows.groupBy(_._4)
    val qa = byAct.map { case (k, v) => k -> v.map(r => q6(r._5)).sum / v.size }
    val na = byAct.map { case (k, v) => k -> v.size }
    var sdm = 0.0; var sdr = 0.0; var swr = 0.0
    for (r <- rows) {
      val pi = if (md5hex((r._3).toString).charAt(0) < '8') "purchase"
               else "click"
      val wt = if (r._4 == pi) nn / na(r._4) else 0.0
      sdm += q10(qa(pi)); sdr += q10(qa(pi) + wt * (r._5 - qa(r._4)))
      swr += q10(wt * r._5)
    }
    val row = graft.SparkEntry.queries("eval_dr_offpolicy")(spark, d)
      .collect()(0)
    assert(row.getAs[Long]("n_events") == 150L)
    assert(math.abs(row.getAs[Double]("dm") - sdm / nn) < 1e-3)
    assert(math.abs(row.getAs[Double]("dr") - sdr / nn) < 1e-3)
    assert(math.abs(row.getAs[Double]("ips") - swr / nn) < 1e-3)
  }

  test("sample_reservoir_k: exactly min(k,n) rows, the k hash-smallest") {
    val d = tmp("rsv")
    val docs = (1L to 2500L).map(i => (i, s"text$i", "en", "s", 10L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val want = docs.map(_._1)
      .sortBy(i => (md5hex(s"$i|rsv1"), i)).take(1000)
    val got = graft.SparkEntry.queries("sample_reservoir_k")(spark, d)
      .collect().map(_.getLong(0)).toSeq
    assert(got.size == 1000 && got == want)
  }

  test("stream_forecast_monitor: linear series exact, planted spike surprises") {
    val d = tmp("sfm")
    // type 'lin': y_t = 10 + 2t for t=1..10 (errors all 0 → mae 0,
    // no surprises); type 'spk': constant 20 with one day at 60 —
    // the spike day's forecast error dominates the MAE → surprise.
    var id = 0L
    def day(t: Int) = Timestamp.valueOf(f"2024-01-$t%02d 12:00:00")
    val lin = for { t <- 1 to 10; _ <- 1 to (10 + 2 * t) } yield {
      id += 1; (id, day(t), id % 5, "lin", 1.0, "{}")
    }
    val spk = for { t <- 1 to 10; _ <- 1 to (if (t == 7) 60 else 20) }
      yield { id += 1; (id, day(t), id % 5, "spk", 1.0, "{}") }
    (lin ++ spk).toDF("event_id", "ts", "user_id", "event_type", "value",
        "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    // JVM Holt fold oracle for the spike series
    def holt(ys: Seq[Double]): (Double, Double, Double, Long) = {
      var l = ys(1) / 2 + (ys(0) + (ys(1) - ys(0))) / 2
      var b = (l - ys(0)) / 4 + ((ys(1) - ys(0)) * 3) / 4
      var serr = 0.0; var n = 0
      for (v <- ys.drop(2)) {
        serr += math.abs(v - (l + b)); n += 1
        val nl = v / 2 + (l + b) / 2
        b = (nl - l) / 4 + b * 3 / 4; l = nl
      }
      val mae = serr / n
      var l2 = ys(1) / 2 + (ys(0) + (ys(1) - ys(0))) / 2
      var b2 = (l2 - ys(0)) / 4 + ((ys(1) - ys(0)) * 3) / 4
      var surp = 0L
      for (v <- ys.drop(2)) {
        if (math.abs(v - (l2 + b2)) > 2 * mae) surp += 1
        val nl = v / 2 + (l2 + b2) / 2
        b2 = (nl - l2) / 4 + b2 * 3 / 4; l2 = nl
      }
      (l, b, mae, surp)
    }
    val spkSeries = (1 to 10).map(t => if (t == 7) 60.0 else 20.0)
    val (el, eb, emae, esurp) = holt(spkSeries)
    val got = graft.SparkEntry.queries("stream_forecast_monitor")(spark, d)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Double]("level"),
         r.getAs[Double]("trend"), r.getAs[Double]("mae"),
         r.getAs[Long]("n_surprises"))).toMap
    assert(got("lin") == ((10L, 30.0, 2.0, 0.0, 0L)), s"lin: ${got("lin")}")
    val s = got("spk")
    assert(s._1 == 10L)
    assert(math.abs(s._2 - math.rint(el * 1e4) / 1e4) < 1e-9)
    assert(math.abs(s._3 - math.rint(eb * 1e4) / 1e4) < 1e-9)
    assert(math.abs(s._4 - math.rint(emae * 1e4) / 1e4) < 1e-9)
    assert(s._5 == esurp && esurp >= 1L, s"spk: $s want surprises=$esurp")
  }

  test("pipe_dedup_against_index: identical new→old flagged, old-old never compared") {
    val d = tmp("incdedup")
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, shared, "en", "s", 60L),                       // old
      (2L, shared, "en", "s", 60L),                       // old, dup of 1
      (3L, "alpha beta gamma delta eps", "en", "s", 30L), // old
      (8L, shared, "en", "s", 60L),                       // new ≡ old 1,2
      (9L, "one two three four five six", "en", "s", 30L))// new, disjoint
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = graft.SparkEntry.queries("pipe_dedup_against_index")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getBoolean(3))).toSeq
    // new doc 8 collides with old 1 on all 4 bands (identical shingle
    // sets → identical signatures); tie on n_bands breaks to the
    // smaller old id. Old-old (1,2) and new-only 9 must be absent.
    assert(got == Seq((8L, 1L, 4, true)), s"got $got")
  }

  test("dq_constraint_suite: planted violations move exactly their metric") {
    val d = tmp("dqcs")
    val day = java.sql.Date.valueOf("2024-03-01")
    val rows = Seq(
      (1L, Some(10L), "O", 100.0, day),
      (2L, Some(11L), "F", 200.0, day),
      (2L, Some(12L), "P", 300.0, day),      // dup orderkey
      (4L, None, "O", 400.0, day),           // null custkey
      (5L, Some(14L), "X", 500.0, day),      // bad status
      (6L, Some(15L), "O", -1.0, day))       // out of range
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val got = graft.SparkEntry.queries("dq_constraint_suite")(spark, d)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getBoolean(2)))
      .toMap
    assert(got("complete_custkey") == ((math.rint(5.0 / 6 * 1e4) / 1e4, false)))
    assert(got("unique_orderkey") == ((math.rint(5.0 / 6 * 1e4) / 1e4, false)))
    assert(got("domain_status") == ((math.rint(5.0 / 6 * 1e4) / 1e4, false)))
    assert(got("range_totalprice") == ((math.rint(5.0 / 6 * 1e4) / 1e4, false)))
    assert(got("fresh_orderdate") == ((1.0, true)))
    assert(got("row_count_min") == ((0.06, false)))
  }

  test("stream_quantile_hist: uniform 0..99 yields exact bucket floors") {
    val d = tmp("sqh")
    val pre = Timestamp.valueOf("2024-01-10 00:00:00")
    val rows = (0 until 100).map(v =>
      ((v + 1).toLong, pre, v.toLong, "lat", v.toDouble, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = graft.SparkEntry.queries("stream_quantile_hist")(spark, d)
      .collect()(0)
    // ranks: p50 → ceil(50)=50 → bucket 4 (cum 50) → floor 40;
    // p95 → 95 → bucket 9 (cum 100; bucket 8 cum 90 < 95) → 90;
    // p99 → 99 → bucket 9 → 90
    assert((r.getAs[String]("event_type"), r.getAs[Long]("n"),
      r.getAs[Long]("p50_floor"), r.getAs[Long]("p95_floor"),
      r.getAs[Long]("p99_floor")) == (("lat", 100L, 40L, 90L, 90L)))
  }

  test("graph_cc_incremental ≡ from-scratch CC on a planted clustered corpus") {
    val d = tmp("incc")
    // three identical-text groups with ids spread across edge residues
    // (the old/delta split is (u+v)%10, so group edges land on both
    // sides), plus singletons
    def grp(tag: Int) = (1 to 14).map(i => s"g$tag-w$i").mkString(" ")
    val docs =
      Seq(1L, 2L, 8L, 17L).map(id => (id, grp(1), "en", "s", 50L)) ++
      Seq(4L, 5L, 23L).map(id => (id, grp(2), "en", "s", 50L)) ++
      Seq(3L, 6L).map(id => (id, s"uniq$id " + grp(3).drop(5), "en", "s", 50L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    def rows(q: String) =
      graft.SparkEntry.queries(q)(spark, d).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val inc = rows("graph_cc_incremental")
    val full = rows("dedup_cluster_cc")
    assert(inc == full, s"incremental $inc != from-scratch $full")
    // and the planted truth: group reps are the min ids
    val m = inc.map(t => t._1 -> t._2).toMap
    assert(Seq(1L, 2L, 8L, 17L).forall(m(_) == 1L))
    assert(Seq(4L, 5L, 23L).forall(m(_) == 4L))
  }

  test("behavior_rfm_migration matches the one-partition window form") {
    val d = tmp("rfmm")
    // 12 customers; order counts differ per half so quintiles move
    val rows = for {
      ck <- 1L to 12L
      half <- Seq(0, 1)
      n = if (half == 0) ck else 13 - ck
      i <- 1L to n
    } yield (ck * 1000 + half * 100 + i, ck,
      if (half == 0) java.sql.Date.valueOf("1997-05-01")
      else java.sql.Date.valueOf("1999-05-01"), "O", 10.0)
    rows.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus",
        "o_totalprice")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    import org.apache.spark.sql.expressions.{Window => W}
    val o = spark.read.parquet(s"$d/orders.parquet")
    def q(cond: org.apache.spark.sql.Column) = o.filter(cond)
      .groupBy(col("o_custkey").as("ck")).agg(count(lit(1)).as("f"))
      .withColumn("q", ntile(5).over(W.orderBy(col("f").desc, col("ck"))))
    val cut = lit("1998-01-01").cast("date")
    val want = q(col("o_orderdate").cast("date") < cut)
      .select(col("ck"), col("q").as("q_before"))
      .join(q(col("o_orderdate").cast("date") >= cut)
        .select(col("ck"), col("q").as("q_after")), Seq("ck"))
      .groupBy("q_before", "q_after").count()
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val got = graft.SparkEntry.queries("behavior_rfm_migration")(spark, d)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == want, s"got $got want $want")
  }

  test("mm_clip_score_filter equals the JVM cosine brute force") {
    val d = tmp("clip")
    val docs = (0L to 59L).map(i => (i, s"caption number $i", "en", "s", 20L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rng = new scala.util.Random(11)
    val embs = (0L to 59L).map(i =>
      (i, Array.fill(12)(rng.nextFloat() * 2 - 1), i.toInt % 3))
    embs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    def tvec(text: String): Array[Double] = {
      val h = md5hex(text)
      (0 until 8).map(k =>
        (java.lang.Long.parseLong(h.substring(2 * k, 2 * k + 2), 16) - 128)
          .toDouble / 128).toArray
    }
    val buckets = scala.collection.mutable.Map.empty[Long, Long]
    for ((id, e, _) <- embs) {
      val t = tvec(s"caption number $id")
      val v = e.take(8).map(_.toDouble)
      var dot = 0.0; var nt = 0.0; var nv = 0.0
      for (k <- 0 until 8) { dot += t(k) * v(k); nt += t(k) * t(k); nv += v(k) * v(k) }
      val score = dot / (math.sqrt(nt) * math.sqrt(nv))
      val b = math.floor(score * 5).toLong
      buckets(b) = buckets.getOrElse(b, 0L) + 1
    }
    val got = graft.SparkEntry.queries("mm_clip_score_filter")(spark, d)
      .collect().map(r => r.getInt(0).toLong -> r.getLong(2)).toMap
    assert(got == buckets.toMap, s"got $got want $buckets")
  }
}
