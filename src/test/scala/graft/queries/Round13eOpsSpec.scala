package graft.queries

import graft.SparkSpec

import java.sql.Timestamp

/** Laws for the round-13 audio-fingerprint and S-H-ESD operators:
  *
  *  - mm_audio_fingerprint: an identical-payload pair must match with
  *    exactly the anchor's full landmark-hash inventory (replayed in
  *    plain JVM arithmetic), and an unrelated payload must not match
  *    either of them; the sf0.001 corpus must show the claimed
  *    chance-band separation (every emitted pair ≥ 18 shared hashes —
  *    the floor — while the planted-unrelated control sits ≤ 15).
  *  - ts_shesd: a flat series with a planted 20× spike and a planted
  *    masked 4× spike flags BOTH — the big one in round 1, the masked
  *    one in a later round — and flags nothing else. A single-pass
  *    z-test (ts_zscore's shape) would have lost the second spike in
  *    the σ the first one inflated; catching it in round ≥ 2 is the
  *    ESD re-estimation working.
  */
class Round13eOpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def day(dom: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$dom%02d 12:00:00")

  private def writeEvents(
      d: String, rows: Seq[(Long, Timestamp, Long, String, Double, String)])
      : Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")

  test("mm_audio_fingerprint: identical payloads share the full landmark inventory; unrelated ones match nobody") {
    val d = tmp("afp")
    // 512 chars = 16 windows of 32 → 15+14+13 = 42 landmarks (pre-dedup).
    val base = (0 until 512)
      .map(i => ('a' + (i * i + 3 * i) % 26).toChar).mkString
    val other = (0 until 512)
      .map(i => ('a' + (i * i + 7 * i + 5) % 26).toChar).mkString
    Seq((1L, base, "en", "t", 0L), (2L, base, "en", "t", 0L),
      (3L, other, "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    // JVM replay of the landmark inventory of `base`.
    val wins = base.length / 32
    val fr = (0 until wins).map { w =>
      base.substring(w * 32, math.min(w * 32 + 32, base.length))
        .map(_.toInt.toLong).sum % 1021
    }
    val hashes = (for {
      i <- 0 until wins; dt <- 1 to 3 if i + dt < wins
    } yield fr(i) * 4084 + fr(i + dt) * 4 + dt).toSet
    assert(hashes.size >= 18, "fixture must clear the match floor")
    val out = graft.SparkEntry.queries("mm_audio_fingerprint")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, hashes.size.toLong)),
      s"got ${out.toSeq}, want the (1,2) pair with ${hashes.size} hashes")
  }

  test("mm_audio_fingerprint: sf0.001 emissions all clear the floor (the chance band stays below)") {
    val rows = graft.SparkEntry.queries("mm_audio_fingerprint")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty, "the corpus' planted near-dups must match")
    assert(rows.forall(_.getLong(2) >= 18))
  }

  test("behavior_pattern_regex: planted journeys count adjacent matches exactly") {
    // u1 = vcpvcp (vcp×2, cp×2), u2 = pe (pe×1), u3 = cp (cp×1).
    val d = tmp("patt")
    val evs = Seq(
      (1L, Seq("view", "click", "purchase", "view", "click", "purchase")),
      (2L, Seq("purchase", "error")),
      (3L, Seq("click", "purchase")))
    var id = 0L
    val rows = evs.flatMap { case (u, types) =>
      types.zipWithIndex.map { case (t, i) =>
        id += 1
        (id, Timestamp.valueOf(f"2024-01-10 ${10 + i}%02d:00:00"), u, t,
          1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = graft.SparkEntry.queries("behavior_pattern_regex")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("cp", 2L, 3L), ("pe", 1L, 1L),
      ("vcp", 1L, 2L)))
  }

  test("ts_adf: mean-reverting series rejects the unit root; a trend does not") {
    val d = tmp("adf")
    var id = 0L
    def mk(tpe: String, series: Seq[Int], base: Int) =
      series.zipWithIndex.flatMap { case (n, i) =>
        (1 to n).map { _ =>
          id += 1
          (id, Timestamp.valueOf(f"2024-01-${base + i}%02d 12:00:00"),
            id % 97, tpe, 1.0, "{}")
        }
      }
    // 'view' oscillates (strong mean reversion, imperfect fit so
    // SSE > 0); 'click' grows with noisy steps (unit-root-ish:
    // Δy carries no level signal — and the noise keeps SSE > 0, a
    // perfectly linear series would hit the nullif guard instead).
    val rows = mk("view", Seq(10, 30, 12, 28, 15, 25, 18, 22), 1) ++
      mk("click", Seq(10, 14, 15, 20, 22, 27, 28, 33), 1)
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = graft.SparkEntry.queries("ts_adf")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    // JVM replay of the closed form on the oscillating series.
    val ys = Seq(10, 30, 12, 28, 15, 25, 18, 22).map(_.toDouble)
    val xz = ys.init.zip(ys.tail.zip(ys.init).map { case (a, b) => a - b })
    val n = xz.length.toDouble
    val (sx, sz) = (xz.map(_._1).sum, xz.map(_._2).sum)
    val sxx = xz.map(p => p._1 * p._1).sum
    val sxz = xz.map(p => p._1 * p._2).sum
    val szz = xz.map(p => p._2 * p._2).sum
    val sxxc = sxx - sx * sx / n
    val rho = (sxz - sx * sz / n) / sxxc
    val sse = (szz - sz * sz / n) - (sxz - sx * sz / n) *
      (sxz - sx * sz / n) / sxxc
    val t = rho / math.sqrt((sse / (n - 2)) / sxxc)
    assert(out("view")._1 == 7L)
    assert(math.abs(out("view")._2 - math.rint(rho * 10000) / 10000) < 1e-9)
    assert(math.abs(out("view")._3 - math.rint(t * 10000) / 10000) < 1e-9)
    assert(out("view")._4, "oscillation must reject the unit root")
    assert(!out("click")._4, "a pure trend must not")
  }

  test("pipe_quality_logit: full JVM replay of the 3-round ridge IRLS") {
    // 4 positive docs with TTR 1.0 vs 4 negatives with TTR 0.25 at
    // equal length: the signal is all in f2, the constant f1 column
    // would be singular without the ridge — which is the point.
    val d = tmp("logit")
    import spark.implicits._
    val rows = (1 to 4).map(i => (i.toLong, "a b c d", "en", "src0", 0L)) ++
      (5 to 8).map(i => (i.toLong, "a a a a", "en", "src9", 0L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    def q10(v: Double) = math.rint(v * 1e10) / 1e10
    val feats = Seq.fill(4)((1.0, math.log(8.0), 1.0)) ++
      Seq.fill(4)((0.0, math.log(8.0), 0.25))
    def round3(beta: (Double, Double, Double)): (Double, Double, Double) = {
      val (b0, b1, b2) = beta
      var (sa, sb, sc, sd, se, sf) = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
      var (g0, g1, g2) = (0.0, 0.0, 0.0)
      for ((y, f1, f2) <- feats) {
        val p = 1.0 / (1.0 + math.exp(-(b0 + b1 * f1 + b2 * f2)))
        val w = p * (1 - p)
        sa += q10(w); sb += q10(w * f1); sc += q10(w * f2)
        sd += q10(w * f1 * f1); se += q10(w * f1 * f2)
        sf += q10(w * f2 * f2)
        g0 += q10(y - p); g1 += q10((y - p) * f1); g2 += q10((y - p) * f2)
      }
      val (a11, a12, a13) = (sa, sb, sc)
      val (a22, a23, a33) = (sd + 1, se, sf + 1)
      // true ridge step: slopes-only penalty in H AND the gradient
      val h1 = g1 - b1
      val h2 = g2 - b2
      val det = a11 * (a22 * a33 - a23 * a23) -
        a12 * (a12 * a33 - a23 * a13) + a13 * (a12 * a23 - a22 * a13)
      val d0 = ((a22 * a33 - a23 * a23) * g0 + (a13 * a23 - a12 * a33) * h1
        + (a12 * a23 - a13 * a22) * h2) / det
      val d1 = ((a13 * a23 - a12 * a33) * g0 + (a11 * a33 - a13 * a13) * h1
        + (a13 * a12 - a11 * a23) * h2) / det
      val d2 = ((a12 * a23 - a13 * a22) * g0 + (a13 * a12 - a11 * a23) * h1
        + (a11 * a22 - a12 * a12) * h2) / det
      (q10(b0 + d0), q10(b1 + d1), q10(b2 + d2))
    }
    val (b0, b1, b2) = round3(round3(round3((0.0, 0.0, 0.0))))
    val nll = feats.map { case (y, f1, f2) =>
      val p = 1.0 / (1.0 + math.exp(-(b0 + b1 * f1 + b2 * f2)))
      q10(-(y * math.log(p) + (1 - y) * math.log(1 - p)))
    }.sum / feats.size
    val r = graft.SparkEntry.queries("pipe_quality_logit")(spark, d)
      .collect().head
    assert(r.getLong(0) == 8L)
    def r4(v: Double) = math.rint(v * 10000) / 10000.0
    assert(r.getDouble(1) == r4(b0), s"beta0 ${r.getDouble(1)} vs ${r4(b0)}")
    assert(r.getDouble(2) == r4(b1), "beta1")
    assert(r.getDouble(3) == r4(b2), "beta2")
    assert(math.abs(r.getDouble(4) - r4(nll)) < 2e-4, "logloss")
    assert(b2 > 0.5, "the TTR coefficient must carry the signal")
  }

  test("eval_cem_att: stratified matching strips the planted confounding") {
    // Stratum A (4 events → ln-bin 3): 2 treated (outcome 99 = 3×33)
    // vs 2 controls (90 = 4×22.5) → +9. Stratum B (7 events → bin 4):
    // 1 treated (24 = 6×4) vs 3 controls (14 = 7×2) → +10. ATT =
    // (2·9 + 1·10)/3 = 9.3333, while the naive diff = 74 − 44.4 =
    // 29.6 (treated users concentrate in the high-activity stratum by
    // construction). Every per-event value is decimal-exact.
    val d = tmp("cem")
    var id = 0L
    def user(u: Long, treat: Boolean, views: Int, viewSum: Double) = {
      val per = viewSum / views
      val vs = (1 to views).map { _ =>
        id += 1; (id, day(10), u, "view", per, "{}")
      }
      val t = if (treat) {
        id += 1; Seq((id, day(10), u, "purchase", 200.0, "{}"))
      } else Seq.empty
      vs ++ t
    }
    val rows =
      user(1, treat = true, 3, 99.0) ++ user(2, treat = true, 3, 99.0) ++
      user(3, treat = false, 4, 90.0) ++ user(4, treat = false, 4, 90.0) ++
      user(5, treat = true, 6, 24.0) ++
      user(6, treat = false, 7, 14.0) ++ user(7, treat = false, 7, 14.0) ++
      user(8, treat = false, 7, 14.0)
    writeEvents(d, rows)
    val r = graft.SparkEntry.queries("eval_cem_att")(spark, d)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 5L, 2L)))
    assert(r.getDouble(3) == 9.3333, "att")
    assert(r.getDouble(4) == 29.6, "naive_diff")
  }

  test("eval_rdd_effect: planted step function recovers the jump") {
    // Left-side users (spend 600-900) have 2 events; right-side
    // (1000-1300) have 6 — flat within side, so slopes ≈ 0 and the
    // effect is the 6 − 2 = 4 step at the cutoff.
    val d = tmp("rdd")
    var id = 0L
    def user(u: Long, spend: Double, events: Int) =
      (1 to events).map { _ =>
        id += 1; (id, day(10), u, "view", spend / events, "{}")
      }
    val rows =
      Seq(600.0, 700.0, 800.0, 900.0).zipWithIndex.flatMap { case (s, i) =>
        user(i + 1, s, 2) } ++
      Seq(1000.0, 1100.0, 1200.0, 1300.0).zipWithIndex.flatMap {
        case (s, i) => user(10 + i, s, 6) }
    writeEvents(d, rows)
    val r = graft.SparkEntry.queries("eval_rdd_effect")(spark, d)
      .collect().head
    assert((r.getLong(0), r.getLong(1)) == ((4L, 4L)))
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 6.0)
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 0.0)
    assert(r.getDouble(6) == 4.0, "rdd_effect")
  }

  test("text_winnowing: edit-local damage only; prefix shift keeps the set") {
    // doc2 = doc1 with one mid-token edited (damage bounded to the ±2
    // fingerprint neighborhood of the edit); doc4 = doc1 with a
    // 5-token prefix (interior fingerprints position-shift but
    // survive); doc3 unrelated. Pairs (1,2) and (1,4) must clear the
    // 0.8-containment gate; nothing may pair with doc3.
    val d = tmp("winnow")
    import spark.implicits._
    val toks = (1 to 40).map(i => s"w${(i * 13) % 37}x$i")
    val doc1 = toks.mkString(" ")
    val doc2 = toks.updated(20, "EDITED").mkString(" ")
    val doc4 = ((1 to 5).map(i => s"pre$i") ++ toks).mkString(" ")
    val doc3 = (1 to 40).map(i => s"z${(i * 7) % 31}q$i").mkString(" ")
    Seq((1L, doc1), (2L, doc2), (3L, doc3), (4L, doc4))
      .map { case (id, t) => (id, t, "en", "t", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = graft.SparkEntry.queries("text_winnowing")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3))
      .toMap
    assert(out.contains((1L, 2L)), "edited twin must match")
    assert(out((1L, 2L)) >= 0.8)
    assert(out.contains((1L, 4L)), "prefix-shifted twin must match")
    assert(out((1L, 4L)) >= 0.8)
    assert(!out.keySet.exists(k => k._1 == 3L || k._2 == 3L),
      "unrelated doc must not pair")
  }

  test("eval_conformal: planted splits hit q90 = 8.1 and coverage 0.9") {
    // train (id%3=0): all value 10 → μ = 10. calibration (id%3=1):
    // values 10..19 → residuals 0..9 → quantile_cont 0.9 = 8.1.
    // test (id%3=2): values 10..19 → 9 of 10 inside μ ± 8.1.
    val d = tmp("conf")
    var rows = Seq.empty[(Long, Timestamp, Long, String, Double, String)]
    for (i <- 0 until 10) {
      rows :+= ((3L * i + 3, day(10), i.toLong, "view", 10.0, "{}"))
      rows :+= ((3L * i + 1, day(11), i.toLong, "view", 10.0 + i, "{}"))
      rows :+= ((3L * i + 2, day(12), i.toLong, "view", 10.0 + i, "{}"))
    }
    writeEvents(d, rows)
    val r = graft.SparkEntry.queries("eval_conformal")(spark, d)
      .collect().head
    assert(r.getString(0) == "view")
    assert(r.getDouble(1) == 10.0, "mu")
    assert(r.getDouble(2) == 8.1, "q_hat")
    assert(r.getLong(3) == 10L && r.getDouble(4) == 0.9, "coverage")
  }

  test("ts_forecast_accuracy: two-week planted series hand-computes") {
    // Week 1 = [10,20,30,40,50,60,70], week 2 = week 1 + [1,2,...,7]:
    // lag-7 errors are exactly 1..7 → MAE = bias = 4; MAPE = mean of
    // k/(10k+k) = 1/11; sMAPE = mean of 2k/(2·10k+k... ) computed
    // per-term below.
    val d = tmp("fca")
    var id = 0L
    val week1 = Seq(10, 20, 30, 40, 50, 60, 70)
    val week2 = week1.zipWithIndex.map { case (v, i) => v + i + 1 }
    val rows = (week1 ++ week2).zipWithIndex.flatMap { case (n, i) =>
      (1 to n).map { _ =>
        id += 1; (id, day(i + 1), id % 97, "view", 1.0, "{}")
      }
    }
    writeEvents(d, rows)
    def q10(v: Double) = math.rint(v * 1e10) / 1e10
    val terms = week1.zip(week2)
    val mape = terms.map { case (f, y) => q10((y - f).toDouble / y) }
      .sum / 7
    val smape = terms.map { case (f, y) =>
      q10(2.0 * (y - f) / (y + f)) }.sum / 7
    val r = graft.SparkEntry.queries("ts_forecast_accuracy")(spark, d)
      .collect().head
    assert(r.getLong(1) == 7L)
    assert(r.getDouble(2) == 4.0, "mae")
    assert(r.getDouble(3) == 4.0, "bias")
    def r4(v: Double) = math.rint(v * 10000) / 10000.0
    assert(r.getDouble(4) == r4(mape), "mape")
    assert(r.getDouble(5) == r4(smape), "smape")
  }

  test("ts_shesd: the masked second spike surfaces in a later round") {
    val d = tmp("shesd")
    // 35 flat days of 10 events, day 15 spikes to 200 (the σ bomb),
    // day 24 to 40 (masked: visible only after round 1 removes day 15;
    // a different weekday than 15, so the median seasonal stays clean).
    var id = 0L
    val rows = (1 to 35).flatMap { dom =>
      val n = dom match { case 15 => 200; case 24 => 40; case _ => 10 }
      val mon = if (dom <= 31) (1, dom) else (2, dom - 31)
      (1 to n).map { _ =>
        id += 1
        (id, Timestamp.valueOf(f"2024-${mon._1}%02d-${mon._2}%02d 12:00:00"),
          id % 97, "view", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = graft.SparkEntry.queries("ts_shesd")(spark, d)
      .collect().map(r => (r.getString(1), r.getInt(5))).toMap
    assert(out == Map("2024-01-15" -> 1, "2024-01-24" -> 2),
      s"exactly the two planted spikes, big one first: $out")
  }
}
