package graft.queries

import graft.{SparkEntry, SparkSpec}
import java.sql.Timestamp

/** Mathematical laws for the experimentation / signal-processing
  * operator additions on planted fixtures: Welch's t matches the
  * closed form on a hand-split cohort, perfectly separated arms give
  * U = 0, a y = 2x covariate makes CUPED equalize the arms at θ = 2,
  * a monotone nation ladder gives Kendall τ_b = 1, a constant series
  * never breaks a Bollinger band, identical series correlate at 1, a
  * level jump produces exactly one SMA crossover, a 1..16 token ramp
  * wastes exactly 1 pad token per 2-doc bucket, MERGE decodes all
  * five action arms, and a linear dimension clips exactly its two
  * tail values. */
class ExperimentOpsSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 12:00:00")
  private def plusDays(t: Timestamp, days: Int): Timestamp =
    new Timestamp(t.getTime + days * 24L * 3600L * 1000L)
  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  /** The queries' hash-arm law, replicated: md5(user_id) nibble < '8'. */
  private def arm(userId: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(userId.toString.getBytes("UTF-8"))
    if (Character.digit((f"${d(0)}%02x").charAt(0), 16) < 8) "A" else "B"
  }

  private def writeEvents(d: String,
      rows: Seq[(Long, Timestamp, Long, String, Double, String)]): Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")

  test("eval_ttest_welch matches the closed form on a hand-split cohort") {
    val d = tempDir("ttw")
    // one event per user; per-arm values alternate so variance > 0.
    val users = (0L until 40L).toSeq
    val rows = users.zipWithIndex.map { case (u, i) =>
      val base = if (arm(u) == "A") 100.0 else 140.0
      (i.toLong, t0, u, "view", base + (u % 2) * 20.0, "{}")
    }
    writeEvents(d, rows)
    val byArm = users.groupBy(arm).map { case (a, us) =>
      a -> us.map(u => (if (a == "A") 100.0 else 140.0) + (u % 2) * 20.0)
    }
    def mv(xs: Seq[Double]): (Double, Double) = {
      val n = xs.size; val m = xs.sum / n
      (m, xs.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (ma, va) = mv(byArm("A")); val (mb, vb) = mv(byArm("B"))
    val na = byArm("A").size; val nb = byArm("B").size
    val expT = (ma - mb) / math.sqrt(va / na + vb / nb)
    val r = SparkEntry.queries("eval_ttest_welch")(spark, d).collect().head
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    // outputs are round(x, 4): allow the rounding half-ulp
    assert(math.abs(r.getAs[Double]("mean_a") - ma) < 6e-5)
    assert(math.abs(r.getAs[Double]("t_stat") - expT) < 1e-3)
    assert(r.getAs[Boolean]("significant") == (math.abs(expT) > 1.96))
  }

  test("eval_mannwhitney: perfectly separated arms give U = 0 and z < 0") {
    val d = tempDir("mwu")
    // A users' integer metric (floor(spend/100)) = 1, B users' = 10.
    val users = (0L until 30L).toSeq
    val rows = users.zipWithIndex.map { case (u, i) =>
      (i.toLong, t0, u, "view", if (arm(u) == "A") 100.0 else 1000.0, "{}")
    }
    writeEvents(d, rows)
    val na = users.count(arm(_) == "A"); val nb = users.size - na
    val r = SparkEntry.queries("eval_mannwhitney")(spark, d).collect().head
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    assert(r.getAs[Double]("u_stat") == 0.0)
    assert(r.getAs[Double]("z_stat") < 0)
    assert(r.getAs[Boolean]("significant"))
  }

  test("eval_cuped: a y = 2x covariate gives theta = 2 and equal adjusted arms") {
    val d = tempDir("cuped")
    // pre-period event value x_u, post-period 2*x_u: theta = 2 exactly
    // and both arms' adjusted means collapse to 2*E[x].
    val pre = Timestamp.valueOf("2024-01-05 00:00:00")
    val post = Timestamp.valueOf("2024-01-20 00:00:00")
    val users = (0L until 24L).toSeq
    val rows = users.zipWithIndex.flatMap { case (u, i) =>
      val x = 10.0 + u
      Seq((2L * i, pre, u, "view", x, "{}"),
        (2L * i + 1, post, u, "view", 2 * x, "{}"))
    }
    writeEvents(d, rows)
    val out = SparkEntry.queries("eval_cuped")(spark, d).collect()
    assert(out.length == 2)
    assert(out.forall(_.getAs[Double]("theta") == 2.0))
    val adj = out.map(_.getAs[Double]("mean_cuped")).distinct
    assert(adj.length == 1)
    val xbar = users.map(10.0 + _).sum / users.size
    assert(math.abs(adj.head - 2 * xbar) < 1e-6)
  }

  test("eval_kendall_tau = 1 on a perfectly concordant nation ladder") {
    val d = tempDir("ktau")
    // nation k has k+1 customers of acctbal 10 each: x and y both
    // strictly increase in k -> every pair concordant.
    val rows = for {
      k <- 0 until 6
      c <- 0 to k
    } yield ((k * 10 + c).toLong, k.toLong, 10.0)
    rows.toDF("c_custkey", "c_nationkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    val r = SparkEntry.queries("eval_kendall_tau")(spark, d).collect().head
    assert(r.getAs[Long]("n_pairs") == 15)
    assert(r.getAs[Long]("concordant") == 15)
    assert(r.getAs[Long]("discordant") == 0)
    assert(r.getAs[Double]("tau_b") == 1.0)
  }

  test("eval_power_mde: powered flag is consistent with mde on the fixture") {
    val r = SparkEntry.queries("eval_power_mde")(
      spark, "/root/testdata/sf0.001").collect().head
    assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
    assert(r.getAs[Double]("mde_abs") > 0)
    val delta = math.abs(r.getAs[Double]("rate_a") - r.getAs[Double]("rate_b"))
    // rounded outputs: allow the boundary slack of one rounding ulp
    val mde = r.getAs[Double]("mde_abs")
    if (delta > mde + 2e-4) assert(r.getAs[Boolean]("powered"))
    if (delta < mde - 2e-4) assert(!r.getAs[Boolean]("powered"))
  }

  test("ts_bollinger: a constant series never breaks the band") {
    val d = tempDir("boll")
    val rows = (0 until 10).map(day =>
      (day.toLong, plusDays(t0, day), 1L, "purchase", 100.0, "{}"))
    writeEvents(d, rows)
    val out = SparkEntry.queries("ts_bollinger")(spark, d).collect()
    assert(out.length == 4) // rows 7..10 have a full 7-day frame
    out.foreach { r =>
      assert(r.getAs[Double]("sma7") == 100.0)
      assert(r.getAs[Double]("sd7") == 0.0)
      assert(!r.getAs[Boolean]("breakout"))
    }
  }

  test("ts_rolling_corr = 1 when click and purchase series are identical") {
    val d = tempDir("rcorr")
    val rows = for {
      day <- 0 until 10
      ev <- Seq("click", "purchase")
      k <- 0 to day // day i has i+1 of each type: non-constant windows
    } yield ((day * 100 + k).toLong + (if (ev == "click") 0 else 5000),
      plusDays(t0, day), 1L, ev, 1.0, "{}")
    writeEvents(d, rows)
    val out = SparkEntry.queries("ts_rolling_corr")(spark, d).collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getAs[Long]("clicks") == r.getAs[Long]("purchases"))
      assert(r.getAs[Double]("corr7") == 1.0)
    }
  }

  test("ts_sma_crossover: one level jump yields exactly one upward cross") {
    val d = tempDir("smax")
    val rows = (0 until 30).map(day =>
      (day.toLong, plusDays(t0, day), 1L, "view",
        if (day < 20) 10.0 else 100.0, "{}"))
    writeEvents(d, rows)
    val out = SparkEntry.queries("ts_sma_crossover")(spark, d).collect()
    assert(out.length == 16) // days 15..30
    val crosses = out.filter(_.getAs[Boolean]("crossover"))
    assert(crosses.length == 1)
    assert(crosses.head.getAs[Boolean]("golden"))
    // before the jump the fast and slow averages tie -> golden false
    assert(!out.head.getAs[Boolean]("golden"))
  }

  test("pipe_length_buckets: a 1..16 token ramp wastes 1 token per bucket") {
    val d = tempDir("lbuck")
    val rows = (1 to 16).map(i =>
      (i.toLong, Seq.fill(i)("w").mkString(" "), "en", "s", i.toLong))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("pipe_length_buckets")(spark, d).collect()
    assert(out.length == 8)
    out.foreach { r =>
      val b = r.getAs[Int]("bucket")
      assert(r.getAs[Long]("n_docs") == 2)
      assert(r.getAs[Long]("min_tok") == 2 * b - 1)
      assert(r.getAs[Long]("max_tok") == 2 * b)
      assert(r.getAs[Long]("pad_waste") == 1)
    }
  }

  test("rel_merge_upsert decodes all five MERGE arms") {
    val d = tempDir("merge")
    // base keys 0, 11, 99; users 0 (delete), 1 (update 11),
    // 3 (insert 33), 5 ending in error with no base row (noop 55).
    Seq((0L, 50.0), (11L, 60.0), (99L, 70.0))
      .toDF("c_custkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    val rows = Seq(
      (1L, t0, 0L, "purchase", 10.0, "{}"),
      (2L, plusDays(t0, 1), 0L, "error", 1.0, "{}"),
      (3L, t0, 1L, "purchase", 25.0, "{}"),
      (4L, t0, 3L, "view", 40.0, "{}"),
      (5L, t0, 5L, "error", 2.0, "{}"))
    writeEvents(d, rows)
    val out = SparkEntry.queries("rel_merge_upsert")(spark, d).collect()
      .map(r => r.getAs[Long]("key") ->
        ((r.getAs[String]("action"), Option(r.getAs[Any]("balance")))))
      .toMap
    assert(out(0L)._1 == "delete" && out(0L)._2.isEmpty)
    assert(out(11L) == (("update", Some(85.0))))
    assert(out(33L) == (("insert", Some(40.0))))
    assert(out(55L)._1 == "noop" && out(55L)._2.isEmpty)
    assert(out(99L) == (("keep", Some(70.0))))
  }

  test("eval_ttest_paired: alternating +4/+6 deltas give mean_diff 5 and the closed-form t") {
    val d = tempDir("tpair")
    val pre = Timestamp.valueOf("2024-01-05 00:00:00")
    val post = Timestamp.valueOf("2024-01-20 00:00:00")
    val users = (0L until 20L).toSeq
    val rows = users.zipWithIndex.flatMap { case (u, i) =>
      Seq((2L * i, pre, u, "view", 10.0 + u, "{}"),
        (2L * i + 1, post, u, "view", 10.0 + u + 4 + (u % 2) * 2, "{}"))
    }
    writeEvents(d, rows)
    val diffs = users.map(u => 4.0 + (u % 2) * 2)
    val n = diffs.size; val md = diffs.sum / n
    val vd = diffs.map(x => (x - md) * (x - md)).sum / (n - 1)
    val expT = md / math.sqrt(vd / n)
    val r = SparkEntry.queries("eval_ttest_paired")(spark, d).collect().head
    assert(r.getAs[Long]("n_pairs") == n)
    assert(r.getAs[Double]("mean_diff") == 5.0)
    assert(math.abs(r.getAs[Double]("t_stat") - expT) < 1e-3)
  }

  test("eval_diff_in_diff recovers a planted 2x2 effect of exactly 10") {
    val d = tempDir("did")
    val pre = Timestamp.valueOf("2024-01-05 00:00:00")
    val post = Timestamp.valueOf("2024-01-20 00:00:00")
    val users = (0L until 20L).toSeq
    val rows = users.zipWithIndex.flatMap { case (u, i) =>
      val (vPre, vPost) = if (arm(u) == "A") (10.0, 30.0) else (10.0, 20.0)
      Seq((2L * i, pre, u, "view", vPre, "{}"),
        (2L * i + 1, post, u, "view", vPost, "{}"))
    }
    writeEvents(d, rows)
    val r = SparkEntry.queries("eval_diff_in_diff")(spark, d).collect().head
    assert(r.getAs[Double]("mean_a_pre") == 10.0)
    assert(r.getAs[Double]("mean_a_post") == 30.0)
    assert(r.getAs[Double]("mean_b_post") == 20.0)
    assert(r.getAs[Double]("did_estimate") == 10.0)
  }

  test("eval_hte_segments: one planted (A,B) pair per quartile gives lift 1 everywhere") {
    val d = tempDir("hte")
    // pick 4 A-users and 4 B-users, pair them with equal spend so each
    // quartile holds exactly one converting A and one non-converting B.
    val (as, bs) = (0L until 100L).partition(arm(_) == "A")
    val pairs = as.take(4).zip(bs.take(4))
    val rows = pairs.zipWithIndex.flatMap { case ((a, b), k) =>
      // A converts: one purchase of 200 + filler to pin spend bucket k
      Seq((10L * k, t0, a, "purchase", 200.0 + 100 * k, "{}"),
        (10L * k + 1, t0, b, "view", 200.0 + 100 * k, "{}"))
    }
    writeEvents(d, rows)
    val out = SparkEntry.queries("eval_hte_segments")(spark, d).collect()
    assert(out.length == 4)
    out.foreach { r =>
      assert(r.getAs[Long]("users_a") == 1 && r.getAs[Long]("users_b") == 1)
      assert(r.getAs[Double]("rate_a") == 1.0)
      assert(r.getAs[Double]("rate_b") == 0.0)
      assert(r.getAs[Double]("lift") == 1.0)
    }
  }

  test("ts_drawdown: an error day dips underwater, recovery resets the peak") {
    val d = tempDir("ddown")
    val rows = Seq(
      (0L, plusDays(t0, 0), 1L, "purchase", 100.0, "{}"),
      (1L, plusDays(t0, 1), 1L, "error", 30.0, "{}"),
      (2L, plusDays(t0, 2), 1L, "purchase", 50.0, "{}"))
    writeEvents(d, rows)
    val out = SparkEntry.queries("ts_drawdown")(spark, d).collect()
    assert(out.length == 3)
    assert(out.map(_.getAs[Double]("cum")).toSeq == Seq(100.0, 70.0, 120.0))
    assert(out.map(_.getAs[Double]("peak")).toSeq == Seq(100.0, 100.0, 120.0))
    assert(out.map(_.getAs[Double]("drawdown")).toSeq == Seq(0.0, 30.0, 0.0))
    assert(out.map(_.getAs[Boolean]("underwater")).toSeq ==
      Seq(false, true, false))
  }

  test("stream_ab_monitor replay equals the batch z-test row exactly") {
    val d = "/root/testdata/sf0.001"
    val st = SparkEntry.queries("stream_ab_monitor")(spark, d).collect()
    val bt = SparkEntry.queries("eval_ab_ztest")(spark, d).collect()
    assert(st.length == 1 && bt.length == 1)
    assert(st.head == bt.head)
  }

  test("eval_sprt: a steady p1-rate stream crosses the H1 boundary on day 4") {
    val d = tempDir("sprt")
    // 100 trials/day, 4 conversions: llr_day = 4*ln2 - 96*0.0206193 =
    // 0.793136; cum crosses ln(19)=2.944439 at day 4 (3.172544).
    val rows = for {
      day <- 0 until 10
      k <- 0 until 100
    } yield ((day * 1000 + k).toLong, plusDays(t0, day), k.toLong,
      if (k < 4) "purchase" else "view", if (k < 4) 200.0 else 10.0, "{}")
    writeEvents(d, rows)
    val out = SparkEntry.queries("eval_sprt")(spark, d).collect()
    assert(out.length == 10)
    assert(out.forall(_.getAs[Double]("llr_day") == 0.7931)
      || out.forall(r => math.abs(r.getAs[Double]("llr_day") - 0.7931) < 1e-9))
    val dec = out.map(_.getAs[String]("decision")).toSeq
    assert(dec.take(3).forall(_ == "continue"))
    assert(dec.drop(3).forall(_ == "accept_h1"))
  }

  test("graph_ppr on a seeded triangle matches the hand-computed 3-iteration scores") {
    val d = tempDir("ppr")
    // triangle {0, 1, 2}, each edge support 2; the only seed is part 0.
    val li = for {
      ok <- Seq(1L, 2L)
      p <- Seq(0L, 1L, 2L)
    } yield (ok, p)
    li.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    Seq(0L, 1L, 2L).toDF("p_partkey")
      .write.mode("overwrite").parquet(s"$d/part.parquet")
    val out = SparkEntry.queries("graph_ppr")(spark, d).collect()
      .map(r => r.getAs[Long]("partkey") -> r.getAs[Double]("score")).toMap
    assert(out(0L) == 0.357719) // 0.15 + 0.85*0.244375
    assert(out(1L) == 0.321141) // 0.85*(0.255625 + 0.1221875)
    assert(out(2L) == out(1L))  // symmetry of the non-seed pair
  }

  test("agg_winsorized_mean clamps a 1..20 ramp to [1.95, 19.05] -> mean 10.5") {
    val d = tempDir("wins")
    (1 to 20).map(i => ("A", i.toDouble))
      .toDF("l_returnflag", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val r = SparkEntry.queries("agg_winsorized_mean")(spark, d).collect().head
    assert(r.getAs[Long]("n") == 20)
    assert(r.getAs[Double]("p05") == 1.95 && r.getAs[Double]("p95") == 19.05)
    assert(r.getAs[Double]("winsorized_mean") == 10.5)
  }

  test("ts_trend_mk: a strict ramp gives S = 45 and the closed-form z") {
    val d = tempDir("mk")
    val rows = (0 until 10).map(day =>
      (day.toLong, plusDays(t0, day), 1L, "view", 10.0 * (day + 1), "{}"))
    writeEvents(d, rows)
    val r = SparkEntry.queries("ts_trend_mk")(spark, d).collect().head
    assert(r.getAs[Long]("n_days") == 10)
    assert(r.getAs[Long]("s_stat") == 45) // all 45 pairs concordant
    assert(r.getAs[Double]("var_s") == 125.0) // 10*9*25/18, no ties
    assert(r.getAs[Double]("z_stat") == 3.9355) // 44/sqrt(125)
    assert(r.getAs[Boolean]("trending"))
  }

  test("ts_slope_theil_sen: a +10/day ramp yields slope 10 for both estimators") {
    val d = tempDir("tsen")
    val rows = (0 until 10).map(day =>
      (day.toLong, plusDays(t0, day), 1L, "view", 10.0 * (day + 1), "{}"))
    writeEvents(d, rows)
    val r = SparkEntry.queries("ts_slope_theil_sen")(spark, d).collect().head
    assert(r.getAs[Long]("n_pairs") == 45)
    assert(r.getAs[Double]("theil_sen_slope") == 10.0)
    assert(r.getAs[Double]("ols_slope") == 10.0)
  }

  test("pipe_pack_curve: exact truncation/bin accounting for a 100/200/300 corpus") {
    val d = tempDir("pcurve")
    Seq((1L, 100), (2L, 200), (3L, 300))
      .map { case (id, n) => (id, Seq.fill(n)("w").mkString(" "), "en", "s", n.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("pipe_pack_curve")(spark, d).collect()
      .map(r => r.getAs[Int]("len") ->
        ((r.getAs[Long]("n_over"), r.getAs[Long]("trunc_tokens"),
          r.getAs[Long]("kept_tokens"), r.getAs[Long]("bins_lb")))).toMap
    assert(out(128) == ((2L, 244L, 356L, 3L)))
    assert(out(256) == ((1L, 44L, 556L, 3L)))
    assert(out(512) == ((0L, 0L, 600L, 2L)))
  }

  test("pipe_dsir_weights: target-pure vs off-target docs get the closed-form log ratios") {
    val d = tempDir("dsir")
    // src0 = all "a", src1 = all "b": term(a)=ln(1.8), term(b)=ln(0.2).
    val rows = Seq(
      (1L, "a a a a", "en", "src0", 7L), (2L, "a a a a", "en", "src0", 7L),
      (3L, "b b b b", "en", "src1", 7L), (4L, "b b b b", "en", "src1", 7L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("pipe_dsir_weights")(spark, d).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Double]("mean_weight"), r.getAs[Double]("frac_target_like"))))
      .toMap
    assert(math.abs(out("src0")._1 - math.log(1.8)) < 1e-3)
    assert(out("src0")._2 == 1.0)
    assert(math.abs(out("src1")._1 - math.log(0.2)) < 1e-3)
    assert(out("src1")._2 == 0.0)
  }

  test("norm_minmax: a 0..100 ramp scales to mean 0.5 with exact extrema") {
    val d = tempDir("minmax")
    val rows = (0 to 100).map(i =>
      (i.toLong, t0, 1L, "view", i.toDouble, "{}"))
    writeEvents(d, rows)
    val r = SparkEntry.queries("norm_minmax")(spark, d).collect().head
    assert(r.getAs[Long]("n") == 101)
    assert(r.getAs[Double]("v_min") == 0.0 && r.getAs[Double]("v_max") == 100.0)
    assert(r.getAs[Double]("scaled_mean") == 0.5)
    assert(r.getAs[Long]("n_low_decile") == 10) // z in [0, 0.1): values 0..9
  }

  test("rel_recursive_cte: keys 0..99 split into depth 0 (0..9) and depth 1 (10..99)") {
    val d = tempDir("rcte")
    (0L until 100L).map(k => (k, 0.0)).toDF("c_custkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    val out = SparkEntry.queries("rel_recursive_cte")(spark, d).collect()
      .map(r => r.getAs[Int]("depth") ->
        ((r.getAs[Long]("n_customers"), r.getAs[Long]("n_roots")))).toMap
    // depth-0 roots are keys 0..9 themselves; keys 10..99 walk one
    // step to roots 1..9 (10..19 -> 1, ..., 90..99 -> 9)
    assert(out == Map(0 -> ((10L, 10L)), 1 -> ((90L, 9L))))
  }

  test("win_time_range: trailing-1h frame follows event-time gaps, not row counts") {
    val d = tempDir("wtr")
    def plusMin(m: Int) = new Timestamp(t0.getTime + m * 60000L)
    val rows = Seq(
      (1L, plusMin(0), 7L, "view", 10.0, "{}"),
      (2L, plusMin(30), 7L, "view", 10.0, "{}"),   // within 1h of #1
      (3L, plusMin(150), 7L, "view", 10.0, "{}"))  // 2h gap: frame resets
    writeEvents(d, rows)
    val out = SparkEntry.queries("win_time_range")(spark, d).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("n_1h")).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("pipe_filter_ablation attributes sole rejects to the right rule") {
    val d = tempDir("ablate")
    // doc 1: healthy en doc (no flags); doc 2: fails ONLY too_short;
    // doc 3: fails ONLY lang. Both failing docs carry stopwords and
    // varied tokens so the other rules stay quiet.
    val healthy = (1 to 30).map(i => s"w$i").mkString(" ") +
      " the a of and to the a of and to"
    val shortDoc = "the a of and to w1 w2 w3 w4 w5"
    val rows = Seq(
      (1L, healthy, "en", "s", 1L),
      (2L, shortDoc, "en", "s", 2L),
      (3L, healthy, "fr", "s", 3L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("pipe_filter_ablation")(spark, d).collect()
      .map(r => r.getAs[String]("rule") ->
        ((r.getAs[Long]("n_flagged"), r.getAs[Long]("n_sole_reject")))).toMap
    assert(out("too_short") == ((1L, 1L)))
    assert(out("lang") == ((1L, 1L)))
    assert(out("low_stopword") == ((0L, 0L)))
    assert(out("repetitive") == ((0L, 0L)))
  }

  test("agg_mean_families: AM/GM/HM of {1,2,4} hit the closed forms and AM>=GM>=HM") {
    val d = tempDir("means")
    Seq(("A", 1.0), ("A", 2.0), ("A", 4.0))
      .toDF("l_returnflag", "l_quantity")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val r = SparkEntry.queries("agg_mean_families")(spark, d).collect().head
    val (am, gm, hm) = (r.getAs[Double]("mean_arith"),
      r.getAs[Double]("mean_geo"), r.getAs[Double]("mean_harm"))
    assert(am == 2.3333)
    assert(gm == 2.0)          // cbrt(8)
    assert(math.abs(hm - 12.0 / 7) < 1e-3)
    assert(am >= gm && gm >= hm)
  }

  test("stream_sprt replay equals the batch SPRT trace exactly") {
    val d = "/root/testdata/sf0.001"
    val st = SparkEntry.queries("stream_sprt")(spark, d).collect()
    val bt = SparkEntry.queries("eval_sprt")(spark, d).collect()
    assert(st.length == bt.length && st.nonEmpty)
    assert(st.toSeq == bt.toSeq)
  }

  test("pipe_shard_manifest: fingerprint is order-invariant and content-sensitive") {
    val d1 = tempDir("man1"); val d2 = tempDir("man2"); val d3 = tempDir("man3")
    def write(dir: String, rows: Seq[(Long, String)]): Unit =
      rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val docs = (1L to 40L).map(i => (i, s"doc body $i"))
    write(d1, docs)
    write(d2, docs.reverse) // same content, different row order
    write(d3, docs.updated(5, (docs(5)._1, "mutated body"))) // one doc changed
    def fps(dir: String) =
      SparkEntry.queries("pipe_shard_manifest")(spark, dir).collect()
        .map(r => r.getAs[Int]("shard") -> r.getAs[String]("fingerprint")).toMap
    val (f1, f2, f3) = (fps(d1), fps(d2), fps(d3))
    assert(f1 == f2)   // row order never moves a shard digest
    assert(f1 != f3)   // a single mutated doc moves exactly its shard
    assert((f1.toSet -- f3.toSet).size == 1)
  }

  test("text_related_topk: near-identical docs rank each other first") {
    val d = tempDir("reltk")
    // doc 1 and 2 share almost all shingles; doc 3 shares fewer.
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val rows = Seq(
      (1L, base + " endA", "en", "s", 1L),
      (2L, base + " endB", "en", "s", 2L),
      (3L, (1 to 15).map(i => s"tok$i").mkString(" ") + " other tail here",
        "en", "s", 3L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("text_related_topk")(spark, d).collect()
    val first = out.filter(_.getAs[Int]("rk") == 1)
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("related_id")).toMap
    assert(first(1L) == 2L && first(2L) == 1L)
    out.foreach { r =>
      assert(r.getAs[Double]("jaccard") >= 0 && r.getAs[Double]("jaccard") <= 1)
    }
  }

  test("behavior_repeat_curve: planted 3/2/1-purchase users produce the exact ladder") {
    val d = tempDir("repeat")
    // user 1: 3 purchases, user 2: 2, user 3: 1 -> reach counts 3,2,1,0,0
    val rows = Seq(
      (1L, t0, 1L, "purchase", 10.0, "{}"),
      (2L, plusDays(t0, 1), 1L, "purchase", 10.0, "{}"),
      (3L, plusDays(t0, 2), 1L, "purchase", 10.0, "{}"),
      (4L, t0, 2L, "purchase", 10.0, "{}"),
      (5L, plusDays(t0, 1), 2L, "purchase", 10.0, "{}"),
      (6L, t0, 3L, "purchase", 10.0, "{}"))
    writeEvents(d, rows)
    val out = SparkEntry.queries("behavior_repeat_curve")(spark, d).collect()
      .map(r => r.getAs[Int]("k") -> r.getAs[Long]("users")).toMap
    assert(out == Map(1 -> 3L, 2 -> 2L, 3 -> 1L, 4 -> 0L, 5 -> 0L))
  }

  test("behavior_wow_change: a doubling weekly series reports +1.0 change") {
    val d = tempDir("wow")
    // Mondays three weeks apart; volumes 100, 200, 400.
    val monday = Timestamp.valueOf("2024-01-08 12:00:00")
    val rows = Seq((1L, monday, 1L, "view", 100.0, "{}"),
      (2L, plusDays(monday, 7), 1L, "view", 200.0, "{}"),
      (3L, plusDays(monday, 14), 1L, "view", 400.0, "{}"))
    writeEvents(d, rows)
    val out = SparkEntry.queries("behavior_wow_change")(spark, d).collect()
    assert(out.length == 3)
    assert(out.head.isNullAt(out.head.fieldIndex("wow_change")))
    assert(out(1).getAs[Double]("wow_change") == 1.0)
    assert(out(2).getAs[Double]("wow_change") == 1.0)
  }

  test("ts_hampel flags a lone spike against a constant baseline (MAD = 0)") {
    val d = tempDir("hampel")
    // user 0 (passes the %20 cut): constant 10s with one 100 spike.
    val vals = Seq(10.0, 10.0, 10.0, 10.0, 100.0, 10.0, 10.0, 10.0, 10.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, new Timestamp(t0.getTime + i * 60000L), 0L, "view", v, "{}")
    }
    writeEvents(d, rows)
    val out = SparkEntry.queries("ts_hampel")(spark, d).collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Boolean]("is_spike"))
      .toMap
    assert(out.size == 5) // rows with a full 5-frame
    assert(out(4L))        // the 100 against med 10, mad 0
    assert(!out(5L) && !out(6L) && !out(7L) && !out(8L))
  }

  test("vec_clip_outliers: a linear dim clips its two tails, a constant dim none") {
    val d = tempDir("clip")
    val rows = (1 to 20).map(i =>
      (i.toLong, Array(i.toFloat, 5.0f), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = SparkEntry.queries("vec_clip_outliers")(spark, d).collect()
    assert(out.length == 2)
    val d0 = out.find(_.getAs[Int]("dim") == 0).get
    assert(d0.getAs[Long]("n_clipped") == 2) // the 1 and the 20
    assert(d0.getAs[Double]("clip_frac") == 0.1)
    val d1 = out.find(_.getAs[Int]("dim") == 1).get
    assert(d1.getAs[Long]("n_clipped") == 0)
    assert(d1.getAs[Double]("p05") == 5.0 && d1.getAs[Double]("p95") == 5.0)
  }
}
