package graft.queries

import graft.SparkSpec

import java.sql.Timestamp

/** Laws for the round-13 fourth batch — the distribution-shape and
  * multiple-testing operators, each re-derived by hand or replayed in
  * plain JVM arithmetic on a planted fixture:
  *
  *  - eval_jarque_bera: skewness/kurtosis must equal agg_moments'
  *    columns (same machinery, independent query text), and a planted
  *    symmetric fixture must hit the hand-computed g2 exactly.
  *  - eval_levene_bf: the textbook two-group fixture {1..5} vs
  *    {10,20..50} hand-computes to F = 8·291.6/282.8.
  *  - eval_fdr_bh: the step-up procedure replayed in JVM arithmetic
  *    from the query's own p-values must reproduce p_adj (extensional
  *    equality of the BH law), and p_adj must be ≥ p and monotone in
  *    the p-rank.
  *  - eval_bayes_ab: a planted 3-vs-2-user fixture hand-computes the
  *    conjugate posterior (0.6 vs 0.5) and the A&S erfc replay must
  *    match prob_b_beats_a to the printed 4 decimals.
  *  - eval_permutation: complete JVM replay — per-user md5 arms for
  *    r = 0 (observed) and r = 1..200, exact spend sums, the same
  *    |T_r| ≥ |T_obs| count.
  */
class Round13dOpsSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def writeEvents(
      d: String, rows: Seq[(Long, Timestamp, Long, String, Double, String)])
      : Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")

  private def day(dom: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$dom%02d 12:00:00")

  /** A&S 7.1.26 erfc(x/√2)·(the two-sided normal p) — the exact
    * arithmetic the queries inline, replayed in plain doubles. */
  private def erfcOverSqrt2(az: Double): Double = {
    val x = az * 0.7071067811865476
    val t = 1.0 / (1.0 + 0.3275911 * x)
    (0.254829592 * t - 0.284496736 * t * t + 1.421413741 * t * t * t
      - 1.453152027 * t * t * t * t
      + 1.061405429 * t * t * t * t * t) * math.exp(-(x * x))
  }

  test("eval_jarque_bera: shape columns equal agg_moments on sf0.001") {
    val d = "/root/testdata/sf0.001"
    val jb = graft.SparkEntry.queries("eval_jarque_bera")(spark, d)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3)))
      .toMap
    val mo = graft.SparkEntry.queries("agg_moments")(spark, d)
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(jb.keySet == mo.keySet)
    for ((k, (sk, ku)) <- jb) {
      assert(math.abs(sk - mo(k)._1) < 1e-9, s"$k skewness")
      assert(math.abs(ku - mo(k)._2) < 1e-9, s"$k kurtosis")
    }
  }

  test("eval_jarque_bera: symmetric planted fixture hits the closed form") {
    // {1,2,3,4,5}: mu=3, m2=2, m3=0 (symmetric), m4=6.8.
    // g1=0, g2=6.8/4-3=-1.3, JB = 5·(0 + 1.69/24) = 0.352083…
    val d = tmp("jb")
    writeEvents(d, (1 to 5).map(i =>
      (i.toLong, day(10), i.toLong, "view", i.toDouble, "{}")))
    val r = graft.SparkEntry.queries("eval_jarque_bera")(spark, d)
      .collect().head
    assert(r.getString(0) == "view" && r.getLong(1) == 5L)
    assert(r.getDouble(2) == 0.0, "skewness")
    assert(r.getDouble(3) == -1.3, "ex_kurtosis")
    assert(math.abs(r.getDouble(4) - 0.3521) < 1e-9, "jb_stat")
    assert(!r.getBoolean(6), "JB 0.35 < 5.991 must not reject")
  }

  test("eval_levene_bf: textbook two-group fixture hand-computes") {
    // view {1..5}: med 3, |dev| sums s1=6, s2=10; click {10,20..50}:
    // med 30, s1=60, s2=1000. grand=6.6; between=291.6; within=282.8;
    // F = (10-2)/(2-1) · 291.6/282.8 = 8.24894…
    val d = tmp("lev")
    val rows = (1 to 5).map(i =>
      (i.toLong, day(10), i.toLong, "view", i.toDouble, "{}")) ++
      (1 to 5).map(i =>
        (10L + i, day(11), 10L + i, "click", i * 10.0, "{}"))
    writeEvents(d, rows)
    val r = graft.SparkEntry.queries("eval_levene_bf")(spark, d)
      .collect().head
    assert(r.getLong(0) == 10L && r.getLong(1) == 2L)
    assert(r.getLong(2) == 1L && r.getLong(3) == 8L)
    assert(math.abs(r.getDouble(4) - 291.6) < 1e-9, "between_ss")
    assert(math.abs(r.getDouble(5) - 282.8) < 1e-9, "within_ss")
    assert(math.abs(r.getDouble(6) - 8.2489) < 1e-9, "f_stat")
    assert(r.getBoolean(7), "8.25 > 2.372 must reject")
  }

  test("eval_fdr_bh: JVM replay of the step-up law on sf0.001") {
    val rows = graft.SparkEntry.queries("eval_fdr_bh")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 35, "5 types × 7 weekdays")
    val ps = rows.map(_.getDouble(3))
    val adj = rows.map(_.getDouble(4))
    // p_adj ≥ p (each BH term p_j·m/j with j ≥ rank(p) is ≥ p).
    for (i <- rows.indices)
      assert(adj(i) >= ps(i) - 2e-4, s"row $i p_adj < p")
    // Replay the step-up from the reported p-values: sort ascending,
    // adj_i = min_{j≥i}(p_j·35/j) capped at 1. The replay works on the
    // 4-dp printed p's, so allow 2e-4 of re-rounding slack.
    val sorted = ps.sorted
    val bh = sorted.zipWithIndex
      .map { case (p, i) => p * 35.0 / (i + 1) }
    val stepUp = bh.scanRight(1.0)(math.min).init.map(math.min(_, 1.0))
    val expect = sorted.zip(stepUp).toMap
    for (i <- rows.indices)
      assert(math.abs(adj(i) - expect(ps(i))) < 2e-4,
        s"row $i: adj ${adj(i)} vs replay ${expect(ps(i))}")
    // reject ⇔ p_adj ≤ 0.1 (modulo the 4-dp print of p_adj)
    for (r <- rows)
      assert(r.getBoolean(5) == (r.getDouble(4) <= 0.1 + 1e-9) ||
        math.abs(r.getDouble(4) - 0.1) < 2e-4)
  }

  test("eval_bayes_ab: planted conjugate posterior hand-computes") {
    // 3 A-users (2 convert) vs 2 B-users (1 converts):
    // post means (1+2)/(2+3)=0.6, (1+1)/(2+2)=0.5;
    // va = 3·2/(25·6) = 0.04, vb = 2·2/(16·5) = 0.05,
    // sc = -0.1/0.3 = -1/3 → prob = erfc(|sc|/√2)/2.
    def isA(u: Long): Boolean = md5hex(u.toString).charAt(0) < '8'
    val aIds = Iterator.from(1).map(_.toLong).filter(isA).take(3).toSeq
    val bIds = Iterator.from(1).map(_.toLong).filterNot(isA).take(2).toSeq
    val d = tmp("bayes")
    val conv = Set(aIds(0), aIds(1), bIds(0))
    val rows = (aIds ++ bIds).zipWithIndex.map { case (u, i) =>
      val (tpe, v) = if (conv(u)) ("purchase", 200.0) else ("view", 10.0)
      (i.toLong, day(10), u, tpe, v, "{}")
    }
    writeEvents(d, rows)
    val r = graft.SparkEntry.queries("eval_bayes_ab")(spark, d)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 2L, 2L, 1L)))
    assert(r.getDouble(4) == 0.6 && r.getDouble(5) == 0.5)
    val sc = (0.5 - 0.6) / math.sqrt(0.04 + 0.05)
    val prob = erfcOverSqrt2(math.abs(sc)) / 2
    assert(math.abs(r.getDouble(6) -
      math.rint(prob * 10000) / 10000.0) < 1e-9, "prob_b_beats_a")
    assert(!r.getBoolean(7), "prob ≈ 0.37 must not ship")
  }

  /** Events with a prescribed per-day count: day d gets counts(d)
    * rows, so the daily-count series IS the planted vector. */
  private def writeDailySeries(d: String, counts: Seq[Int]): Unit = {
    var id = 0L
    val rows = counts.zipWithIndex.flatMap { case (c, i) =>
      (1 to c).map { _ =>
        id += 1
        (id, day(i + 1), id % 97, "view", 1.0, "{}")
      }
    }
    writeEvents(d, rows)
  }

  test("ts_holt_winters: a perfectly weekly series is a fixed point") {
    // Two exact weeks of [10,20,30,40,50,60,70]: seed l0 = 40, b0 = 0,
    // s = y - 40. Every update then reproduces itself (the additive HW
    // fixed point): level 40, trend 0, head seasonal -30, forecast_1
    // = 40 + 0 - 30 = 10 — day 15's true count.
    val d = tmp("hw")
    val week = Seq(10, 20, 30, 40, 50, 60, 70)
    writeDailySeries(d, week ++ week)
    val r = graft.SparkEntry.queries("ts_holt_winters")(spark, d)
      .collect().head
    assert(r.getLong(1) == 14L)
    assert(r.getDouble(2) == 40.0, "level")
    assert(r.getDouble(3) == 0.0, "trend")
    assert(r.getDouble(4) == -30.0, "s_next")
    assert(r.getDouble(5) == 10.0, "forecast_1")
  }

  test("ts_peaks: planted [1,5,2,7,3] finds both strict maxima") {
    val d = tmp("peaks")
    writeDailySeries(d, Seq(1, 5, 2, 7, 3))
    val out = graft.SparkEntry.queries("ts_peaks")(spark, d)
      .collect().map(r => (r.getDate(1).toString, r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("2024-01-02", 5L, 3L, false),  // 5 > 1, 5 > 2; prom 5-2
      ("2024-01-04", 7L, 4L, true))) // 7 > 2, 7 > 3; prom 7-3, top
  }

  test("ts_periodogram: a pure period-2 series puts all power at p=2") {
    // 14 days of [10,30] alternating: mean 20, x = ∓10; at p = 2 the
    // cos terms are all -10 (C = -140, S = 0 exactly — sin(0) = 0 and
    // the sin(π) leak dies in the 12-dp quantization), so power =
    // 140²/14 = 1400 exactly and p=2 dominates.
    val d = tmp("pgram")
    writeDailySeries(d, Seq.tabulate(14)(i => if (i % 2 == 0) 10 else 30))
    val rows = graft.SparkEntry.queries("ts_periodogram")(spark, d)
      .collect().map(r => r.getInt(1) -> (r.getDouble(3), r.getBoolean(4)))
      .toMap
    assert(rows(2)._1 == 1400.0, "p=2 power")
    assert(rows(2)._2, "p=2 dominant")
    assert(rows(7)._1 < 1400.0 && !rows(7)._2)
  }

  test("text_heaps_law: planted 20-doc corpus cumulates exactly; beta matches JVM fit") {
    // Doc i (one per bucket) holds the shared token plus one unique
    // token: cum_tokens(b) = 2(b+1), cum_vocab(b) = b+2.
    val d = tmp("heaps")
    import spark.implicits._
    (0 to 19).map(i => (i.toLong, s"shared u$i", "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = graft.SparkEntry.queries("text_heaps_law")(spark, d)
      .collect()
    assert(rows.length == 20)
    for (r <- rows) {
      val b = r.getInt(0)
      assert(r.getLong(1) == 2L * (b + 1), s"bucket $b cum_tokens")
      assert(r.getLong(2) == b + 2L, s"bucket $b cum_vocab")
    }
    // JVM least-squares replay on the same quantized ln-ln points.
    def q(v: Double) = math.rint(v * 1e12) / 1e12
    val xs = (0 to 19).map(b => q(math.log(2.0 * (b + 1))))
    val ys = (0 to 19).map(b => q(math.log(b + 2.0)))
    val xy = (0 to 19).map(b =>
      q(math.log(2.0 * (b + 1)) * math.log(b + 2.0)))
    val xx = (0 to 19).map(b =>
      q(math.log(2.0 * (b + 1)) * math.log(2.0 * (b + 1))))
    val (m, sx, sy, sxx, sxy) =
      (20.0, xs.sum, ys.sum, xx.sum, xy.sum)
    val beta = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    assert(math.abs(rows.head.getDouble(3) -
      math.rint(beta * 10000) / 10000.0) < 1e-9, "heaps_beta")
  }

  test("text_unicode_census: planted class mix hand-computes") {
    val d = tmp("census")
    import spark.implicits._
    // "ab 12 ??" per doc: 8 chars = 2 letters + 2 digits + 2 spaces
    // + 2 other → ratios 0.25 each; 2 docs so n_chars = 16.
    Seq((0L, "ab 12 ??", "en", "t", 0L), (1L, "ab 12 ??", "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = graft.SparkEntry.queries("text_unicode_census")(spark, d)
      .collect().head
    assert(r.getString(0) == "en" && r.getLong(1) == 2L &&
      r.getLong(2) == 16L)
    assert(r.getDouble(3) == 8.0)
    assert((4 to 7).map(r.getDouble).toSeq == Seq(0.25, 0.25, 0.25, 0.25))
  }

  test("graph_butterflies: planted K_{2,3} biclique hand-computes") {
    // Customers {1,2} both buy parts {10,11,12}: every part has
    // degree 2 (wedge_pairs = 3·C(2,2) = 3), the single customer pair
    // has co-degree 3 → C(3,2) = 3 butterflies, 1.0 per wedge pair.
    val d = tmp("bfly")
    import spark.implicits._
    Seq((100L, 1L), (200L, 2L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq(10L, 11L, 12L).flatMap(p => Seq((100L, p), (200L, p)))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val r = graft.SparkEntry.queries("graph_butterflies")(spark, d)
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 1L, 3L)))
    assert(r.getDouble(3) == 1.0)
  }

  test("graph_rich_club: planted clique + pendant pair hand-computes") {
    // Two orders over parts {1,2,3,4} (a 4-clique, every pair support
    // 2, degree 3) plus two orders over {5,6} (a support-2 pendant
    // edge, degree 1). φ(1) = φ(2) = 2·6/(4·3) = 1.0 over the clique;
    // k ≥ 4 empties the club → NULL φ.
    val d = tmp("rclub")
    import spark.implicits._
    (Seq(301L, 302L).flatMap(o => Seq(1L, 2L, 3L, 4L).map(p => (o, p))) ++
      Seq(303L, 304L).flatMap(o => Seq(5L, 6L).map(p => (o, p))))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val rows = graft.SparkEntry.queries("graph_rich_club")(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.toSeq == Seq(
      (1, 4L, 6L, Some(1.0)), (2, 4L, 6L, Some(1.0)),
      (4, 0L, 0L, None), (8, 0L, 0L, None), (16, 0L, 0L, None)))
  }

  test("dq_key_discovery: planted duplicate flips exactly the right probes") {
    val d = tmp("keys")
    import spark.implicits._
    // orders: o_orderkey unique; one customer places two orders on
    // one date so (o_custkey, o_orderdate) is NOT a key here.
    Seq((1L, 10L, "2024-01-05"), (2L, 10L, "2024-01-05"),
      (3L, 11L, "2024-01-06"))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    // lineitem: (orderkey, linenumber) repeats once; the 4-col
    // composite stays unique.
    Seq((1L, 100L, 7L, 1), (1L, 101L, 7L, 1), (2L, 100L, 8L, 1))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val out = graft.SparkEntry.queries("dq_key_discovery")(spark, d)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(5)))
    assert(out.toSeq == Seq(
      ("l_orderkey,l_linenumber", 3L, 2L, false),
      ("l_orderkey,l_partkey,l_suppkey,l_linenumber", 3L, 3L, true),
      ("o_custkey", 3L, 2L, false),
      ("o_custkey,o_orderdate", 3L, 2L, false),
      ("o_orderkey", 3L, 3L, true)))
  }

  test("sample_neyman: zero-variance stratum gets zero budget; the other gets it all") {
    // Stratum 'view' is constant (S_h = 0 → allocation 0, no rows
    // sampled, NULL mean); 'click' carries all the variance → the full
    // 1000 budget, keep16 = 65536·1000 // 4 ≫ 65535 keeps all 4 rows.
    val d = tmp("neyman")
    val rows =
      (1 to 4).map(i => (i.toLong, day(10), i.toLong, "view", 10.0, "{}")) ++
      (1 to 4).map(i => (10L + i, day(11), 10L + i, "click",
        i * 10.0, "{}"))
    writeEvents(d, rows)
    val out = graft.SparkEntry.queries("sample_neyman")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    val sdB = math.rint(math.sqrt(125.0) * 10000) / 10000.0
    assert(out.toSeq == Seq(
      ("click", 4L, sdB, 1000L, 4L, Some(25.0)),
      ("view", 4L, 0.0, 0L, 0L, None)))
  }

  test("norm_boxcox: JVM replay of the stacked profile log-likelihood on sf0.001") {
    val vs = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
      .select("value").collect().map(_.getDouble(0)).filter(_ > 0)
    def q(v: Double, s: Int) = {
      val m = math.pow(10, s)
      math.rint(v * m) / m
    }
    val n = vs.length.toDouble
    val slx = vs.map(v => q(math.log(v), 12)).sum
    def ll(y: Double => Double, lam: Double): Double = {
      val s1 = if (lam == 0.0) slx else vs.map(v => q(y(v), 10)).sum
      val s2 = vs.map(v => q(y(v) * y(v), 10)).sum
      val vr = s2 / n - (s1 / n) * (s1 / n)
      -(n / 2.0) * math.log(vr) + (lam - 1) * slx
    }
    val expect = Map(
      -1.0 -> ll(v => 1 - 1 / v, -1.0),
      0.0 -> ll(math.log, 0.0),
      0.5 -> ll(v => (math.sqrt(v) - 1) / 0.5, 0.5),
      1.0 -> ll(v => v - 1, 1.0))
    val out = graft.SparkEntry.queries("norm_boxcox")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    for ((lam, e) <- expect)
      assert(math.abs(out(lam) - math.rint(e * 10000) / 10000.0) < 2e-4,
        s"lambda $lam: ${out(lam)} vs $e")
  }

  test("sim_knn_mutual: planted bucket keeps only the above-threshold pair") {
    // Three vectors share the all-positive first-8 sign bucket;
    // cos(1,2) = 8/(√8·3) ≈ 0.943 survives, every pair with v3 sits
    // below 0.4 → the graph is exactly the (1,2) edge, same label.
    val d = tmp("knng")
    import spark.implicits._
    val v1 = Array.fill(8)(1f) ++ Array.fill(56)(0f)
    val v2 = Array.fill(8)(1f) ++ Array(1f) ++ Array.fill(55)(0f)
    val v3 = Array.fill(8)(1f) ++ Array(0f) ++ Array.fill(55)(2f)
    Seq((1L, v1, 7), (2L, v2, 7), (3L, v3, 9))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = graft.SparkEntry.queries("sim_knn_mutual")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))
    val cos12 = math.rint(8.0 / (math.sqrt(8) * 3) * 10000) / 10000.0
    assert(out.toSeq == Seq((1L, 2L, cos12, true)))
  }

  test("eval_permutation: complete JVM replay on a planted fixture") {
    val d = tmp("perm")
    val users = (1L to 8L).toSeq
    val spend = users.map(u => u -> (u * 7 % 5 + 1) * 10.0).toMap
    writeEvents(d, users.zipWithIndex.map { case (u, i) =>
      (i.toLong, day(10), u, "view", spend(u), "{}")
    })
    def arm(u: Long, r: Int): Boolean =
      if (r == 0) md5hex(u.toString).charAt(0) < '8'
      else md5hex(s"$u:$r").charAt(0) < '8'
    def tdiff(r: Int): Option[Double] = {
      val (a, b) = users.partition(arm(_, r))
      if (a.isEmpty || b.isEmpty) None
      else Some(a.map(spend).sum / a.size - b.map(spend).sum / b.size)
    }
    val tObs = tdiff(0).get
    // One-sided md5 draws yield a NULL T_r in BOTH engines (sum over
    // empty side) — those rows drop out of the ≥ count identically.
    val extreme = (1 to 200).flatMap(tdiff)
      .count(t => math.abs(t) >= math.abs(tObs))
    val r = graft.SparkEntry.queries("eval_permutation")(spark, d)
      .collect().head
    assert(r.getLong(0) == 200L)
    assert(math.abs(r.getDouble(1) - math.rint(tObs * 10000) / 10000.0)
      < 1e-9, "t_obs")
    assert(r.getLong(2) == extreme.toLong, "n_extreme replay")
    assert(math.abs(r.getDouble(3) -
      math.rint((1.0 + extreme) / 201.0 * 10000) / 10000.0) < 1e-9)
  }
}
