package graft.queries

import graft.SparkSpec

import java.sql.Timestamp

/** Laws for the round-13 third batch — the rank-based experiment
  * guardrails, each re-derived by hand on a planted fixture:
  *
  *  - eval_srm: arm counts must equal a JVM md5 recount of the same
  *    nibble coin, and a planted 20-vs-5 imbalance must fire the flag
  *    with the exact chi-square value 9.0.
  *  - eval_friedman: a strictly-increasing fixture hits the closed
  *    form chi2 = 2n (the k=3 maximum); adding one tied block engages
  *    the tie-correction C = 1 - 6/(24n) and the hand-computed 266/23.
  *  - eval_page_trend: same strict fixture gives L = 14n and
  *    z = sqrt(2n) exactly.
  *  - eval_krippendorff: the textbook 2-unit alpha = 0 configuration,
  *    and a 3-unit mixed-agreement case hand-computed to 0.4444.
  */
class Round13cOpsSpec extends SparkSpec {
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

  test("eval_srm: counts equal a JVM md5 recount; planted imbalance fires") {
    // Walk user ids upward, taking the first 20 whose md5 nibble says
    // arm A and the first 5 that say B — the query must see exactly
    // that split and chi2 = (20-5)^2/25 = 9 > 3.8415.
    def isA(u: Long): Boolean = md5hex(u.toString).charAt(0) < '8'
    val aIds = Iterator.from(1).map(_.toLong).filter(isA).take(20).toSeq
    val bIds = Iterator.from(1).map(_.toLong).filterNot(isA).take(5).toSeq
    val d = tmp("srm")
    val rows = (aIds ++ bIds).zipWithIndex.map { case (u, i) =>
      (i.toLong, day(10), u, "click", 1.0, "{}")
    }
    // a second stratum with a balanced 10/10 split must NOT flag
    val aB = aIds.take(10); val bB = bIds ++
      Iterator.from(1).map(_.toLong).filterNot(isA).slice(5, 10).toSeq
    val balanced = (aB ++ bB).zipWithIndex.map { case (u, i) =>
      (1000L + i, day(12), u, "view", 1.0, "{}")
    }
    writeEvents(d, rows ++ balanced)
    val out = graft.SparkEntry.queries("eval_srm")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4))).toSeq
    assert(out == Seq(
      ("click", 20L, 5L, 9.0, true),
      ("view", 10L, 10L, 0.0, false)))
  }

  test("eval_friedman: strict order hits chi2 = 2n; a tied block engages C") {
    val d = tmp("friedman")
    // 5 users, strictly increasing period sums 10 < 20 < 30
    val strict = (1 to 5).flatMap { u =>
      Seq((u * 10L, day(5), u.toLong, "click", 10.0, "{}"),
        (u * 10L + 1, day(15), u.toLong, "click", 20.0, "{}"),
        (u * 10L + 2, day(25), u.toLong, "click", 30.0, "{}"))
    }
    writeEvents(d, strict)
    val r1 = graft.SparkEntry.queries("eval_friedman")(spark, d)
      .collect()(0)
    assert(r1.getAs[Long]("n_blocks") == 5L)
    assert(r1.getAs[Double]("rank_sum_1") == 5.0 &&
      r1.getAs[Double]("rank_sum_2") == 10.0 &&
      r1.getAs[Double]("rank_sum_3") == 15.0)
    assert(r1.getAs[Double]("chi2") == 10.0) // 2n, the k=3 maximum
    assert(r1.getAs[Boolean]("significant"))

    // user 6 ties periods 1 and 2 (10,10,30): ranks 1.5/1.5/3 ⇒
    // R = (6.5, 11.5, 18), chi2raw = 498.5/6 - 72 = 133/12,
    // C = 1 - 6/144 = 23/24 ⇒ chi2 = 266/23 = 11.5652
    val d2 = tmp("friedman2")
    writeEvents(d2, strict ++ Seq(
      (100L, day(5), 6L, "click", 10.0, "{}"),
      (101L, day(15), 6L, "click", 10.0, "{}"),
      (102L, day(25), 6L, "click", 30.0, "{}")))
    val r2 = graft.SparkEntry.queries("eval_friedman")(spark, d2)
      .collect()(0)
    assert(r2.getAs[Long]("n_blocks") == 6L)
    assert(r2.getAs[Double]("rank_sum_1") == 6.5 &&
      r2.getAs[Double]("rank_sum_2") == 11.5 &&
      r2.getAs[Double]("rank_sum_3") == 18.0)
    assert(r2.getAs[Double]("chi2") == 11.5652)
    // rank-sum identity: sum R_j = n*k(k+1)/2 = 6n
    assert(r2.getAs[Double]("rank_sum_1") +
      r2.getAs[Double]("rank_sum_2") +
      r2.getAs[Double]("rank_sum_3") == 36.0)
  }

  test("eval_page_trend: strict fixture gives L = 14n, z = sqrt(2n)") {
    val d = tmp("page")
    val strict = (1 to 5).flatMap { u =>
      Seq((u * 10L, day(5), u.toLong, "click", 10.0, "{}"),
        (u * 10L + 1, day(15), u.toLong, "click", 20.0, "{}"),
        (u * 10L + 2, day(25), u.toLong, "click", 30.0, "{}"))
    }
    writeEvents(d, strict)
    val r = graft.SparkEntry.queries("eval_page_trend")(spark, d)
      .collect()(0)
    assert(r.getAs[Long]("n_blocks") == 5L)
    assert(r.getAs[Double]("l_stat") == 70.0) // 14n
    assert(r.getAs[Double]("z_stat") == 3.1623) // sqrt(10)
    assert(r.getAs[Boolean]("trend_up"))
  }

  test("eval_krippendorff: textbook alpha = 0 and a hand-computed 0.4444") {
    // cat 0 = sv < 500, cat 1 = 500 <= sv < 650 (literal cuts)
    val d = tmp("kripp0")
    writeEvents(d, Seq(
      (1L, day(5), 1L, "click", 100.0, "{}"),
      (2L, day(5), 1L, "view", 100.0, "{}"),
      (3L, day(5), 2L, "click", 100.0, "{}"),
      (4L, day(5), 2L, "view", 550.0, "{}")))
    val r0 = graft.SparkEntry.queries("eval_krippendorff")(spark, d)
      .collect()(0)
    assert(r0.getAs[Long]("n_units") == 2L &&
      r0.getAs[Long]("n_ratings") == 4L &&
      r0.getAs[Long]("n_categories") == 2L)
    assert(r0.getAs[Double]("d_o") == 0.5 &&
      r0.getAs[Double]("d_e") == 0.5 &&
      r0.getAs[Double]("alpha") == 0.0)

    // u1 agree cat0, u2 agree cat1, u3 split ⇒ Do = 1/3, De = 0.6,
    // alpha = 1 - (1/3)/0.6 = 4/9 = 0.4444
    val d2 = tmp("kripp1")
    writeEvents(d2, Seq(
      (1L, day(5), 1L, "click", 100.0, "{}"),
      (2L, day(5), 1L, "view", 100.0, "{}"),
      (3L, day(5), 2L, "click", 550.0, "{}"),
      (4L, day(5), 2L, "view", 550.0, "{}"),
      (5L, day(5), 3L, "click", 100.0, "{}"),
      (6L, day(5), 3L, "view", 550.0, "{}")))
    val r1 = graft.SparkEntry.queries("eval_krippendorff")(spark, d2)
      .collect()(0)
    assert(r1.getAs[Double]("d_o") == 0.333333 &&
      r1.getAs[Double]("d_e") == 0.6 &&
      r1.getAs[Double]("alpha") == 0.4444)
  }

  test("dq_schema_drift: mirrored halves give psi = 0; disjoint domains 2.1459") {
    // identical ref/cur distributions ⇒ p = q on every bucket ⇒ psi 0
    val d = tmp("drift0")
    val rows = (1 to 8).map { i =>
      (i.toLong, day(if (i <= 4) 5 else 20), (i % 4).toLong, "click",
        10.0 * (i % 4), "{}")
    }
    writeEvents(d, rows)
    val out = graft.SparkEntry.queries("dq_schema_drift")(spark, d)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.keySet == Set("event_type", "user_id", "value"))
    assert(out.values.forall(r => r.getAs[Double]("psi") == 0.0 &&
      !r.getAs[Boolean]("drift_flag")))
    assert(out("user_id").getAs[Long]("distinct_ref") == 4 &&
      out("user_id").getAs[Long]("distinct_cur") == 4)

    // ref all 'a', cur all 'b' ⇒ smoothed psi = (4/3)·ln 5 = 2.1459
    val d2 = tmp("drift1")
    writeEvents(d2,
      (1 to 4).map(i => (i.toLong, day(5), 1L, "a", 10.0, "{}")) ++
      (5 to 8).map(i => (i.toLong, day(20), 1L, "b", 10.0, "{}")))
    val et = graft.SparkEntry.queries("dq_schema_drift")(spark, d2)
      .collect().find(_.getString(0) == "event_type").get
    assert(et.getAs[Double]("psi") == 2.1459)
    assert(et.getAs[Boolean]("drift_flag"))
    assert(et.getAs[Long]("distinct_ref") == 1 &&
      et.getAs[Long]("distinct_cur") == 1)
  }

  test("sample_systematic equals the JVM every-25th draw on the md5 frame") {
    val d = tmp("syst")
    // 100 events, type = parity of the id
    val rows = (1 to 100).map { i =>
      (i.toLong, day(10), i.toLong,
        if (i % 2 == 0) "even" else "odd", 1.0, "{}")
    }
    writeEvents(d, rows)
    val order = (1L to 100L).sortBy(id => (md5hex(id.toString), id))
    val picked = order.zipWithIndex.collect {
      case (id, rn) if rn % 25 == 0 => id
    }
    val wantEven = picked.count(_ % 2 == 0)
    val out = graft.SparkEntry.queries("sample_systematic")(spark, d)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(picked.size == 4) // exactly ceil(100/25)
    assert(out("even") == ((50L, wantEven.toLong)))
    assert(out("odd") == ((50L, (4 - wantEven).toLong)))
  }

  test("vec_mmd_poly: orthogonal one-hot groups give exactly 2; equal groups 0") {
    val d = tmp("mmd")
    def oneHot(k: Int): Array[Float] =
      Array.tabulate(8)(i => if (i == k) 1.0f else 0.0f)
    // labels 0 (grp 0) all e0; labels 1 (grp 1) all e1:
    // M_A = diag(1,0..), M_B = diag(0,1,0..) ⇒ ||M_A - M_B||_F^2 = 2
    val rows = (1 to 10).map { i =>
      (i.toLong, oneHot(i % 2), i % 2)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val r = graft.SparkEntry.queries("vec_mmd_poly")(spark, d)
      .collect()(0)
    assert(r.getAs[Long]("n_a") == 5L && r.getAs[Long]("n_b") == 5L)
    assert(r.getAs[Long]("n_cells") == 64L)
    assert(r.getAs[Double]("mmd2_poly2") == 2.0)
    assert(r.getAs[Double]("frob_a") == 1.0 &&
      r.getAs[Double]("frob_b") == 1.0)

    // both groups the same one-hot ⇒ identical moments ⇒ MMD 0
    val d2 = tmp("mmd0")
    (1 to 10).map(i => (i.toLong, oneHot(3), i % 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d2/embeddings.parquet")
    val r0 = graft.SparkEntry.queries("vec_mmd_poly")(spark, d2)
      .collect()(0)
    assert(r0.getAs[Double]("mmd2_poly2") == 0.0)
  }

  test("eval_uplift_qini equals the JVM brute force on a planted frame") {
    val d = tmp("qini")
    // user u has score u (one event, value u); treated users (md5
    // coin) additionally convert via a zero-value purchase event
    def isA(u: Long): Boolean = md5hex(u.toString).charAt(0) < '8'
    val base = (1 to 20).map(u =>
      (u.toLong, day(10), u.toLong, "click", u.toDouble, "{}"))
    val convs = (1 to 20).filter(u => isA(u.toLong)).map(u =>
      (100L + u, day(11), u.toLong, "purchase", 0.0, "{}"))
    writeEvents(d, base ++ convs)

    // JVM brute force: deciles by (score desc, user) — 2 users each
    val ordered = (1L to 20L).sortBy(u => (-u, u)) // score = u
    val perDec = ordered.grouped(2).toSeq
    var ct = 0L; var cc = 0L; var nt = 0L; var nc = 0L
    val want = perDec.zipWithIndex.map { case (us, i) =>
      val t = us.count(isA); val c = us.size - t
      val convT = us.count(isA) // every treated converts
      nt += t; nc += c; ct += convT
      val uplift =
        if (t == 0 || c == 0) None
        else Some(BigDecimal(convT.toDouble / t - 0.0)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      val qini =
        if (nc == 0) None
        else Some(BigDecimal(ct - cc.toDouble * nt / nc)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      (i + 1, t.toLong, c.toLong, convT.toLong, 0L, uplift, qini)
    }
    val got = graft.SparkEntry.queries("eval_uplift_qini")(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        Option(r.get(5)).map(_.asInstanceOf[Double]),
        Option(r.get(6)).map(_.asInstanceOf[Double]))).toSeq
    assert(got == want, s"got $got\nwant $want")
  }

  test("ts_kalman_level: constant series gives level = c, rmse = 0, JVM p") {
    val d = tmp("kalman")
    // one type, 10 days, two events of 50 per day ⇒ daily mean 50
    val rows = (1 to 10).flatMap { dd =>
      Seq((dd * 2L, day(dd), 1L, "click", 50.0, "{}"),
        (dd * 2L + 1, day(dd), 2L, "click", 50.0, "{}"))
    }
    writeEvents(d, rows)
    var p = 1.0
    for (_ <- 2 to 10) p = (p + 0.25) / (p + 1.25)
    val r = graft.SparkEntry.queries("ts_kalman_level")(spark, d)
      .collect()(0)
    assert(r.getAs[Long]("n_days") == 10L)
    assert(r.getAs[Double]("level") == 50.0)
    assert(r.getAs[Double]("innov_rmse") == 0.0)
    assert(r.getAs[Double]("err_var") ==
      BigDecimal(p).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("stream_cusum: calm series never alarms; a planted 150 shift walks 45/day") {
    val d = tmp("cusum")
    // 'calm': 10 days at mean exactly 100 (drift term -5, clamped at 0)
    // 'shift': 5 days at 100 then 5 at 150 (+45/day ⇒ 45..225, all >20)
    val calm = (1 to 10).map(dd =>
      (dd.toLong, day(dd), 1L, "calm", 100.0, "{}"))
    val shift = (1 to 10).map(dd =>
      (100L + dd, day(dd), 2L, "shift",
        if (dd <= 5) 100.0 else 150.0, "{}"))
    writeEvents(d, calm ++ shift)
    val out = graft.SparkEntry.queries("stream_cusum")(spark, d)
      .collect().map(r => r.getString(0) -> r).toMap
    val c = out("calm")
    assert(c.getAs[Double]("s_plus") == 0.0 &&
      c.getAs[Double]("s_max") == 0.0 &&
      c.getAs[Long]("n_alarm_days") == 0L &&
      !c.getAs[Boolean]("drifted"))
    val sft = out("shift")
    assert(sft.getAs[Double]("s_plus") == 225.0 &&
      sft.getAs[Double]("s_max") == 225.0 &&
      sft.getAs[Long]("n_alarm_days") == 5L &&
      sft.getAs[Boolean]("drifted"))
  }

  private def writeDocs(d: String, rows: Seq[(Long, String)]): Unit =
    rows.map { case (id, t) => (id, t, "en", "s1", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

  test("text_rake_keywords: hand-computed deg/freq scores and the 4-token chunk law") {
    val d = tmp("rake")
    // phrases: "alpha beta" ×2 (doc1), "gamma", "alpha" (doc2)
    // deg/freq: alpha 5/3, beta 2, gamma 1 ⇒ scores: "alpha beta"
    // = 5/3 + 2 = 3.6667, "alpha" = 1.6667, "gamma" = 1.0
    writeDocs(d, Seq(
      (1L, "alpha beta the alpha beta"),
      (2L, "gamma the alpha")))
    val got = graft.SparkEntry.queries("text_rake_keywords")(spark, d)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == Seq(
      ("alpha beta", 2, 2L, 3.6667),
      ("alpha", 1, 1L, 1.6667),
      ("gamma", 1, 1L, 1.0)))

    // a 9-token stopword-free run chunks into phrases of 4, 4, 1
    val d2 = tmp("rake2")
    writeDocs(d2, Seq((1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9")))
    val lens = graft.SparkEntry.queries("text_rake_keywords")(spark, d2)
      .collect().map(r => r.getInt(1)).toSeq.sorted
    assert(lens == Seq(1, 4, 4))
  }

  test("vec_jl_distortion equals the JVM projection + ring-pair brute force") {
    val d = tmp("jl")
    // deterministic non-trivial vectors: x_v[i] = ((v*17 + i*3) % 7) - 3
    def vec(v: Int): Array[Float] =
      Array.tabulate(64)(i => (((v * 17 + i * 3) % 7) - 3).toFloat)
    (1 to 12).map(v => (v.toLong, vec(v)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")

    def sign(i: Int, j: Int): Double =
      if (md5hex(s"$i:$j").charAt(0) < '8') 1.0 else -1.0
    def proj(x: Array[Float]): Array[Double] =
      Array.tabulate(16) { j =>
        var acc = 0.0
        for (i <- 0 until 64) acc += sign(i, j) * x(i).toDouble
        0.25 * acc
      }
    val vs = (1 to 12).map(v => v.toLong -> vec(v)).toMap
    val ratios = for {
      a <- 1 to 12; off <- Seq(1, 7); b = a + off; if b <= 12
    } yield {
      val (xa, xb) = (vs(a.toLong), vs(b.toLong))
      var d2 = 0.0
      for (i <- 0 until 64)
        d2 += (xa(i).toDouble - xb(i)) * (xa(i).toDouble - xb(i))
      val (pa, pb) = (proj(xa), proj(xb))
      var p2 = 0.0
      for (j <- 0 until 16) p2 += (pa(j) - pb(j)) * (pa(j) - pb(j))
      (d2, p2)
    }
    val kept = ratios.filter(_._1 > 0).map { case (d2, p2) => p2 / d2 }
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val meanQ = kept.map(x => BigDecimal(x)
      .setScale(10, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble /
      kept.size
    val r = graft.SparkEntry.queries("vec_jl_distortion")(spark, d)
      .collect()(0)
    assert(r.getAs[Long]("n_pairs") == kept.size.toLong)
    assert(r.getAs[Double]("min_ratio") == r4(kept.min))
    assert(r.getAs[Double]("max_ratio") == r4(kept.max))
    assert(r.getAs[Double]("mean_ratio") == r4(meanQ))
    assert(r.getAs[Double]("frac_within_2x") ==
      r4(kept.count(x => x >= 0.5 && x <= 2) / kept.size.toDouble))
  }

  test("stream_srm agrees with batch eval_srm on the planted fixture (twin law)") {
    def isA(u: Long): Boolean = md5hex(u.toString).charAt(0) < '8'
    val aIds = Iterator.from(1).map(_.toLong).filter(isA).take(12).toSeq
    val bIds = Iterator.from(1).map(_.toLong).filterNot(isA).take(3).toSeq
    val d = tmp("ssrm")
    writeEvents(d, (aIds ++ bIds).zipWithIndex.map { case (u, i) =>
      (i.toLong, day(10), u, "click", 1.0, "{}")
    })
    val live = graft.SparkEntry.queries("stream_srm")(spark, d).collect()
    val batch = graft.SparkEntry.queries("eval_srm")(spark, d).collect()
    assert(live.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
    assert(live(0).getAs[Long]("n_a") == 12L &&
      live(0).getAs[Long]("n_b") == 3L)
    // chi2 = (12-3)^2/15 = 5.4 > 3.8415
    assert(live(0).getAs[Double]("chi2") == 5.4 &&
      live(0).getAs[Boolean]("srm_flag"))
  }

  test("eval_group_sequential equals the JVM look-by-look recount") {
    def isA(u: Long): Boolean = md5hex(u.toString).charAt(0) < '8'
    val d = tmp("gst")
    // users enter across all four look windows; every TREATED user
    // converts (purchase, value 200) two days after entry
    val users = (1 to 40).map { i =>
      val entry = Seq(3, 10, 20, 28)(i % 4)
      (i.toLong, entry)
    }
    val rows = users.flatMap { case (u, e) =>
      val click = Seq((u * 10L, day(e), u, "click", 10.0, "{}"))
      val conv = if (isA(u) && e + 2 <= 30)
        Seq((u * 10L + 1, day(e + 2), u, "purchase", 200.0, "{}"))
      else Seq.empty
      click ++ conv
    }
    writeEvents(d, rows)

    val cuts = Seq(1 -> 8, 2 -> 16, 3 -> 23, 4 -> 31)
    val bounds = Map(1 -> 4.333, 2 -> 2.963, 3 -> 2.359, 4 -> 2.014)
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = cuts.map { case (look, c) =>
      val in = users.filter(_._2 <= c)
      val na = in.count(u => isA(u._1)); val nb = in.size - na
      val ca = in.count { case (u, e) => isA(u) && e + 2 <= math.min(c, 30) }
      val cb = 0
      val pp = (ca + cb).toDouble / (na + nb)
      val z = (ca.toDouble / na - cb.toDouble / nb) /
        math.sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb))
      (look, na.toLong, nb.toLong, ca.toLong, cb.toLong, r4(z),
        bounds(look), math.abs(z) > bounds(look))
    }
    val got = graft.SparkEntry.queries("eval_group_sequential")(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6),
        r.getBoolean(7))).toSeq
    assert(got == want, s"got $got\nwant $want")
  }

  test("dq_volume_anomaly: flat baseline stays quiet, a 5x day fires") {
    val d = tmp("volanom")
    // days 1..8 carry 10 events each; day 9 carries 50
    val rows = (1 to 9).flatMap { dd =>
      val n = if (dd == 9) 50 else 10
      (1 to n).map(i =>
        ((dd * 100 + i).toLong, day(dd), i.toLong, "click", 1.0, "{}"))
    }
    writeEvents(d, rows)
    val out = graft.SparkEntry.queries("dq_volume_anomaly")(spark, d)
      .collect().map(r => (r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toSeq
    // only days 8 and 9 have a full 7-day baseline
    assert(out == Seq(
      ("2024-01-08", 10L, 10.0, 0.0, false),
      ("2024-01-09", 50L, 10.0, 0.0, true)))
  }

  test("graph_closeness_sampled: path-graph BFS with the 8-hop truncation law") {
    val d = tmp("closeness")
    // chain 1—2—…—10, each consecutive pair co-purchased twice
    val rows = (1 to 9).flatMap { i =>
      Seq((i * 10L, i.toLong), (i * 10L, i + 1L),
        (i * 10L + 1, i.toLong), (i * 10L + 1, i + 1L))
    }
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")

    // JVM BFS on the chain with the same 8-hop cap and quantization
    def expect(seed: Int): (Long, Long, Double) = {
      val ds = (1 to 10).filter(_ != seed)
        .map(n => math.abs(n - seed)).filter(_ <= 8)
      val h = ds.map(dd => BigDecimal(1.0 / dd)
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum
      (ds.size.toLong, ds.map(_.toLong).sum,
        BigDecimal(h.toDouble)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = graft.SparkEntry.queries("graph_closeness_sampled")(spark, d)
      .collect().map(r => r.getLong(0).toInt ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    for (seed <- 1 to 4)
      assert(got(seed) == expect(seed),
        s"seed $seed: got ${got(seed)} want ${expect(seed)}")
    // the truncation is real: node 10 is 9 hops from seed 1
    assert(got(1)._1 == 8L)
  }
}
