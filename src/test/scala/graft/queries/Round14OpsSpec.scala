package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Laws for the round-14 width-scaled banded sign-LSH family
  * (vec_cosine_lsh_banded / sim_knn_mutual_banded — the corpus-scale
  * closure of the fixed-8-bit cosineEdges class):
  *
  *  - mean-centering: a corpus that drifts entirely positive (where
  *    raw sign keys collapse into the all-ones bucket) must still
  *    split into geometry-defined buckets, with the candidate mass
  *    exactly the within-group pair count.
  *  - hot-bucket cap: >256 identical vectors excise their bucket in
  *    every band — candidate mass and edges must come only from the
  *    survivors.
  *  - band-OR recall: a true near-dup pair separated by one early-dim
  *    sign flip (band 0 key differs, bands 1-3 agree) must be found
  *    by the banded form AND missed by the fixed single-band 8-bit
  *    exemplar — the measured recall premium of the OR-construction.
  */
class Round14OpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def writeVecs(d: String, rows: Seq[(Long, Seq[Float], Int)])
      : Unit =
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")

  private def census(d: String): Map[String, (Int, Long, Long, Long, Long, Long)] =
    SparkEntry.queries("vec_cosine_lsh_banded")(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap

  test("banded LSH: mean-centering splits an all-positive drifted corpus by geometry") {
    val d = tmp("r14center")
    // 64 vectors, ALL dims positive: group X = 10.5 on dims 0..31,
    // group Y = 9.5 there; both 10.0 on dims 32..63. Raw sign keys
    // would put every vector in the all-ones bucket; the centered
    // keys (per-dim mean = 10 exactly) split X from Y in every band.
    val vecs = (0 until 64).map { i =>
      val hi = i < 32
      val e = Array.tabulate(64)(dd =>
        if (dd >= 32) 10.0f else if (hi) 10.5f else 9.5f)
      (i.toLong, e.toSeq, if (hi) 1 else 0)
    }
    writeVecs(d, vecs)
    val c = census(d)
    assert(c.keySet == Set("band0", "band1", "band2", "band3", "union"))
    for (b <- 0 to 3) {
      val (bits, nb, mo, ne, cand, _) = c(s"band$b")
      assert(bits == 8, "N=64 sits on the ladder floor")
      assert(nb == 2, s"band$b must split the drifted corpus in two")
      assert(mo == 32 && ne == 0)
      // 2 groups x C(32,2) within-group pairs, exact
      assert(cand == 2 * 32 * 31 / 2)
    }
    // all 4 bands produce the SAME pairs -> union dedups back to 992,
    // and every within-group pair is an exact duplicate (cos = 1)
    val (_, _, _, _, candU, edgesU) = c("union")
    assert(candU == 992 && edgesU == 992)
  }

  test("banded LSH: a >256-member bucket is excised in every band") {
    val d = tmp("r14cap")
    // 300 identical all-negative vectors (one hot bucket per band) +
    // the 64-vector positive corpus above at vec_ids 1000+. The hot
    // mass drags the per-dim mean to ~-2.36 on dims 0..31, so the
    // whole positive corpus centers positive (ONE 64-member kept
    // bucket per band — X/Y merge; cross-group cos ~0.9988 is still
    // an edge) while the hot bucket (centered negative) is excised.
    val hot = (0 until 300).map { i =>
      (i.toLong, Array.fill(64)(-5.0f).toSeq, 9)
    }
    val spread = (0 until 64).map { i =>
      val hi = i < 32
      val e = Array.tabulate(64)(dd =>
        if (dd >= 32) 10.0f else if (hi) 10.5f else 9.5f)
      ((1000 + i).toLong, e.toSeq, if (hi) 1 else 0)
    }
    writeVecs(d, hot ++ spread)
    val c = census(d)
    for (b <- 0 to 3) {
      val (_, nb, mo, ne, cand, _) = c(s"band$b")
      assert(nb == 2, s"band$b: hot bucket + merged positive bucket")
      assert(mo == 300, "the hot bucket is visible in max_occ")
      assert(ne == 1, s"band$b must excise exactly the hot bucket")
      // candidate mass = the kept 64-member bucket only — the
      // C(300,2) = 44850 suppressed pairs never enter the join
      assert(cand == 64 * 63 / 2)
    }
    val (_, _, _, _, candU, edgesU) = c("union")
    assert(candU == 2016 && edgesU == 2016,
      "no hot-bucket pair survives to the edge scoring")
  }

  test("banded LSH: band-OR catches a near-dup the single 8-bit band misses") {
    val d = tmp("r14or")
    // A and B agree on dims 1..31 (pattern values) and differ ONLY in
    // the sign of dim 0 (+0.5 vs -0.5). Dim 0 is read by band 0 bit 1
    // and by NOTHING else ((b-1)*4+k = 0 only at b=1,k=0), so bands
    // 1-3 bucket A with B while band 0 separates them. cos(A,B) ~= 1.
    // 18 decoys live on disjoint dim pairs in 32..63 (keys never read
    // those dims at r=8) in sign-cancelling pairs, so the corpus mean
    // at dims 32..63 is exactly 0 and every decoy-anything cosine is
    // 0 or -1 — below the 0.4 edge threshold.
    def patt(dd: Int): Float = (((dd * 7) % 13) - 6).toFloat
    val a = Array.tabulate(64)(dd =>
      if (dd == 0) 0.5f else if (dd < 32) patt(dd) else 0.0f)
    val b = Array.tabulate(64)(dd =>
      if (dd == 0) -0.5f else if (dd < 32) patt(dd) else 0.0f)
    val decoys = (0 until 18).map { j =>
      val pair = j / 2
      val sign = if (j % 2 == 0) 3.0f else -3.0f
      val e = Array.tabulate(64)(dd =>
        if (dd == 32 + 2 * pair || dd == 33 + 2 * pair) sign else 0.0f)
      ((3 + j).toLong, e.toSeq, 0)
    }
    writeVecs(d, Seq((1L, a.toSeq, 7), (2L, b.toSeq, 7)) ++ decoys)
    val banded = SparkEntry.queries("sim_knn_mutual_banded")(spark, d)
      .collect()
    assert(banded.length == 1, "exactly the planted pair is mutual")
    assert(banded.head.getLong(0) == 1L && banded.head.getLong(1) == 2L)
    assert(banded.head.getBoolean(3), "labels agree")
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(banded.head.getDouble(2) - dot / (na * nb)) < 1e-4)
    // the fixed single-band exemplar misses it: raw dim-0 signs land
    // A and B in different 8-bit buckets, and no decoy pair crosses
    // the cosine threshold
    val legacy = SparkEntry.queries("sim_knn_mutual")(spark, d).collect()
    assert(legacy.isEmpty,
      "the single-band exemplar must miss the sign-flipped near-dup")
  }

  test("banded LSH: width ladder sits at 8 bits for fixture-scale corpora") {
    val c = census("/root/testdata/sf0.001")
    assert(c("union")._1 == 8)
    for (b <- 0 to 3) assert(c(s"band$b")._2 <= 256L,
      "8-bit bands cannot exceed 256 buckets")
  }

  private val sf = "/root/testdata/sf0.001"

  test("eval_somers_gamma: census closes (C+D+T = pos*neg) and somers_d = 2*AUC - 1") {
    val sg = SparkEntry.queries("eval_somers_gamma")(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    val auc = SparkEntry.queries("eval_auc")(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(sg.keySet == auc.keySet && sg.nonEmpty)
    for ((grp, (c, dd, t, sd)) <- sg) {
      val (pos, neg, a) = auc(grp)
      assert(c + dd + t == pos * neg,
        s"grp $grp: concordance census must close")
      // both sides independently rounded to 4 dp
      assert(math.abs(sd - (2 * a - 1)) < 2.5e-4,
        s"grp $grp: somers_d $sd vs 2*AUC-1 ${2 * a - 1}")
    }
  }

  test("eval_cramers_v: a planted decisive 2x2 scores V = 1 exactly") {
    val d = tmp("r14cv")
    import java.sql.Timestamp
    // 50 low-value Monday-morning views vs 50 high-value Tuesday-night
    // purchases: all three features (weekday, tod4h, score_q) are
    // perfect 2x2 tables -> chi2 = n, V = sqrt((chi2/n)/1) = 1.
    val rows = (0 until 50).map(i => (i.toLong,
        Timestamp.valueOf("2024-01-01 10:00:00"), i.toLong, "view",
        10.0, "{}")) ++
      (50 until 100).map(i => (i.toLong,
        Timestamp.valueOf("2024-01-02 20:00:00"), i.toLong, "purchase",
        60.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = SparkEntry.queries("eval_cramers_v")(spark, d).collect()
      .map(r => r.getString(0) -> ((r.getDouble(3), r.getDouble(4),
        r.getDouble(5)))).toMap
    assert(out.keySet == Set("weekday", "tod4h", "score_q"))
    for ((f, (chi2, v, vc)) <- out) {
      assert(chi2 == 100.0 && v == 1.0, s"$f must be decisive")
      assert(vc <= 1.0 && vc >= 0.97,
        s"$f: bias correction shaves, never inflates")
    }
  }

  test("eval_gwet_ac1: po matches eval_kappa's and the AC1 algebra closes") {
    val k = SparkEntry.queries("eval_kappa")(spark, sf).collect().head
    val g = SparkEntry.queries("eval_gwet_ac1")(spark, sf).collect().head
    assert(g.getLong(0) == k.getLong(0))
    assert(g.getDouble(2) == k.getDouble(2), "same observed agreement")
    val (po, pe, ac1) = (g.getDouble(2), g.getDouble(3), g.getDouble(4))
    assert(math.abs(ac1 - (po - pe) / (1 - pe)) < 3e-4)
    assert(g.getLong(1) == 5L, "all five classes observed")
  }

  test("eval_hosmer_lemeshow: full JVM replay on a crafted fixture") {
    val d = tmp("r14hl")
    import java.sql.Timestamp
    // values spread across sigmoid bins; purchases are the positives
    val vals = Seq(20.0, 40.0, 60.0, 80.0, 100.0, 120.0, 140.0, 160.0,
      55.0, 95.0, 135.0, 175.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, Timestamp.valueOf("2024-01-02 09:00:00"), i.toLong,
        if (i % 3 == 0) "purchase" else "view", v, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    def q12(x: Double) = math.rint(x * 1e12) / 1e12
    val binned = rows.groupBy { case (_, _, _, _, v, _) =>
      math.min(math.floor((1.0 / (1 + math.exp(-(v - 100) / 40.0))) * 10)
        .toInt, 9)
    }
    val chi2 = binned.values.map { rs =>
      val n = rs.size
      val o = rs.count(_._4 == "purchase")
      val ex = rs.map(r =>
        q12(1.0 / (1 + math.exp(-(r._5 - 100) / 40.0)))).sum
      q12((o - ex) * (o - ex) / (ex * (1 - ex / n)))
    }.sum
    val out = SparkEntry.queries("eval_hosmer_lemeshow")(spark, d)
      .collect().head
    assert(out.getLong(0) == binned.size.toLong)
    assert(out.getLong(1) == binned.size.toLong - 2)
    assert(math.abs(out.getDouble(2) - math.rint(chi2 * 1e4) / 1e4) < 2e-4)
  }

  test("eval_icc: between-day signal reads ~1, shuffled values read ~0") {
    import java.sql.Timestamp
    def write(d: String, shuffled: Boolean): Unit = {
      // 2024-01-01 is a Monday; 7 consecutive days = 7 weekday groups
      val rows = for {
        day <- 0 until 7
        j <- 0 until 10
      } yield {
        val base = if (shuffled) ((day + j * 3) % 7) * 25.0
          else day * 25.0
        ((day * 10 + j).toLong,
          Timestamp.valueOf(f"2024-01-0${day + 1}%d 12:00:00"),
          (day * 10 + j).toLong, "view", base + (j % 2) * 0.02, "{}")
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    val d1 = tmp("r14icc1"); write(d1, shuffled = false)
    val d2 = tmp("r14icc2"); write(d2, shuffled = true)
    val hi = SparkEntry.queries("eval_icc")(spark, d1).collect().head
    val lo = SparkEntry.queries("eval_icc")(spark, d2).collect().head
    assert(hi.getLong(0) == 7L && hi.getLong(1) == 70L)
    assert(hi.getDouble(5) > 0.999, s"day-determined values: ${hi.getDouble(5)}")
    assert(lo.getDouble(5) < 0.1, s"shuffled values: ${lo.getDouble(5)}")
  }

  test("eval_lin_ccc: |CCC| <= |pearson| (Lin's inequality) and JVM replay") {
    val row = SparkEntry.queries("eval_lin_ccc")(spark, sf).collect().head
    val (r, ccc) = (row.getDouble(3), row.getDouble(4))
    assert(math.abs(ccc) <= math.abs(r) + 1e-9)
    assert(math.abs(r) <= 1.0 && math.abs(ccc) <= 1.0)
    // JVM replay on a crafted fixture: p2 affine in p1 with a location
    // shift -> pearson stays 1, CCC drops below it
    val d = tmp("r14ccc")
    import java.sql.Timestamp
    val rows = Seq(40.0, 80.0, 120.0, 160.0).zipWithIndex.map {
      case (v, i) => (i.toLong, Timestamp.valueOf("2024-01-03 08:00:00"),
        i.toLong, "view", v, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = SparkEntry.queries("eval_lin_ccc")(spark, d).collect().head
    def q12(x: Double) = math.rint(x * 1e12) / 1e12
    val p1 = rows.map(r => q12(1.0 / (1 + math.exp(-(r._5 - 100) / 40.0))))
    val p2 = rows.map(r => q12(math.min(math.max(r._5 / 200.0, 0), 1)))
    val n = p1.size
    val (m1, m2) = (p1.sum / n, p2.sum / n)
    val v1 = p1.map(x => q12(x * x)).sum / n - m1 * m1
    val v2 = p2.map(x => q12(x * x)).sum / n - m2 * m2
    val cov = p1.zip(p2).map { case (a, b) => q12(a * b) }.sum / n - m1 * m2
    val expCcc = 2 * cov / (v1 + v2 + (m1 - m2) * (m1 - m2))
    assert(math.abs(out.getDouble(4) - expCcc) < 2e-4)
    assert(math.abs(out.getDouble(3) - cov / math.sqrt(v1 * v2)) < 2e-4)
  }

  import java.sql.Timestamp

  /** One 'view' event per unit of count on consecutive January days. */
  private def writeDayCounts(d: String, counts: Seq[Int]): Unit = {
    var id = 0L
    val rows = counts.zipWithIndex.flatMap { case (c, day) =>
      val date = java.time.LocalDate.of(2024, 1, 1).plusDays(day.toLong)
      (0 until c).map { _ =>
        id += 1
        (id, Timestamp.valueOf(date.atTime(12, 0)), id, "view", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
  }

  test("ts_ar2_yw + ts_ljung_box: full JVM replay on an integer-mean fixture") {
    val d = tmp("r14ar2")
    // 12 days, total 48 -> mu = 4 exactly; every (c-mu) product is an
    // integer, so the DECIMAL quantization is exact and the JVM replay
    // walks the identical arithmetic.
    val counts = Seq(3, 5, 2, 7, 4, 6, 3, 8, 2, 5, 2, 1)
    writeDayCounts(d, counts)
    val n = counts.size
    val mu = counts.sum.toDouble / n
    def s(k: Int): Double = (0 until n - k)
      .map(i => (counts(i) - mu) * (counts(i + k) - mu)).sum
    val (s0, s1, s2) = (s(0), s(1), s(2))
    val (r1, r2) = (s1 / s0, s2 / s0)
    val phi1 = r1 * (1 - r2) / (1 - r1 * r1)
    val phi2 = (r2 - r1 * r1) / (1 - r1 * r1)
    val fc = mu + phi1 * (counts(n - 1) - mu) + phi2 * (counts(n - 2) - mu)
    val ar = SparkEntry.queries("ts_ar2_yw")(spark, d).collect().head
    assert(ar.getLong(1) == n.toLong)
    assert(math.abs(ar.getDouble(2) - phi1) < 1e-4, "phi1")
    assert(math.abs(ar.getDouble(3) - phi2) < 1e-4, "phi2")
    assert(math.abs(ar.getDouble(4) - fc) < 1e-4, "forecast")
    val q = n * (n + 2.0) *
      (1 to 7).map(k => (s(k) / s0) * (s(k) / s0) / (n - k)).sum
    val lb = SparkEntry.queries("ts_ljung_box")(spark, d).collect().head
    assert(math.abs(lb.getDouble(2) - q) < 1e-4, "ljung-box Q")
    assert(lb.getBoolean(4) == (q > 14.0671))
  }

  test("ts_ljung_box: a strong weekly pattern rejects whiteness") {
    val d = tmp("r14lbw")
    // 42 days of a hard period-7 cycle
    writeDayCounts(d, (0 until 42).map(i => 2 + (i % 7) * 4))
    val lb = SparkEntry.queries("ts_ljung_box")(spark, d).collect().head
    assert(lb.getDouble(2) > 14.0671 && lb.getBoolean(4),
      s"periodic series must reject: Q=${lb.getDouble(2)}")
  }

  test("ts_lttb: keeps endpoints, catches the planted spike, 20 rows") {
    val d = tmp("r14lttb")
    // 60 flat days with one interior spike at day 31
    writeDayCounts(d, (0 until 60).map(i => if (i == 30) 50 else 5))
    val out = SparkEntry.queries("ts_lttb")(spark, d).collect()
    assert(out.length == 20, "one point per bucket")
    val days = out.map(_.getString(2)).toSet
    assert(days.contains("2024-01-01"), "first point kept")
    assert(days.contains("2024-02-29"), "last point kept")
    assert(days.contains("2024-01-31"), "the spike dominates its bucket")
    val yv = out.map(r => r.getString(2) -> r.getLong(3)).toMap
    assert(yv("2024-01-31") == 50L)
  }

  test("ts_hurst: trending series reads persistent, alternating reads anti-persistent") {
    val d1 = tmp("r14h1")
    writeDayCounts(d1, (0 until 64).map(i => 1 + i)) // pure trend
    val d2 = tmp("r14h2")
    writeDayCounts(d2, (0 until 64).map(i => if (i % 2 == 0) 5 else 15))
    val hi = SparkEntry.queries("ts_hurst")(spark, d1).collect().head
      .getDouble(1)
    val lo = SparkEntry.queries("ts_hurst")(spark, d2).collect().head
      .getDouble(1)
    assert(hi > 0.8, s"trend must read persistent: $hi")
    assert(lo < 0.3, s"alternation must read anti-persistent: $lo")
    assert(hi > lo + 0.4)
  }

  test("dq_functional_deps: planted violation and planted hold read exactly") {
    val d = tmp("r14fd")
    // customer: custkey->nationkey holds (unique keys); nationkey 7
    // maps to TWO segments (one violating LHS group, max fan-out 2)
    Seq((1L, "Customer#1", 7L, 1.0, "AUTO"),
        (2L, "Customer#2", 7L, 1.0, "BIKE"),
        (3L, "Customer#3", 8L, 1.0, "AUTO"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    Seq((7L, "GERMANY", 1L), (8L, "FRANCE", 1L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$d/nation.parquet")
    Seq((1L, 1L, "F", 10.0, java.sql.Date.valueOf("2024-01-01"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq((1L, 1L, 1L, 1L, 1.0, 1.0, 0.0, 0.0, "N", "O",
        java.sql.Date.valueOf("2024-01-02")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val out = SparkEntry.queries("dq_functional_deps")(spark, d).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    assert(out("c_custkey->c_nationkey") == ((3L, 0L, 1L, true)))
    assert(out("c_nationkey->c_mktsegment") == ((2L, 1L, 2L, false)))
    assert(out("n_nationkey->n_regionkey")._4)
  }

  test("dq_format_census: a corrupted value splits its column's class census") {
    val d = tmp("r14fmt")
    Seq((1L, "Customer#001", 1L, 1.0, "AUTO"),
        (2L, "Customer#002", 1L, 1.0, "AUTO"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    // 3 clean alpha_space names + 1 corrupted (digit inside)
    Seq((1L, "cold widget", "Brand#1", "ECONOMY", 1L, 1.0),
        (2L, "small bolt", "Brand#2", "PROMO", 1L, 1.0),
        (3L, "large gear", "Brand#3", "PROMO", 1L, 1.0),
        (4L, "w1dget oops", "Brand#4", "PROMO", 1L, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
      .write.mode("overwrite").parquet(s"$d/part.parquet")
    Seq((1L, 1L, "F", 10.0, java.sql.Date.valueOf("2024-01-01"),
        "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val out = SparkEntry.queries("dq_format_census")(spark, d).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out(("p_name", "alpha_space")) == ((3L, 0.75, true)))
    assert(out(("p_name", "other")) == ((1L, 0.25, false)))
    assert(out(("c_name", "id_hash")) == ((2L, 1.0, true)))
    assert(out(("o_orderpriority", "code_upper"))._2 == 1.0)
  }

  test("pipe_mix_effective_sources: temperature flattens the mix (JVM replay)") {
    val d = tmp("r14mix")
    // 90/10 two-source corpus
    val rows = (0 until 90).map(i => (i.toLong, s"doc $i", "en", "srcA",
      5L)) ++ (90 until 100).map(i => (i.toLong, s"doc $i", "en", "srcB", 5L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("pipe_mix_effective_sources")(spark, d)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    def q12(x: Double) = math.rint(x * 1e12) / 1e12
    val hRaw = q12(-(0.9 * math.log(0.9))) + q12(-(0.1 * math.log(0.1)))
    val (nR, eR, effR, msR) = out("raw")
    assert(nR == 2L && math.abs(eR - hRaw) < 2e-4 && msR == 0.9)
    assert(math.abs(effR - math.exp(hRaw)) < 2e-3)
    val (_, eT, effT, msT) = out("tempered")
    assert(effT > effR && msT < msR, "temperature must flatten")
    assert(effT <= 2.0 + 1e-9)
  }

  test("text_yule_k: all-distinct tokens score K = 0; a single type scores 10^4(1-1/N)") {
    val d1 = tmp("r14yk1")
    Seq((1L, "a b c d", "en", "s", 7L), (2L, "e f g h", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d1/documents.parquet")
    val o1 = SparkEntry.queries("text_yule_k")(spark, d1).collect().head
    assert(o1.getLong(0) == 8L && o1.getLong(1) == 8L)
    assert(o1.getDouble(2) == 0.0 && o1.getDouble(3) == 0.0)
    val d2 = tmp("r14yk2")
    Seq((1L, "x x x x x x x x x x", "en", "s", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val o2 = SparkEntry.queries("text_yule_k")(spark, d2).collect().head
    assert(o2.getLong(1) == 1L)
    assert(o2.getDouble(2) == math.rint(10000.0 * 0.9 * 10000) / 10000)
    assert(o2.getDouble(3) == 1.0, "single type: Simpson D = 1")
  }

  test("graph_ktruss: a 4-clique survives the peel, a lone triangle does not") {
    val d = tmp("r14truss")
    // two orders over parts {1,2,3,4} (every pair support 2 -> a
    // 4-clique; each clique edge sits in 2 triangles) and two orders
    // over {5,6,7} (a lone triangle; each edge in 1 triangle)
    val rows = for {
      (ok, parts) <- Seq((1L, Seq(1L, 2L, 3L, 4L)), (2L, Seq(1L, 2L, 3L, 4L)),
        (3L, Seq(5L, 6L, 7L)), (4L, Seq(5L, 6L, 7L)))
      (p, i) <- parts.zipWithIndex
    } yield (ok, p, 1L, (i + 1).toLong, 1.0, 1.0, 0.0, 0.0, "N", "O",
      java.sql.Date.valueOf("2024-01-02"))
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val out = SparkEntry.queries("graph_ktruss")(spark, d).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getBoolean(3)))).toMap
    assert(out(1) == ((9L, 6L, false)), "round 1 peels the lone triangle")
    assert(out(2) == ((6L, 6L, true)), "round 2 certifies the fixpoint")
  }

  test("sim_ivfpq_adc: an exact duplicate ranks first; other cells are pruned") {
    val d = tmp("r14ivfpq")
    // label 0: query vec 0, its exact duplicate 20, and far decoys
    // 21-25; ids 1-15 (label 1) anchor the residual codebook; id 30
    // duplicates the query but lives in cell 1 -> IVF must prune it.
    def vec(seed: Int): Seq[Float] =
      Array.tabulate(64)(j => (((seed * 13 + j * 7) % 17) - 8).toFloat).toSeq
    val q0 = vec(99)
    val rows =
      Seq((0L, q0, 0), (20L, q0, 0), (30L, q0, 1)) ++
      (21 to 25).map(i => (i.toLong, vec(i), 0)) ++
      (1 to 15).map(i => (i.toLong, vec(i * 3 + 1), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = SparkEntry.queries("sim_ivfpq_adc")(spark, d).collect()
    val q0rows = out.filter(_.getLong(0) == 0L)
    assert(q0rows.nonEmpty)
    assert(q0rows.head.getLong(1) == 20L,
      s"duplicate must rank first, got ${q0rows.head.getLong(1)}")
    assert(!q0rows.map(_.getLong(1)).contains(30L),
      "the other cell's duplicate must be pruned by the IVF stage")
  }

  test("norm_yeo_johnson: full JVM replay of the profile log-likelihood grid") {
    val d = tmp("r14yj")
    // signed data around the 100 pivot: both YJ branches exercised
    val vals = Seq(60.0, 80.0, 95.0, 100.0, 103.0, 120.0, 150.0, 190.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, Timestamp.valueOf("2024-01-05 10:00:00"), i.toLong,
        "view", v, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    def q(x: Double, s: Int) = {
      val f = math.pow(10, s)
      math.rint(x * f) / f
    }
    val xs = vals.map(_ - 100)
    def yj(lam: Double)(x: Double): Double =
      if (lam == 0.0) { if (x >= 0) math.log(x + 1)
        else -(((1 - x) * (1 - x)) - 1) / 2 }
      else if (lam == 0.5) { if (x >= 0) 2 * (math.sqrt(x + 1) - 1)
        else -(((1 - x) * math.sqrt(1 - x)) - 1) / 1.5 }
      else if (lam == 1.0) x
      else { if (x >= 0) ((x + 1) * (x + 1) - 1) / 2
        else -math.log(1 - x) }
    val slx = xs.map(x => q(if (x >= 0) math.log(1 + x)
      else -math.log(1 - x), 12)).sum
    val n = xs.size
    val expected = Seq(0.0, 0.5, 1.0, 2.0).map { lam =>
      val ys = xs.map(yj(lam))
      val s1 = ys.map(q(_, 10)).sum
      val s2 = ys.map(y => q(y * y, 10)).sum
      val v = s2 / n - (s1 / n) * (s1 / n)
      lam -> (-(n / 2.0) * math.log(v) + (lam - 1) * slx)
    }.toMap
    val out = SparkEntry.queries("norm_yeo_johnson")(spark, d).collect()
    assert(out.length == 4)
    for (r <- out) {
      val lam = r.getDouble(0)
      assert(math.abs(r.getDouble(2) - expected(lam)) < 2e-4,
        s"lambda $lam: ${r.getDouble(2)} vs ${expected(lam)}")
    }
    assert(out.count(_.getBoolean(3)) == 1, "exactly one winner")
  }

  test("eval_auc_by_fold: five folds, dispersion consistent with the fold AUCs") {
    val out = SparkEntry.queries("eval_auc_by_fold")(spark, sf).collect()
    assert(out.map(_.getInt(0)).toSet == Set(0, 1, 2, 3, 4))
    val aucs = out.map(_.getDouble(3))
    assert(aucs.forall(a => a >= 0.0 && a <= 1.0))
    val mean = aucs.sum / aucs.length
    assert(math.abs(out.head.getDouble(4) - mean) < 1e-3,
      "mean_auc tracks the per-fold AUCs")
    assert(out.map(_.getDouble(5)).distinct.length == 1,
      "sd_auc is one number repeated")
  }

  test("ts_time_weighted_avg: holding intervals weight the mean (exact fixture)") {
    val d = tmp("r14twa")
    // v=10 held 300 s, v=40 held 100 s, terminal point unweighted:
    // TWA = (10*300 + 40*100)/400 = 17.5; simple mean = (10+40)/2 = 25
    val base = Timestamp.valueOf("2024-01-06 00:00:00").getTime
    val rows = Seq((1L, 0L, 10.0), (2L, 300L, 40.0), (3L, 400L, 99.0))
      .map { case (id, off, v) =>
        (id, new Timestamp(base + off * 1000), id, "view", v, "{}")
      }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = SparkEntry.queries("ts_time_weighted_avg")(spark, d)
      .collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 400L)
    assert(r.getDouble(3) == 17.5 && r.getDouble(4) == 25.0)
  }

  test("agg_inequality: equality reads 0 everywhere; a two-point split replays") {
    val d1 = tmp("r14ineq1")
    val eq = (0 until 20).map(i => (i.toLong,
      Timestamp.valueOf("2024-01-07 10:00:00"), i.toLong, "view", 5.0, "{}"))
    eq.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d1/events.parquet")
    val r1 = SparkEntry.queries("agg_inequality")(spark, d1).collect().head
    for (i <- 2 to 5)
      assert(math.abs(r1.getDouble(i)) < 1e-4, s"equality index $i must be 0")
    val d2 = tmp("r14ineq2")
    val half = (0 until 10).map(i => (i.toLong,
        Timestamp.valueOf("2024-01-07 10:00:00"), i.toLong, "view", 1.0,
        "{}")) ++
      (10 until 20).map(i => (i.toLong,
        Timestamp.valueOf("2024-01-07 10:00:00"), i.toLong, "view", 3.0,
        "{}"))
    half.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d2/events.parquet")
    val r2 = SparkEntry.queries("agg_inequality")(spark, d2).collect().head
    // mu = 2: Hoover = (10*1 + 10*1)/(2*20*2) = 0.25 exactly
    assert(r2.getDouble(5) == 0.25)
    val theilT = (0.5 * math.log(0.5) + 1.5 * math.log(1.5)) / 2
    assert(math.abs(r2.getDouble(2) - theilT) < 2e-4)
    val theilL = (math.log(2.0) + math.log(2.0 / 3)) / 2
    assert(math.abs(r2.getDouble(3) - theilL) < 2e-4)
  }

  test("ts_forecast_deviance: an exact period-7 series scores zero deviance") {
    val d = tmp("r14dev")
    writeDayCounts(d, (0 until 28).map(i => 2 + (i % 7) * 3))
    val r = SparkEntry.queries("ts_forecast_deviance")(spark, d)
      .collect().head
    assert(r.getLong(1) == 21L)
    assert(r.getDouble(2) == 0.0 && r.getDouble(4) == 0.0,
      "perfect seasonal-naive forecast: zero Poisson and gamma deviance")
  }

  test("behavior_price_elasticity: a planted ln-ln line reads slope -2, R2 = 1") {
    val d = tmp("r14elas")
    // unit prices 1 and 2, quantities 8 and 2: ln q = 3ln2 - 2 ln u
    val li = Seq((1L, 1L, 1L, 1L, 8.0, 8.0), (2L, 1L, 1L, 2L, 2.0, 4.0))
      .map { case (ok, pk, sk, ln, q, ep) =>
        (ok, pk, sk, ln, q, ep, 0.0, 0.0, "N", "O",
          java.sql.Date.valueOf("2024-01-02"))
      }
    li.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    Seq((1L, "cold widget", "Brand#1", "ECONOMY", 1L, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
      .write.mode("overwrite").parquet(s"$d/part.parquet")
    val r = SparkEntry.queries("behavior_price_elasticity")(spark, d)
      .collect().head
    assert(r.getString(0) == "Brand#1" && r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - (-2.0)) < 1e-4)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-4)
  }

  test("eval_cost_threshold: exactly one optimum; curve replays from confusion counts") {
    val out = SparkEntry.queries("eval_cost_threshold")(spark, sf).collect()
    assert(out.length == 9)
    assert(out.count(_.getBoolean(4)) == 1, "exactly one optimal threshold")
    // cost column closes over its own parts, and FP falls / FN rises
    // monotonically as the threshold climbs
    for (r <- out)
      assert(r.getLong(3) == r.getLong(1) + 5 * r.getLong(2))
    val fps = out.map(_.getLong(1)); val fns = out.map(_.getLong(2))
    assert(fps.zip(fps.tail).forall { case (a, b) => b <= a })
    assert(fns.zip(fns.tail).forall { case (a, b) => b >= a })
    val best = out.filter(_.getBoolean(4)).head.getLong(3)
    assert(out.forall(_.getLong(3) >= best))
  }

  test("dq_value_drift: planted new and vanished buckets read exactly") {
    val d = tmp("r14drift")
    // ref window (days <= 15): buckets {0, 1, 2}; cur window: {1, 2, 9}
    def ev(id: Long, day: Int, v: Double) =
      (id, Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), id, "view", v,
        "{}")
    val rows = Seq(ev(1, 5, 5.0), ev(2, 6, 15.0), ev(3, 7, 25.0),
      ev(4, 20, 15.0), ev(5, 21, 25.0), ev(6, 22, 95.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = SparkEntry.queries("dq_value_drift")(spark, d).collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 3L, "n_ref, n_cur")
    assert(r.getLong(3) == 2L, "shared {1,2}")
    assert(r.getLong(4) == 1L && r.getLong(5) == 1L, "one new, one gone")
    assert(r.getDouble(6) == 0.5, "jaccard 2/4")
  }

  test("text_lm_interp_ppl: a deterministic corpus replays; ppl beats add-one on repeats") {
    val d = tmp("r14lm")
    // one language, one doc: 'a b a b a' -> bigrams ab x2, ba x2
    Seq((1L, "a b a b a", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = SparkEntry.queries("text_lm_interp_ppl")(spark, d)
      .collect().head
    assert(r.getString(0) == "en" && r.getLong(1) == 4L)
    // c(a)=3, c(b)=2, N=5; p(b|a) = .75*(2/3) + .25*(2/5);
    // p(a|b) = .75*(2/2) + .25*(3/5)
    def q12(x: Double) = math.rint(x * 1e12) / 1e12
    val nll = (q12(2 * -math.log(0.75 * (2.0 / 3) + 0.25 * (2.0 / 5))) +
      q12(2 * -math.log(0.75 * (2.0 / 2) + 0.25 * (3.0 / 5)))) / 4
    assert(math.abs(r.getDouble(2) - math.floor(nll * 1e4 + 0.5) / 1e4)
      < 1e-9)
    assert(math.abs(r.getDouble(3) -
      math.floor(math.exp(r.getDouble(2)) * 1e4 + 0.5) / 1e4) < 1e-9)
  }

  test("eval_mcc: a perfect classifier reads 1.0, an inverted one -1.0") {
    def write(d: String, inverted: Boolean): Unit = {
      // value 160 -> p ~ 0.82 (pred 1); value 40 -> p ~ 0.18 (pred 0)
      val rows = (0 until 10).map { i =>
        val pos = i < 5
        val v = if (pos ^ inverted) 160.0 else 40.0
        (i.toLong, Timestamp.valueOf("2024-01-08 09:00:00"), i.toLong,
          if (pos) "purchase" else "view", v, "{}")
      }
      rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("overwrite").parquet(s"$d/events.parquet")
    }
    val d1 = tmp("r14mcc1"); write(d1, inverted = false)
    val d2 = tmp("r14mcc2"); write(d2, inverted = true)
    val perf = SparkEntry.queries("eval_mcc")(spark, d1).collect().head
    assert(perf.getLong(0) == 5L && perf.getLong(3) == 5L)
    assert(perf.getDouble(4) == 1.0 && perf.getDouble(5) == 1.0 &&
      perf.getDouble(6) == 1.0)
    val inv = SparkEntry.queries("eval_mcc")(spark, d2).collect().head
    assert(inv.getDouble(4) == -1.0 && inv.getDouble(5) == 0.0 &&
      inv.getDouble(6) == 0.0)
  }

  test("ts_pacf: an AR(1)-like signal's pacf2/pacf3 collapse; pacf1 = r1 against ts_autocorr machinery") {
    val d = tmp("r14pacf")
    // the integer-mean replay fixture: recompute r1/phi22/phi33 in JVM
    val counts = Seq(3, 5, 2, 7, 4, 6, 3, 8, 2, 5, 2, 1)
    writeDayCounts(d, counts)
    val n = counts.size
    val mu = counts.sum.toDouble / n
    def s(k: Int): Double = (0 until n - k)
      .map(i => (counts(i) - mu) * (counts(i + k) - mu)).sum
    val (r1, r2, r3) = (s(1) / s(0), s(2) / s(0), s(3) / s(0))
    val p22 = (r2 - r1 * r1) / (1 - r1 * r1)
    val p21 = r1 * (1 - p22)
    val p33 = (r3 - p21 * r2 - p22 * r1) / (1 - p21 * r1 - p22 * r2)
    val out = SparkEntry.queries("ts_pacf")(spark, d).collect().head
    assert(out.getLong(1) == n.toLong)
    assert(math.abs(out.getDouble(2) - r1) < 1e-4)
    assert(math.abs(out.getDouble(3) - p22) < 1e-4)
    assert(math.abs(out.getDouble(4) - p33) < 1e-4)
  }
}
