package graft.queries

import graft.{SparkEntry, SparkSpec}
import java.sql.Timestamp

/** Mathematical laws for the round-10 operator additions on planted
  * fixtures — invariants any correct implementation satisfies:
  * last-touch attribution conserves purchases across channels, a
  * transition matrix is row-stochastic, a perfectly 7-periodic series
  * has zero seasonal-naive error, a star graph is maximally
  * disassortative (r = −1), and an exact factor-2 rank-frequency pair
  * fits a Zipf slope of exactly −1. */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  private def plantEvents(
      rows: Seq[(Long, Timestamp, Long, String, Double, String)]): String = {
    val d = java.nio.file.Files.createTempDirectory("r10fix").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private val t0 = Timestamp.valueOf("2024-01-01 12:00:00")
  private def plus(t: Timestamp, hours: Int): Timestamp =
    new Timestamp(t.getTime + hours * 3600L * 1000L)

  test("behavior_attribution_lt: in-window touch wins, stale/no touch is direct; purchases conserved") {
    val d = plantEvents(Seq(
      (1L, t0, 1L, "click", 0.0, "{}"),            // user 1: click 1 h before
      (2L, plus(t0, 1), 1L, "purchase", 10.0, "{}"),
      (3L, t0, 2L, "view", 0.0, "{}"),              // user 2: touch 25 h stale
      (4L, plus(t0, 25), 2L, "purchase", 20.0, "{}"),
      (5L, t0, 3L, "purchase", 30.0, "{}")))        // user 3: no touch at all
    val rows = SparkEntry.queries("behavior_attribution_lt")(spark, d).collect()
    val byCh = rows.map(r => r.getAs[String]("channel") ->
      r.getAs[Long]("purchases")).toMap
    assert(byCh("click") == 1L)
    assert(byCh("direct") == 2L)
    assert(byCh.values.sum == 3L) // conservation: every purchase lands once
  }

  test("behavior_transitions: row-stochastic matrix with exact planted counts") {
    val d = plantEvents(Seq(
      (1L, t0, 1L, "view", 0.0, "{}"),
      (2L, plus(t0, 1), 1L, "click", 0.0, "{}"),
      (3L, plus(t0, 2), 1L, "purchase", 0.0, "{}"),
      (4L, t0, 2L, "view", 0.0, "{}"),
      (5L, plus(t0, 1), 2L, "view", 0.0, "{}")))
    val rows = SparkEntry.queries("behavior_transitions")(spark, d).collect()
    val m = rows.map(r => (r.getAs[String]("src"), r.getAs[String]("dst")) ->
      (r.getAs[Long]("n"), r.getAs[Double]("p"))).toMap
    assert(m(("view", "click")) == ((1L, 0.5)))
    assert(m(("view", "view")) == ((1L, 0.5)))
    assert(m(("click", "purchase")) == ((1L, 1.0)))
    // row-stochastic: per-src probabilities sum to 1
    rows.groupBy(_.getAs[String]("src")).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getAs[Double]("p")).sum - 1.0) < 1e-9)
    }
  }

  test("behavior_paths: ordered first-5 signature, counted across users") {
    val d = plantEvents(Seq(
      (1L, t0, 1L, "view", 0.0, "{}"),
      (2L, plus(t0, 1), 1L, "click", 0.0, "{}"),
      (3L, t0, 2L, "view", 0.0, "{}"),
      (4L, plus(t0, 1), 2L, "click", 0.0, "{}"),
      (5L, t0, 3L, "click", 0.0, "{}")))
    val rows = SparkEntry.queries("behavior_paths")(spark, d).collect()
    val byPath = rows.map(r => r.getAs[String]("path") ->
      r.getAs[Long]("users")).toMap
    assert(byPath("view>click") == 2L)
    assert(byPath("click") == 1L)
  }

  test("ts_forecast_naive: a perfectly 7-periodic daily series backtests to zero error") {
    // 21 days; day d carries (d mod 7) + 1 events — lag-7 is exact.
    val rows = for {
      d <- 0 until 21
      k <- 0 to (d % 7)
    } yield ((d * 10 + k + 1).toLong,
      Timestamp.valueOf(f"2024-01-${d + 1}%02d 0$k:00:00"),
      1L, "view", 1.0, "{}")
    val dir = plantEvents(rows)
    val out = SparkEntry.queries("ts_forecast_naive")(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_days") == 14L)
    assert(out.head.getAs[Long]("abs_err") == 0L)
    assert(out.head.getAs[Double]("mape") == 0.0)
  }

  test("norm_robust: exact interpolated quartiles and the Tukey outlier census") {
    // 1..100 plus two planted extremes: q1 = 26.25, med = 51.5,
    // q3 = 76.75 (pos = 1 + p·(n−1) over the 102 sorted values),
    // upper fence 152.5 — exactly the two extremes trip it.
    val rows = (1 to 100).map(i =>
      (i.toLong, plus(t0, i % 24), (i % 5).toLong, "view", i.toDouble, "{}")) ++
      Seq((101L, t0, 1L, "view", 500.0, "{}"), (102L, t0, 2L, "view", 600.0, "{}"))
    val d = plantEvents(rows)
    val out = SparkEntry.queries("norm_robust")(spark, d).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Double]("med") == 51.5)
    assert(r.getAs[Double]("iqr") == 50.5)
    assert(r.getAs[Long]("n") == 102L)
    assert(r.getAs[Long]("n_outliers") == 2L)
  }

  test("graph_assortativity: a star co-purchase graph is maximally disassortative (r = -1)") {
    // Center part 100 paired with each leaf 101..104 in two orders —
    // every (center, leaf) edge clears support ≥ 2, no leaf-leaf edge.
    val li = (for {
      leaf <- 101L to 104L
      rep <- 0 to 1
    } yield {
      val orderKey = leaf * 10 + rep
      Seq((orderKey, 100L), (orderKey, leaf))
    }).flatten
    val d = java.nio.file.Files.createTempDirectory("r10star").toString
    li.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val out = SparkEntry.queries("graph_assortativity")(spark, d).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_edges") == 8L) // 4 edges, both directions
    assert(out.head.getAs[Double]("assortativity") == -1.0)
  }

  test("text_zipf: an exact factor-2 rank-frequency pair fits slope -1") {
    // 'a' ×100 (rank 1), 'b' ×50 (rank 2): the two-point OLS line has
    // slope ln(50/100) / ln(2/1) = −1 exactly.
    val text = (Seq.fill(100)("a") ++ Seq.fill(50)("b")).mkString(" ")
    val d = java.nio.file.Files.createTempDirectory("r10zipf").toString
    Seq((1L, text, "en", "web", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("text_zipf")(spark, d).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_terms") == 2L)
    assert(out.head.getAs[Double]("zipf_slope") == -1.0)
  }

  test("eval_ks: perfectly separating scores give KS = 1") {
    // All on one weekday; every positive (purchase) scores above every
    // negative (view) — the CDF gap must reach exactly 1.
    val d = plantEvents(Seq(
      (1L, t0, 1L, "view", 10.0, "{}"),
      (2L, plus(t0, 1), 1L, "view", 20.0, "{}"),
      (3L, plus(t0, 2), 2L, "purchase", 90.0, "{}"),
      (4L, plus(t0, 3), 2L, "purchase", 95.0, "{}")))
    val out = SparkEntry.queries("eval_ks")(spark, d).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("p_cnt") == 2L)
    assert(out.head.getAs[Long]("n_cnt") == 2L)
    assert(out.head.getAs[Double]("ks") == 1.0)
  }

  test("eval_regression: planted residuals give exact RMSE/MAE/R2") {
    // y in {40, 50, 60}: err = 0.2y - 10 = {-2, 0, 2} -> SSE 8, SAE 4,
    // SST = 7700 - 7500 = 200, R2 = 1 - 8/200 = 0.96.
    val d = plantEvents(Seq(
      (1L, t0, 1L, "view", 40.0, "{}"),
      (2L, plus(t0, 1), 1L, "view", 50.0, "{}"),
      (3L, plus(t0, 2), 1L, "view", 60.0, "{}")))
    val out = SparkEntry.queries("eval_regression")(spark, d).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n") == 3L)
    assert(r.getAs[Double]("mae") == 1.3333)
    assert(r.getAs[Double]("r2") == 0.96)
    assert(math.abs(r.getAs[Double]("rmse") - math.sqrt(8.0 / 3)) < 5e-5)
  }

  test("agg_weighted_quantile: cumulative-share boundaries pick exact values") {
    // weights: 10->1, 20->1, 30->2 (tot 4); shares 0.25 / 0.5 / 1.0.
    val d = java.nio.file.Files.createTempDirectory("r10wq").toString
    Seq(("A", 10.0, 1.0), ("A", 20.0, 1.0), ("A", 30.0, 1.0),
        ("A", 30.0, 1.0))
      .toDF("l_returnflag", "l_extendedprice", "l_quantity")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val out = SparkEntry.queries("agg_weighted_quantile")(spark, d).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Double]("wq25") == 10.0)
    assert(r.getAs[Double]("wq50") == 20.0)
    assert(r.getAs[Double]("wq75") == 30.0)
  }

  test("win_median: trailing-5 exact medians over a planted sequence") {
    // user 0 (%20==0), values 5,1,9,3,7 -> medians 5, 3, 5, 4, 5.
    val d = plantEvents(Seq(
      (1L, t0, 0L, "view", 5.0, "{}"),
      (2L, plus(t0, 1), 0L, "view", 1.0, "{}"),
      (3L, plus(t0, 2), 0L, "view", 9.0, "{}"),
      (4L, plus(t0, 3), 0L, "view", 3.0, "{}"),
      (5L, plus(t0, 4), 0L, "view", 7.0, "{}")))
    val out = SparkEntry.queries("win_median")(spark, d).collect()
    assert(out.map(_.getAs[Double]("med5")).toSeq ==
      Seq(5.0, 3.0, 5.0, 4.0, 5.0))
  }

  test("dq_outlier_iqr: a planted extreme is the only Tukey outlier") {
    // 10..17 plus 1000: q1 = 12, q3 = 16, fences [6, 22] -> 1 outlier.
    val rows = (10 to 17).map(v =>
      (v.toLong, plus(t0, v), 1L, "view", v.toDouble, "{}")) :+
      (99L, plus(t0, 99), 1L, "view", 1000.0, "{}")
    val d = plantEvents(rows)
    val out = SparkEntry.queries("dq_outlier_iqr")(spark, d).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n") == 9L)
    assert(r.getAs[Double]("q1") == 12.0)
    assert(r.getAs[Double]("q3") == 16.0)
    assert(r.getAs[Long]("outliers") == 1L)
  }

  test("text_ngram_novelty: first doc scores 1, a dup scores 0, half-new scores fractionally") {
    val d = java.nio.file.Files.createTempDirectory("r10nov").toString
    Seq((1L, "a b c d", "en", "web", 7L),
        (2L, "a b c d", "en", "web", 7L),   // exact dup of doc 1
        (3L, "a b c x y z", "en", "web", 11L)) // 1 of 4 shingles seen
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("text_ngram_novelty")(spark, d).collect()
    val m = out.map(r => r.getAs[Long]("doc_id") ->
      r.getAs[Double]("novelty")).toMap
    assert(m(1L) == 1.0)
    assert(m(2L) == 0.0)
    assert(m(3L) == 0.75)
  }

  test("eval_mutual_info: independence gives MI 0; perfect dependence gives ln 2") {
    // 2 days x 2 types, fully balanced -> independent -> MI = 0.
    val ind = plantEvents(Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "view", 0.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 11:00:00"), 1L, "purchase", 0.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-02 10:00:00"), 1L, "view", 0.0, "{}"),
      (4L, Timestamp.valueOf("2024-01-02 11:00:00"), 1L, "purchase", 0.0, "{}")))
    val r1 = SparkEntry.queries("eval_mutual_info")(spark, ind).collect().head
    assert(r1.getAs[Double]("mi") == 0.0)
    assert(r1.getAs[Double]("h_day") == 0.6931) // ln 2
    // day determines type -> MI = H(type) = ln 2.
    val dep = plantEvents(Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "view", 0.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 11:00:00"), 1L, "view", 0.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-02 10:00:00"), 1L, "purchase", 0.0, "{}"),
      (4L, Timestamp.valueOf("2024-01-02 11:00:00"), 1L, "purchase", 0.0, "{}")))
    val r2 = SparkEntry.queries("eval_mutual_info")(spark, dep).collect().head
    assert(r2.getAs[Double]("mi") == 0.6931)
  }

  test("pipe_shard_balance: shard counts conserve the corpus and shares sum to 1") {
    val d = plantEvents((1L to 100L).map(i =>
      (i, plus(t0, i.toInt), i % 7, "view", 1.0, "{}")))
    val out = SparkEntry.queries("pipe_shard_balance")(spark, d).collect()
    assert(out.map(_.getAs[Long]("cnt")).sum == 100L)
    assert(out.forall { r =>
      val s = r.getAs[Int]("shard"); s >= 0 && s < 32 })
    assert(math.abs(out.map(_.getAs[Double]("share")).sum - 1.0) < 1e-2)
  }

  test("dq_referential: a planted orphan line is counted, intact FKs are clean") {
    val d = java.nio.file.Files.createTempDirectory("r10fk").toString
    Seq((1L, 5L), (2L, 5L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq(Tuple1(5L)).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    Seq(Tuple1(1L), Tuple1(1L), Tuple1(99L)).toDF("l_orderkey") // 99 orphan
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val out = SparkEntry.queries("dq_referential")(spark, d).collect()
    val m = out.map(r => r.getAs[String]("relation") ->
      ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_orphans")))).toMap
    assert(m("lineitem->orders") == ((3L, 1L)))
    assert(m("orders->customer") == ((2L, 0L)))
  }

  test("behavior_pareto: one dominant user reaches the 80% point alone") {
    // user 1: 8 of 10 events -> cum share 0.8 at rank 1; share 1/3.
    val rows = (1 to 8).map(i =>
      (i.toLong, plus(t0, i), 1L, "view", 1.0, "{}")) ++
      Seq((9L, plus(t0, 9), 2L, "view", 1.0, "{}"),
          (10L, plus(t0, 10), 3L, "view", 1.0, "{}"))
    val d = plantEvents(rows)
    val r = SparkEntry.queries("behavior_pareto")(spark, d).collect().head
    assert(r.getAs[Long]("n_users") == 3L)
    assert(r.getAs[Long]("n_events") == 10L)
    assert(r.getAs[Long]("pareto_rank") == 1L)
    assert(r.getAs[Double]("pareto_user_share") == 0.3333)
  }

  test("pipe_source_card: per-source stats and dominant language") {
    val d = java.nio.file.Files.createTempDirectory("r10card").toString
    Seq((1L, "t", "en", "web", 10L), (2L, "t", "en", "web", 20L),
        (3L, "t", "de", "web", 30L), (4L, "t", "fr", "books", 40L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("pipe_source_card")(spark, d).collect()
    val web = out.find(_.getAs[String]("source") == "web").get
    assert(web.getAs[Long]("docs") == 3L)
    assert(web.getAs[Long]("n_langs") == 2L)
    assert(web.getAs[String]("top_lang") == "en")
    assert(web.getAs[Double]("top_lang_share") == 0.6667)
    assert(web.getAs[Double]("avg_chars") == 20.0)
  }

  test("dq_freshness: a stalled type shows its exact lag to the watermark") {
    val d = plantEvents(Seq(
      (1L, t0, 1L, "view", 1.0, "{}"),
      (2L, plus(t0, 10), 1L, "view", 1.0, "{}"),   // watermark
      (3L, t0, 1L, "purchase", 1.0, "{}")))         // stalled 10 h
    val out = SparkEntry.queries("dq_freshness")(spark, d).collect()
    val m = out.map(r => r.getAs[String]("event_type") ->
      r.getAs[Long]("lag_sec")).toMap
    assert(m("view") == 0L)
    assert(m("purchase") == 36000L)
  }

  test("stream_freshness: the streaming replay equals the batch audit exactly") {
    val d = plantEvents(Seq(
      (1L, t0, 1L, "view", 1.0, "{}"),
      (2L, plus(t0, 10), 1L, "view", 1.0, "{}"),
      (3L, t0, 1L, "purchase", 1.0, "{}")))
    val stream = SparkEntry.queries("stream_freshness")(spark, d).collect()
    val batch = SparkEntry.queries("dq_freshness")(spark, d).collect()
    assert(stream.map(_.toSeq).toSeq == batch.map(_.toSeq).toSeq)
    val m = stream.map(r => r.getAs[String]("event_type") ->
      r.getAs[Long]("lag_sec")).toMap
    assert(m("purchase") == 36000L)
  }

  test("vec_dim_variance: planted two-vector corpus gives exact per-dim moments") {
    val d = java.nio.file.Files.createTempDirectory("r10dv").toString
    Seq((1L, Array(1.0f, 3.0f), 0), (2L, Array(3.0f, 1.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = SparkEntry.queries("vec_dim_variance")(spark, d).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Double]("mean") == 2.0)
      assert(r.getAs[Double]("variance") == 1.0)
    }
  }

  test("vec_centroid_shift: orthogonal halves cos 0, identical halves cos 1") {
    val d = java.nio.file.Files.createTempDirectory("r10cs").toString
    Seq((0L, Array(1.0f, 0.0f), 0), (1L, Array(0.0f, 1.0f), 0), // orthogonal
        (2L, Array(1.0f, 1.0f), 1), (3L, Array(1.0f, 1.0f), 1)) // identical
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = SparkEntry.queries("vec_centroid_shift")(spark, d).collect()
    val m = out.map(r => r.getAs[Int]("label") ->
      r.getAs[Double]("centroid_cos")).toMap
    assert(m(0) == 0.0)
    assert(m(1) == 1.0)
  }

  test("behavior_new_returning: first-day users are new, repeats are returning") {
    val day2 = Timestamp.valueOf("2024-01-02 12:00:00")
    val d = plantEvents(Seq(
      (1L, t0, 1L, "view", 1.0, "{}"),
      (2L, day2, 1L, "view", 1.0, "{}"),
      (3L, day2, 2L, "view", 1.0, "{}")))
    val out = SparkEntry.queries("behavior_new_returning")(spark, d).collect()
    val m = out.map(r => r.getAs[String]("day") ->
      ((r.getAs[Long]("active_users"), r.getAs[Long]("new_users"),
        r.getAs[Long]("returning_users")))).toMap
    assert(m("2024-01-01") == ((1L, 1L, 0L)))
    assert(m("2024-01-02") == ((2L, 1L, 1L)))
  }

  test("behavior_churn: a user absent next week churns, a continuing one does not") {
    val nextWeek = new Timestamp(t0.getTime + 7L * 86400 * 1000)
    val d = plantEvents(Seq(
      (1L, t0, 1L, "view", 1.0, "{}"),
      (2L, nextWeek, 1L, "view", 1.0, "{}"),
      (3L, t0, 2L, "view", 1.0, "{}")))
    val out = SparkEntry.queries("behavior_churn")(spark, d).collect()
    val first = out.minBy(_.getAs[Long]("w"))
    assert(first.getAs[Long]("active") == 2L)
    assert(first.getAs[Long]("churned") == 1L)
    assert(first.getAs[Double]("churn_rate") == 0.5)
  }

  test("agg_trimmed_mean: 1..10 trims to 2..9 with mean 5.5") {
    val d = java.nio.file.Files.createTempDirectory("r10tm").toString
    (1 to 10).map(i => ("A", i.toDouble))
      .toDF("l_returnflag", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val r = SparkEntry.queries("agg_trimmed_mean")(spark, d).collect().head
    assert(r.getAs[Long]("n") == 10L)
    assert(r.getAs[Long]("n_kept") == 8L)
    assert(r.getAs[Double]("trimmed_mean") == 5.5)
  }

  test("ts_concurrency: overlapping holds peak at 2, disjoint at 1") {
    def at(ms: Long) = new Timestamp(t0.getTime + ms)
    val d = plantEvents(Seq(
      (1L, t0, 1L, "view", 9.0, "{}"),        // holds [0, 10s)
      (2L, at(5000), 1L, "view", 1.0, "{}"),  // holds [5s, 7s) — overlap
      (3L, t0, 1L, "click", 1.0, "{}"),       // holds [0, 2s)
      (4L, at(60000), 1L, "click", 1.0, "{}"))) // holds [60s, 62s)
    val out = SparkEntry.queries("ts_concurrency")(spark, d).collect()
    val m = out.map(r => r.getAs[String]("event_type") ->
      ((r.getAs[Long]("peak_concurrency"), r.getAs[Long]("n_intervals"))))
      .toMap
    assert(m("view") == ((2L, 2L)))
    assert(m("click") == ((1L, 2L)))
  }

  test("ts_xcorr: a perfectly lag-1-coupled pair of series correlates at 1") {
    def day(n: Int, i: Int) =
      Timestamp.valueOf(f"2024-01-0$n 0$i:00:00")
    var id = 0L
    def mk(n: Int, tpe: String, c: Int) = (1 to c).map { i =>
      id += 1; (id, day(n, i), 1L, tpe, 0.0, "{}") }
    // views 1,2,3 on days 1-3; purchases 2,4,6 on days 2-4.
    val d = plantEvents(
      mk(1, "view", 1) ++ mk(2, "view", 2) ++ mk(3, "view", 3) ++
      mk(2, "purchase", 2) ++ mk(3, "purchase", 4) ++ mk(4, "purchase", 6))
    val out = SparkEntry.queries("ts_xcorr")(spark, d).collect()
    val m = out.map(r => r.getAs[Int]("lag") ->
      ((r.getAs[Long]("n"), r.getAs[Double]("r")))).toMap
    assert(m(1) == ((3L, 1.0)))  // (1,2),(2,4),(3,6): exact line
    assert(m(0)._1 == 2L)        // days 2,3 overlap at lag 0
  }

  test("graph_adamic_adar: two degree-2 common neighbours score 2/ln 2") {
    // Edges (1,10),(10,2),(1,11),(11,2), each with support 2 — the
    // pair (1,2) has common neighbours {10, 11}, both degree 2.
    val li = Seq(
      (101L, 1L), (101L, 10L), (102L, 1L), (102L, 10L),
      (103L, 10L), (103L, 2L), (104L, 10L), (104L, 2L),
      (105L, 1L), (105L, 11L), (106L, 1L), (106L, 11L),
      (107L, 11L), (107L, 2L), (108L, 11L), (108L, 2L))
    val d = java.nio.file.Files.createTempDirectory("r10aa").toString
    li.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val out = SparkEntry.queries("graph_adamic_adar")(spark, d).collect()
    val p = out.find(r => r.getAs[Long]("x") == 1L &&
      r.getAs[Long]("y") == 2L).get
    assert(p.getAs[Long]("cn") == 2L)
    assert(p.getAs[Double]("adamic_adar") ==
      math.floor(2.0 / math.log(2.0) * 10000 + 0.5) / 10000)
  }

  test("text_lang_confusion: planted misroute shows up in the (true, pred) cell") {
    val d = java.nio.file.Files.createTempDirectory("r10lc").toString
    Seq((1L, "the key row", "en", "web", 11L),
        (2L, "the a key", "en", "web", 9L),
        (3L, "der und wert", "en", "web", 12L)) // mislabelled-looking text
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("text_lang_confusion")(spark, d).collect()
    val m = out.map(r => (r.getAs[String]("lang"),
      r.getAs[String]("pred_lang")) ->
      ((r.getAs[Long]("n"), r.getAs[Double]("share_of_true")))).toMap
    assert(m(("en", "en")) == ((2L, 0.6667)))
    assert(m(("en", "de")) == ((1L, 0.3333)))
  }

  test("ts_interarrival: planted gaps give exact order statistics") {
    def at(ms: Long) = new Timestamp(t0.getTime + ms)
    val d = plantEvents(Seq(
      (1L, t0, 1L, "view", 1.0, "{}"),
      (2L, at(10000), 1L, "view", 1.0, "{}"),   // gap 10 s
      (3L, at(30000), 1L, "view", 1.0, "{}")))  // gap 20 s
    val r = SparkEntry.queries("ts_interarrival")(spark, d).collect().head
    assert(r.getAs[Long]("n_gaps") == 2L)
    assert(r.getAs[Double]("p50_sec") == 15.0)
    assert(r.getAs[Double]("p95_sec") == 19.5)
    assert(r.getAs[Double]("mean_sec") == 15.0)
  }

  test("eval_spearman: monotone association is rho 1, reversed is -1") {
    def at(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    val up = plantEvents(Seq(
      (1L, at(9), 1L, "view", 1.0, "{}"),
      (2L, at(10), 1L, "view", 2.0, "{}"),
      (3L, at(11), 1L, "view", 3.0, "{}")))
    val r1 = SparkEntry.queries("eval_spearman")(spark, up).collect().head
    assert(r1.getAs[Double]("rho") == 1.0)
    val down = plantEvents(Seq(
      (1L, at(9), 1L, "view", 3.0, "{}"),
      (2L, at(10), 1L, "view", 2.0, "{}"),
      (3L, at(11), 1L, "view", 1.0, "{}")))
    val r2 = SparkEntry.queries("eval_spearman")(spark, down).collect().head
    assert(r2.getAs[Double]("rho") == -1.0)
  }

  test("dedup_rate_by_source: a duplicated source flags fully, a unique one not at all") {
    val dup = "alpha beta gamma delta epsilon zeta"
    val d = java.nio.file.Files.createTempDirectory("r10dr").toString
    Seq((1L, dup, "en", "mirror", dup.length.toLong),
        (2L, dup, "en", "mirror", dup.length.toLong),
        (3L, "one two three four five six", "en", "fresh", 27L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("dedup_rate_by_source")(spark, d).collect()
    val m = out.map(r => r.getAs[String]("source") ->
      ((r.getAs[Long]("docs"), r.getAs[Long]("flagged"),
        r.getAs[Double]("dup_rate")))).toMap
    assert(m("mirror") == ((2L, 2L, 1.0)))
    assert(m("fresh") == ((1L, 0L, 0.0)))
  }

  test("json_key_profile: key counts and row shares over a mixed-validity column") {
    val d = plantEvents(Seq(
      (1L, t0, 1L, "view", 1.0, """{"a":1,"b":2}"""),
      (2L, plus(t0, 1), 1L, "view", 1.0, """{"a":3}"""),
      (3L, plus(t0, 2), 1L, "view", 1.0, "not json")))
    val out = SparkEntry.queries("json_key_profile")(spark, d).collect()
    val m = out.map(r => r.getAs[String]("key") ->
      ((r.getAs[Long]("cnt"), r.getAs[Double]("row_share")))).toMap
    assert(m("a") == ((2L, 0.6667)))
    assert(m("b") == ((1L, 0.3333)))
  }

  test("pipe_kfold: folds disjointly cover the corpus, shares sum to 1") {
    val d = java.nio.file.Files.createTempDirectory("r10kf").toString
    (1L to 200L).map(i => (i, if (i % 3 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("pipe_kfold")(spark, d).collect()
    assert(out.map(_.getAs[Long]("docs")).sum == 200L)
    assert(out.forall { r =>
      val f = r.getAs[Int]("fold"); f >= 0 && f < 5 })
    assert(math.abs(out.map(_.getAs[Double]("share")).sum - 1.0) < 1e-2)
  }
}
