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
}
