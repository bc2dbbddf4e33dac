package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Accuracy laws for the sketch family. The declared sketch_* queries
  * now run in provably-EXACT regimes (bounded-cardinality keys below
  * each sketch's exact threshold) and carry full DuckDB oracles; these
  * specs pin what the oracles cannot: large-cardinality ESTIMATION-mode
  * accuracy (rsd envelopes, quantile brackets, merge laws) via inline
  * sketches over the raw high-cardinality columns, plus the exact-regime
  * equalities the graduated oracles rely on. */
class SketchAccuracySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct within 3x rsd of exact (rsd=0.02)") {
    val li = graft.Tables.lineitem(spark, dir)
    val exact = li.select(countDistinct(col("l_partkey"))).as[Long].head()
    val approx = li.select(approx_count_distinct(col("l_partkey"), 0.02))
      .as[Long].head()
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.06, s"HLL err $err (exact=$exact approx=$approx)")
  }

  test("percentile_approx p50 lies between exact p45 and p55") {
    val li = graft.Tables.lineitem(spark, dir)
    val Array(p45, p55) = li
      .select(expr("percentile(l_extendedprice, array(0.45, 0.55))"))
      .as[Seq[Double]].head().toArray
    val approx = li
      .select(expr("percentile_approx(l_extendedprice, 0.5, 1000)"))
      .as[Double].head()
    assert(approx >= p45 && approx <= p55,
      s"approx p50 $approx outside exact [$p45, $p55]")
  }

  test("sketch_hll_merge: union of per-group sketches == direct sketch, " +
    "and estimates within 5% of exact") {
    val e = graft.Tables.events(spark, dir)
    // Merge law: estimating the union of per-type sketches must equal
    // estimating one sketch built over the whole column — the property
    // that makes stored sketches re-mergeable without a rescan.
    val merged = e.groupBy("event_type")
      .agg(expr("hll_sketch_agg(user_id)").as("s"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(s))")).as[Double].head()
    val direct = e.agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id))"))
      .as[Double].head()
    assert(merged == direct, s"merge law violated: $merged != $direct")
    val exact = e.select(countDistinct(col("user_id"))).as[Long].head()
    assert(math.abs(merged - exact) / exact <= 0.05,
      s"HLL est $merged vs exact $exact")
    // The declared query sketches user_id % 50 (exact coupon regime):
    // its ALL row must EQUAL the exact distinct residue count.
    val q = graft.SparkEntry.queries("sketch_hll_merge")(spark, dir)
    val all = q.filter(col("scope") === "ALL").select("est").as[Long].head()
    val exactRes = e.select(countDistinct(expr("user_id % 50"))).as[Long].head()
    assert(all == exactRes,
      s"exact-regime HLL ALL row $all != exact residue count $exactRes")
  }

  test("sketch_theta_overlap: inclusion bounds + 5% accuracy vs exact sets") {
    val e = graft.Tables.events(spark, dir)
    val q = graft.SparkEntry.queries("sketch_theta_overlap")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // Structural bounds that hold for ANY sketch state.
    assert(q("a_and_b") <= math.min(q("a_purchase"), q("b_click")))
    assert(q("a_minus_b") <= q("a_purchase"))
    // The declared query sketches user_id % 1000 (exact theta regime:
    // retained < nominal entries) — estimates must EQUAL the exact
    // residue-set algebra, not just approximate it.
    val pur = e.filter(col("event_type") === "purchase")
      .select(expr("user_id % 1000")).distinct().as[Long].collect().toSet
    val clk = e.filter(col("event_type") === "click")
      .select(expr("user_id % 1000")).distinct().as[Long].collect().toSet
    assert(q("a_purchase") == pur.size.toLong)
    assert(q("a_and_b") == pur.intersect(clk).size.toLong)
    assert(q("a_minus_b") == pur.diff(clk).size.toLong)
  }

  test("KLL estimation-mode bracket law + exact-regime equality of the " +
    "declared query") {
    // Estimation-mode bracket law over the HIGH-cardinality column the
    // graduated query no longer touches: an inline sketch of
    // o_totalprice must land between neighboring exact quantiles.
    val o = graft.Tables.orders(spark, dir)
    val Array(p45, p55, p90, p99) = o
      .select(expr("percentile(o_totalprice, array(0.45, 0.55, 0.90, 0.99))"))
      .as[Seq[Double]].head().toArray
    val r = o.agg(expr("kll_sketch_agg_double(o_totalprice)").as("s"))
      .selectExpr("kll_sketch_get_quantile_double(s, 0.5) AS p50",
        "kll_sketch_get_quantile_double(s, 0.95) AS p95")
      .collect().head
    assert(r.getDouble(0) >= p45 && r.getDouble(0) <= p55,
      s"KLL p50 ${r.getDouble(0)} outside [$p45,$p55]")
    assert(r.getDouble(1) >= p90 && r.getDouble(1) <= p99,
      s"KLL p95 ${r.getDouble(1)} outside [$p90,$p99]")
    // The declared query is in the exact-retention regime (25 nation
    // keys < k=200): its ALL row IS the inclusive order statistic.
    val q = graft.SparkEntry.queries("sketch_kll_quantiles")(spark, dir)
      .collect().map(x => x.getString(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    val keys = graft.Tables.nation(spark, dir)
      .select(col("n_nationkey").cast("double")).as[Double].collect().sorted
    val n = keys.length
    assert(q("ALL") == ((keys(math.ceil(0.5 * n).toInt - 1),
      keys(math.ceil(0.95 * n).toInt - 1))))
    // Per-group rows exist for every region and are internally ordered.
    assert(q.size == 6)
    q.values.foreach { case (a, b) => assert(a <= b) }
  }

  test("theta set algebra on PARTIAL overlap (the sf fixtures only ever " +
    "produce total overlap — every user does every event type)") {
    // A = {1..60}, B = {41..100}: |A∩B| = 20, |A∖B| = 40.
    val est = spark.sql(
      """SELECT
        |  theta_sketch_estimate(theta_intersection(a.s, b.s)) AS inter,
        |  theta_sketch_estimate(theta_difference(a.s, b.s)) AS diff
        |FROM (SELECT theta_sketch_agg(x) AS s
        |      FROM (SELECT explode(sequence(1, 60)) AS x)) a,
        |     (SELECT theta_sketch_agg(x) AS s
        |      FROM (SELECT explode(sequence(41, 100)) AS x)) b""".stripMargin)
      .collect()(0)
    assert(math.abs(est.getLong(0) - 20L) <= 1, s"inter ${est.getLong(0)}")
    assert(math.abs(est.getLong(1) - 40L) <= 2, s"diff ${est.getLong(1)}")
  }

  test("approx_top_k is exact below maxItemsTracked (oracle-legitimacy)") {
    // The agg_approx_topk oracle depends on this regime: with
    // maxItemsTracked >= distinct items, space-saving never evicts and
    // returned counts are exact.
    val e = graft.Tables.events(spark, dir)
    val exact = e.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sk = graft.SparkEntry.queries("agg_approx_topk")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    sk.foreach { case (item, cnt) => assert(exact(item) == cnt, item) }
  }
}
