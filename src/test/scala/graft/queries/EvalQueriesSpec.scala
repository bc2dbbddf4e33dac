package graft.queries

import graft.{SparkEntry, SparkSpec}
import java.sql.Timestamp

/** Mathematical laws for the eval-metric family on planted fixtures —
  * the invariants that hold for ANY correct implementation:
  * a perfect separator scores AUC 1, all-tied scores give the
  * tie-corrected 0.5, a classifier that is right on every row has
  * precision/recall/F1 = 1, and a model ranking identical to the ideal
  * ranking has NDCG@10 = 1. */
class EvalQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def plant(rows: Seq[(Long, Timestamp, Long, String, Double, String)]): String = {
    val d = java.nio.file.Files.createTempDirectory("evalfix").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private val t0 = Timestamp.valueOf("2024-01-01 12:00:00") // a Monday

  test("eval_auc: perfect separation scores 1.0; all-tied scores 0.5") {
    // Positives (purchase/signup) all outscore negatives -> AUC 1.
    val perfect = plant((1L to 8L).map { i =>
      val pos = i <= 4
      (i, t0, 1L, if (pos) "purchase" else "view",
        if (pos) 100.0 + i else 10.0 + i, """{"k": 1}""")
    })
    val r1 = SparkEntry.queries("eval_auc")(spark, perfect).collect()
    assert(r1.length == 1 && r1.head.getAs[Double]("auc") == 1.0)

    // Every score identical -> tie-corrected Mann-Whitney gives 0.5
    // (naive rank assignment without the (cnt+1)/2 average would not).
    val tied = plant((1L to 8L).map { i =>
      (i, t0, 1L, if (i <= 4) "purchase" else "view", 42.0, """{"k": 1}""")
    })
    val r2 = SparkEntry.queries("eval_auc")(spark, tied).collect()
    assert(r2.head.getAs[Double]("auc") == 0.5)
  }

  test("eval_confusion: an always-right classifier has P=R=F1=1 per class") {
    // Values planted mid-bucket so the threshold classifier reproduces
    // the true class exactly.
    val mid = Map("view" -> 10.0, "click" -> 30.0, "signup" -> 50.0,
      "purchase" -> 70.0, "error" -> 90.0)
    val d = plant(mid.toSeq.zipWithIndex.flatMap { case ((cls, v), i) =>
      (0 until 3).map(j => ((i * 3 + j + 1).toLong, t0, 1L, cls, v, "{}"))
    })
    val rows = SparkEntry.queries("eval_confusion")(spark, d).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("tp") == 3L)
      assert(r.getAs[Double]("prec") == 1.0)
      assert(r.getAs[Double]("rec") == 1.0)
      assert(r.getAs[Double]("f1") == 1.0)
    }
  }

  test("eval_ndcg: model ranking identical to ideal ranking gives NDCG 1") {
    // Per user: score order == relevance order (rel = k % 4, distinct),
    // so DCG == IDCG positionwise.
    val d = plant((0L until 3L).flatMap { u =>
      (0 until 4).map { r =>
        (u * 4 + r + 1, t0, u, "view", 100.0 * (r + 1), s"""{"k": $r}""")
      }
    })
    val rows = SparkEntry.queries("eval_ndcg")(spark, d).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Double]("ndcg") == 1.0)
      assert(r.getAs[Double]("dcg") == r.getAs[Double]("idcg"))
    }
  }

  test("eval_pr_thresholds: threshold 0 has recall 1 and precision = base rate") {
    val d = plant((1L to 10L).map { i =>
      (i, t0, 1L, if (i <= 3) "purchase" else "view", i * 10.0, "{}")
    })
    val rows = SparkEntry.queries("eval_pr_thresholds")(spark, d).collect()
    val at0 = rows.find(_.getAs[Double]("thr") == 0.0).get
    assert(at0.getAs[Double]("rec") == 1.0)
    assert(at0.getAs[Double]("prec") == 0.3)
  }

  test("eval_calibration + eval_kappa: bounded outputs on real sf0.001 data") {
    val d = "/root/testdata/sf0.001"
    val cal = SparkEntry.queries("eval_calibration")(spark, d).collect()
    assert(cal.nonEmpty && cal.forall { r =>
      val p = r.getAs[Double]("avg_pred"); val f = r.getAs[Double]("frac_pos")
      p >= 0 && p <= 1 && f >= 0 && f <= 1 &&
        math.abs(math.abs(p - f) - r.getAs[Double]("gap")) < 1e-3
    })
    val k = SparkEntry.queries("eval_kappa")(spark, d).collect().head
    val (po, pe, kappa) = (k.getAs[Double]("po"), k.getAs[Double]("pe"),
      k.getAs[Double]("kappa"))
    assert(po >= 0 && po <= 1 && pe > 0 && pe < 1)
    assert(kappa >= -1.0001 && kappa <= 1.0001)
    // kappa consistent with its own po/pe to rounding
    assert(math.abs(kappa - (po - pe) / (1 - pe)) < 2e-3)
  }

  test("eval_brier: bounded, and agrees with an independent plain-double " +
    "recomputation (the decimal-quantized sum changes nothing but ordering)") {
    import org.apache.spark.sql.functions._
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("eval_brier")(spark, d).collect()
    assert(rows.length == 7) // one per weekday
    assert(rows.forall { r =>
      val b = r.getAs[Double]("brier"); val p = r.getAs[Double]("base_rate")
      b >= 0 && b <= 1 && p >= 0 && p <= 1
    })
    // Independent formulation: plain double avg, no decimal quantization,
    // no floor-rounding — must agree to rounding tolerance.
    val indep = graft.Tables.events(spark, d)
      .select(expr("weekday(ts)").as("grp"),
        expr("1 / (1 + exp(-(value - 100) / 40.0))").as("p"),
        expr("CASE WHEN event_type IN ('purchase','signup') THEN 1 ELSE 0 END")
          .as("lbl"))
      .groupBy("grp")
      .agg(avg(expr("(p - lbl) * (p - lbl)")).as("b2"))
      .collect().map(r => r.getAs[Int]("grp") -> r.getAs[Double]("b2")).toMap
    for (r <- rows)
      assert(math.abs(r.getAs[Double]("brier") -
        indep(r.getAs[Int]("grp"))) < 1e-3)
  }

  test("eval_lift: deciles partition the population, lift averages to 1, " +
    "cumulative gain reaches 1") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("eval_lift")(spark, d).collect()
    assert(rows.length == 10)
    // Population conservation: decile sizes sum to N and differ by <= 1.
    val sizes = rows.map(_.getAs[Long]("n_d"))
    assert(sizes.max - sizes.min <= 1)
    // Positives conservation => the size-weighted mean response rate is
    // the base rate, i.e. the size-weighted mean lift is 1.
    val n = sizes.sum.toDouble
    val wLift = rows.map(r => r.getAs[Long]("n_d") *
      r.getAs[Double]("lift")).sum / n
    assert(math.abs(wLift - 1.0) < 5e-3)
    // Monotone cumulative gain ending at 1 (all positives captured).
    val gains = rows.sortBy(_.getAs[Int]("decile")).map(_.getAs[Double]("cum_gain"))
    assert(gains.zip(gains.tail).forall { case (a, b) => b >= a - 1e-9 })
    assert(math.abs(gains.last - 1.0) < 1e-3)
  }

  test("eval_logloss: a clairvoyant model scores ~0; a maximally wrong " +
    "one pays the clamp ceiling") {
    // p = sigmoid((value-100)/40): positives at value 300 -> p ~ 0.9933;
    // negatives at value -100 -> p ~ 0.0067. Logloss ~ 0.0067.
    val good = plant((1L to 8L).map { i =>
      val pos = i <= 4
      (i, t0, 1L, if (pos) "purchase" else "view",
        if (pos) 300.0 else -100.0, "{}")
    })
    val g = SparkEntry.queries("eval_logloss")(spark, good).collect().head
    assert(g.getAs[Double]("logloss") < 0.01)
    // Inverted labels: same probabilities, flipped truth.
    val bad = plant((1L to 8L).map { i =>
      val pos = i <= 4
      (i, t0, 1L, if (pos) "view" else "purchase",
        if (pos) 300.0 else -100.0, "{}")
    })
    val b = SparkEntry.queries("eval_logloss")(spark, bad).collect().head
    assert(b.getAs[Double]("logloss") > 4.0) // -ln(0.0067) ~ 5.0
  }

  test("eval_mrr: relevant-first users score 1; no-relevant users score 0") {
    // User 0: top-scored event relevant (k=1 -> rel 1). User 1: no
    // relevant event anywhere (k=0,4,8 -> rel 0).
    val d = plant(Seq(
      (1L, t0, 0L, "view", 90.0, """{"k": 1}"""),
      (2L, t0, 0L, "view", 10.0, """{"k": 0}"""),
      (3L, t0, 1L, "view", 90.0, """{"k": 0}"""),
      (4L, t0, 1L, "view", 10.0, """{"k": 4}""")))
    val rows = SparkEntry.queries("eval_mrr")(spark, d).collect()
    val byCohort = rows.map(r => r.getAs[Int]("cohort") ->
      r.getAs[Double]("mrr")).toMap
    assert(byCohort(0) == 1.0)
    assert(byCohort(1) == 0.0)
  }

  test("eval_chi2: an independent feature scores ~0; a decisive one is large") {
    // 4 balanced cells: weekday (Mon/Tue) independent of label.
    val d = plant(Seq.tabulate(8) { i =>
      val day = if (i % 2 == 0) t0
        else Timestamp.valueOf("2024-01-02 12:00:00")
      val pos = i < 4
      ((i + 1).toLong, day, 1L, if (pos) "purchase" else "view",
        if (pos) 150.0 else 10.0, "{}")
    })
    val rows = SparkEntry.queries("eval_chi2")(spark, d).collect()
    val byF = rows.map(r => r.getAs[String]("feature") ->
      r.getAs[Double]("chi2")).toMap
    assert(byF("weekday") == 0.0)      // perfectly balanced -> chi2 = 0
    assert(byF("score_q") >= 7.9)      // value bucket determines the label
    assert(rows.forall(_.getAs[Double]("chi2") >= 0.0))
  }
}
