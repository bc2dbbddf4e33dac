package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Model-evaluation operators — the metrics a training-data pipeline
  * computes over scored/labelled corpora before and after a training
  * run: ROC AUC, precision/recall at thresholds, NDCG@k ranking
  * quality, calibration (reliability bins), a multi-class confusion
  * summary, and inter-annotator agreement (Cohen's kappa).
  *
  * The fixture "model" is deterministic: `value` is the score, the
  * positive label is a conversion event (purchase/signup), the fake
  * classifier buckets `value` into the five event types, and the
  * second annotator derives from an md5 nibble — so both engines see
  * the identical prediction set with no RNG.
  *
  * Scale posture: every metric here is one or two hash aggregates over
  * exact integer counts (AUC's rank statistic comes from a per-group
  * window over DISTINCT scores, not a sort of the raw rows), so each
  * query is partial+final aggregable and partition-count invariant.
  * Float accumulation (DCG terms, mean predictions) is quantized to
  * DECIMAL(28,12) per term before the order-free sum, the same law the
  * text-entropy family pins.
  *
  * The DISTINCT-score windows (eval_lift/eval_ks/eval_mannwhitney/
  * eval_auc) lean on a FIXED-PRECISION score domain — a DECIMAL(p,s)
  * column has finitely many representable values, so "distinct
  * scores" is bounded by the score grammar, not the corpus
  * (DETERMINISM.md rule 21). For genuinely continuous scores (raw
  * model logits) the binned fallback applies: quantize scores to a
  * fixed grid first (the eval_ece / eval_pr_thresholds pattern) or
  * swap the exact rank for a sketch-quantile rank; the metric laws
  * are unchanged.
  */
object EvalQueries {

  /** Positive = conversion event; identical text in both dialects. */
  private val lbl =
    "CASE WHEN event_type IN ('purchase','signup') THEN 1 ELSE 0 END"

  /** Fake 5-class classifier from score thresholds. */
  private def valClass(tpe: String): String =
    if (tpe == "name")
      """CASE WHEN value < 20 THEN 'view' WHEN value < 40 THEN 'click'
        |     WHEN value < 60 THEN 'signup' WHEN value < 80 THEN 'purchase'
        |     ELSE 'error' END""".stripMargin
    else
      """CASE WHEN value < 20 THEN 0 WHEN value < 40 THEN 1
        |     WHEN value < 60 THEN 2 WHEN value < 80 THEN 3
        |     ELSE 4 END""".stripMargin

  def all: Seq[Q] = Seq(

    // ROC AUC per weekday group via the tie-corrected Mann-Whitney rank
    // statistic. The key scale move: ranks are NOT assigned by sorting
    // the raw rows (a 100 TB global sort) — rows first collapse to
    // (group, score) -> (count, positives) by hash aggregate, then one
    // window over the DISTINCT scores assigns the tied-average rank
    // analytically (cum_before + (cnt+1)/2). Everything stays integer
    // (2*S avoids the half) until the final division, so the result is
    // bit-identical on any partitioning. Spark weekday() is 0=Monday,
    // matching DuckDB isodow-1.
    Q("eval_auc",
      s"""WITH e AS (SELECT CAST(date_part('isodow', ts) - 1 AS INT) AS grp,
         |    value AS score, $lbl AS lbl FROM events),
         |s AS (SELECT grp, score, count(*) AS cnt, sum(lbl) AS pos
         |  FROM e GROUP BY 1, 2),
         |r AS (SELECT grp, cnt, pos,
         |    sum(cnt) OVER (PARTITION BY grp ORDER BY score) - cnt AS cum_before
         |  FROM s),
         |a AS (SELECT grp,
         |    CAST(sum(pos) AS BIGINT) AS p_cnt,
         |    CAST(sum(cnt) - sum(pos) AS BIGINT) AS n_cnt,
         |    CAST(sum(pos * (2 * cum_before + cnt + 1)) AS BIGINT) AS two_s
         |  FROM r GROUP BY 1)
         |SELECT grp, p_cnt, n_cnt,
         |  round((two_s / 2.0 - p_cnt * (p_cnt + 1) / 2.0)
         |        / (p_cnt * CAST(n_cnt AS DOUBLE)), 4) AS auc
         |FROM a ORDER BY grp""") { (s, d) =>
      val e = Tables.events(s, d).select(
        expr("weekday(ts)").as("grp"), col("value").as("score"),
        expr(lbl).as("lbl"))
      val grouped = e.groupBy(col("grp"), col("score"))
        .agg(count(lit(1)).as("cnt"), sum(col("lbl")).as("pos"))
      val w = Window.partitionBy(col("grp")).orderBy(col("score"))
      grouped
        .withColumn("cum_before", sum(col("cnt")).over(w) - col("cnt"))
        .groupBy(col("grp"))
        .agg(
          sum(col("pos")).as("p_cnt"),
          (sum(col("cnt")) - sum(col("pos"))).as("n_cnt"),
          sum(col("pos") * (lit(2) * col("cum_before") + col("cnt") + 1))
            .as("two_s"))
        .select(col("grp"), col("p_cnt"), col("n_cnt"),
          round((col("two_s") / 2.0 - col("p_cnt") * (col("p_cnt") + 1) / 2.0)
            / (col("p_cnt") * col("n_cnt").cast("double")), 4).as("auc"))
        .orderBy(col("grp"))
    },

    // DeLONG AUC STANDARD ERROR (DeLong, DeLong & Clarke-Pearson 1988,
    // midrank form per Sun & Xu 2014) — the error bar eval_auc's point
    // estimate needs before two models can be compared: per-group
    // SE(AUC) from the variance of the per-observation structural
    // components V10 (positives) and V01 (negatives), plus the normal
    // 95% CI. The components are PURE MIDRANK algebra, so everything
    // rides the DISTINCT-score relation (the eval_auc machinery — one
    // window over distinct scores, never a raw-row sort): all rows at
    // one score share a component value, and the 2×-scaled component
    // differences (2·R_all − 2·R_class) stay exact BIGINTs until the
    // final ratios. Variance terms quantize to DECIMAL before the
    // order-free weighted sum — partition-invariant to the last bit.
    Q("eval_delong",
      s"""WITH e AS (SELECT CAST(date_part('isodow', ts) - 1 AS INT)
         |    AS grp, value AS score, $lbl AS lbl FROM events),
         |s AS (SELECT grp, score, count(*) AS cnt, sum(lbl) AS pos
         |  FROM e GROUP BY 1, 2),
         |r AS (SELECT grp, score, cnt, pos, cnt - pos AS neg,
         |    sum(cnt) OVER w - cnt AS call,
         |    sum(pos) OVER w - pos AS cpos,
         |    sum(cnt - pos) OVER w - (cnt - pos) AS cneg
         |  FROM s WINDOW w AS (PARTITION BY grp ORDER BY score)),
         |t AS (SELECT grp, CAST(sum(pos) AS BIGINT) AS p,
         |    CAST(sum(neg) AS BIGINT) AS n FROM r GROUP BY 1),
         |v AS (SELECT r.grp, pos, neg, t.p, t.n,
         |    ((2 * call + cnt + 1) - (2 * cpos + pos + 1))
         |      / (2.0 * t.n) AS v10,
         |    1.0 - ((2 * call + cnt + 1) - (2 * cneg + neg + 1))
         |      / (2.0 * t.p) AS v01
         |  FROM r JOIN t ON t.grp = r.grp),
         |a AS (SELECT grp, p, n,
         |    CAST(sum(CAST(round(pos * v10, 12) AS DECIMAL(38,12)))
         |      AS DOUBLE) / p AS auc
         |  FROM v GROUP BY 1, 2, 3),
         |vr AS (SELECT v.grp, a.p, a.n, a.auc,
         |    CAST(sum(CAST(round(pos * (v10 - a.auc) * (v10 - a.auc), 12)
         |      AS DECIMAL(38,12))) AS DOUBLE) / (a.p - 1) AS s10,
         |    CAST(sum(CAST(round(neg * (v01 - a.auc) * (v01 - a.auc), 12)
         |      AS DECIMAL(38,12))) AS DOUBLE) / (a.n - 1) AS s01
         |  FROM v JOIN a ON a.grp = v.grp GROUP BY 1, 2, 3, 4)
         |SELECT grp, p AS n_pos, n AS n_neg, round(auc, 4) AS auc,
         |  round(sqrt(s10 / p + s01 / n), 6) AS se_delong,
         |  round(auc - 1.96 * sqrt(s10 / p + s01 / n), 4) AS ci_lo,
         |  round(auc + 1.96 * sqrt(s10 / p + s01 / n), 4) AS ci_hi
         |FROM vr ORDER BY grp""") { (s, d) =>
      val e = Tables.events(s, d).select(
        expr("weekday(ts)").as("grp"), col("value").as("score"),
        expr(lbl).as("lbl"))
      val grouped = e.groupBy(col("grp"), col("score"))
        .agg(count(lit(1)).as("cnt"), sum(col("lbl")).as("pos"))
        .withColumn("neg", col("cnt") - col("pos"))
      val w = Window.partitionBy(col("grp")).orderBy(col("score"))
      val r = grouped
        .withColumn("call", sum(col("cnt")).over(w) - col("cnt"))
        .withColumn("cpos", sum(col("pos")).over(w) - col("pos"))
        .withColumn("cneg", sum(col("neg")).over(w) - col("neg"))
      val t = r.groupBy(col("grp"))
        .agg(sum(col("pos")).as("p"), sum(col("neg")).as("n"))
      val v = r.join(t, Seq("grp"))
        .withColumn("v10",
          ((lit(2) * col("call") + col("cnt") + 1)
            - (lit(2) * col("cpos") + col("pos") + 1))
            / (lit(2.0) * col("n")))
        .withColumn("v01",
          lit(1.0) - ((lit(2) * col("call") + col("cnt") + 1)
            - (lit(2) * col("cneg") + col("neg") + 1))
            / (lit(2.0) * col("p")))
      val a = v.groupBy(col("grp"), col("p"), col("n"))
        .agg((sum(round(col("pos") * col("v10"), 12)
          .cast("decimal(38,12)")).cast("double") / col("p")).as("auc"))
      val vr = v.join(a.select(col("grp"), col("auc")), Seq("grp"))
        .groupBy(col("grp"), col("p"), col("n"), col("auc"))
        .agg(
          (sum(round(col("pos") * (col("v10") - col("auc"))
              * (col("v10") - col("auc")), 12).cast("decimal(38,12)"))
            .cast("double") / (col("p") - 1)).as("s10"),
          (sum(round(col("neg") * (col("v01") - col("auc"))
              * (col("v01") - col("auc")), 12).cast("decimal(38,12)"))
            .cast("double") / (col("n") - 1)).as("s01"))
      val se = sqrt(col("s10") / col("p") + col("s01") / col("n"))
      vr.select(col("grp"),
          col("p").cast("long").as("n_pos"),
          col("n").cast("long").as("n_neg"),
          round(col("auc"), 4).as("auc"),
          round(se, 6).as("se_delong"),
          round(col("auc") - lit(1.96) * se, 4).as("ci_lo"),
          round(col("auc") + lit(1.96) * se, 4).as("ci_hi"))
        .orderBy(col("grp"))
    },

    // MURPHY DECOMPOSITION OF THE BRIER SCORE (Murphy 1973) —
    // reliability − resolution + uncertainty: splits eval_brier's
    // single number into "how miscalibrated" (REL, lower better),
    // "how discriminating" (RES, higher better) and the irreducible
    // base-rate term (UNC) — the readout that says WHY a probability
    // model is bad. Same sigmoid score and 10-bin layout as
    // eval_calibration; all three terms come from the bin aggregates
    // (n_k, Σp, Σy) with each bin's term DECIMAL-quantized before the
    // 10-term order-free sum; the residual (brier − rel + res − unc)
    // is emitted too — it is the within-bin variance the binned
    // decomposition leaves behind, and reporting it keeps the identity
    // honest instead of pretending the binned terms are exact.
    Q("eval_brier_decomp",
      s"""WITH e AS (SELECT 1 / (1 + exp(-(value - 100) / 40.0)) AS p,
         |    $lbl AS y FROM events),
         |b AS (SELECT least(CAST(floor(p * 10) AS INT), 9) AS bin, p, y
         |  FROM e),
         |m AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CAST(round(p, 12) AS DECIMAL(28,12))) AS DOUBLE)
         |      AS sp,
         |    CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(CAST(round((p - y) * (p - y), 12)
         |      AS DECIMAL(28,12))) AS DOUBLE) AS sq
         |  FROM b GROUP BY 1),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
         |    CAST(sum(sy) AS BIGINT) AS ny,
         |    CAST(sum(CAST(round(sq, 12) AS DECIMAL(38,12))) AS DOUBLE)
         |      AS brier_sum,
         |    CAST(sum(CAST(round(n * (sp / n - CAST(sy AS DOUBLE) / n)
         |        * (sp / n - CAST(sy AS DOUBLE) / n), 12)
         |      AS DECIMAL(38,12))) AS DOUBLE) AS rel_sum
         |  FROM m),
         |r AS (SELECT t.nn, t.ny, t.brier_sum, t.rel_sum,
         |    CAST(sum(CAST(round(m.n * (CAST(m.sy AS DOUBLE) / m.n
         |        - CAST(t.ny AS DOUBLE) / t.nn)
         |        * (CAST(m.sy AS DOUBLE) / m.n
         |        - CAST(t.ny AS DOUBLE) / t.nn), 12)
         |      AS DECIMAL(38,12))) AS DOUBLE) AS res_sum
         |  FROM m CROSS JOIN t GROUP BY 1, 2, 3, 4)
         |SELECT round(brier_sum / nn, 6) AS brier,
         |  round(rel_sum / nn, 6) AS reliability,
         |  round(res_sum / nn, 6) AS resolution,
         |  round(CAST(ny AS DOUBLE) / nn
         |    * (1 - CAST(ny AS DOUBLE) / nn), 6) AS uncertainty,
         |  round(brier_sum / nn - (rel_sum / nn - res_sum / nn
         |    + CAST(ny AS DOUBLE) / nn * (1 - CAST(ny AS DOUBLE) / nn)),
         |    6) AS within_bin_residual
         |FROM r""") { (s, d) =>
      val e = Tables.events(s, d).select(
        expr("1 / (1 + exp(-(value - 100) / 40.0))").as("p"),
        expr(lbl).as("y"))
      val m = e
        .select(expr("least(CAST(floor(p * 10) AS INT), 9)").as("bin"),
          col("p"), col("y"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("p"), 12).cast("decimal(28,12)"))
            .cast("double").as("sp"),
          sum(col("y")).as("sy"),
          sum(round((col("p") - col("y")) * (col("p") - col("y")), 12)
            .cast("decimal(28,12)")).cast("double").as("sq"))
      val t = m.agg(sum(col("n")).as("nn"), sum(col("sy")).as("ny"),
        sum(round(col("sq"), 12).cast("decimal(38,12)"))
          .cast("double").as("brier_sum"),
        sum(round(col("n") * (col("sp") / col("n")
            - col("sy").cast("double") / col("n"))
          * (col("sp") / col("n")
            - col("sy").cast("double") / col("n")), 12)
          .cast("decimal(38,12)")).cast("double").as("rel_sum"))
      val r = m.crossJoin(broadcast(t))
        .groupBy(col("nn"), col("ny"), col("brier_sum"), col("rel_sum"))
        .agg(sum(round(col("n") * (col("sy").cast("double") / col("n")
            - col("ny").cast("double") / col("nn"))
          * (col("sy").cast("double") / col("n")
            - col("ny").cast("double") / col("nn")), 12)
          .cast("decimal(38,12)")).cast("double").as("res_sum"))
      val base = col("ny").cast("double") / col("nn")
      r.select(round(col("brier_sum") / col("nn"), 6).as("brier"),
        round(col("rel_sum") / col("nn"), 6).as("reliability"),
        round(col("res_sum") / col("nn"), 6).as("resolution"),
        round(base * (lit(1) - base), 6).as("uncertainty"),
        round(col("brier_sum") / col("nn") - (col("rel_sum") / col("nn")
          - col("res_sum") / col("nn") + base * (lit(1) - base)), 6)
          .as("within_bin_residual"))
    },

    // PAIRED DeLONG TEST (two correlated AUCs, DeLong et al. 1988 §3)
    // — the question the single-model SE (eval_delong) can't answer:
    // "is model B actually better than model A ON THE SAME examples?"
    // A naive z on two independent SEs overstates the variance because
    // both models' errors correlate through the shared data; the
    // paired test subtracts twice the COVARIANCE of the per-
    // observation structural components. Components come from the same
    // distinct-score midrank machinery, then join back to the rows by
    // score so each observation carries its (V_A, V_B) PAIR; all
    // second moments (including the cross term) are DECIMAL-quantized
    // exact sums. Model A = the raw value; model B = value degraded by
    // a deterministic md5 perturbation (a strictly worse model, so the
    // z-score's sign is known). One corpus pass per model + two
    // score-keyed joins — no per-pair O(P·N) work anywhere.
    Q("eval_delong_compare",
      s"""WITH e AS (SELECT value AS sa,
         |    value + ((('0x' || substring(md5(CAST(event_id AS VARCHAR)),
         |      1, 1))::BIGINT) * 2 - 15) * 20 AS sb,
         |    $lbl AS lbl FROM events),
         |t AS (SELECT CAST(sum(lbl) AS BIGINT) AS p,
         |    CAST(count(*) - sum(lbl) AS BIGINT) AS n FROM e),
         |ga AS (SELECT sa, count(*) AS cnt, sum(lbl) AS pos
         |  FROM e GROUP BY 1),
         |ra AS (SELECT sa,
         |    sum(cnt) OVER w - cnt AS call, cnt,
         |    sum(pos) OVER w - pos AS cpos, pos,
         |    sum(cnt - pos) OVER w - (cnt - pos) AS cneg, cnt - pos AS neg
         |  FROM ga WINDOW w AS (ORDER BY sa)),
         |va AS (SELECT sa,
         |    ((2 * call + cnt + 1) - (2 * cpos + pos + 1))
         |      / (2.0 * t.n) AS v10a,
         |    1.0 - ((2 * call + cnt + 1) - (2 * cneg + neg + 1))
         |      / (2.0 * t.p) AS v01a
         |  FROM ra CROSS JOIN t),
         |gb AS (SELECT sb, count(*) AS cnt, sum(lbl) AS pos
         |  FROM e GROUP BY 1),
         |rb AS (SELECT sb,
         |    sum(cnt) OVER w - cnt AS call, cnt,
         |    sum(pos) OVER w - pos AS cpos, pos,
         |    sum(cnt - pos) OVER w - (cnt - pos) AS cneg, cnt - pos AS neg
         |  FROM gb WINDOW w AS (ORDER BY sb)),
         |vb AS (SELECT sb,
         |    ((2 * call + cnt + 1) - (2 * cpos + pos + 1))
         |      / (2.0 * t.n) AS v10b,
         |    1.0 - ((2 * call + cnt + 1) - (2 * cneg + neg + 1))
         |      / (2.0 * t.p) AS v01b
         |  FROM rb CROSS JOIN t),
         |pe AS (SELECT e.lbl, va.v10a, va.v01a, vb.v10b, vb.v01b
         |  FROM e JOIN va ON va.sa = e.sa JOIN vb ON vb.sb = e.sb),
         |mom AS (SELECT
         |    CAST(sum(CASE WHEN lbl = 1 THEN CAST(round(v10a, 12)
         |      AS DECIMAL(38,12)) END) AS DOUBLE) AS sa10,
         |    CAST(sum(CASE WHEN lbl = 1 THEN CAST(round(v10b, 12)
         |      AS DECIMAL(38,12)) END) AS DOUBLE) AS sb10,
         |    CAST(sum(CASE WHEN lbl = 1 THEN CAST(round(v10a * v10a, 12)
         |      AS DECIMAL(38,12)) END) AS DOUBLE) AS saa10,
         |    CAST(sum(CASE WHEN lbl = 1 THEN CAST(round(v10b * v10b, 12)
         |      AS DECIMAL(38,12)) END) AS DOUBLE) AS sbb10,
         |    CAST(sum(CASE WHEN lbl = 1 THEN CAST(round(v10a * v10b, 12)
         |      AS DECIMAL(38,12)) END) AS DOUBLE) AS sab10,
         |    CAST(sum(CASE WHEN lbl = 0 THEN CAST(round(v01a, 12)
         |      AS DECIMAL(38,12)) END) AS DOUBLE) AS sa01,
         |    CAST(sum(CASE WHEN lbl = 0 THEN CAST(round(v01b, 12)
         |      AS DECIMAL(38,12)) END) AS DOUBLE) AS sb01,
         |    CAST(sum(CASE WHEN lbl = 0 THEN CAST(round(v01a * v01a, 12)
         |      AS DECIMAL(38,12)) END) AS DOUBLE) AS saa01,
         |    CAST(sum(CASE WHEN lbl = 0 THEN CAST(round(v01b * v01b, 12)
         |      AS DECIMAL(38,12)) END) AS DOUBLE) AS sbb01,
         |    CAST(sum(CASE WHEN lbl = 0 THEN CAST(round(v01a * v01b, 12)
         |      AS DECIMAL(38,12)) END) AS DOUBLE) AS sab01
         |  FROM pe)
         |SELECT round(sa10 / t.p, 4) AS auc_a,
         |  round(sb10 / t.p, 4) AS auc_b,
         |  round(sa10 / t.p - sb10 / t.p, 4) AS auc_diff,
         |  round(sqrt(
         |    ((saa10 - sa10 * sa10 / t.p) / (t.p - 1)
         |     + (sbb10 - sb10 * sb10 / t.p) / (t.p - 1)
         |     - 2 * (sab10 - sa10 * sb10 / t.p) / (t.p - 1)) / t.p
         |    + ((saa01 - sa01 * sa01 / t.n) / (t.n - 1)
         |     + (sbb01 - sb01 * sb01 / t.n) / (t.n - 1)
         |     - 2 * (sab01 - sa01 * sb01 / t.n) / (t.n - 1)) / t.n),
         |    6) AS se_diff,
         |  round((sa10 / t.p - sb10 / t.p) / nullif(sqrt(
         |    ((saa10 - sa10 * sa10 / t.p) / (t.p - 1)
         |     + (sbb10 - sb10 * sb10 / t.p) / (t.p - 1)
         |     - 2 * (sab10 - sa10 * sb10 / t.p) / (t.p - 1)) / t.p
         |    + ((saa01 - sa01 * sa01 / t.n) / (t.n - 1)
         |     + (sbb01 - sb01 * sb01 / t.n) / (t.n - 1)
         |     - 2 * (sab01 - sa01 * sb01 / t.n) / (t.n - 1)) / t.n),
         |    0), 4) AS z
         |FROM mom CROSS JOIN t""") { (s, d) =>
      val e = Tables.events(s, d).select(
        col("value").as("sa"),
        (col("value") + (expr(
          "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 1), 16, 10) AS BIGINT)")
          * 2 - 15) * 20).as("sb"),
        expr(lbl).as("lbl"))
      val t = e.agg(sum(col("lbl")).as("p"),
        (count(lit(1)) - sum(col("lbl"))).as("n"))
      def comp(key: String, v10: String, v01: String) = {
        val g = e.groupBy(col(key))
          .agg(count(lit(1)).as("cnt"), sum(col("lbl")).as("pos"))
          .withColumn("neg", col("cnt") - col("pos"))
        val w = Window.orderBy(col(key))
        g.withColumn("call", sum(col("cnt")).over(w) - col("cnt"))
          .withColumn("cpos", sum(col("pos")).over(w) - col("pos"))
          .withColumn("cneg", sum(col("neg")).over(w) - col("neg"))
          .crossJoin(broadcast(t))
          .select(col(key),
            (((lit(2) * col("call") + col("cnt") + 1)
              - (lit(2) * col("cpos") + col("pos") + 1))
              / (lit(2.0) * col("n"))).as(v10),
            (lit(1.0) - ((lit(2) * col("call") + col("cnt") + 1)
              - (lit(2) * col("cneg") + col("neg") + 1))
              / (lit(2.0) * col("p"))).as(v01))
      }
      val pe = e
        .join(comp("sa", "v10a", "v01a"), Seq("sa"))
        .join(comp("sb", "v10b", "v01b"), Seq("sb"))
      def dsum(c: org.apache.spark.sql.Column, onLbl: Int, name: String) =
        sum(when(col("lbl") === onLbl,
          round(c, 12).cast("decimal(38,12)"))).cast("double").as(name)
      val mom = pe.agg(
        dsum(col("v10a"), 1, "sa10"), dsum(col("v10b"), 1, "sb10"),
        dsum(col("v10a") * col("v10a"), 1, "saa10"),
        dsum(col("v10b") * col("v10b"), 1, "sbb10"),
        dsum(col("v10a") * col("v10b"), 1, "sab10"),
        dsum(col("v01a"), 0, "sa01"), dsum(col("v01b"), 0, "sb01"),
        dsum(col("v01a") * col("v01a"), 0, "saa01"),
        dsum(col("v01b") * col("v01b"), 0, "sbb01"),
        dsum(col("v01a") * col("v01b"), 0, "sab01"))
      val r = mom.crossJoin(broadcast(t))
      def cv(ss: String, a: String, b: String, nn: org.apache.spark.sql.Column) =
        (col(ss) - col(a) * col(b) / nn) / (nn - 1)
      val varDiff =
        (cv("saa10", "sa10", "sa10", col("p"))
          + cv("sbb10", "sb10", "sb10", col("p"))
          - lit(2) * cv("sab10", "sa10", "sb10", col("p"))) / col("p") +
        (cv("saa01", "sa01", "sa01", col("n"))
          + cv("sbb01", "sb01", "sb01", col("n"))
          - lit(2) * cv("sab01", "sa01", "sb01", col("n"))) / col("n")
      val se = sqrt(varDiff)
      r.select(
        round(col("sa10") / col("p"), 4).as("auc_a"),
        round(col("sb10") / col("p"), 4).as("auc_b"),
        round(col("sa10") / col("p") - col("sb10") / col("p"), 4)
          .as("auc_diff"),
        round(se, 6).as("se_diff"),
        round((col("sa10") / col("p") - col("sb10") / col("p"))
          / nullif(se, lit(0d)), 4).as("z"))
    },

    // AVERAGE PRECISION / AUPRC per weekday group — the
    // class-imbalance-robust summary the ROC AUC (eval_auc) overstates
    // on rare positives. Exact step-interpolated AP over the DISTINCT
    // score relation: AP = Σ_i (pos_i / P) · precision_i with one
    // descending-cumulative window over distinct scores (the eval_auc
    // machinery — never a global sort of raw rows); each AP term is
    // DECIMAL-quantized before its order-free sum so the statistic is
    // partition-invariant.
    Q("eval_auprc",
      s"""WITH e AS (SELECT CAST(date_part('isodow', ts) - 1 AS INT) AS grp,
         |    value AS score, $lbl AS lbl FROM events),
         |s AS (SELECT grp, score, count(*) AS cnt, sum(lbl) AS pos
         |  FROM e GROUP BY 1, 2),
         |r AS (SELECT grp, score, cnt, pos,
         |    sum(cnt) OVER (PARTITION BY grp ORDER BY score DESC) AS cum_n,
         |    sum(pos) OVER (PARTITION BY grp ORDER BY score DESC) AS cum_tp
         |  FROM s),
         |p AS (SELECT grp, sum(pos) AS pc, sum(cnt) - sum(pos) AS nc
         |  FROM s GROUP BY 1)
         |SELECT r.grp, CAST(p.pc AS BIGINT) AS p_cnt,
         |  CAST(p.nc AS BIGINT) AS n_cnt,
         |  round(CAST(sum(CAST(round((pos / CAST(p.pc AS DOUBLE))
         |    * (cum_tp / CAST(cum_n AS DOUBLE)), 12) AS DECIMAL(28,12)))
         |    AS DOUBLE), 4) AS auprc
         |FROM r JOIN p USING (grp)
         |GROUP BY r.grp, p.pc, p.nc ORDER BY r.grp""") { (s, d) =>
      val e = Tables.events(s, d).select(
        expr("weekday(ts)").as("grp"), col("value").as("score"),
        expr(lbl).as("lbl"))
      val sc = e.groupBy(col("grp"), col("score"))
        .agg(count(lit(1)).as("cnt"), sum(col("lbl")).as("pos"))
      val w = Window.partitionBy(col("grp")).orderBy(col("score").desc)
      val r = sc
        .withColumn("cum_n", sum(col("cnt")).over(w))
        .withColumn("cum_tp", sum(col("pos")).over(w))
      val p = sc.groupBy(col("grp"))
        .agg(sum(col("pos")).as("pc"),
          (sum(col("cnt")) - sum(col("pos"))).as("nc"))
      r.join(p, Seq("grp"))
        .groupBy(col("grp"), col("pc"), col("nc"))
        .agg(round(sum(
          round((col("pos") / col("pc").cast("double")) *
            (col("cum_tp") / col("cum_n").cast("double")), 12)
            .cast("decimal(28,12)")).cast("double"), 4).as("auprc"))
        .select(col("grp"), col("pc").cast("long").as("p_cnt"),
          col("nc").cast("long").as("n_cnt"), col("auprc"))
        .orderBy(col("grp"))
    },

    // EXPECTED CALIBRATION ERROR — eval_calibration's per-bin gaps
    // collapsed into the two numbers a model card reports: ECE =
    // Σ (n_b/N)·|avg_pred_b − frac_pos_b| (bin-mass-weighted) and MCE =
    // max gap. Same sigmoid pseudo-probability and 10 equal-width bins;
    // per-bin means ride DECIMAL-quantized sums, and the weighted ECE
    // terms are themselves quantized before the 10-row final sum.
    Q("eval_ece",
      s"""WITH e AS (SELECT 1 / (1 + exp(-("value" - 100) / 40.0)) AS p,
         |    $lbl AS lbl FROM events),
         |b AS (SELECT least(CAST(floor(p * 10) AS INT), 9) AS bin, p, lbl
         |  FROM e),
         |m AS (SELECT bin, count(*) AS n,
         |    floor(CAST(sum(CAST(p AS DECIMAL(28,12))) AS DOUBLE)
         |          / count(*) * 10000 + 0.5) / 10000.0 AS avg_pred,
         |    round(sum(lbl) / CAST(count(*) AS DOUBLE), 4) AS frac_pos
         |  FROM b GROUP BY 1),
         |t AS (SELECT sum(n) AS total FROM m)
         |SELECT CAST(t.total AS BIGINT) AS n,
         |  CAST(count(*) AS BIGINT) AS n_bins,
         |  round(CAST(sum(CAST(round((n / CAST(t.total AS DOUBLE))
         |    * abs(avg_pred - frac_pos), 12) AS DECIMAL(28,12)))
         |    AS DOUBLE), 4) AS ece,
         |  round(max(abs(avg_pred - frac_pos)), 4) AS mce
         |FROM m CROSS JOIN t GROUP BY t.total""") { (s, d) =>
      val m = Tables.events(s, d)
        .select(expr("1 / (1 + exp(-(value - 100) / 40.0))").as("p"),
          expr(lbl).as("lbl"))
        .select(expr("least(CAST(floor(p * 10) AS INT), 9)").as("bin"),
          col("p"), col("lbl"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          expr("""CAST(floor(CAST(sum(CAST(p AS DECIMAL(28,12))) AS DOUBLE)
                 |      / count(*) * 10000 + 0.5) / 10000.0 AS DOUBLE)"""
            .stripMargin).as("avg_pred"),
          round(sum(col("lbl")) / count(lit(1)).cast("double"), 4)
            .as("frac_pos"))
      val t = m.agg(sum(col("n")).as("total"))
      m.crossJoin(broadcast(t))
        .groupBy(col("total"))
        .agg(count(lit(1)).as("n_bins"),
          round(sum(
            round((col("n") / col("total").cast("double")) *
              abs(col("avg_pred") - col("frac_pos")), 12)
              .cast("decimal(28,12)")).cast("double"), 4).as("ece"),
          round(max(abs(col("avg_pred") - col("frac_pos"))), 4).as("mce"))
        .select(col("total").cast("long").as("n"), col("n_bins"),
          col("ece"), col("mce"))
    },

    // Precision/recall/F1 swept over 10 score thresholds — the PR curve
    // a labelling pipeline reads before picking an operating point. One
    // pass over the events with a broadcast 10-row literal threshold
    // relation (constant multiplier, never data x data); counts stay
    // exact integers until the final guarded divisions.
    Q("eval_pr_thresholds",
      s"""WITH e AS (SELECT value AS score, $lbl AS lbl FROM events),
         |t AS (SELECT CAST(x * 50 AS DOUBLE) AS thr FROM range(0, 10) r(x)),
         |m AS (SELECT thr,
         |    CAST(sum(CASE WHEN score >= thr AND lbl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(sum(CASE WHEN score >= thr AND lbl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |    CAST(sum(CASE WHEN score < thr AND lbl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
         |  FROM e, t GROUP BY 1)
         |SELECT thr, tp, fp, fn,
         |  CASE WHEN tp + fp > 0
         |       THEN round(tp / CAST(tp + fp AS DOUBLE), 4) ELSE 0.0 END AS prec,
         |  CASE WHEN tp + fn > 0
         |       THEN round(tp / CAST(tp + fn AS DOUBLE), 4) ELSE 0.0 END AS rec,
         |  CASE WHEN 2 * tp + fp + fn > 0
         |       THEN round(2 * tp / CAST(2 * tp + fp + fn AS DOUBLE), 4)
         |       ELSE 0.0 END AS f1
         |FROM m ORDER BY thr""") { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("value").as("score"), expr(lbl).as("lbl"))
      val t = s.range(0, 10)
        .select((col("id") * 50).cast("double").as("thr"))
      e.crossJoin(broadcast(t))
        .groupBy(col("thr"))
        .agg(
          sum(expr("CASE WHEN score >= thr AND lbl = 1 THEN 1 ELSE 0 END")).as("tp"),
          sum(expr("CASE WHEN score >= thr AND lbl = 0 THEN 1 ELSE 0 END")).as("fp"),
          sum(expr("CASE WHEN score < thr AND lbl = 1 THEN 1 ELSE 0 END")).as("fn"))
        .select(col("thr"), col("tp"), col("fp"), col("fn"),
          expr("CASE WHEN tp + fp > 0 THEN round(tp / CAST(tp + fp AS DOUBLE), 4) ELSE 0.0 END").as("prec"),
          expr("CASE WHEN tp + fn > 0 THEN round(tp / CAST(tp + fn AS DOUBLE), 4) ELSE 0.0 END").as("rec"),
          expr("CASE WHEN 2 * tp + fp + fn > 0 THEN round(2 * tp / CAST(2 * tp + fp + fn AS DOUBLE), 4) ELSE 0.0 END").as("f1"))
        .orderBy(col("thr"))
    },

    // ROC CURVE POINTS at the same fixed threshold grid as
    // eval_pr_thresholds — the (FPR, TPR) trace plus Youden's J
    // (TPR − FPR, whose max picks the operating point) that AUC alone
    // doesn't give an operator. All exact integer counts off one scan
    // × a 10-row literal broadcast grid; TN completes the confusion
    // square so TPR/FPR are both closed-form.
    Q("eval_roc_points",
      s"""WITH e AS (SELECT value AS score, $lbl AS lbl FROM events),
         |t AS (SELECT CAST(x * 50 AS DOUBLE) AS thr FROM range(0, 10) r(x)),
         |m AS (SELECT thr,
         |    CAST(sum(CASE WHEN score >= thr AND lbl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |    CAST(sum(CASE WHEN score >= thr AND lbl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |    CAST(sum(CASE WHEN score < thr AND lbl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |    CAST(sum(CASE WHEN score < thr AND lbl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
         |  FROM e, t GROUP BY 1)
         |SELECT thr, tp, fp, fn, tn,
         |  CASE WHEN tp + fn > 0
         |       THEN round(tp / CAST(tp + fn AS DOUBLE), 4) ELSE 0.0 END AS tpr,
         |  CASE WHEN fp + tn > 0
         |       THEN round(fp / CAST(fp + tn AS DOUBLE), 4) ELSE 0.0 END AS fpr,
         |  round(CASE WHEN tp + fn > 0
         |      THEN tp / CAST(tp + fn AS DOUBLE) ELSE 0.0 END
         |    - CASE WHEN fp + tn > 0
         |      THEN fp / CAST(fp + tn AS DOUBLE) ELSE 0.0 END, 4) + 0.0
         |    AS youden_j
         |FROM m ORDER BY thr""") { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("value").as("score"), expr(lbl).as("lbl"))
      val t = s.range(0, 10)
        .select((col("id") * 50).cast("double").as("thr"))
      e.crossJoin(broadcast(t))
        .groupBy(col("thr"))
        .agg(
          sum(expr("CASE WHEN score >= thr AND lbl = 1 THEN 1 ELSE 0 END")).as("tp"),
          sum(expr("CASE WHEN score >= thr AND lbl = 0 THEN 1 ELSE 0 END")).as("fp"),
          sum(expr("CASE WHEN score < thr AND lbl = 1 THEN 1 ELSE 0 END")).as("fn"),
          sum(expr("CASE WHEN score < thr AND lbl = 0 THEN 1 ELSE 0 END")).as("tn"))
        .select(col("thr"), col("tp"), col("fp"), col("fn"), col("tn"),
          expr("CASE WHEN tp + fn > 0 THEN round(tp / CAST(tp + fn AS DOUBLE), 4) ELSE 0.0 END").as("tpr"),
          expr("CASE WHEN fp + tn > 0 THEN round(fp / CAST(fp + tn AS DOUBLE), 4) ELSE 0.0 END").as("fpr"),
          expr("""round(CASE WHEN tp + fn > 0 THEN tp / CAST(tp + fn AS DOUBLE) ELSE 0.0 END
                 |  - CASE WHEN fp + tn > 0 THEN fp / CAST(fp + tn AS DOUBLE) ELSE 0.0 END, 4) + 0.0""".stripMargin).as("youden_j"))
        .orderBy(col("thr"))
    },

    // NDCG@10 per user: the model ranking orders each user's events by
    // score, graded relevance derives from the props payload (k mod 4),
    // and the ideal ranking re-sorts by relevance. Two row_numbers over
    // the same per-user window partition (one shuffle), DCG terms
    // quantized to DECIMAL(28,12) before the order-free sum. The
    // user_id < 40 predicate is pushed into the parquet scan, so the
    // 100 TB shape reads only the evaluated cohort.
    Q("eval_ndcg",
      """WITH e AS (SELECT user_id, event_id, value AS score,
        |    CAST(regexp_extract(props, '[0-9]+') AS INT) % 4 AS rel
        |  FROM events WHERE user_id < 40),
        |rk AS (SELECT user_id, rel,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY score DESC, event_id) AS pos,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY rel DESC, event_id) AS ipos
        |  FROM e),
        |d AS (SELECT user_id,
        |    sum(CASE WHEN pos <= 10
        |        THEN CAST((pow(2, rel) - 1) / log2(pos + 1) AS DECIMAL(28,12))
        |        ELSE CAST(0 AS DECIMAL(28,12)) END) AS dcg_raw,
        |    sum(CASE WHEN ipos <= 10
        |        THEN CAST((pow(2, rel) - 1) / log2(ipos + 1) AS DECIMAL(28,12))
        |        ELSE CAST(0 AS DECIMAL(28,12)) END) AS idcg_raw
        |  FROM rk GROUP BY 1),
        |f AS (SELECT user_id,
        |    floor(CAST(dcg_raw AS DOUBLE) * 10000 + 0.5) / 10000.0 AS dcg,
        |    floor(CAST(idcg_raw AS DOUBLE) * 10000 + 0.5) / 10000.0 AS idcg
        |  FROM d)
        |SELECT user_id, dcg, idcg,
        |  CASE WHEN idcg > 0
        |       THEN floor(dcg / idcg * 10000 + 0.5) / 10000.0
        |       ELSE 0.0 END AS ndcg
        |FROM f ORDER BY user_id""") { (s, d) =>
      val e = Tables.events(s, d)
        .filter(col("user_id") < 40)
        .select(col("user_id"), col("event_id"), col("value").as("score"),
          expr("CAST(regexp_extract(props, '[0-9]+', 0) AS INT) % 4").as("rel"))
      val byScore = Window.partitionBy(col("user_id"))
        .orderBy(col("score").desc, col("event_id"))
      val byRel = Window.partitionBy(col("user_id"))
        .orderBy(col("rel").desc, col("event_id"))
      e.withColumn("pos", row_number().over(byScore))
        .withColumn("ipos", row_number().over(byRel))
        .groupBy(col("user_id"))
        .agg(
          sum(expr(
            """CASE WHEN pos <= 10
              |  THEN CAST((pow(2, rel) - 1) / log2(pos + 1) AS DECIMAL(28,12))
              |  ELSE CAST(0 AS DECIMAL(28,12)) END""".stripMargin)).as("dcg_raw"),
          sum(expr(
            """CASE WHEN ipos <= 10
              |  THEN CAST((pow(2, rel) - 1) / log2(ipos + 1) AS DECIMAL(28,12))
              |  ELSE CAST(0 AS DECIMAL(28,12)) END""".stripMargin)).as("idcg_raw"))
        .select(col("user_id"),
          // 10000.0 inside expr() parses as a DECIMAL literal in Spark
          // SQL (unlike the DataFrame-API double) — cast the quotient
          // back to DOUBLE so the schema matches the oracle's.
          expr("CAST(floor(CAST(dcg_raw AS DOUBLE) * 10000 + 0.5) / 10000.0 AS DOUBLE)").as("dcg"),
          expr("CAST(floor(CAST(idcg_raw AS DOUBLE) * 10000 + 0.5) / 10000.0 AS DOUBLE)").as("idcg"))
        .withColumn("ndcg", expr(
          """CAST(CASE WHEN idcg > 0
            |  THEN floor(dcg / idcg * 10000 + 0.5) / 10000.0
            |  ELSE 0.0 END AS DOUBLE)""".stripMargin))
        .orderBy(col("user_id"))
    },

    // Calibration / reliability bins: sigmoid-squash the score into a
    // pseudo-probability, bucket into 10 bins, compare mean predicted
    // probability against the observed positive rate per bin. The gap
    // column is the per-bin |calibration error| an ECE sums. One hash
    // aggregate; mean prediction rides a DECIMAL-quantized sum.
    Q("eval_calibration",
      s"""WITH e AS (SELECT 1 / (1 + exp(-(value - 100) / 40.0)) AS p,
         |    $lbl AS lbl FROM events),
         |b AS (SELECT least(CAST(floor(p * 10) AS INT), 9) AS bin, p, lbl FROM e),
         |m AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
         |    floor(CAST(sum(CAST(p AS DECIMAL(28,12))) AS DOUBLE)
         |          / count(*) * 10000 + 0.5) / 10000.0 AS avg_pred,
         |    round(sum(lbl) / CAST(count(*) AS DOUBLE), 4) AS frac_pos
         |  FROM b GROUP BY 1)
         |SELECT bin, n, avg_pred, frac_pos,
         |  floor(abs(avg_pred - frac_pos) * 10000 + 0.5) / 10000.0 AS gap
         |FROM m ORDER BY bin""") { (s, d) =>
      Tables.events(s, d)
        .select(expr("1 / (1 + exp(-(value - 100) / 40.0))").as("p"),
          expr(lbl).as("lbl"))
        .select(expr("least(CAST(floor(p * 10) AS INT), 9)").as("bin"),
          col("p"), col("lbl"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          // CAST back to DOUBLE: 10000.0 is a DECIMAL literal in expr().
          expr("""CAST(floor(CAST(sum(CAST(p AS DECIMAL(28,12))) AS DOUBLE)
                 |      / count(*) * 10000 + 0.5) / 10000.0 AS DOUBLE)""".stripMargin)
            .as("avg_pred"),
          round(sum(col("lbl")) / count(lit(1)).cast("double"), 4)
            .as("frac_pos"))
        .withColumn("gap",
          expr("CAST(floor(abs(avg_pred - frac_pos) * 10000 + 0.5) / 10000.0 AS DOUBLE)"))
        .orderBy(col("bin"))
    },

    // Brier score per weekday group — the proper scoring rule that
    // calibration bins summarize (Brier 1950): mean squared error of
    // the sigmoid pseudo-probability against the binary outcome, with
    // the group base rate alongside (its p(1-p) is the score of the
    // climatology forecast — the skill reference). One hash aggregate;
    // each squared-error term is the identical double expression in
    // both engines, DECIMAL(28,12)-quantized before the order-free sum,
    // floor-quantized at 4dp after the division.
    Q("eval_brier",
      s"""WITH e AS (SELECT CAST(date_part('isodow', ts) - 1 AS INT) AS grp,
         |    1 / (1 + exp(-(value - 100) / 40.0)) AS p, $lbl AS lbl FROM events)
         |SELECT grp, CAST(count(*) AS BIGINT) AS n,
         |  floor(CAST(sum(CAST((p - lbl) * (p - lbl) AS DECIMAL(28,12))) AS DOUBLE)
         |        / count(*) * 10000 + 0.5) / 10000.0 AS brier,
         |  round(sum(lbl) / CAST(count(*) AS DOUBLE), 4) AS base_rate
         |FROM e GROUP BY grp ORDER BY grp""") { (s, d) =>
      Tables.events(s, d)
        .select(expr("weekday(ts)").as("grp"),
          expr("1 / (1 + exp(-(value - 100) / 40.0))").as("p"),
          expr(lbl).as("lbl"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"),
          expr("""CAST(floor(CAST(sum(CAST((p - lbl) * (p - lbl) AS DECIMAL(28,12))) AS DOUBLE)
                 |      / count(*) * 10000 + 0.5) / 10000.0 AS DOUBLE)""".stripMargin)
            .as("brier"),
          round(sum(col("lbl")) / count(lit(1)).cast("double"), 4)
            .as("base_rate"))
        .orderBy(col("grp"))
    },

    // Multi-class confusion summary: the threshold classifier's
    // predictions against the true event types, reduced to per-class
    // tp / actual / predicted and precision/recall/F1 (F1 via the
    // division-free 2tp/(actual+predicted) identity). Cells collapse
    // first (at most classes^2 rows leave the scan), so the three
    // marginal joins run on a bounded relation regardless of input size.
    Q("eval_confusion",
      s"""WITH e AS (SELECT event_type AS t, ${valClass("name")} AS p
         |  FROM events),
         |cells AS (SELECT t, p, count(*) AS c FROM e GROUP BY 1, 2),
         |byt AS (SELECT t AS cls, CAST(sum(c) AS BIGINT) AS actual
         |  FROM cells GROUP BY 1),
         |byp AS (SELECT p AS cls, CAST(sum(c) AS BIGINT) AS predicted
         |  FROM cells GROUP BY 1),
         |diag AS (SELECT t AS cls, CAST(sum(c) AS BIGINT) AS tp
         |  FROM cells WHERE t = p GROUP BY 1)
         |SELECT byt.cls,
         |  coalesce(tp, CAST(0 AS BIGINT)) AS tp, actual,
         |  coalesce(predicted, CAST(0 AS BIGINT)) AS predicted,
         |  CASE WHEN coalesce(predicted, 0) > 0
         |       THEN round(coalesce(tp, 0) / CAST(predicted AS DOUBLE), 4)
         |       ELSE 0.0 END AS prec,
         |  round(coalesce(tp, 0) / CAST(actual AS DOUBLE), 4) AS rec,
         |  round(2 * coalesce(tp, 0)
         |        / CAST(actual + coalesce(predicted, 0) AS DOUBLE), 4) AS f1
         |FROM byt
         |LEFT JOIN byp ON byp.cls = byt.cls
         |LEFT JOIN diag ON diag.cls = byt.cls
         |ORDER BY byt.cls""") { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("event_type").as("t"), expr(valClass("name")).as("p"))
      val cells = e.groupBy(col("t"), col("p")).agg(count(lit(1)).as("c"))
        .cache()
      val byt = cells.groupBy(col("t").as("cls"))
        .agg(sum(col("c")).as("actual"))
      val byp = cells.groupBy(col("p").as("cls"))
        .agg(sum(col("c")).as("predicted"))
      val diag = cells.filter(col("t") === col("p"))
        .groupBy(col("t").as("cls")).agg(sum(col("c")).as("tp"))
      byt.join(byp, Seq("cls"), "left").join(diag, Seq("cls"), "left")
        .select(col("cls"),
          coalesce(col("tp"), lit(0L)).as("tp"), col("actual"),
          coalesce(col("predicted"), lit(0L)).as("predicted"),
          expr("CASE WHEN coalesce(predicted, 0) > 0 THEN round(coalesce(tp, 0) / CAST(predicted AS DOUBLE), 4) ELSE 0.0 END").as("prec"),
          expr("round(coalesce(tp, 0) / CAST(actual AS DOUBLE), 4)").as("rec"),
          expr("round(2 * coalesce(tp, 0) / CAST(actual + coalesce(predicted, 0) AS DOUBLE), 4)").as("f1"))
        .orderBy(col("cls"))
    },

    // Cohen's kappa between two annotators: the threshold classifier
    // and an md5-nibble labeller (both deterministic, so both engines
    // agree on every cell). Observed agreement and the chance-agreement
    // marginals are exact integer counts; kappa = (po-pe)/(1-pe) is the
    // only float step. The marginal product join is 5x5 rows.
    Q("eval_kappa",
      s"""WITH e AS (SELECT ${valClass("int")} AS a,
         |    (instr('0123456789abcdef',
         |           substring(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 1) % 5 AS b
         |  FROM events),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree
         |  FROM e),
         |pa AS (SELECT a, count(*) AS ca FROM e GROUP BY 1),
         |pb AS (SELECT b, count(*) AS cb FROM e GROUP BY 1),
         |x AS (SELECT CAST(sum(ca * cb) AS BIGINT) AS chance
         |  FROM pa JOIN pb ON pa.a = pb.b)
         |SELECT n, agree,
         |  round(agree / CAST(n AS DOUBLE), 4) AS po,
         |  round(chance / (CAST(n AS DOUBLE) * n), 4) AS pe,
         |  round((agree / CAST(n AS DOUBLE) - chance / (CAST(n AS DOUBLE) * n))
         |        / (1 - chance / (CAST(n AS DOUBLE) * n)), 4) AS kappa
         |FROM n, x ORDER BY n""") { (s, d) =>
      val e = Tables.events(s, d).select(
        expr(valClass("int")).as("a"),
        expr("(instr('0123456789abcdef', substring(md5(CAST(event_id AS STRING)), 1, 1)) - 1) % 5").as("b"))
        .cache()
      val n = e.agg(count(lit(1)).as("n"),
        sum(expr("CASE WHEN a = b THEN 1 ELSE 0 END")).as("agree"))
      val pa = e.groupBy(col("a")).agg(count(lit(1)).as("ca"))
      val pb = e.groupBy(col("b")).agg(count(lit(1)).as("cb"))
      val x = pa.join(pb, col("a") === col("b"))
        .agg(sum(col("ca") * col("cb")).as("chance"))
      n.crossJoin(broadcast(x))
        .select(col("n"), col("agree"),
          round(col("agree") / col("n").cast("double"), 4).as("po"),
          round(col("chance") / (col("n").cast("double") * col("n")), 4).as("pe"),
          expr("""round((agree / CAST(n AS DOUBLE) - chance / (CAST(n AS DOUBLE) * n))
                 |      / (1 - chance / (CAST(n AS DOUBLE) * n)), 4)""".stripMargin)
            .as("kappa"))
        .orderBy(col("n"))
    },

    // Per-group cross-entropy (log loss) under the same deterministic
    // sigmoid "model" eval_brier scores. Probabilities are clamped to
    // [1e-6, 1-1e-6] before the log (the standard guard against infinite
    // penalty on confident mistakes); each row's -[y ln p + (1-y) ln(1-p)]
    // term is quantized to DECIMAL(28,12) BEFORE the sum, so the mean is
    // bit-identical on any partitioning — one hash aggregate, no sort.
    Q("eval_logloss",
      s"""WITH e AS (SELECT CAST(date_part('isodow', ts) - 1 AS INT) AS grp,
         |    greatest(1e-6, least(1 - 1e-6,
         |      1 / (1 + exp(-(value - 100) / 40.0)))) AS p,
         |    $lbl AS lbl FROM events)
         |SELECT grp, CAST(count(*) AS BIGINT) AS n,
         |  floor(CAST(sum(CAST(-(lbl * ln(p) + (1 - lbl) * ln(1 - p))
         |                      AS DECIMAL(28,12))) AS DOUBLE)
         |        / count(*) * 10000 + 0.5) / 10000.0 AS logloss,
         |  round(sum(lbl) / CAST(count(*) AS DOUBLE), 4) AS base_rate
         |FROM e GROUP BY grp ORDER BY grp""") { (s, d) =>
      Tables.events(s, d)
        .select(expr("weekday(ts)").as("grp"),
          expr("greatest(1e-6, least(1 - 1e-6, 1 / (1 + exp(-(value - 100) / 40.0))))").as("p"),
          expr(lbl).as("lbl"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"),
          expr("""CAST(floor(CAST(sum(CAST(-(lbl * ln(p) + (1 - lbl) * ln(1 - p))
                 |                        AS DECIMAL(28,12))) AS DOUBLE)
                 |      / count(*) * 10000 + 0.5) / 10000.0 AS DOUBLE)""".stripMargin)
            .as("logloss"),
          round(sum(col("lbl")) / count(lit(1)).cast("double"), 4)
            .as("base_rate"))
        .orderBy(col("grp"))
    },

    // Decile lift / cumulative-gains table — the campaign-targeting view
    // of a scored population. The scale move mirrors eval_auc: rows
    // collapse to (score -> cnt, pos) by hash aggregate, ONE window over
    // the DISTINCT scores (desc) assigns each run its rank interval
    // [cum_before, cum_before+cnt), and a broadcast 10-row decile
    // relation intersects intervals analytically — ties that straddle a
    // decile boundary apportion their positives PRO RATA (the
    // tied-average-rank convention), so the result is exact, order-free,
    // and never sorts the raw rows. lift = decile response rate / overall
    // base rate; cum_gain = fraction of all positives captured so far.
    Q("eval_lift",
      s"""WITH e AS (SELECT value AS score, $lbl AS lbl FROM events),
         |s AS (SELECT score, count(*) AS cnt, sum(lbl) AS pos
         |  FROM e GROUP BY 1),
         |r AS (SELECT score, cnt, pos,
         |    sum(cnt) OVER (ORDER BY score DESC) - cnt AS cum_before
         |  FROM s),
         |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n,
         |    CAST(sum(pos) AS BIGINT) AS p FROM s),
         |dec AS (SELECT CAST(x AS INT) AS decile FROM range(0, 10) t(x)),
         |cut AS (SELECT decile,
         |    CAST(floor(n * decile / 10.0) AS BIGINT) AS lo,
         |    CAST(floor(n * (decile + 1) / 10.0) AS BIGINT) AS hi
         |  FROM dec, tot),
         |ov AS (SELECT decile,
         |    greatest(0, least(cum_before + cnt, hi) - greatest(cum_before, lo)) AS w,
         |    pos, cnt FROM r, cut
         |  WHERE cum_before + cnt > lo AND cum_before < hi),
         |d AS (SELECT decile, CAST(sum(w) AS BIGINT) AS n_d,
         |    floor(CAST(sum(CAST(pos * w / CAST(cnt AS DOUBLE)
         |                        AS DECIMAL(28,12))) AS DOUBLE)
         |          * 10000 + 0.5) / 10000.0 AS pos_d
         |  FROM ov GROUP BY 1)
         |SELECT decile, n_d, pos_d,
         |  round(pos_d / n_d / (p / CAST(n AS DOUBLE)), 4) AS lift,
         |  round(sum(pos_d) OVER (ORDER BY decile) / p, 4) AS cum_gain
         |FROM d, tot ORDER BY decile""") { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("value").as("score"), expr(lbl).as("lbl"))
      val runs = e.groupBy(col("score"))
        .agg(count(lit(1)).as("cnt"), sum(col("lbl")).as("pos"))
      val w = Window.orderBy(col("score").desc)
      val r = runs
        .withColumn("cum_before", sum(col("cnt")).over(w) - col("cnt"))
      val tot = runs.agg(sum(col("cnt")).as("n"), sum(col("pos")).as("p"))
      val cut = s.range(0, 10).select(col("id").cast("int").as("decile"))
        .crossJoin(broadcast(tot))
        .select(col("decile"),
          expr("CAST(floor(n * decile / 10.0) AS BIGINT)").as("lo"),
          expr("CAST(floor(n * (decile + 1) / 10.0) AS BIGINT)").as("hi"))
      val ov = r.crossJoin(broadcast(cut))
        .filter(col("cum_before") + col("cnt") > col("lo") &&
          col("cum_before") < col("hi"))
        .select(col("decile"),
          greatest(lit(0L), least(col("cum_before") + col("cnt"), col("hi"))
            - greatest(col("cum_before"), col("lo"))).as("w"),
          col("pos"), col("cnt"))
      val dd = ov.groupBy(col("decile"))
        .agg(sum(col("w")).as("n_d"),
          expr("""CAST(floor(CAST(sum(CAST(pos * w / CAST(cnt AS DOUBLE)
                 |                        AS DECIMAL(28,12))) AS DOUBLE)
                 |      * 10000 + 0.5) / 10000.0 AS DOUBLE)""".stripMargin)
            .as("pos_d"))
      val wc = Window.orderBy(col("decile"))
      dd.crossJoin(broadcast(tot))
        .select(col("decile"), col("n_d"), col("pos_d"),
          round(col("pos_d") / col("n_d") / (col("p") / col("n").cast("double")), 4)
            .as("lift"),
          round(sum(col("pos_d")).over(wc) / col("p"), 4).as("cum_gain"))
        .orderBy(col("decile"))
    },

    // Mean reciprocal rank by user cohort: each user's events rank by
    // score (desc, event_id tiebreak) inside a PER-USER window — a keyed
    // shuffle, never a global sort — the first relevant hit (graded rel
    // from the props payload, as eval_ndcg) contributes 1/rank, users
    // with no relevant event contribute 0, and cohorts (user_id % 10)
    // average the per-user RR with DECIMAL quantization.
    Q("eval_mrr",
      """WITH e AS (SELECT user_id, event_id, value AS score,
        |    CAST(regexp_extract(props, '[0-9]+') AS INT) % 4 AS rel
        |  FROM events),
        |rk AS (SELECT user_id,
        |    row_number() OVER (PARTITION BY user_id
        |                       ORDER BY score DESC, event_id) AS rnk,
        |    rel FROM e),
        |u AS (SELECT user_id,
        |    coalesce(1.0 / min(CASE WHEN rel > 0 THEN rnk END), 0.0) AS rr
        |  FROM rk GROUP BY 1)
        |SELECT CAST(user_id % 10 AS INT) AS cohort,
        |  CAST(count(*) AS BIGINT) AS users,
        |  floor(CAST(sum(CAST(rr AS DECIMAL(28,12))) AS DOUBLE)
        |        / count(*) * 10000 + 0.5) / 10000.0 AS mrr
        |FROM u GROUP BY 1 ORDER BY cohort""") { (s, d) =>
      val e = Tables.events(s, d).select(col("user_id"), col("event_id"),
        col("value").as("score"),
        expr("CAST(regexp_extract(props, '[0-9]+', 0) AS INT) % 4").as("rel"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("score").desc, col("event_id"))
      val u = e.withColumn("rnk", row_number().over(w))
        .groupBy(col("user_id"))
        .agg(coalesce(lit(1.0) / min(expr("CASE WHEN rel > 0 THEN rnk END")),
          lit(0.0)).as("rr"))
      u.groupBy(expr("CAST(user_id % 10 AS INT)").as("cohort"))
        .agg(count(lit(1)).as("users"),
          expr("""CAST(floor(CAST(sum(CAST(rr AS DECIMAL(28,12))) AS DOUBLE)
                 |      / count(*) * 10000 + 0.5) / 10000.0 AS DOUBLE)""".stripMargin)
            .as("mrr"))
        .orderBy(col("cohort"))
    },

    // Chi-square feature↔label association — the feature-selection
    // screen a labelling pipeline runs before training. Three candidate
    // features (weekday, 4h time-of-day bucket, score quartile bucket)
    // unpivot in ONE scan pass; cells collapse to at most
    // features x values x 2 rows by hash aggregate, marginals join on
    // that bounded relation, and chi2 = sum (obs-exp)^2/exp with each
    // cell's term DECIMAL-quantized. dof = (|values|-1)(|labels|-1).
    Q("eval_chi2",
      s"""WITH e AS (SELECT CAST(date_part('isodow', ts) - 1 AS VARCHAR) AS wd,
         |    CAST(CAST(date_part('hour', ts) AS INT) // 4 AS VARCHAR) AS tod,
         |    CAST(CAST(floor(least(greatest(value, 0), 199.99)) AS INT)
         |      // 50 AS VARCHAR) AS vq,
         |    $lbl AS lbl FROM events),
         |u AS (SELECT 'weekday' AS feature, wd AS v, lbl FROM e
         |  UNION ALL SELECT 'tod4h', tod, lbl FROM e
         |  UNION ALL SELECT 'score_q', vq, lbl FROM e),
         |cells AS (SELECT feature, v, lbl, count(*) AS c FROM u GROUP BY 1,2,3),
         |rowm AS (SELECT feature, v, sum(c) AS rc FROM cells GROUP BY 1,2),
         |colm AS (SELECT feature, lbl, sum(c) AS cc FROM cells GROUP BY 1,2),
         |tot AS (SELECT feature, sum(c) AS n FROM cells GROUP BY 1),
         |x AS (SELECT rowm.feature,
         |    CAST((coalesce(cells.c, 0) - rc * cc / CAST(n AS DOUBLE))
         |         * (coalesce(cells.c, 0) - rc * cc / CAST(n AS DOUBLE))
         |         / (rc * cc / CAST(n AS DOUBLE)) AS DECIMAL(28,12)) AS term
         |  FROM rowm
         |  JOIN colm ON colm.feature = rowm.feature
         |  JOIN tot ON tot.feature = rowm.feature
         |  LEFT JOIN cells ON cells.feature = rowm.feature
         |    AND cells.v = rowm.v AND cells.lbl = colm.lbl),
         |k AS (SELECT feature,
         |    CAST((count(DISTINCT v) - 1) * (count(DISTINCT lbl) - 1) AS BIGINT) AS dof
         |  FROM cells GROUP BY 1)
         |SELECT x.feature,
         |  floor(CAST(sum(term) AS DOUBLE) * 10000 + 0.5) / 10000.0 AS chi2,
         |  max(dof) AS dof
         |FROM x JOIN k ON k.feature = x.feature
         |GROUP BY 1 ORDER BY x.feature""") { (s, d) =>
      val e = Tables.events(s, d).select(
        expr("CAST(weekday(ts) AS STRING)").as("wd"),
        expr("CAST(CAST(hour(ts) AS INT) DIV 4 AS STRING)").as("tod"),
        // greatest(value, 0): Spark DIV truncates toward zero while
        // DuckDB // floors — they diverge on negatives, so the bucket
        // is clamped non-negative in BOTH dialects (round-13 ANSI-div
        // discipline) instead of silently relying on the fixture's min.
        expr("CAST(CAST(floor(least(greatest(value, 0), 199.99)) AS INT) DIV 50 AS STRING)").as("vq"),
        expr(lbl).as("lbl"))
      val u = e.select(expr(
        """stack(3, 'weekday', wd, 'tod4h', tod, 'score_q', vq)
          |  AS (feature, v)""".stripMargin), col("lbl"))
      val cells = u.groupBy(col("feature"), col("v"), col("lbl"))
        .agg(count(lit(1)).as("c")).cache()
      val rowm = cells.groupBy(col("feature"), col("v")).agg(sum(col("c")).as("rc"))
      val colm = cells.groupBy(col("feature"), col("lbl")).agg(sum(col("c")).as("cc"))
      val tot = cells.groupBy(col("feature")).agg(sum(col("c")).as("n"))
      val k = cells.groupBy(col("feature"))
        .agg(expr("CAST((count(DISTINCT v) - 1) * (count(DISTINCT lbl) - 1) AS BIGINT)")
          .as("dof"))
      // Full row×col category cross product per feature, LEFT-joined to
      // the observed cells: an absent (v, lbl) combination is a ZERO
      // cell, and its (0 − exp)²/exp term still belongs in the
      // statistic — dropping it understates χ² exactly when the
      // association is strongest (a planted decisive 2×2 halves).
      rowm
        .join(colm, Seq("feature"))
        .join(tot, Seq("feature"))
        .join(cells, Seq("feature", "v", "lbl"), "left")
        .select(col("feature"),
          expr("""CAST((coalesce(c, 0) - rc * cc / CAST(n AS DOUBLE))
                 |     * (coalesce(c, 0) - rc * cc / CAST(n AS DOUBLE))
                 |     / (rc * cc / CAST(n AS DOUBLE)) AS DECIMAL(28,12))""".stripMargin)
            .as("term"))
        .groupBy(col("feature"))
        .agg(expr("CAST(floor(CAST(sum(term) AS DOUBLE) * 10000 + 0.5) / 10000.0 AS DOUBLE)")
          .as("chi2"))
        .join(k, Seq("feature"))
        .select(col("feature"), col("chi2"), col("dof"))
        .orderBy(col("feature"))
    },

    // Population stability index — the score-drift monitor every
    // deployed model runs: fixed value buckets, month-half reference vs
    // current windows, PSI = Σ (p−q)·ln(p/q) with add-one smoothing
    // over the union bucket grid (an empty bucket on one side must
    // contribute, not divide by zero). Two bounded rollups + a
    // |types|×|buckets| grid join; each term is DECIMAL-quantized so
    // the index is partition-invariant. Rule of thumb: <0.1 stable,
    // >0.25 drifted.
    Q("eval_psi",
      """WITH e AS (SELECT event_type,
        |    CASE WHEN CAST(date_part('day', ts) AS INT) <= 15
        |      THEN 'ref' ELSE 'cur' END AS win,
        |    least(greatest(CAST(floor(value / 25) AS INT), -4), 7) AS b
        |  FROM events),
        |c AS (SELECT event_type, win, b, count(*) AS c FROM e GROUP BY 1,2,3),
        |n AS (SELECT event_type, win, sum(c) AS n FROM c GROUP BY 1,2),
        |g AS (SELECT event_type, b, CAST(count(*)
        |    OVER (PARTITION BY event_type) AS BIGINT) AS nb
        |  FROM (SELECT DISTINCT event_type, b FROM c)),
        |x AS (SELECT g.event_type, g.b,
        |    (coalesce(cr.c, 0) + 1) / CAST(nr.n + g.nb AS DOUBLE) AS p,
        |    (coalesce(cc.c, 0) + 1) / CAST(nc.n + g.nb AS DOUBLE) AS q
        |  FROM g
        |  JOIN n nr ON nr.event_type = g.event_type AND nr.win = 'ref'
        |  JOIN n nc ON nc.event_type = g.event_type AND nc.win = 'cur'
        |  LEFT JOIN c cr ON cr.event_type = g.event_type AND cr.b = g.b
        |    AND cr.win = 'ref'
        |  LEFT JOIN c cc ON cc.event_type = g.event_type AND cc.b = g.b
        |    AND cc.win = 'cur')
        |SELECT event_type,
        |  floor(CAST(sum(CAST((p - q) * ln(p / q) AS DECIMAL(28,12)))
        |    AS DOUBLE) * 10000 + 0.5) / 10000.0 AS psi
        |FROM x GROUP BY 1 ORDER BY event_type""") { (s, d) =>
      val e = Tables.events(s, d).select(col("event_type"),
        when(expr("CAST(dayofmonth(ts) AS INT)") <= 15, "ref").otherwise("cur")
          .as("win"),
        least(greatest(expr("CAST(floor(value / 25) AS INT)"), lit(-4)), lit(7))
          .as("b"))
      val c = e.groupBy(col("event_type"), col("win"), col("b"))
        .agg(count(lit(1)).as("c")).cache()
      val n = c.groupBy(col("event_type"), col("win")).agg(sum(col("c")).as("n"))
      val g = c.select(col("event_type"), col("b")).distinct()
        .withColumn("nb", count(lit(1)).over(
          Window.partitionBy(col("event_type"))))
      g.join(n.filter(col("win") === "ref")
            .select(col("event_type"), col("n").as("n_ref")), Seq("event_type"))
        .join(n.filter(col("win") === "cur")
            .select(col("event_type"), col("n").as("n_cur")), Seq("event_type"))
        .join(c.filter(col("win") === "ref")
            .select(col("event_type"), col("b"), col("c").as("c_ref")),
          Seq("event_type", "b"), "left")
        .join(c.filter(col("win") === "cur")
            .select(col("event_type"), col("b"), col("c").as("c_cur")),
          Seq("event_type", "b"), "left")
        .select(col("event_type"),
          ((coalesce(col("c_ref"), lit(0L)) + 1) /
            (col("n_ref") + col("nb")).cast("double")).as("p"),
          ((coalesce(col("c_cur"), lit(0L)) + 1) /
            (col("n_cur") + col("nb")).cast("double")).as("q"))
        .groupBy(col("event_type"))
        .agg(expr("""CAST(floor(CAST(sum(CAST((p - q) * ln(p / q)
               |  AS DECIMAL(28,12))) AS DOUBLE) * 10000 + 0.5)
               |  / 10000.0 AS DOUBLE)""".stripMargin).as("psi"))
        .orderBy(col("event_type"))
    },

    // Poisson-bootstrap confidence interval for the per-type mean value
    // — THE scalable bootstrap: instead of resampling rows, every row
    // gets a deterministic per-replica weight ~ Poisson(1)
    // (approximated by a 4-point pmf on one md5 nibble: 6/16·0,
    // 6/16·1, 3/16·2, 1/16·3), so all 64 replica means compute in ONE
    // grouped pass over events×64 and no replica ever materializes.
    // The md5 seed makes the "randomness" identical in any engine and
    // on any partitioning; per-replica sums are DECIMAL-quantized and
    // the CI is the exact interpolated 2.5/97.5 percentile over the 64
    // replica means.
    Q("eval_bootstrap_ci",
      """WITH reps AS (SELECT unnest(range(0, 64)) AS b),
        |w AS (SELECT event_type, value, b,
        |    CASE WHEN nib < 6 THEN 0 WHEN nib < 12 THEN 1
        |      WHEN nib < 15 THEN 2 ELSE 3 END AS w
        |  FROM (SELECT event_type, value, b,
        |      instr('0123456789abcdef', substring(md5(
        |        CAST(event_id AS VARCHAR) || ':' || CAST(b AS VARCHAR)),
        |        1, 1)) - 1 AS nib
        |    FROM events CROSS JOIN reps)),
        |m AS (SELECT event_type, b,
        |    CAST(CAST(sum(CAST(w * value AS DECIMAL(18,4))) AS DOUBLE)
        |      / sum(w) AS DECIMAL(18,8)) AS mb
        |  FROM w GROUP BY 1, 2)
        |SELECT event_type,
        |  round(quantile_cont(CAST(mb AS DOUBLE), 0.025), 4) AS ci_lo,
        |  round(quantile_cont(CAST(mb AS DOUBLE), 0.975), 4) AS ci_hi,
        |  round(CAST(avg(mb) AS DOUBLE), 4) AS boot_mean
        |FROM m GROUP BY 1 ORDER BY event_type""") { (s, d) =>
      val reps = s.range(0, 64).select(col("id").cast("int").as("b"))
      val w = Tables.events(s, d)
        .select(col("event_type"), col("value"), col("event_id"))
        .crossJoin(broadcast(reps))
        .withColumn("nib", expr(
          """instr('0123456789abcdef', substring(md5(
            |  CAST(event_id AS STRING) || ':' || CAST(b AS STRING)),
            |  1, 1)) - 1""".stripMargin))
        .withColumn("w", when(col("nib") < 6, 0).when(col("nib") < 12, 1)
          .when(col("nib") < 15, 2).otherwise(3))
      val m = w.groupBy(col("event_type"), col("b"))
        .agg(((sum((col("w") * col("value")).cast("decimal(18,4)"))
            .cast("double")) / sum(col("w")))
          .cast("decimal(18,8)").as("mb"))
      m.groupBy(col("event_type"))
        .agg(
          round(expr("percentile(CAST(mb AS DOUBLE), 0.025)"), 4).as("ci_lo"),
          round(expr("percentile(CAST(mb AS DOUBLE), 0.975)"), 4).as("ci_hi"),
          round(avg(col("mb")).cast("double"), 4).as("boot_mean"))
        .orderBy(col("event_type"))
    },

    // Kolmogorov-Smirnov separation statistic per weekday group: the
    // max gap between the positive and negative score CDFs — the
    // standard "can this score separate classes at all" screen run
    // before a threshold sweep. Same scale shape as eval_auc: rows
    // collapse to (grp, score) -> (cnt, pos) by hash aggregate first,
    // then ONE window over the DISTINCT scores forms both running CDFs,
    // so the heavy pass is partial+final aggregable and no global sort
    // of raw rows ever happens. CDF ratios are exact-integer / total
    // divisions (single IEEE op each) — bit-identical across engines.
    Q("eval_ks",
      s"""WITH e AS (SELECT CAST(date_part('isodow', ts) - 1 AS INT) AS grp,
         |    value AS score, $lbl AS lbl FROM events),
         |s AS (SELECT grp, score, count(*) AS cnt, sum(lbl) AS pos
         |  FROM e GROUP BY 1, 2),
         |c AS (SELECT grp,
         |    sum(pos) OVER (PARTITION BY grp ORDER BY score) AS cum_pos,
         |    sum(cnt - pos) OVER (PARTITION BY grp ORDER BY score) AS cum_neg,
         |    sum(pos) OVER (PARTITION BY grp) AS p_cnt,
         |    sum(cnt - pos) OVER (PARTITION BY grp) AS n_cnt
         |  FROM s)
         |SELECT grp, CAST(max(p_cnt) AS BIGINT) AS p_cnt,
         |  CAST(max(n_cnt) AS BIGINT) AS n_cnt,
         |  round(max(abs(cum_pos / CAST(p_cnt AS DOUBLE)
         |              - cum_neg / CAST(n_cnt AS DOUBLE))), 4) AS ks
         |FROM c GROUP BY grp ORDER BY grp""") { (s, d) =>
      val e = Tables.events(s, d).select(
        expr("weekday(ts)").as("grp"), col("value").as("score"),
        expr(lbl).as("lbl"))
      val grouped = e.groupBy(col("grp"), col("score"))
        .agg(count(lit(1)).as("cnt"), sum(col("lbl")).as("pos"))
      val wOrd = Window.partitionBy(col("grp")).orderBy(col("score"))
      val wAll = Window.partitionBy(col("grp"))
      grouped
        .withColumn("cum_pos", sum(col("pos")).over(wOrd))
        .withColumn("cum_neg", sum(col("cnt") - col("pos")).over(wOrd))
        .withColumn("p_cnt", sum(col("pos")).over(wAll))
        .withColumn("n_cnt", sum(col("cnt") - col("pos")).over(wAll))
        .groupBy(col("grp"))
        .agg(max(col("p_cnt")).cast("long").as("p_cnt"),
          max(col("n_cnt")).cast("long").as("n_cnt"),
          round(max(abs(col("cum_pos") / col("p_cnt").cast("double")
            - col("cum_neg") / col("n_cnt").cast("double"))), 4).as("ks"))
        .orderBy(col("grp"))
    },

    // Regression-model evaluation per event type: RMSE / MAE / R² of a
    // deterministic linear "prediction" (0.8·y + 10, computed in exact
    // DECIMAL so both engines see the identical residuals). The scale
    // law of the family: every metric reduces to exact DECIMAL power
    // sums (Σe², Σ|e|, Σy, Σy²) — one hash aggregate, partial+final
    // aggregable, partition-count invariant; doubles appear only in the
    // final sqrt/divide over already-exact totals.
    Q("eval_regression",
      """WITH e AS (SELECT event_type,
        |    CAST(value AS DECIMAL(18,4)) AS y,
        |    CAST(CAST(value AS DECIMAL(18,4)) * CAST(0.8 AS DECIMAL(8,4))
        |      + 10 AS DECIMAL(18,4)) AS pred
        |  FROM events),
        |r AS (SELECT event_type, y, y - pred AS err FROM e),
        |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(err * err AS DECIMAL(28,8))) AS DOUBLE) AS sse,
        |    CAST(sum(CAST(abs(err) AS DECIMAL(28,4))) AS DOUBLE) AS sae,
        |    CAST(sum(CAST(y AS DECIMAL(28,4))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(y * y AS DECIMAL(28,8))) AS DOUBLE) AS syy
        |  FROM r GROUP BY 1)
        |SELECT event_type, n,
        |  round(sqrt(sse / n), 4) AS rmse,
        |  round(sae / n, 4) AS mae,
        |  round(1 - sse / (syy - sy * sy / n), 4) AS r2
        |FROM a ORDER BY event_type""") { (s, d) =>
      val e = Tables.events(s, d).select(col("event_type"),
          col("value").cast("decimal(18,4)").as("y"))
        .withColumn("pred",
          (col("y") * lit(0.8).cast("decimal(8,4)") + 10)
            .cast("decimal(18,4)"))
        .withColumn("err", col("y") - col("pred"))
      e.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum((col("err") * col("err")).cast("decimal(28,8)"))
            .cast("double").as("sse"),
          sum(abs(col("err")).cast("decimal(28,4)"))
            .cast("double").as("sae"),
          sum(col("y").cast("decimal(28,4)")).cast("double").as("sy"),
          sum((col("y") * col("y")).cast("decimal(28,8)"))
            .cast("double").as("syy"))
        .select(col("event_type"), col("n"),
          round(sqrt(col("sse") / col("n")), 4).as("rmse"),
          round(col("sae") / col("n"), 4).as("mae"),
          round(lit(1) - col("sse")
            / (col("syy") - col("sy") * col("sy") / col("n")), 4).as("r2"))
        .orderBy(col("event_type"))
    },

    // Mutual information between weekday and event type — the
    // feature-selection screen ("does this categorical feature carry
    // any signal about the label?") run before features enter a
    // training mix. MI = H(day) + H(type) − H(day, type), all three
    // entropies from ONE tiny joint-count table (7×5 rows) produced by
    // a single corpus-scale hash aggregate; everything after operates
    // on constant-size relations (broadcast 1-row totals). plogp terms
    // are DECIMAL(28,12)-quantized before the order-free sum — the
    // entropy-family determinism law.
    Q("eval_mutual_info",
      """WITH j AS (SELECT CAST(date_part('isodow', ts) - 1 AS INT) AS grp,
        |    event_type AS tpe, count(*) AS c FROM events GROUP BY 1, 2),
        |n AS (SELECT sum(c) AS n FROM j),
        |hj AS (SELECT CAST(sum(CAST(-(c / CAST(n.n AS DOUBLE))
        |      * ln(c / CAST(n.n AS DOUBLE)) AS DECIMAL(28,12)))
        |    AS DOUBLE) AS h FROM j CROSS JOIN n),
        |hd AS (SELECT CAST(sum(CAST(-(c / CAST(n.n AS DOUBLE))
        |      * ln(c / CAST(n.n AS DOUBLE)) AS DECIMAL(28,12)))
        |    AS DOUBLE) AS h
        |  FROM (SELECT grp, sum(c) AS c FROM j GROUP BY 1) m CROSS JOIN n),
        |ht AS (SELECT CAST(sum(CAST(-(c / CAST(n.n AS DOUBLE))
        |      * ln(c / CAST(n.n AS DOUBLE)) AS DECIMAL(28,12)))
        |    AS DOUBLE) AS h
        |  FROM (SELECT tpe, sum(c) AS c FROM j GROUP BY 1) m CROSS JOIN n)
        |SELECT CAST(max(n.n) AS BIGINT) AS n,
        |  round(max(hd.h), 4) AS h_day, round(max(ht.h), 4) AS h_type,
        |  round(max(hj.h), 4) AS h_joint,
        |  round(max(hd.h) + max(ht.h) - max(hj.h), 4) AS mi
        |FROM n CROSS JOIN hj CROSS JOIN hd CROSS JOIN ht
        |ORDER BY n""") { (s, d) =>
      val j = Tables.events(s, d)
        .groupBy(expr("weekday(ts)").as("grp"), col("event_type").as("tpe"))
        .agg(count(lit(1)).as("c"))
      val n = j.agg(sum(col("c")).as("n"))
      def ent(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
        df.crossJoin(broadcast(n))
          .agg(expr("""CAST(sum(CAST(-(c / CAST(n AS DOUBLE))
                 |  * ln(c / CAST(n AS DOUBLE)) AS DECIMAL(28,12)))
                 |  AS DOUBLE)""".stripMargin).as("h"))
      val hj = ent(j)
      val hd = ent(j.groupBy(col("grp")).agg(sum(col("c")).as("c")))
      val ht = ent(j.groupBy(col("tpe")).agg(sum(col("c")).as("c")))
      n.crossJoin(broadcast(hj.select(col("h").as("h_j"))))
        .crossJoin(broadcast(hd.select(col("h").as("h_d"))))
        .crossJoin(broadcast(ht.select(col("h").as("h_t"))))
        .select(col("n").cast("long").as("n"),
          round(col("h_d"), 4).as("h_day"),
          round(col("h_t"), 4).as("h_type"),
          round(col("h_j"), 4).as("h_joint"),
          round(col("h_d") + col("h_t") - col("h_j"), 4).as("mi"))
        .orderBy(col("n"))
    },

    // Spearman rank correlation per weekday between the score and the
    // second-of-day — "does the score drift over the day" as a
    // monotone-association test, robust where Pearson on raw values is
    // not. Tied-average ranks come from the eval_auc machinery (value
    // hash-collapse → ONE window over DISTINCT values), joined back to
    // rows by the (grp, value) key; Pearson is invariant under positive
    // affine maps, so the query correlates DOUBLED ranks
    // (2·cum_before + cnt + 1 — pure integers, no halves), keeping
    // every power sum exact in DECIMAL until the final rho division.
    Q("eval_spearman",
      """WITH e AS (SELECT CAST(date_part('isodow', ts) - 1 AS INT) AS grp,
        |    value AS x,
        |    CAST(date_part('hour', ts) * 3600 + date_part('minute', ts) * 60
        |      + date_part('second', ts) AS BIGINT) AS y
        |  FROM events),
        |rx AS (SELECT grp, x,
        |    CAST(2 * (sum(cnt) OVER (PARTITION BY grp ORDER BY x) - cnt)
        |      + cnt + 1 AS BIGINT) AS r
        |  FROM (SELECT grp, x, count(*) AS cnt FROM e GROUP BY 1, 2)),
        |ry AS (SELECT grp, y,
        |    CAST(2 * (sum(cnt) OVER (PARTITION BY grp ORDER BY y) - cnt)
        |      + cnt + 1 AS BIGINT) AS r
        |  FROM (SELECT grp, y, count(*) AS cnt FROM e GROUP BY 1, 2)),
        |j AS (SELECT e.grp, rx.r AS a, ry.r AS b FROM e
        |  JOIN rx ON rx.grp = e.grp AND rx.x = e.x
        |  JOIN ry ON ry.grp = e.grp AND ry.y = e.y),
        |s AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(a AS DECIMAL(38,0))) AS DOUBLE) AS sa,
        |    CAST(sum(CAST(b AS DECIMAL(38,0))) AS DOUBLE) AS sb,
        |    CAST(sum(CAST(a AS DECIMAL(38,0)) * b) AS DOUBLE) AS sab,
        |    CAST(sum(CAST(a AS DECIMAL(38,0)) * a) AS DOUBLE) AS saa,
        |    CAST(sum(CAST(b AS DECIMAL(38,0)) * b) AS DOUBLE) AS sbb
        |  FROM j GROUP BY 1)
        |SELECT grp, n,
        |  round((n * sab - sa * sb)
        |    / sqrt((n * saa - sa * sa) * (n * sbb - sb * sb)), 4) AS rho
        |FROM s ORDER BY grp""") { (s, d) =>
      val e = Tables.events(s, d).select(
        expr("weekday(ts)").as("grp"), col("value").as("x"),
        (hour(col("ts")) * 3600 + minute(col("ts")) * 60
          + second(col("ts"))).cast("long").as("y"))
      def ranks(v: String): org.apache.spark.sql.DataFrame = {
        val w = Window.partitionBy(col("grp")).orderBy(col(v))
        e.groupBy(col("grp"), col(v)).agg(count(lit(1)).as("cnt"))
          .select(col("grp"), col(v),
            (lit(2) * (sum(col("cnt")).over(w) - col("cnt"))
              + col("cnt") + 1).cast("long").as(s"r_$v"))
      }
      e.join(ranks("x"), Seq("grp", "x"))
        .join(ranks("y"), Seq("grp", "y"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("r_x").cast("decimal(38,0)")).cast("double").as("sa"),
          sum(col("r_y").cast("decimal(38,0)")).cast("double").as("sb"),
          sum(col("r_x").cast("decimal(38,0)") * col("r_y"))
            .cast("double").as("sab"),
          sum(col("r_x").cast("decimal(38,0)") * col("r_x"))
            .cast("double").as("saa"),
          sum(col("r_y").cast("decimal(38,0)") * col("r_y"))
            .cast("double").as("sbb"))
        .select(col("grp"), col("n"),
          round((col("n") * col("sab") - col("sa") * col("sb"))
            / sqrt((col("n") * col("saa") - col("sa") * col("sa"))
              * (col("n") * col("sbb") - col("sb") * col("sb"))), 4)
            .as("rho"))
        .orderBy(col("grp"))
    },

    // RANK-BIASED OVERLAP at depth 20 (Webber, Moffat & Zobel 2010,
    // TOIS) between two part rankings — by buyer reach (distinct
    // customers) vs by volume (total quantity). RBO is THE top-weighted
    // list-similarity measure for comparing rankers (two retrieval
    // models, two feature variants): RBO@k = (1−p)·Σ_{d≤k} p^{d−1}·
    // X_d/d with X_d the prefix-intersection size, p = 0.9. Both
    // rankings cut to top-20 via orderBy+limit (TakeOrdered — no global
    // sort); X_d derives from the ≤20-row joined rank pairs against a
    // 20-row literal depth grid, every term quantized DECIMAL(28,12)
    // before the 20-term sum, so the score is exact-deterministic.
    Q("eval_rbo",
      """WITH d1 AS (SELECT l_partkey AS p, count(DISTINCT o.o_custkey) AS m
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  GROUP BY 1),
        |r1 AS (SELECT p, row_number() OVER (ORDER BY m DESC, p) AS r1
        |  FROM d1 ORDER BY m DESC, p LIMIT 20),
        |d2 AS (SELECT l_partkey AS p,
        |    sum(CAST(l_quantity AS DECIMAL(18,4))) AS m FROM lineitem
        |  GROUP BY 1),
        |r2 AS (SELECT p, row_number() OVER (ORDER BY m DESC, p) AS r2
        |  FROM d2 ORDER BY m DESC, p LIMIT 20),
        |pr AS (SELECT r1.p, greatest(r1.r1, r2.r2) AS mr
        |  FROM r1 JOIN r2 ON r2.p = r1.p),
        |xd AS (SELECT g.d, count(pr.p) AS x
        |  FROM range(1, 21) g(d) LEFT JOIN pr ON pr.mr <= g.d
        |  GROUP BY 1)
        |SELECT CAST(max(CASE WHEN d = 20 THEN x END) AS BIGINT) AS n_common,
        |  round(0.1 * CAST(sum(CAST(pow(0.9, d - 1) * x / d
        |    AS DECIMAL(28,12))) AS DOUBLE), 4) AS rbo_20
        |FROM xd""") { (s, d) =>
      val li = Tables.lineitem(s, d)
      val deg = li.join(Tables.orders(s, d),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_partkey").as("p"))
        .agg(countDistinct(col("o_custkey")).as("m"))
      val r1 = deg.orderBy(col("m").desc, col("p")).limit(20)
        .withColumn("r1", row_number().over(
          Window.orderBy(col("m").desc, col("p"))))
        .select(col("p"), col("r1"))
      val qty = li.groupBy(col("l_partkey").as("p"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("m"))
      val r2 = qty.orderBy(col("m").desc, col("p")).limit(20)
        .withColumn("r2", row_number().over(
          Window.orderBy(col("m").desc, col("p"))))
        .select(col("p").as("p2"), col("r2"))
      val pr = r1.join(r2, col("p2") === col("p"))
        .select(col("p"), greatest(col("r1"), col("r2")).as("mr"))
      val grid = s.range(1, 21).select(col("id").cast("int").as("d"))
      val xd = grid.join(pr, col("mr") <= col("d"), "left_outer")
        .groupBy(col("d")).agg(count(col("p")).as("x"))
      xd.agg(
          max(when(col("d") === 20, col("x"))).cast("long").as("n_common"),
          round(lit(0.1) * sum((pow(lit(0.9), col("d") - 1) * col("x") /
              col("d")).cast("decimal(28,12)")).cast("double"), 4)
            .as("rbo_20"))
    },

    // TWO-PROPORTION Z-TEST for the A/B assignment — the significance
    // arithmetic on top of behavior_ab_assign's deterministic arms:
    // conversion (high-value purchase, value > 150, so the rate is
    // strictly inside (0,1) on the fixture) per user, pooled-SE z
    // statistic between arm A and arm B, and the |z| > 1.96 decision
    // flag. The z division is guarded with nullif(denom, 0): when the
    // pooled rate degenerates to 0 or 1 the statistic is NULL in both
    // engines rather than an ANSI DIVIDE_BY_ZERO in Spark. The
    // statistic is exact integer counts → one double formula evaluated
    // on the same inputs in both engines (no erf needed — the 95% flag
    // IS the test); everything reduces to a 2-row aggregate.
    Q("eval_ab_ztest",
      """WITH u AS (SELECT user_id,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |      THEN 'A' ELSE 'B' END AS arm,
        |    max(CASE WHEN event_type = 'purchase' AND value > 150
        |      THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT arm, count(*) AS n, sum(conv) AS c FROM u GROUP BY 1),
        |w AS (SELECT
        |    max(CASE WHEN arm = 'A' THEN n END) AS na,
        |    max(CASE WHEN arm = 'A' THEN c END) AS ca,
        |    max(CASE WHEN arm = 'B' THEN n END) AS nb,
        |    max(CASE WHEN arm = 'B' THEN c END) AS cb
        |  FROM g)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(ca AS BIGINT) AS conv_a,
        |  CAST(nb AS BIGINT) AS n_b, CAST(cb AS BIGINT) AS conv_b,
        |  round(ca / CAST(na AS DOUBLE) - cb / CAST(nb AS DOUBLE), 4)
        |    AS lift,
        |  round((ca / CAST(na AS DOUBLE) - cb / CAST(nb AS DOUBLE))
        |    / nullif(sqrt(((ca + cb) / CAST(na + nb AS DOUBLE))
        |      * (1 - (ca + cb) / CAST(na + nb AS DOUBLE))
        |      * (1.0 / na + 1.0 / nb)), 0), 4) AS z_stat,
        |  CAST(abs((ca / CAST(na AS DOUBLE) - cb / CAST(nb AS DOUBLE))
        |    / nullif(sqrt(((ca + cb) / CAST(na + nb AS DOUBLE))
        |      * (1 - (ca + cb) / CAST(na + nb AS DOUBLE))
        |      * (1.0 / na + 1.0 / nb)), 0)) > 1.96 AS BOOLEAN) AS significant
        |FROM w""") { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy(col("user_id"),
          when(substring(md5(col("user_id").cast("string")), 1, 1) < "8", "A")
            .otherwise("B").as("arm"))
        .agg(max(when(col("event_type") === "purchase" && col("value") > 150,
          1).otherwise(0)).as("conv"))
      val w = u.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
        .agg(max(when(col("arm") === "A", col("n"))).as("na"),
          max(when(col("arm") === "A", col("c"))).as("ca"),
          max(when(col("arm") === "B", col("n"))).as("nb"),
          max(when(col("arm") === "B", col("c"))).as("cb"))
      val pa = col("ca") / col("na").cast("double")
      val pb = col("cb") / col("nb").cast("double")
      val pp = (col("ca") + col("cb")) / (col("na") + col("nb")).cast("double")
      val z = (pa - pb) / nullif(sqrt(pp * (lit(1) - pp) *
        (lit(1.0) / col("na") + lit(1.0) / col("nb"))), lit(0d))
      w.select(col("na").cast("long").as("n_a"),
        col("ca").cast("long").as("conv_a"),
        col("nb").cast("long").as("n_b"),
        col("cb").cast("long").as("conv_b"),
        round(pa - pb, 4).as("lift"),
        round(z, 4).as("z_stat"),
        (abs(z) > 1.96).as("significant"))
    },

    // FLEISS' KAPPA multi-rater agreement (Fleiss 1971) — the
    // chance-corrected agreement score for >2 annotators that Cohen's
    // kappa (eval_kappa) can't express. Three deterministic raters are
    // derived per item: each keeps the item's base category with md5
    // probability 12/16 and otherwise reports an md5-derived category —
    // a fixed labeling protocol both engines replay bit-identically, so
    // the statistic (not a random fixture) is what's under test. The
    // per-item agreement P_i = (Σn_ij² − n)/(n(n−1)) keeps its integer
    // NUMERATOR through the corpus sum (denominator 6 applied once at
    // the end — no per-item float), marginal P_e terms are
    // DECIMAL-quantized before their 3-row sum; one (item, category)
    // rollup is the only corpus-scale shuffle.
    Q("eval_fleiss_kappa",
      """WITH it AS (SELECT event_id,
        |    CASE WHEN event_type IN ('click', 'view') THEN 0
        |         WHEN event_type IN ('purchase', 'signup') THEN 1
        |         ELSE 2 END AS base
        |  FROM events WHERE event_id % 7 = 0),
        |rt AS (SELECT it.event_id, r.r,
        |    CASE WHEN substr(md5(CAST(it.event_id AS VARCHAR) || ':'
        |        || CAST(r.r AS VARCHAR)), 1, 1) < 'c' THEN it.base
        |      ELSE CAST(('0x' || substr(md5(CAST(it.event_id AS VARCHAR)
        |        || ':' || CAST(r.r AS VARCHAR)), 2, 1))::BIGINT % 3 AS INT)
        |    END AS cat
        |  FROM it CROSS JOIN (SELECT unnest([0, 1, 2]) AS r) r),
        |nij AS (SELECT event_id, cat, count(*) AS n FROM rt GROUP BY 1, 2),
        |pi AS (SELECT event_id, sum(n * n) - 3 AS pin FROM nij GROUP BY 1),
        |np AS (SELECT count(*) AS n_items, sum(pin) AS pn FROM pi),
        |cj AS (SELECT cat, sum(n) AS cn FROM nij GROUP BY 1),
        |pe AS (SELECT sum(CAST(round(
        |    (cn / CAST(3 * np.n_items AS DOUBLE))
        |      * (cn / CAST(3 * np.n_items AS DOUBLE)), 12)
        |    AS DECIMAL(18,12))) AS pe
        |  FROM cj CROSS JOIN np)
        |SELECT CAST(np.n_items AS BIGINT) AS n_items,
        |  round(np.pn / (6.0 * np.n_items), 4) AS p_bar,
        |  round(CAST(pe.pe AS DOUBLE), 4) AS p_e,
        |  round((np.pn / (6.0 * np.n_items) - CAST(pe.pe AS DOUBLE))
        |    / (1 - CAST(pe.pe AS DOUBLE)), 4) AS kappa
        |FROM np CROSS JOIN pe""") { (s, d) =>
      val it = Tables.events(s, d)
        .filter(col("event_id") % 7 === 0)
        .select(col("event_id"),
          when(col("event_type").isin("click", "view"), 0)
            .when(col("event_type").isin("purchase", "signup"), 1)
            .otherwise(2).as("base"))
      val raters = s.range(0, 3).select(col("id").cast("int").as("r"))
      val h = md5(concat(col("event_id").cast("string"), lit(":"),
        col("r").cast("string")))
      val rt = it.crossJoin(broadcast(raters))
        .select(col("event_id"),
          when(substring(h, 1, 1) < "c", col("base"))
            .otherwise((expr(
              """CAST(conv(substr(md5(concat(CAST(event_id AS STRING), ':',
                |  CAST(r AS STRING))), 2, 1), 16, 10) AS BIGINT)"""
                .stripMargin) % 3).cast("int")).as("cat"))
      val nij = rt.groupBy(col("event_id"), col("cat"))
        .agg(count(lit(1)).as("n"))
      val np = nij.groupBy(col("event_id"))
        .agg((sum(col("n") * col("n")) - 3).as("pin"))
        .agg(count(lit(1)).as("n_items"), sum(col("pin")).as("pn"))
      val pterm = col("cn") / (lit(3) * col("n_items")).cast("double")
      val pe = nij.groupBy(col("cat")).agg(sum(col("n")).as("cn"))
        .crossJoin(broadcast(np))
        .select(round(pterm * pterm, 12).cast("decimal(18,12)").as("term"))
        .agg(sum(col("term")).as("pe"))
      val pbar = col("pn") / (lit(6.0) * col("n_items"))
      np.crossJoin(broadcast(pe))
        .select(col("n_items").cast("long").as("n_items"),
          round(pbar, 4).as("p_bar"),
          round(col("pe").cast("double"), 4).as("p_e"),
          round((pbar - col("pe").cast("double")) /
            (lit(1) - col("pe").cast("double")), 4).as("kappa"))
    },

    // WELCH'S TWO-SAMPLE t-TEST on per-user total spend by hash arm —
    // the continuous-metric companion to eval_ab_ztest (proportions).
    // Unequal variances are the realistic default for revenue metrics,
    // so the Welch form (separate variance terms + Satterthwaite df) is
    // what an experimentation platform actually ships. Determinism by
    // construction: the per-user metric is an EXACT decimal sum, and
    // the arm moments (n, Σx, Σx²) stay decimal until the final scalar
    // algebra — both engines then run the identical IEEE expression on
    // identical inputs. Scale: one user-keyed rollup + one 2-row
    // aggregate; partial-aggregable, partition-count invariant.
    Q("eval_ttest_welch",
      """WITH u AS (SELECT user_id,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |      THEN 'A' ELSE 'B' END AS arm,
        |    CAST(sum(CAST("value" AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS x
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT arm, count(*) AS n,
        |    CAST(sum(x) AS DOUBLE) AS s1,
        |    CAST(sum(x * x) AS DOUBLE) AS s2
        |  FROM u GROUP BY 1),
        |w AS (SELECT
        |    max(CASE WHEN arm = 'A' THEN n END) AS na,
        |    max(CASE WHEN arm = 'A' THEN s1 END) AS s1a,
        |    max(CASE WHEN arm = 'A' THEN s2 END) AS s2a,
        |    max(CASE WHEN arm = 'B' THEN n END) AS nb,
        |    max(CASE WHEN arm = 'B' THEN s1 END) AS s1b,
        |    max(CASE WHEN arm = 'B' THEN s2 END) AS s2b
        |  FROM g),
        |v AS (SELECT na, nb, s1a / na AS ma, s1b / nb AS mb,
        |    (s2a - s1a * s1a / na) / (na - 1) AS va,
        |    (s2b - s1b * s1b / nb) / (nb - 1) AS vb
        |  FROM w)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  round(ma, 4) AS mean_a, round(mb, 4) AS mean_b,
        |  round((ma - mb) / nullif(sqrt(va / na + vb / nb), 0), 4)
        |    AS t_stat,
        |  round((va / na + vb / nb) * (va / na + vb / nb)
        |    / nullif((va / na) * (va / na) / (na - 1)
        |           + (vb / nb) * (vb / nb) / (nb - 1), 0), 4) AS df,
        |  round((ma - mb) / nullif(sqrt(((na - 1) * va + (nb - 1) * vb)
        |    / (na + nb - 2)), 0), 4) AS cohens_d,
        |  CAST(abs((ma - mb) / nullif(sqrt(va / na + vb / nb), 0)) > 1.96
        |    AS BOOLEAN) AS significant
        |FROM v""") { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy(col("user_id"),
          when(substring(md5(col("user_id").cast("string")), 1, 1) < "8", "A")
            .otherwise("B").as("arm"))
        .agg(sum(col("value").cast("decimal(18,4)"))
          .cast("decimal(18,4)").as("x"))
      val w = u.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).cast("double").as("s1"),
          sum(col("x") * col("x")).cast("double").as("s2"))
        .agg(max(when(col("arm") === "A", col("n"))).as("na"),
          max(when(col("arm") === "A", col("s1"))).as("s1a"),
          max(when(col("arm") === "A", col("s2"))).as("s2a"),
          max(when(col("arm") === "B", col("n"))).as("nb"),
          max(when(col("arm") === "B", col("s1"))).as("s1b"),
          max(when(col("arm") === "B", col("s2"))).as("s2b"))
      val v = w.select(col("na"), col("nb"),
        (col("s1a") / col("na")).as("ma"),
        (col("s1b") / col("nb")).as("mb"),
        ((col("s2a") - col("s1a") * col("s1a") / col("na"))
          / (col("na") - 1)).as("va"),
        ((col("s2b") - col("s1b") * col("s1b") / col("nb"))
          / (col("nb") - 1)).as("vb"))
      val sea = col("va") / col("na")
      val seb = col("vb") / col("nb")
      val t = (col("ma") - col("mb")) / nullif(sqrt(sea + seb), lit(0d))
      v.select(col("na").cast("long").as("n_a"),
        col("nb").cast("long").as("n_b"),
        round(col("ma"), 4).as("mean_a"),
        round(col("mb"), 4).as("mean_b"),
        round(t, 4).as("t_stat"),
        round((sea + seb) * (sea + seb) /
          nullif(sea * sea / (col("na") - 1)
            + seb * seb / (col("nb") - 1), lit(0d)), 4).as("df"),
        round((col("ma") - col("mb")) /
          nullif(sqrt(((col("na") - 1) * col("va")
            + (col("nb") - 1) * col("vb"))
            / (col("na") + col("nb") - 2)), lit(0d)), 4).as("cohens_d"),
        (abs(t) > 1.96).as("significant"))
    },

    // MANN-WHITNEY U (Wilcoxon rank-sum) with tie correction — the
    // nonparametric A/B test for skewed metrics where the t-test's
    // normality assumption fails (revenue is the canonical case). The
    // scale move mirrors eval_auc: ranks are NEVER assigned by sorting
    // raw rows — users collapse to an integer metric, the metric
    // collapses to DISTINCT values with per-arm counts, and ONE window
    // over the distinct-value relation (bounded by metric cardinality,
    // not corpus size) assigns tied-average ranks. The tie term
    // Σ(t³−t) rides the same rollup. All rank algebra is exact
    // (integer counts, .0/.5 average ranks), so z is bit-stable.
    Q("eval_mannwhitney",
      """WITH u AS (SELECT user_id,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |      THEN 'A' ELSE 'B' END AS arm,
        |    CAST(floor(CAST(sum(CAST("value" AS DECIMAL(18,4)))
        |      AS DOUBLE) / 100) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |dv AS (SELECT v,
        |    sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS ca,
        |    count(*) AS c
        |  FROM u GROUP BY 1),
        |r AS (SELECT v, ca, c,
        |    sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
        |      AS cb
        |  FROM dv),
        |st AS (SELECT sum(ca * (cb + (c + 1) / 2.0)) AS ra,
        |    sum(c * c * c - c) AS ties FROM r),
        |n AS (SELECT
        |    sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS na,
        |    sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS nb
        |  FROM u),
        |z AS (SELECT na, nb, na + nb AS nn,
        |    ra - na * (na + 1) / 2.0 AS u_a, ties
        |  FROM st CROSS JOIN n)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  round(u_a, 1) AS u_stat,
        |  round((u_a - na * nb / 2.0)
        |    / nullif(sqrt((na * nb / 12.0)
        |      * ((nn + 1) - ties / (CAST(nn AS DOUBLE) * (nn - 1)))), 0), 4)
        |    AS z_stat,
        |  CAST(abs((u_a - na * nb / 2.0)
        |    / nullif(sqrt((na * nb / 12.0)
        |      * ((nn + 1) - ties / (CAST(nn AS DOUBLE) * (nn - 1)))), 0))
        |    > 1.96 AS BOOLEAN) AS significant
        |FROM z""") { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy(col("user_id"),
          when(substring(md5(col("user_id").cast("string")), 1, 1) < "8", "A")
            .otherwise("B").as("arm"))
        .agg(floor(sum(col("value").cast("decimal(18,4)"))
          .cast("double") / 100).cast("long").as("v"))
      val dv = u.groupBy(col("v"))
        .agg(sum(when(col("arm") === "A", 1).otherwise(0)).as("ca"),
          count(lit(1)).as("c"))
      val win = Window.orderBy(col("v")).rowsBetween(Window.unboundedPreceding, 0)
      val r = dv.withColumn("cb", sum(col("c")).over(win) - col("c"))
      val st = r.agg(
        sum(col("ca") * (col("cb") + (col("c") + 1) / 2.0)).as("ra"),
        sum(col("c") * col("c") * col("c") - col("c")).as("ties"))
      val n = u.agg(
        sum(when(col("arm") === "A", 1).otherwise(0)).as("na"),
        sum(when(col("arm") === "B", 1).otherwise(0)).as("nb"))
      val z = st.crossJoin(broadcast(n))
        .select(col("na"), col("nb"), (col("na") + col("nb")).as("nn"),
          (col("ra") - col("na") * (col("na") + 1) / 2.0).as("u_a"),
          col("ties"))
      val zs = (col("u_a") - col("na") * col("nb") / 2.0) /
        nullif(sqrt((col("na") * col("nb") / 12.0) *
          ((col("nn") + 1) - col("ties") /
            (col("nn").cast("double") * (col("nn") - 1)))), lit(0d))
      z.select(col("na").cast("long").as("n_a"),
        col("nb").cast("long").as("n_b"),
        round(col("u_a"), 1).as("u_stat"),
        round(zs, 4).as("z_stat"),
        (abs(zs) > 1.96).as("significant"))
    },

    // CUPED variance reduction (Deng et al., WSDM'13) — adjust the
    // experiment metric by the pre-period covariate: θ = cov(X,Y)/var(X)
    // over users, adjusted mean = E[Y|arm] − θ·(E[X|arm] − E[X]). The
    // workhorse of modern experimentation platforms: same decision, far
    // tighter confidence intervals. Pre/post split at the fixture's
    // mid-point epoch. All co-moments are exact decimal sums (ΣX, ΣY,
    // ΣXY, ΣX²) pushed to one user rollup + one scalar aggregate; θ and
    // the arm means meet in a 2-row broadcast cross join — no second
    // pass over the data, which is the property that matters at 100 TB.
    Q("eval_cuped",
      """WITH u AS (SELECT user_id,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |      THEN 'A' ELSE 'B' END AS arm,
        |    CAST(sum(CASE WHEN epoch(ts) < 1705363200
        |      THEN CAST("value" AS DECIMAL(18,4))
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS x,
        |    CAST(sum(CASE WHEN epoch(ts) >= 1705363200
        |      THEN CAST("value" AS DECIMAL(18,4))
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS y
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT count(*) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum(x * y) AS DOUBLE) AS sxy,
        |    CAST(sum(x * x) AS DOUBLE) AS sxx
        |  FROM u),
        |th AS (SELECT sx / n AS xbar,
        |    (sxy - sx * sy / n) / nullif(sxx - sx * sx / n, 0) AS theta
        |  FROM m),
        |a AS (SELECT arm, count(*) AS users,
        |    CAST(sum(y) AS DOUBLE) / count(*) AS my,
        |    CAST(sum(x) AS DOUBLE) / count(*) AS mx
        |  FROM u GROUP BY 1)
        |SELECT arm, CAST(users AS BIGINT) AS users,
        |  round(my, 4) AS mean_post,
        |  round(my - theta * (mx - xbar), 4) AS mean_cuped,
        |  round(theta, 4) AS theta
        |FROM a CROSS JOIN th ORDER BY arm""") { (s, d) =>
      val dec = col("value").cast("decimal(18,4)")
      val zero = lit(0).cast("decimal(18,4)")
      val u = Tables.events(s, d)
        .groupBy(col("user_id"),
          when(substring(md5(col("user_id").cast("string")), 1, 1) < "8", "A")
            .otherwise("B").as("arm"))
        .agg(
          sum(when(unix_timestamp(col("ts")) < 1705363200L, dec)
            .otherwise(zero)).cast("decimal(18,4)").as("x"),
          sum(when(unix_timestamp(col("ts")) >= 1705363200L, dec)
            .otherwise(zero)).cast("decimal(18,4)").as("y"))
      val m = u.agg(count(lit(1)).as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("y")).cast("double").as("sxy"),
        sum(col("x") * col("x")).cast("double").as("sxx"))
      val th = m.select((col("sx") / col("n")).as("xbar"),
        ((col("sxy") - col("sx") * col("sy") / col("n")) /
          nullif(col("sxx") - col("sx") * col("sx") / col("n"), lit(0d)))
          .as("theta"))
      val a = u.groupBy(col("arm"))
        .agg(count(lit(1)).as("users"),
          (sum(col("y")).cast("double") / count(lit(1))).as("my"),
          (sum(col("x")).cast("double") / count(lit(1))).as("mx"))
      a.crossJoin(broadcast(th))
        .select(col("arm"), col("users").cast("long").as("users"),
          round(col("my"), 4).as("mean_post"),
          round(col("my") - col("theta") * (col("mx") - col("xbar")), 4)
            .as("mean_cuped"),
          round(col("theta"), 4).as("theta"))
        .orderBy(col("arm"))
    },

    // KENDALL'S τ-b rank correlation between two per-nation metrics
    // (customer count vs total account balance) — the concordance
    // statistic eval_spearman can't express (τ counts pair inversions;
    // ρ correlates rank values). The pair join is over the AGGREGATED
    // relation (25 nations → 300 pairs), never the raw rows — the same
    // collapse-then-quadratic shape as ts_ewma: at 100 TB the rollup is
    // the only corpus-scale pass, and the τ join stays O(groups²).
    // Comparisons are on exact values (integer count, decimal→double
    // balance), so concordant/discordant/tie counts are bit-stable.
    // Tie terms follow the standard τ-b denominator: tx counts ALL
    // pairs tied on x (and ty all pairs tied on y), INCLUDING pairs
    // tied on both metrics — excluding double-ties understates |τ-b|
    // (Kendall 1945 form: τ_b = (C−D)/√((n0−tx)(n0−ty))).
    Q("eval_kendall_tau",
      """WITH m AS (SELECT c_nationkey AS nk, count(*) AS x,
        |    CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS y
        |  FROM customer GROUP BY 1),
        |p AS (SELECT a.x AS xa, a.y AS ya, b.x AS xb, b.y AS yb
        |  FROM m a JOIN m b ON a.nk < b.nk),
        |s AS (SELECT count(*) AS n0,
        |    sum(CASE WHEN (xa < xb AND ya < yb) OR (xa > xb AND ya > yb)
        |      THEN 1 ELSE 0 END) AS conc,
        |    sum(CASE WHEN (xa < xb AND ya > yb) OR (xa > xb AND ya < yb)
        |      THEN 1 ELSE 0 END) AS disc,
        |    sum(CASE WHEN xa = xb THEN 1 ELSE 0 END) AS tx,
        |    sum(CASE WHEN ya = yb THEN 1 ELSE 0 END) AS ty
        |  FROM p)
        |SELECT CAST(n0 AS BIGINT) AS n_pairs,
        |  CAST(conc AS BIGINT) AS concordant,
        |  CAST(disc AS BIGINT) AS discordant,
        |  round((conc - disc)
        |    / nullif(sqrt(CAST((n0 - tx) AS DOUBLE) * (n0 - ty)), 0), 4)
        |    AS tau_b
        |FROM s""") { (s, d) =>
      val m = Tables.customer(s, d)
        .groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("x"),
          sum(col("c_acctbal").cast("decimal(18,2)"))
            .cast("double").as("y"))
      val p = m.as("a").join(m.as("b"), col("a.nk") < col("b.nk"))
        .select(col("a.x").as("xa"), col("a.y").as("ya"),
          col("b.x").as("xb"), col("b.y").as("yb"))
      val st = p.agg(count(lit(1)).as("n0"),
        sum(when((col("xa") < col("xb") && col("ya") < col("yb")) ||
          (col("xa") > col("xb") && col("ya") > col("yb")), 1)
          .otherwise(0)).as("conc"),
        sum(when((col("xa") < col("xb") && col("ya") > col("yb")) ||
          (col("xa") > col("xb") && col("ya") < col("yb")), 1)
          .otherwise(0)).as("disc"),
        sum(when(col("xa") === col("xb"), 1).otherwise(0)).as("tx"),
        sum(when(col("ya") === col("yb"), 1).otherwise(0)).as("ty"))
      st.select(col("n0").cast("long").as("n_pairs"),
        col("conc").cast("long").as("concordant"),
        col("disc").cast("long").as("discordant"),
        round((col("conc") - col("disc")) /
          nullif(sqrt((col("n0") - col("tx")).cast("double") *
            (col("n0") - col("ty"))), lit(0d)), 4).as("tau_b"))
    },

    // POWER / MDE analysis for the two-proportion test — the question
    // every experimenter asks BEFORE shipping: "is this test even able
    // to detect the effect we saw?" From the observed arm sizes and the
    // pooled rate: MDE at (α=.05, power=.80) via the standard
    // (z_{α/2}+z_{β})·SE closed form, and the per-arm n required to
    // power the OBSERVED lift. Pure scalar algebra on one user rollup —
    // the z constants are exact double literals in both engines.
    Q("eval_power_mde",
      """WITH u AS (SELECT user_id,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |      THEN 'A' ELSE 'B' END AS arm,
        |    max(CASE WHEN event_type = 'purchase' AND "value" > 150
        |      THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT arm, count(*) AS n, sum(conv) AS c FROM u GROUP BY 1),
        |w AS (SELECT
        |    max(CASE WHEN arm = 'A' THEN n END) AS na,
        |    max(CASE WHEN arm = 'A' THEN c END) AS ca,
        |    max(CASE WHEN arm = 'B' THEN n END) AS nb,
        |    max(CASE WHEN arm = 'B' THEN c END) AS cb
        |  FROM g),
        |v AS (SELECT na, nb, ca / CAST(na AS DOUBLE) AS pa,
        |    cb / CAST(nb AS DOUBLE) AS pb,
        |    (ca + cb) / CAST(na + nb AS DOUBLE) AS pp
        |  FROM w)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  round(pa, 4) AS rate_a, round(pb, 4) AS rate_b,
        |  round((1.96 + 0.8416)
        |    * sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb)), 4) AS mde_abs,
        |  CAST(ceil(2 * pp * (1 - pp) * (1.96 + 0.8416) * (1.96 + 0.8416)
        |    / nullif(abs(pa - pb) * abs(pa - pb), 0)) AS BIGINT)
        |    AS n_required,
        |  CAST(abs(pa - pb) >= (1.96 + 0.8416)
        |    * sqrt(pp * (1 - pp) * (1.0 / na + 1.0 / nb)) AS BOOLEAN)
        |    AS powered
        |FROM v""") { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy(col("user_id"),
          when(substring(md5(col("user_id").cast("string")), 1, 1) < "8", "A")
            .otherwise("B").as("arm"))
        .agg(max(when(col("event_type") === "purchase" && col("value") > 150,
          1).otherwise(0)).as("conv"))
      val w = u.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
        .agg(max(when(col("arm") === "A", col("n"))).as("na"),
          max(when(col("arm") === "A", col("c"))).as("ca"),
          max(when(col("arm") === "B", col("n"))).as("nb"),
          max(when(col("arm") === "B", col("c"))).as("cb"))
      val v = w.select(col("na"), col("nb"),
        (col("ca") / col("na").cast("double")).as("pa"),
        (col("cb") / col("nb").cast("double")).as("pb"),
        ((col("ca") + col("cb")) / (col("na") + col("nb")).cast("double"))
          .as("pp"))
      val zsum = lit(1.96) + lit(0.8416)
      val mde = zsum * sqrt(col("pp") * (lit(1) - col("pp")) *
        (lit(1.0) / col("na") + lit(1.0) / col("nb")))
      v.select(col("na").cast("long").as("n_a"),
        col("nb").cast("long").as("n_b"),
        round(col("pa"), 4).as("rate_a"),
        round(col("pb"), 4).as("rate_b"),
        round(mde, 4).as("mde_abs"),
        ceil(lit(2) * col("pp") * (lit(1) - col("pp")) * zsum * zsum /
          nullif(abs(col("pa") - col("pb")) * abs(col("pa") - col("pb")),
            lit(0d))).cast("long").as("n_required"),
        (abs(col("pa") - col("pb")) >= mde).as("powered"))
    },

    // PAIRED t-TEST on per-user pre→post spend deltas — the
    // within-subject design (each user is their own control), which
    // eliminates between-user variance entirely rather than modeling it
    // away (CUPED's regression form). The difference series d_u = y−x
    // is an exact decimal per user; (n, Σd, Σd²) stay decimal to the
    // final t = d̄/(s_d/√n). One user rollup + one scalar aggregate.
    Q("eval_ttest_paired",
      """WITH u AS (SELECT user_id,
        |    CAST(sum(CASE WHEN epoch(ts) < 1705363200
        |      THEN CAST("value" AS DECIMAL(18,4))
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS x,
        |    CAST(sum(CASE WHEN epoch(ts) >= 1705363200
        |      THEN CAST("value" AS DECIMAL(18,4))
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS y
        |  FROM events GROUP BY 1),
        |m AS (SELECT count(*) AS n,
        |    CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |    CAST(sum((y - x) * (y - x)) AS DOUBLE) AS sdd
        |  FROM u),
        |v AS (SELECT n, sx / n AS mx, sy / n AS my,
        |    (sy - sx) / n AS md,
        |    (sdd - (sy - sx) * (sy - sx) / n) / (n - 1) AS vd
        |  FROM m)
        |SELECT CAST(n AS BIGINT) AS n_pairs,
        |  round(mx, 4) AS mean_pre, round(my, 4) AS mean_post,
        |  round(md, 4) AS mean_diff,
        |  round(md / nullif(sqrt(vd / n), 0), 4) AS t_stat,
        |  CAST(abs(md / nullif(sqrt(vd / n), 0)) > 1.96 AS BOOLEAN)
        |    AS significant
        |FROM v""") { (s, d) =>
      val dec = col("value").cast("decimal(18,4)")
      val zero = lit(0).cast("decimal(18,4)")
      val u = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          sum(when(unix_timestamp(col("ts")) < 1705363200L, dec)
            .otherwise(zero)).cast("decimal(18,4)").as("x"),
          sum(when(unix_timestamp(col("ts")) >= 1705363200L, dec)
            .otherwise(zero)).cast("decimal(18,4)").as("y"))
      val m = u.agg(count(lit(1)).as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum((col("y") - col("x")) * (col("y") - col("x")))
          .cast("double").as("sdd"))
      val v = m.select(col("n"),
        (col("sx") / col("n")).as("mx"),
        (col("sy") / col("n")).as("my"),
        ((col("sy") - col("sx")) / col("n")).as("md"),
        ((col("sdd") - (col("sy") - col("sx")) * (col("sy") - col("sx"))
          / col("n")) / (col("n") - 1)).as("vd"))
      val t = col("md") / nullif(sqrt(col("vd") / col("n")), lit(0d))
      v.select(col("n").cast("long").as("n_pairs"),
        round(col("mx"), 4).as("mean_pre"),
        round(col("my"), 4).as("mean_post"),
        round(col("md"), 4).as("mean_diff"),
        round(t, 4).as("t_stat"),
        (abs(t) > 1.96).as("significant"))
    },

    // DIFFERENCE-IN-DIFFERENCES — the quasi-experimental estimator for
    // a rollout without randomization: treated (arm A) vs control (B)
    // change across the pre/post boundary, DiD = (Ā_post − Ā_pre) −
    // (B̄_post − B̄_pre). The 2×2 cell means come from ONE (arm,
    // period) rollup of exact decimal event sums; the estimate is
    // scalar algebra on four cells. Parallel-trends is the analyst's
    // assumption — the operator's job is the exact cell arithmetic.
    Q("eval_diff_in_diff",
      """WITH c AS (SELECT
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |      THEN 'A' ELSE 'B' END AS arm,
        |    CASE WHEN epoch(ts) < 1705363200 THEN 'pre' ELSE 'post' END
        |      AS period,
        |    count(*) AS n,
        |    CAST(sum(CAST("value" AS DECIMAL(18,4))) AS DOUBLE) AS sv
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT
        |    max(CASE WHEN arm = 'A' AND period = 'pre' THEN sv / n END)
        |      AS a_pre,
        |    max(CASE WHEN arm = 'A' AND period = 'post' THEN sv / n END)
        |      AS a_post,
        |    max(CASE WHEN arm = 'B' AND period = 'pre' THEN sv / n END)
        |      AS b_pre,
        |    max(CASE WHEN arm = 'B' AND period = 'post' THEN sv / n END)
        |      AS b_post
        |  FROM c)
        |SELECT round(a_pre, 4) AS mean_a_pre,
        |  round(a_post, 4) AS mean_a_post,
        |  round(b_pre, 4) AS mean_b_pre,
        |  round(b_post, 4) AS mean_b_post,
        |  round((a_post - a_pre) - (b_post - b_pre), 4) AS did_estimate
        |FROM w""") { (s, d) =>
      val c = Tables.events(s, d)
        .groupBy(
          when(substring(md5(col("user_id").cast("string")), 1, 1) < "8", "A")
            .otherwise("B").as("arm"),
          when(unix_timestamp(col("ts")) < 1705363200L, "pre")
            .otherwise("post").as("period"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,4)")).cast("double").as("sv"))
      def cell(a: String, p: String) =
        max(when(col("arm") === a && col("period") === p,
          col("sv") / col("n")))
      val w = c.agg(cell("A", "pre").as("a_pre"),
        cell("A", "post").as("a_post"),
        cell("B", "pre").as("b_pre"),
        cell("B", "post").as("b_post"))
      w.select(round(col("a_pre"), 4).as("mean_a_pre"),
        round(col("a_post"), 4).as("mean_a_post"),
        round(col("b_pre"), 4).as("mean_b_pre"),
        round(col("b_post"), 4).as("mean_b_post"),
        round((col("a_post") - col("a_pre"))
          - (col("b_post") - col("b_pre")), 4).as("did_estimate"))
    },

    // HETEROGENEOUS TREATMENT EFFECT by spend segment — the per-segment
    // lift table behind "who did the experiment actually move?": users
    // quartile by total spend (fully tie-broken ntile semantics over
    // the USER aggregate, same discipline as rfm_segments), then per
    // segment the two arms' conversion rates and lift. The quartile cut
    // runs over users (≪ events) but users are unbounded, so it is
    // computed by Ranks.withNtile (range-repartition + per-partition
    // rank + offset rollup) — no single-partition window at any user
    // count; the DuckDB oracle keeps the ntile text and hash parity
    // proves the distributed cut bucket-identical. Everything else is
    // exact integer counts.
    Q("eval_hte_segments",
      """WITH u AS (SELECT user_id,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |      THEN 'A' ELSE 'B' END AS arm,
        |    CAST(sum(CAST("value" AS DECIMAL(18,4))) AS DECIMAL(18,4))
        |      AS spend,
        |    max(CASE WHEN event_type = 'purchase' AND "value" > 150
        |      THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1, 2),
        |q AS (SELECT user_id, arm, conv,
        |    CAST(ntile(4) OVER (ORDER BY spend, user_id) AS INT)
        |      AS segment
        |  FROM u),
        |g AS (SELECT segment,
        |    sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS na,
        |    sum(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS ca,
        |    sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS nb,
        |    sum(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS cb
        |  FROM q GROUP BY 1)
        |SELECT segment, CAST(na AS BIGINT) AS users_a,
        |  CAST(nb AS BIGINT) AS users_b,
        |  round(ca / CAST(na AS DOUBLE), 4) AS rate_a,
        |  round(cb / CAST(nb AS DOUBLE), 4) AS rate_b,
        |  round(ca / CAST(na AS DOUBLE) - cb / CAST(nb AS DOUBLE), 4)
        |    AS lift
        |FROM g ORDER BY segment""") { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy(col("user_id"),
          when(substring(md5(col("user_id").cast("string")), 1, 1) < "8", "A")
            .otherwise("B").as("arm"))
        .agg(sum(col("value").cast("decimal(18,4)"))
            .cast("decimal(18,4)").as("spend"),
          max(when(col("event_type") === "purchase" && col("value") > 150,
            1).otherwise(0)).as("conv"))
      val q = Ranks.withNtile(u,
        Seq(col("spend"), col("user_id")), 4, "segment")
      val g = q.groupBy(col("segment"))
        .agg(sum(when(col("arm") === "A", 1).otherwise(0)).as("na"),
          sum(when(col("arm") === "A", col("conv")).otherwise(0)).as("ca"),
          sum(when(col("arm") === "B", 1).otherwise(0)).as("nb"),
          sum(when(col("arm") === "B", col("conv")).otherwise(0)).as("cb"))
      g.select(col("segment"), col("na").cast("long").as("users_a"),
        col("nb").cast("long").as("users_b"),
        round(col("ca") / col("na").cast("double"), 4).as("rate_a"),
        round(col("cb") / col("nb").cast("double"), 4).as("rate_b"),
        round(col("ca") / col("na").cast("double")
          - col("cb") / col("nb").cast("double"), 4).as("lift"))
        .orderBy(col("segment"))
    },

    // SEQUENTIAL PROBABILITY RATIO TEST (Wald) trace — the always-valid
    // sequential monitor: per day, the Bernoulli log-likelihood-ratio
    // increment for H1: p=0.04 vs H0: p=0.02 over purchase-conversion
    // trials, the cumulative LLR, and the decision state against the
    // ±ln(19) (α=β=0.05) boundaries. Determinism discipline: the two
    // per-trial log terms are PRECOMPUTED design constants carried as
    // exact decimal literals (ln(2) ≈ 0.6931472, ln(0.96/0.98) ≈
    // −0.0206193) — no runtime ln, so no engine-libm ulp anywhere; the
    // increments, running sum, and boundary compares are all
    // exact-decimal arithmetic. One day rollup + one
    // day-grained window — the ts_* scale shape.
    Q("eval_sprt",
      """WITH dd AS (SELECT CAST(ts AS DATE) AS day, count(*) AS n,
        |    sum(CASE WHEN event_type = 'purchase' AND "value" > 150
        |      THEN 1 ELSE 0 END) AS c
        |  FROM events GROUP BY 1),
        |l AS (SELECT day, n, c,
        |    CAST(c * CAST(0.6931472 AS DECIMAL(9,7))
        |      - (n - c) * CAST(0.0206193 AS DECIMAL(9,7))
        |      AS DECIMAL(28,12)) AS llr
        |  FROM dd),
        |w AS (SELECT day, n, c, llr,
        |    sum(llr) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM l)
        |SELECT day, CAST(n AS BIGINT) AS n_trials,
        |  CAST(c AS BIGINT) AS conversions,
        |  round(CAST(llr AS DOUBLE), 4) AS llr_day,
        |  round(CAST(cum AS DOUBLE), 4) AS llr_cum,
        |  CASE WHEN cum >= CAST(2.944439 AS DECIMAL(28,12))
        |         THEN 'accept_h1'
        |       WHEN cum <= CAST(-2.944439 AS DECIMAL(28,12))
        |         THEN 'accept_h0'
        |       ELSE 'continue' END AS decision
        |FROM w ORDER BY day""") { (s, d) =>
      val dd = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "purchase" && col("value") > 150,
            1).otherwise(0)).as("c"))
      val l = dd.withColumn("llr",
        (col("c") * lit(0.6931472).cast("decimal(9,7)")
          - (col("n") - col("c")) * lit(0.0206193).cast("decimal(9,7)"))
          .cast("decimal(28,12)"))
      val cumw = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val w = l.withColumn("cum", sum(col("llr")).over(cumw))
      val bound = lit(2.944439).cast("decimal(28,12)")
      w.select(col("day"), col("n").cast("long").as("n_trials"),
          col("c").cast("long").as("conversions"),
          round(col("llr").cast("double"), 4).as("llr_day"),
          round(col("cum").cast("double"), 4).as("llr_cum"),
          when(col("cum") >= bound, "accept_h1")
            .when(col("cum") <= -bound, "accept_h0")
            .otherwise("continue").as("decision"))
        .orderBy(col("day"))
    },

    // ONE-WAY ANOVA across event types — "does the metric differ across
    // these k segments at all?", the omnibus test run before any
    // pairwise t-test family (eval_ttest_welch covers k=2). Classic
    // sums-of-squares decomposition from exact moments: per-group
    // (n, Σx, Σx²) with every term quantized to DECIMAL before the
    // order-free sum (docs/DETERMINISM.md rule 5), then
    // SSB = Σ s_g²/n_g − S²/N and SSW = SStot − Σ s_g²/n_g in plain
    // IEEE arithmetic on those exact aggregates — bit-stable at any
    // partitioning. One corpus pass, k-row rollup; the F ratio is
    // driver-free scalar algebra on a 1-row frame.
    Q("eval_anova_oneway",
      """WITH g AS (SELECT event_type AS grp,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round("value", 12) AS DECIMAL(28,12)))
        |      AS DOUBLE) AS s,
        |    CAST(sum(CAST(round("value" * "value", 12) AS DECIMAL(28,12)))
        |      AS DOUBLE) AS ss
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(n) AS BIGINT) AS nn, sum(s) AS st, sum(ss) AS sst,
        |    sum(s * s / n) AS sb FROM g)
        |SELECT k, nn AS n_total,
        |  round(sb - st * st / nn, 4) AS ss_between,
        |  round(sst - sb, 4) AS ss_within,
        |  round(((sb - st * st / nn) / (k - 1))
        |    / nullif((sst - sb) / (nn - k), 0), 4) AS f_stat
        |FROM t""") { (s, d) =>
      val g = Tables.events(s, d)
        .groupBy(col("event_type").as("grp"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value"), 12).cast("decimal(28,12)"))
            .cast("double").as("s"),
          sum(round(col("value") * col("value"), 12).cast("decimal(28,12)"))
            .cast("double").as("ss"))
      g.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
          sum(col("s")).as("st"), sum(col("ss")).as("sst"),
          sum(col("s") * col("s") / col("n")).as("sb"))
        .select(col("k").cast("long").as("k"),
          col("nn").cast("long").as("n_total"),
          round(col("sb") - col("st") * col("st") / col("nn"), 4)
            .as("ss_between"),
          round(col("sst") - col("sb"), 4).as("ss_within"),
          round(((col("sb") - col("st") * col("st") / col("nn"))
              / (col("k") - 1))
            / nullif((col("sst") - col("sb")) / (col("nn") - col("k")),
              lit(0d)), 4).as("f_stat"))
    },

    // McNEMAR'S TEST on paired binary predictions — the right test for
    // "is classifier B better than A on the SAME examples?" (a two-
    // proportion z-test ignores the pairing and wastes power). Two
    // deterministic md5-derived classifiers predict the high-value flag
    // per event; the statistic depends only on the DISCORDANT cells
    // b (A right, B wrong) and c (A wrong, B right):
    // χ² = (b−c)²/(b+c), continuity-corrected variant also emitted
    // ((|b−c|−1)²/(b+c), Edwards 1948). Pure integer cell counts from
    // one corpus pass — bit-stable by construction.
    Q("eval_mcnemar",
      """WITH p AS (SELECT
        |    ("value" > 50) AS y,
        |    (substring(md5(CAST(event_id AS VARCHAR) || '#a'), 1, 1)
        |      < '8') AS pa,
        |    (substring(md5(CAST(event_id AS VARCHAR) || '#b'), 1, 1)
        |      < 'a') AS pb
        |  FROM events),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN pa = y AND pb <> y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN pa <> y AND pb = y THEN 1 ELSE 0 END)
        |      AS BIGINT) AS c
        |  FROM p)
        |SELECT n, b AS only_a_correct, c AS only_b_correct,
        |  round((b - c) * (b - c) / CAST(nullif(b + c, 0) AS DOUBLE), 4)
        |    AS mcnemar_chi2,
        |  round((abs(b - c) - 1) * (abs(b - c) - 1)
        |    / CAST(nullif(b + c, 0) AS DOUBLE), 4) AS mcnemar_cc
        |FROM c""") { (s, d) =>
      val p = Tables.events(s, d).select(
        (col("value") > 50).as("y"),
        (substring(md5(concat(col("event_id").cast("string"), lit("#a"))),
          1, 1) < "8").as("pa"),
        (substring(md5(concat(col("event_id").cast("string"), lit("#b"))),
          1, 1) < "a").as("pb"))
      p.agg(count(lit(1)).as("n"),
          sum(when(col("pa") === col("y") && col("pb") =!= col("y"), 1)
            .otherwise(0)).as("b"),
          sum(when(col("pa") =!= col("y") && col("pb") === col("y"), 1)
            .otherwise(0)).as("c"))
        .select(col("n").cast("long").as("n"),
          col("b").cast("long").as("only_a_correct"),
          col("c").cast("long").as("only_b_correct"),
          round((col("b") - col("c")) * (col("b") - col("c"))
            / nullif(col("b") + col("c"), lit(0)).cast("double"), 4)
            .as("mcnemar_chi2"),
          round((abs(col("b") - col("c")) - 1)
              * (abs(col("b") - col("c")) - 1)
            / nullif(col("b") + col("c"), lit(0)).cast("double"), 4)
            .as("mcnemar_cc"))
    },

    // TOST EQUIVALENCE TEST (two one-sided tests, Schuirmann 1987) —
    // the experiment readout eval_ttest_welch CANNOT give: failing to
    // reject "no difference" never shows the arms are the SAME; TOST
    // rejects both "diff ≤ −δ" and "diff ≥ +δ" to conclude equivalence
    // within margin δ (here δ = 5.0 on the event value, an absolute
    // margin). Large-sample z form (dfs in the thousands, so the
    // normal quantile 1.6449 — a literal, no libm quantile function):
    // equivalent ⟺ min(t_lower, t_upper) > 1.6449. Same md5 arm split
    // and DECIMAL-quantized exact moments as the Welch test; se is one
    // sqrt on exact aggregates.
    Q("eval_tost",
      """WITH u AS (SELECT
        |    CASE WHEN substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
        |      < '8' THEN 'A' ELSE 'B' END AS arm,
        |    "value" AS x FROM events),
        |m AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(x, 12) AS DECIMAL(28,12))) AS DOUBLE)
        |      AS s,
        |    CAST(sum(CAST(round(x * x, 12) AS DECIMAL(28,12))) AS DOUBLE)
        |      AS ss
        |  FROM u GROUP BY 1),
        |w AS (SELECT
        |    max(CASE WHEN arm = 'A' THEN n END) AS na,
        |    max(CASE WHEN arm = 'B' THEN n END) AS nb,
        |    max(CASE WHEN arm = 'A' THEN s / n END) AS ma,
        |    max(CASE WHEN arm = 'B' THEN s / n END) AS mb,
        |    max(CASE WHEN arm = 'A' THEN (ss - s * s / n) / (n - 1) END)
        |      AS va,
        |    max(CASE WHEN arm = 'B' THEN (ss - s * s / n) / (n - 1) END)
        |      AS vb
        |  FROM m)
        |SELECT round(ma, 4) AS mean_a, round(mb, 4) AS mean_b,
        |  round(ma - mb, 4) AS diff,
        |  round(sqrt(va / na + vb / nb), 4) AS se,
        |  round((ma - mb + 5.0) / sqrt(va / na + vb / nb), 4) AS t_lower,
        |  round((5.0 - (ma - mb)) / sqrt(va / na + vb / nb), 4)
        |    AS t_upper,
        |  CASE WHEN (ma - mb + 5.0) / sqrt(va / na + vb / nb) > 1.6449
        |        AND (5.0 - (ma - mb)) / sqrt(va / na + vb / nb) > 1.6449
        |       THEN 1 ELSE 0 END AS equivalent
        |FROM w""") { (s, d) =>
      val u = Tables.events(s, d).select(
        when(substring(md5(col("user_id").cast("string")), 1, 1) < "8", "A")
          .otherwise("B").as("arm"),
        col("value").as("x"))
      val m = u.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("x"), 12).cast("decimal(28,12)"))
            .cast("double").as("s"),
          sum(round(col("x") * col("x"), 12).cast("decimal(28,12)"))
            .cast("double").as("ss"))
      val w = m.agg(
        max(when(col("arm") === "A", col("n"))).as("na"),
        max(when(col("arm") === "B", col("n"))).as("nb"),
        max(when(col("arm") === "A", col("s") / col("n"))).as("ma"),
        max(when(col("arm") === "B", col("s") / col("n"))).as("mb"),
        max(when(col("arm") === "A",
          (col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1)))
          .as("va"),
        max(when(col("arm") === "B",
          (col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1)))
          .as("vb"))
      val se = sqrt(col("va") / col("na") + col("vb") / col("nb"))
      val tl = (col("ma") - col("mb") + 5.0) / se
      val tu = (lit(5.0) - (col("ma") - col("mb"))) / se
      w.select(round(col("ma"), 4).as("mean_a"),
        round(col("mb"), 4).as("mean_b"),
        round(col("ma") - col("mb"), 4).as("diff"),
        round(se, 4).as("se"),
        round(tl, 4).as("t_lower"), round(tu, 4).as("t_upper"),
        when(tl > 1.6449 && tu > 1.6449, 1).otherwise(0).as("equivalent"))
    },

    // WILCOXON SIGNED-RANK — the paired nonparametric test (the
    // rank-based twin of eval_ttest_paired, as eval_mannwhitney is of
    // eval_ttest_welch): per-user pre/post revenue (the eval_cuped
    // epoch split), zero differences dropped per the classic
    // procedure, |d| quantized to integer units (the fixed-precision
    // discipline of this file's header — rank algebra runs over
    // DISTINCT quantized magnitudes with per-sign counts, so the ONE
    // unpartitioned window is over an aggregate-reduced relation
    // bounded by the magnitude grammar, never the corpus). Tied
    // magnitudes get exact .0/.5 average ranks; the normal
    // approximation carries the standard Σ(t³−t)/48 tie correction.
    // W⁺ and all counts are exact integers/halves, so z is bit-stable.
    Q("eval_wilcoxon_signed",
      """WITH u AS (SELECT user_id,
        |    CAST(sum(CASE WHEN epoch(ts) < 1705363200
        |      THEN CAST("value" AS DECIMAL(18,4))
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS x,
        |    CAST(sum(CASE WHEN epoch(ts) >= 1705363200
        |      THEN CAST("value" AS DECIMAL(18,4))
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS y
        |  FROM events GROUP BY 1),
        |p AS (SELECT
        |    CAST(floor(abs(CAST(y - x AS DOUBLE))) AS BIGINT) AS dq,
        |    CASE WHEN y > x THEN 1 ELSE 0 END AS pos
        |  FROM u),
        |f AS (SELECT dq, pos FROM p WHERE dq >= 1),
        |dv AS (SELECT dq, count(*) AS c, sum(pos) AS cp
        |  FROM f GROUP BY 1),
        |r AS (SELECT dq, c, cp,
        |    sum(c) OVER (ORDER BY dq
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS cb
        |  FROM dv),
        |st AS (SELECT sum(c) AS n,
        |    sum(cp * (cb + (c + 1) / 2.0)) AS wp,
        |    sum(c * c * c - c) AS ties
        |  FROM r)
        |SELECT CAST(n AS BIGINT) AS n_pairs,
        |  round(wp, 1) AS w_plus,
        |  round((wp - n * (n + 1) / 4.0)
        |    / nullif(sqrt(n * (n + 1) * (2 * n + 1) / 24.0 - ties / 48.0),
        |        0), 4) AS z_stat,
        |  CAST(abs((wp - n * (n + 1) / 4.0)
        |    / nullif(sqrt(n * (n + 1) * (2 * n + 1) / 24.0 - ties / 48.0),
        |        0)) > 1.96 AS BOOLEAN) AS significant
        |FROM st""") { (s, d) =>
      val dec = col("value").cast("decimal(18,4)")
      val zero = lit(0).cast("decimal(18,4)")
      val u = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(
          sum(when(unix_timestamp(col("ts")) < 1705363200L, dec)
            .otherwise(zero)).cast("decimal(18,4)").as("x"),
          sum(when(unix_timestamp(col("ts")) >= 1705363200L, dec)
            .otherwise(zero)).cast("decimal(18,4)").as("y"))
      val f = u.select(
          floor(abs((col("y") - col("x")).cast("double"))).cast("long")
            .as("dq"),
          when(col("y") > col("x"), 1).otherwise(0).as("pos"))
        .filter(col("dq") >= 1)
      val dv = f.groupBy(col("dq"))
        .agg(count(lit(1)).as("c"), sum(col("pos")).as("cp"))
      val win = Window.orderBy(col("dq"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val r = dv.withColumn("cb", sum(col("c")).over(win) - col("c"))
      val st = r.agg(sum(col("c")).as("n"),
        sum(col("cp") * (col("cb") + (col("c") + 1) / 2.0)).as("wp"),
        sum(col("c") * col("c") * col("c") - col("c")).as("ties"))
      val z = (col("wp") - col("n") * (col("n") + 1) / 4.0) /
        nullif(sqrt(col("n") * (col("n") + 1) * (col("n") * 2 + 1) / 24.0 -
          col("ties") / 48.0), lit(0d))
      st.select(col("n").cast("long").as("n_pairs"),
        round(col("wp"), 1).as("w_plus"),
        round(z, 4).as("z_stat"),
        (abs(z) > 1.96).as("significant"))
    },

    // CLIFF'S DELTA — the ordinal effect SIZE companion to
    // eval_mannwhitney's significance test: δ = P(A>B) − P(A<B)
    // = 2·U_A/(n_A·n_B) − 1, read directly off the same
    // distinct-value rank rollup (no new machinery, no raw-row sort).
    // Where the z-test says "arms differ", δ says BY HOW MUCH in a
    // scale-free way that survives any monotone transform of the
    // metric. Magnitude labels follow Romano et al. 2006 thresholds
    // (0.147 / 0.33 / 0.474); the CASE runs on the identical double in
    // both engines, so the label is deterministic.
    Q("eval_cliffs_delta",
      """WITH u AS (SELECT user_id,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |      THEN 'A' ELSE 'B' END AS arm,
        |    CAST(floor(CAST(sum(CAST("value" AS DECIMAL(18,4)))
        |      AS DOUBLE) / 100) AS BIGINT) AS v
        |  FROM events GROUP BY 1, 2),
        |dv AS (SELECT v,
        |    sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS ca,
        |    count(*) AS c
        |  FROM u GROUP BY 1),
        |r AS (SELECT v, ca, c,
        |    sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
        |      AS cb
        |  FROM dv),
        |st AS (SELECT sum(ca * (cb + (c + 1) / 2.0)) AS ra FROM r),
        |n AS (SELECT
        |    sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS na,
        |    sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS nb
        |  FROM u),
        |z AS (SELECT na, nb,
        |    2.0 * (ra - na * (na + 1) / 2.0) / (na * nb) - 1 AS delta
        |  FROM st CROSS JOIN n)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  round(delta, 4) AS delta,
        |  CASE WHEN abs(delta) < 0.147 THEN 'negligible'
        |       WHEN abs(delta) < 0.33 THEN 'small'
        |       WHEN abs(delta) < 0.474 THEN 'medium'
        |       ELSE 'large' END AS magnitude
        |FROM z""") { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy(col("user_id"),
          when(substring(md5(col("user_id").cast("string")), 1, 1) < "8", "A")
            .otherwise("B").as("arm"))
        .agg(floor(sum(col("value").cast("decimal(18,4)"))
          .cast("double") / 100).cast("long").as("v"))
      val dv = u.groupBy(col("v"))
        .agg(sum(when(col("arm") === "A", 1).otherwise(0)).as("ca"),
          count(lit(1)).as("c"))
      val win = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val r = dv.withColumn("cb", sum(col("c")).over(win) - col("c"))
      val st = r.agg(
        sum(col("ca") * (col("cb") + (col("c") + 1) / 2.0)).as("ra"))
      val n = u.agg(
        sum(when(col("arm") === "A", 1).otherwise(0)).as("na"),
        sum(when(col("arm") === "B", 1).otherwise(0)).as("nb"))
      val z = st.crossJoin(broadcast(n))
        .select(col("na"), col("nb"),
          (lit(2.0) * (col("ra") - col("na") * (col("na") + 1) / 2.0) /
            (col("na") * col("nb")) - 1).as("delta"))
      z.select(col("na").cast("long").as("n_a"),
        col("nb").cast("long").as("n_b"),
        round(col("delta"), 4).as("delta"),
        when(abs(col("delta")) < 0.147, "negligible")
          .when(abs(col("delta")) < 0.33, "small")
          .when(abs(col("delta")) < 0.474, "medium")
          .otherwise("large").as("magnitude"))
    },

    // COCHRAN–MANTEL–HAENSZEL — the stratified 2×2 test: does the
    // arm → conversion association hold AFTER controlling for a
    // confounder (here event_type as the stratum), and what is the
    // common odds ratio? This is the Simpson's-paradox guard every
    // experimentation readout needs when traffic mix differs by arm.
    // One hash aggregate builds the K 2×2 tables (a/b/c/d per
    // stratum); the CMH statistic (with the standard 0.5 continuity
    // correction) and the Mantel-Haenszel pooled odds ratio are
    // per-stratum double terms QUANTIZED to DECIMAL(28,12) before the
    // order-free sum (the house law — K summands in arbitrary shuffle
    // order must still hash-match). Products ride doubles, not longs,
    // so stratum sizes can't overflow at any SF.
    Q("eval_cmh",
      """WITH e AS (SELECT
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |      THEN 'A' ELSE 'B' END AS arm,
        |    event_type AS stratum,
        |    CASE WHEN "value" >= 100 THEN 1 ELSE 0 END AS pos
        |  FROM events),
        |k AS (SELECT stratum,
        |    sum(CASE WHEN arm = 'A' AND pos = 1 THEN 1 ELSE 0 END) AS a,
        |    sum(CASE WHEN arm = 'A' AND pos = 0 THEN 1 ELSE 0 END) AS b,
        |    sum(CASE WHEN arm = 'B' AND pos = 1 THEN 1 ELSE 0 END) AS c,
        |    sum(CASE WHEN arm = 'B' AND pos = 0 THEN 1 ELSE 0 END) AS d
        |  FROM e GROUP BY 1),
        |t AS (SELECT stratum, a, b, c, d,
        |    CAST(a + b + c + d AS DOUBLE) AS n FROM k),
        |s AS (SELECT sum(a) AS sa,
        |    sum(CAST(round(CAST(a + b AS DOUBLE) * (a + c) / n, 12)
        |      AS DECIMAL(28,12))) AS se,
        |    CAST(sum(CAST(round(CAST(a + b AS DOUBLE) * (c + d)
        |      * (a + c) * (b + d)
        |      / (n * n * (n - 1)), 12) AS DECIMAL(28,12))) AS DOUBLE) AS sv,
        |    CAST(sum(CAST(round(CAST(a AS DOUBLE) * d / n, 12)
        |      AS DECIMAL(28,12))) AS DOUBLE) AS sad,
        |    CAST(sum(CAST(round(CAST(b AS DOUBLE) * c / n, 12)
        |      AS DECIMAL(28,12))) AS DOUBLE) AS sbc,
        |    count(*) AS ks
        |  FROM t)
        |SELECT CAST(ks AS BIGINT) AS n_strata,
        |  CAST(sa AS BIGINT) AS sum_a,
        |  round((abs(sa - CAST(se AS DOUBLE)) - 0.5)
        |    * (abs(sa - CAST(se AS DOUBLE)) - 0.5) / nullif(sv, 0), 4)
        |    AS chi2_cmh,
        |  round(sad / nullif(sbc, 0), 4) AS or_mh,
        |  CAST((abs(sa - CAST(se AS DOUBLE)) - 0.5)
        |    * (abs(sa - CAST(se AS DOUBLE)) - 0.5) / nullif(sv, 0)
        |    > 3.8415 AS BOOLEAN) AS significant
        |FROM s""") { (s, d) =>
      val e = Tables.events(s, d).select(
        when(substring(md5(col("user_id").cast("string")), 1, 1) < "8", "A")
          .otherwise("B").as("arm"),
        col("event_type").as("stratum"),
        when(col("value") >= 100, 1).otherwise(0).as("pos"))
      val k = e.groupBy(col("stratum")).agg(
        sum(when(col("arm") === "A" && col("pos") === 1, 1).otherwise(0))
          .as("a"),
        sum(when(col("arm") === "A" && col("pos") === 0, 1).otherwise(0))
          .as("b"),
        sum(when(col("arm") === "B" && col("pos") === 1, 1).otherwise(0))
          .as("c"),
        sum(when(col("arm") === "B" && col("pos") === 0, 1).otherwise(0))
          .as("d"))
      val t = k.withColumn("n",
        (col("a") + col("b") + col("c") + col("d")).cast("double"))
      val st = t.agg(sum(col("a")).as("sa"),
        sum(round((col("a") + col("b")).cast("double") *
          (col("a") + col("c")) / col("n"),
          12).cast("decimal(28,12)")).as("se"),
        sum(round((col("a") + col("b")).cast("double") *
          (col("c") + col("d")) *
          (col("a") + col("c")) * (col("b") + col("d")) /
          (col("n") * col("n") * (col("n") - 1)), 12)
          .cast("decimal(28,12)")).cast("double").as("sv"),
        sum(round(col("a").cast("double") * col("d") / col("n"), 12)
          .cast("decimal(28,12)")).cast("double").as("sad"),
        sum(round(col("b").cast("double") * col("c") / col("n"), 12)
          .cast("decimal(28,12)")).cast("double").as("sbc"),
        count(lit(1)).as("ks"))
      val dev = abs(col("sa") - col("se").cast("double")) - 0.5
      val chi2 = dev * dev / nullif(col("sv"), lit(0d))
      st.select(col("ks").cast("long").as("n_strata"),
        col("sa").cast("long").as("sum_a"),
        round(chi2, 4).as("chi2_cmh"),
        round(col("sad") / nullif(col("sbc"), lit(0d)), 4).as("or_mh"),
        (chi2 > 3.8415).as("significant"))
    },

    // OFF-POLICY EVALUATION via inverse propensity scoring — "what
    // would the new policy have earned on the logged traffic?" The
    // logged bandit feedback is (context = user, action = event_type,
    // reward = value); the logging policy's propensities are the
    // EMPIRICAL action shares (one broadcast aggregate — the standard
    // estimated-propensity variant); the target policy is a
    // deterministic rule (purchase for the md5-A cohort, click
    // otherwise). Reported: IPS (unbiased, high variance), SNIPS
    // (self-normalized — the production default), and the effective
    // sample size (Σw)²/Σw² that tells you whether the overlap is
    // good enough to trust either. Per-event weight terms are
    // DECIMAL(28,10)-quantized before the order-free sums (house
    // law); everything is two hash aggregates + a broadcast — one
    // pass over the log at any scale.
    Q("eval_ips_offpolicy",
      """WITH e AS (SELECT user_id, event_type AS act,
        |    CAST("value" AS DOUBLE) AS r,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |      THEN 'purchase' ELSE 'click' END AS pi_act
        |  FROM events),
        |p AS (SELECT act, count(*) AS na FROM e GROUP BY 1),
        |n AS (SELECT count(*) AS nn FROM e),
        |w AS (SELECT e.user_id, e.r,
        |    CASE WHEN e.act = e.pi_act
        |      THEN CAST(n.nn AS DOUBLE) / p.na ELSE 0.0 END AS wt
        |  FROM e JOIN p ON p.act = e.act CROSS JOIN n),
        |s AS (SELECT count(*) AS cnt,
        |    CAST(sum(CAST(round(wt * r, 10) AS DECIMAL(28,10)))
        |      AS DOUBLE) AS swr,
        |    CAST(sum(CAST(round(wt, 10) AS DECIMAL(28,10)))
        |      AS DOUBLE) AS sw,
        |    CAST(sum(CAST(round(wt * wt, 10) AS DECIMAL(28,10)))
        |      AS DOUBLE) AS sw2
        |  FROM w)
        |SELECT CAST(cnt AS BIGINT) AS n_events,
        |  round(swr / cnt, 4) AS ips,
        |  round(swr / nullif(sw, 0), 4) AS snips,
        |  round(sw * sw / nullif(sw2, 0), 2) AS eff_sample_size
        |FROM s""") { (s, d) =>
      val e = Tables.events(s, d).select(col("user_id"),
        col("event_type").as("act"), col("value").cast("double").as("r"),
        when(substring(md5(col("user_id").cast("string")), 1, 1) < "8",
          "purchase").otherwise("click").as("pi_act"))
      val p = e.groupBy(col("act")).agg(count(lit(1)).as("na"))
      val n = e.agg(count(lit(1)).as("nn"))
      val w = e.join(broadcast(p), Seq("act")).crossJoin(broadcast(n))
        .select(col("r"),
          when(col("act") === col("pi_act"),
            col("nn").cast("double") / col("na")).otherwise(0.0).as("wt"))
      val st = w.agg(count(lit(1)).as("cnt"),
        sum(round(col("wt") * col("r"), 10).cast("decimal(28,10)"))
          .cast("double").as("swr"),
        sum(round(col("wt"), 10).cast("decimal(28,10)"))
          .cast("double").as("sw"),
        sum(round(col("wt") * col("wt"), 10).cast("decimal(28,10)"))
          .cast("double").as("sw2"))
      st.select(col("cnt").cast("long").as("n_events"),
        round(col("swr") / col("cnt"), 4).as("ips"),
        round(col("swr") / nullif(col("sw"), lit(0d)), 4).as("snips"),
        round(col("sw") * col("sw") / nullif(col("sw2"), lit(0d)), 2)
          .as("eff_sample_size"))
    },

    // DOUBLY-ROBUST off-policy evaluation (Dudík, Langford & Li,
    // ICML 2011) — the estimator that stays consistent if EITHER the
    // reward model OR the propensities are right: DR = E[Q̂(π(x))] +
    // E[w·(r − Q̂(a))], with the direct-method estimate E[Q̂(π(x))]
    // alongside for the bias/variance picture. The reward model here
    // is the simplest honest one — per-action empirical mean reward
    // (sum/count off one broadcast rollup, DECIMAL-quantized) — and
    // the propensities are the empirical action shares, both derived
    // from the log itself. Execution: two tiny broadcast aggregates
    // joined back to one scan; per-event correction terms
    // DECIMAL(28,10)-quantized before the order-free sums. One pass
    // at any log size.
    Q("eval_dr_offpolicy",
      """WITH e AS (SELECT user_id, event_type AS act,
        |    CAST("value" AS DOUBLE) AS r,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |      THEN 'purchase' ELSE 'click' END AS pi_act
        |  FROM events),
        |q AS (SELECT act,
        |    CAST(sum(CAST(round(r, 6) AS DECIMAL(18,6))) AS DOUBLE)
        |      / count(*) AS qa,
        |    count(*) AS na
        |  FROM e GROUP BY 1),
        |n AS (SELECT count(*) AS nn FROM e),
        |w AS (SELECT e.r,
        |    qp.qa AS qpi,
        |    ql.qa AS qlog,
        |    CASE WHEN e.act = e.pi_act
        |      THEN CAST(n.nn AS DOUBLE) / ql.na ELSE 0.0 END AS wt
        |  FROM e JOIN q ql ON ql.act = e.act
        |  JOIN q qp ON qp.act = e.pi_act CROSS JOIN n),
        |s AS (SELECT count(*) AS cnt,
        |    CAST(sum(CAST(round(qpi, 10) AS DECIMAL(28,10)))
        |      AS DOUBLE) AS sdm,
        |    CAST(sum(CAST(round(qpi + wt * (r - qlog), 10)
        |      AS DECIMAL(28,10))) AS DOUBLE) AS sdr,
        |    CAST(sum(CAST(round(wt * r, 10) AS DECIMAL(28,10)))
        |      AS DOUBLE) AS swr
        |  FROM w)
        |SELECT CAST(cnt AS BIGINT) AS n_events,
        |  round(sdm / cnt, 4) AS dm,
        |  round(sdr / cnt, 4) AS dr,
        |  round(swr / cnt, 4) AS ips
        |FROM s""") { (s, d) =>
      val e = Tables.events(s, d).select(col("user_id"),
        col("event_type").as("act"), col("value").cast("double").as("r"),
        when(substring(md5(col("user_id").cast("string")), 1, 1) < "8",
          "purchase").otherwise("click").as("pi_act"))
      val q = e.groupBy(col("act")).agg(
        (sum(round(col("r"), 6).cast("decimal(18,6)")).cast("double") /
          count(lit(1))).as("qa"),
        count(lit(1)).as("na"))
      val n = e.agg(count(lit(1)).as("nn"))
      val w = e
        .join(broadcast(q.select(col("act"), col("qa").as("qlog"),
          col("na"))), Seq("act"))
        .join(broadcast(q.select(col("act").as("pi_act"),
          col("qa").as("qpi"))), Seq("pi_act"))
        .crossJoin(broadcast(n))
        .select(col("r"), col("qpi"), col("qlog"),
          when(col("act") === col("pi_act"),
            col("nn").cast("double") / col("na")).otherwise(0.0).as("wt"))
      val st = w.agg(count(lit(1)).as("cnt"),
        sum(round(col("qpi"), 10).cast("decimal(28,10)"))
          .cast("double").as("sdm"),
        sum(round(col("qpi") + col("wt") * (col("r") - col("qlog")), 10)
          .cast("decimal(28,10)")).cast("double").as("sdr"),
        sum(round(col("wt") * col("r"), 10).cast("decimal(28,10)"))
          .cast("double").as("swr"))
      st.select(col("cnt").cast("long").as("n_events"),
        round(col("sdm") / col("cnt"), 4).as("dm"),
        round(col("sdr") / col("cnt"), 4).as("dr"),
        round(col("swr") / col("cnt"), 4).as("ips"))
    },

    // SAMPLE-RATIO MISMATCH — the first guardrail of every A/B
    // readout: does the observed unit split per stratum match the
    // designed 50/50 allocation? The md5-nibble assignment puts hex
    // 0-7 in A (exactly half the nibble space), so any stratum whose
    // distinct-user split deviates beyond the 1-df chi-square bound
    // signals broken bucketing/logging, and every downstream metric
    // for that stratum is suspect. chi2 = (na-nb)^2/(na+nb) is exact
    // integer arithmetic until one final double division — nothing
    // libm-dependent. One distinct + one hash aggregate; scales as a
    // pure shuffle on (stratum, user).
    Q("eval_srm",
      """WITH e AS (SELECT DISTINCT event_type AS stratum, user_id
        |  FROM events),
        |a AS (SELECT stratum,
        |    sum(CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
        |      < '8' THEN 1 ELSE 0 END) AS na,
        |    sum(CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1)
        |      < '8' THEN 0 ELSE 1 END) AS nb
        |  FROM e GROUP BY 1)
        |SELECT stratum, CAST(na AS BIGINT) AS n_a,
        |  CAST(nb AS BIGINT) AS n_b,
        |  round(CAST((na - nb) * (na - nb) AS DOUBLE) / (na + nb), 4)
        |    AS chi2,
        |  CAST(CAST((na - nb) * (na - nb) AS DOUBLE) / (na + nb)
        |    > 3.8415 AS BOOLEAN) AS srm_flag
        |FROM a ORDER BY stratum""") { (s, d) =>
      val e = Tables.events(s, d)
        .select(col("event_type").as("stratum"), col("user_id")).distinct()
      val inA = substring(md5(col("user_id").cast("string")), 1, 1) < "8"
      val a = e.groupBy(col("stratum")).agg(
        sum(when(inA, 1).otherwise(0)).as("na"),
        sum(when(inA, 0).otherwise(1)).as("nb"))
      val chi2 = ((col("na") - col("nb")) * (col("na") - col("nb")))
        .cast("double") / (col("na") + col("nb"))
      a.select(col("stratum"), col("na").cast("long").as("n_a"),
          col("nb").cast("long").as("n_b"),
          round(chi2, 4).as("chi2"), (chi2 > 3.8415).as("srm_flag"))
        .orderBy(col("stratum"))
    },

    // FRIEDMAN TEST — the nonparametric repeated-measures ANOVA:
    // does per-user spend differ across the three ten-day periods of
    // the month, judged only on WITHIN-user rank order (so user-level
    // scale differences cancel)? Blocks are users present in all
    // three periods; within each block the k=3 period totals get mean
    // ranks (rank() + (ties-1)/2 — exact halves, carried as
    // DECIMAL(10,1) so the order-free rank sums are exact), and the
    // tie-corrected statistic chi2 = [sum R_j^2 / n - 12n] / C with
    // C = 1 - sum(t^3 - t)/(24n) is pure rational arithmetic against
    // the literal chi-square(2) 0.05 bound 5.9915 — no libm anywhere.
    // The only window is partitioned by user (3 rows per partition);
    // everything else is hash aggregates. The final assembly is a
    // 1-row x 1-row cross (hygiene-whitelisted).
    Q("eval_friedman",
      """WITH u AS (SELECT user_id,
        |    CASE WHEN extract(day FROM ts) <= 10 THEN 1
        |         WHEN extract(day FROM ts) <= 20 THEN 2
        |         ELSE 3 END AS t,
        |    CAST(sum(CAST("value" AS DECIMAL(18,4))) AS DECIMAL(18,4))
        |      AS x
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT user_id FROM u GROUP BY 1 HAVING count(*) = 3),
        |v AS (SELECT u.user_id, t, x FROM u JOIN b USING (user_id)),
        |r AS (SELECT user_id, t,
        |    CAST(rank() OVER (PARTITION BY user_id ORDER BY x)
        |      + (count(*) OVER (PARTITION BY user_id, x) - 1) / 2.0
        |      AS DECIMAL(10,1)) AS rk
        |  FROM v),
        |rj AS (SELECT
        |    CAST(sum(CASE WHEN t = 1 THEN rk
        |      ELSE CAST(0 AS DECIMAL(10,1)) END) AS DOUBLE) AS r1,
        |    CAST(sum(CASE WHEN t = 2 THEN rk
        |      ELSE CAST(0 AS DECIMAL(10,1)) END) AS DOUBLE) AS r2,
        |    CAST(sum(CASE WHEN t = 3 THEN rk
        |      ELSE CAST(0 AS DECIMAL(10,1)) END) AS DOUBLE) AS r3,
        |    CAST(count(DISTINCT user_id) AS DOUBLE) AS n
        |  FROM r),
        |tt AS (SELECT CAST(sum(m * m * m - m) AS DOUBLE) AS tcorr
        |  FROM (SELECT user_id, x, count(*) AS m FROM v GROUP BY 1, 2)),
        |z AS (SELECT n, r1, r2, r3,
        |    (r1 * r1 + r2 * r2 + r3 * r3) / n - 12.0 * n AS chi2raw,
        |    1.0 - tcorr / (24.0 * n) AS cfac
        |  FROM rj CROSS JOIN tt)
        |SELECT CAST(n AS BIGINT) AS n_blocks,
        |  r1 AS rank_sum_1, r2 AS rank_sum_2, r3 AS rank_sum_3,
        |  round(chi2raw / nullif(cfac, 0), 4) AS chi2,
        |  CAST(chi2raw / nullif(cfac, 0) > 5.9915 AS BOOLEAN)
        |    AS significant
        |FROM z""") { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy(col("user_id"),
          when(dayofmonth(col("ts")) <= 10, 1)
            .when(dayofmonth(col("ts")) <= 20, 2)
            .otherwise(3).as("t"))
        .agg(sum(col("value").cast("decimal(18,4)"))
          .cast("decimal(18,4)").as("x"))
      val b = u.groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") === 3).select(col("user_id"))
      val v = u.join(b, Seq("user_id"))
      val wRank = Window.partitionBy(col("user_id")).orderBy(col("x"))
      val wTie = Window.partitionBy(col("user_id"), col("x"))
      val r = v.select(col("user_id"), col("t"),
        (rank().over(wRank) + (count(lit(1)).over(wTie) - 1) / 2.0)
          .cast("decimal(10,1)").as("rk"))
      val zeroRk = lit(0).cast("decimal(10,1)")
      val rj = r.agg(
        sum(when(col("t") === 1, col("rk")).otherwise(zeroRk))
          .cast("double").as("r1"),
        sum(when(col("t") === 2, col("rk")).otherwise(zeroRk))
          .cast("double").as("r2"),
        sum(when(col("t") === 3, col("rk")).otherwise(zeroRk))
          .cast("double").as("r3"),
        countDistinct(col("user_id")).cast("double").as("n"))
      val tt = v.groupBy(col("user_id"), col("x"))
        .agg(count(lit(1)).as("m"))
        .agg(sum(col("m") * col("m") * col("m") - col("m"))
          .cast("double").as("tcorr"))
      val z = rj.crossJoin(broadcast(tt)).select(col("n"),
        col("r1"), col("r2"), col("r3"),
        (((col("r1") * col("r1") + col("r2") * col("r2") +
          col("r3") * col("r3")) / col("n")) - lit(12.0) * col("n"))
          .as("chi2raw"),
        (lit(1.0) - col("tcorr") / (lit(24.0) * col("n"))).as("cfac"))
      val chi2 = col("chi2raw") / nullif(col("cfac"), lit(0d))
      z.select(col("n").cast("long").as("n_blocks"),
        col("r1").as("rank_sum_1"), col("r2").as("rank_sum_2"),
        col("r3").as("rank_sum_3"),
        round(chi2, 4).as("chi2"), (chi2 > 5.9915).as("significant"))
    },

    // PAGE'S L TREND TEST — the ordered-alternative companion to
    // eval_friedman on the same complete-block construction: is spend
    // MONOTONICALLY drifting across the three periods (early < mid <
    // late), not merely "different somewhere"? L = sum_j j*R_j off
    // the identical exact-decimal rank sums; under H0 the literal
    // moments for k=3 are mu = 12n and var = 2n, so
    // z = (L - 12n)/sqrt(2n) — sqrt is IEEE-correctly-rounded, so the
    // whole statistic is cross-engine deterministic. One-sided 0.05
    // bound 1.6449 (upward trend). Same scale shape as friedman:
    // user-partitioned 3-row windows + hash aggregates.
    Q("eval_page_trend",
      """WITH u AS (SELECT user_id,
        |    CASE WHEN extract(day FROM ts) <= 10 THEN 1
        |         WHEN extract(day FROM ts) <= 20 THEN 2
        |         ELSE 3 END AS t,
        |    CAST(sum(CAST("value" AS DECIMAL(18,4))) AS DECIMAL(18,4))
        |      AS x
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT user_id FROM u GROUP BY 1 HAVING count(*) = 3),
        |v AS (SELECT u.user_id, t, x FROM u JOIN b USING (user_id)),
        |r AS (SELECT user_id, t,
        |    CAST(rank() OVER (PARTITION BY user_id ORDER BY x)
        |      + (count(*) OVER (PARTITION BY user_id, x) - 1) / 2.0
        |      AS DECIMAL(10,1)) AS rk
        |  FROM v),
        |rj AS (SELECT
        |    CAST(sum(CASE WHEN t = 1 THEN rk
        |      ELSE CAST(0 AS DECIMAL(10,1)) END) AS DOUBLE) AS r1,
        |    CAST(sum(CASE WHEN t = 2 THEN rk
        |      ELSE CAST(0 AS DECIMAL(10,1)) END) AS DOUBLE) AS r2,
        |    CAST(sum(CASE WHEN t = 3 THEN rk
        |      ELSE CAST(0 AS DECIMAL(10,1)) END) AS DOUBLE) AS r3,
        |    CAST(count(DISTINCT user_id) AS DOUBLE) AS n
        |  FROM r),
        |z AS (SELECT n, r1 + 2.0 * r2 + 3.0 * r3 AS l FROM rj)
        |SELECT CAST(n AS BIGINT) AS n_blocks,
        |  round(l, 1) AS l_stat,
        |  round((l - 12.0 * n) / sqrt(2.0 * n), 4) AS z_stat,
        |  CAST((l - 12.0 * n) / sqrt(2.0 * n) > 1.6449 AS BOOLEAN)
        |    AS trend_up
        |FROM z""") { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy(col("user_id"),
          when(dayofmonth(col("ts")) <= 10, 1)
            .when(dayofmonth(col("ts")) <= 20, 2)
            .otherwise(3).as("t"))
        .agg(sum(col("value").cast("decimal(18,4)"))
          .cast("decimal(18,4)").as("x"))
      val b = u.groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") === 3).select(col("user_id"))
      val v = u.join(b, Seq("user_id"))
      val wRank = Window.partitionBy(col("user_id")).orderBy(col("x"))
      val wTie = Window.partitionBy(col("user_id"), col("x"))
      val r = v.select(col("user_id"), col("t"),
        (rank().over(wRank) + (count(lit(1)).over(wTie) - 1) / 2.0)
          .cast("decimal(10,1)").as("rk"))
      val zeroRk = lit(0).cast("decimal(10,1)")
      val rj = r.agg(
        sum(when(col("t") === 1, col("rk")).otherwise(zeroRk))
          .cast("double").as("r1"),
        sum(when(col("t") === 2, col("rk")).otherwise(zeroRk))
          .cast("double").as("r2"),
        sum(when(col("t") === 3, col("rk")).otherwise(zeroRk))
          .cast("double").as("r3"),
        countDistinct(col("user_id")).cast("double").as("n"))
      val z = rj.select(col("n"),
        (col("r1") + lit(2.0) * col("r2") + lit(3.0) * col("r3"))
          .as("l"))
      val zs = (col("l") - lit(12.0) * col("n")) /
        sqrt(lit(2.0) * col("n"))
      z.select(col("n").cast("long").as("n_blocks"),
        round(col("l"), 1).as("l_stat"),
        round(zs, 4).as("z_stat"), (zs > 1.6449).as("trend_up"))
    },

    // KRIPPENDORFF'S ALPHA (nominal) — the inter-annotator agreement
    // coefficient that, unlike eval_fleiss_kappa, handles MISSING
    // ratings natively (units rated by any subset of >= 2 raters
    // count, weighted by their pairable ratings). Raters are the five
    // event types, a unit is a user, and a rating is the literal-
    // bucketed per-(user,rater) exact-decimal spend (cuts 500/650/800
    // — integer literals against DECIMAL sums, no tie ambiguity).
    // alpha = 1 - Do/De off the coincidence-matrix identities:
    // per-unit observed-disagreement terms (mu^2 - sum nuc^2)/(mu-1)
    // are DECIMAL(28,12)-quantized before the order-free sum (house
    // law); De = (n^2 - sum nc^2)/(n(n-1)) is exact-integer until the
    // final division. Hash aggregates end-to-end; the final assembly
    // is three 1-row relations crossed (hygiene-whitelisted).
    Q("eval_krippendorff",
      """WITH e AS (SELECT user_id, event_type AS rater,
        |    CAST(sum(CAST("value" AS DECIMAL(18,4))) AS DECIMAL(18,4))
        |      AS sv
        |  FROM events GROUP BY 1, 2),
        |c AS (SELECT user_id, rater,
        |    CASE WHEN sv < 500 THEN 0 WHEN sv < 650 THEN 1
        |         WHEN sv < 800 THEN 2 ELSE 3 END AS cat
        |  FROM e),
        |m AS (SELECT user_id, count(*) AS mu FROM c GROUP BY 1
        |  HAVING count(*) >= 2),
        |uc AS (SELECT c.user_id, cat, count(*) AS nuc
        |  FROM c JOIN m USING (user_id) GROUP BY 1, 2),
        |du AS (SELECT uc.user_id, max(mu) AS mu,
        |    sum(nuc * nuc) AS s2
        |  FROM uc JOIN m USING (user_id) GROUP BY 1),
        |dosum AS (SELECT
        |    CAST(sum(CAST(round(CAST(mu * mu - s2 AS DOUBLE)
        |      / (mu - 1), 12) AS DECIMAL(28,12))) AS DOUBLE) AS don,
        |    count(*) AS nu
        |  FROM du),
        |nn AS (SELECT CAST(sum(mu) AS BIGINT) AS n FROM m),
        |des AS (SELECT CAST(sum(CAST(nc AS BIGINT) * nc) AS BIGINT)
        |      AS s2c, count(*) AS ncats
        |  FROM (SELECT cat, CAST(sum(nuc) AS BIGINT) AS nc
        |    FROM uc GROUP BY 1)),
        |fin AS (SELECT nu, n, ncats,
        |    don / n AS dob,
        |    CAST(n * n - s2c AS DOUBLE) / (n * (n - 1.0)) AS de
        |  FROM dosum CROSS JOIN nn CROSS JOIN des)
        |SELECT CAST(nu AS BIGINT) AS n_units,
        |  CAST(n AS BIGINT) AS n_ratings,
        |  CAST(ncats AS BIGINT) AS n_categories,
        |  round(dob, 6) AS d_o, round(de, 6) AS d_e,
        |  round(1.0 - dob / nullif(de, 0), 4) AS alpha
        |FROM fin""") { (s, d) =>
      val e = Tables.events(s, d)
        .groupBy(col("user_id"), col("event_type").as("rater"))
        .agg(sum(col("value").cast("decimal(18,4)"))
          .cast("decimal(18,4)").as("sv"))
      val c = e.select(col("user_id"), col("rater"),
        when(col("sv") < 500, 0).when(col("sv") < 650, 1)
          .when(col("sv") < 800, 2).otherwise(3).as("cat"))
      val m = c.groupBy(col("user_id")).agg(count(lit(1)).as("mu"))
        .filter(col("mu") >= 2)
      val uc = c.join(m.select(col("user_id")), Seq("user_id"))
        .groupBy(col("user_id"), col("cat"))
        .agg(count(lit(1)).as("nuc"))
      val du = uc.join(m, Seq("user_id"))
        .groupBy(col("user_id"))
        .agg(max(col("mu")).as("mu"),
          sum(col("nuc") * col("nuc")).as("s2"))
      val dosum = du.agg(
        sum(round((col("mu") * col("mu") - col("s2")).cast("double") /
          (col("mu") - 1), 12).cast("decimal(28,12)"))
          .cast("double").as("don"),
        count(lit(1)).as("nu"))
      val nn = m.agg(sum(col("mu")).cast("long").as("n"))
      val des = uc.groupBy(col("cat"))
        .agg(sum(col("nuc")).cast("long").as("nc"))
        .agg(sum(col("nc") * col("nc")).cast("long").as("s2c"),
          count(lit(1)).as("ncats"))
      val fin = dosum.crossJoin(broadcast(nn)).crossJoin(broadcast(des))
        .select(col("nu"), col("n"), col("ncats"),
          (col("don") / col("n")).as("dob"),
          ((col("n") * col("n") - col("s2c")).cast("double") /
            (col("n") * (col("n") - lit(1.0)))).as("de"))
      fin.select(col("nu").cast("long").as("n_units"),
        col("n").cast("long").as("n_ratings"),
        col("ncats").cast("long").as("n_categories"),
        round(col("dob"), 6).as("d_o"), round(col("de"), 6).as("d_e"),
        round(lit(1.0) - col("dob") / nullif(col("de"), lit(0d)), 4)
          .as("alpha"))
    },

    // UPLIFT-BY-DECILE / QINI — the targeting-model report card: rank
    // users by predicted responsiveness (here the exact-decimal spend
    // score), cut into deciles, and per decile compare treated vs
    // control conversion; the running Qini numerator
    // ct - cc*nt/nc says how many INCREMENTAL conversions targeting
    // the top-k deciles would have bought. The decile cut rides the
    // distributed range-partitioned ntile (no single-task sort; the
    // SQL window is the DuckDB oracle only) with the house unique
    // tiebreak (score DESC, user_id) so the remainder rule lands
    // identically in both engines; the only unpartitioned window runs
    // over the 10-row aggregated decile table. Arms are the md5 coin.
    Q("eval_uplift_qini",
      """WITH u0 AS (SELECT user_id,
        |    CAST(sum(CAST("value" AS DECIMAL(18,4))) AS DECIMAL(18,4))
        |      AS score,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS conv
        |  FROM events GROUP BY 1),
        |u AS (SELECT user_id, score, conv,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |      THEN 1 ELSE 0 END AS treat
        |  FROM u0),
        |dc AS (SELECT treat, conv,
        |    ntile(10) OVER (ORDER BY score DESC, user_id) AS decile
        |  FROM u),
        |g AS (SELECT decile,
        |    CAST(sum(treat) AS BIGINT) AS n_t,
        |    CAST(sum(1 - treat) AS BIGINT) AS n_c,
        |    CAST(sum(CASE WHEN treat = 1 THEN conv ELSE 0 END)
        |      AS BIGINT) AS c_t,
        |    CAST(sum(CASE WHEN treat = 0 THEN conv ELSE 0 END)
        |      AS BIGINT) AS c_c
        |  FROM dc GROUP BY 1),
        |q AS (SELECT decile, n_t, n_c, c_t, c_c,
        |    sum(c_t) OVER w AS ct, sum(c_c) OVER w AS cc,
        |    sum(n_t) OVER w AS nt, sum(n_c) OVER w AS nc
        |  FROM g WINDOW w AS (ORDER BY decile
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT decile, n_t AS n_treat, n_c AS n_ctrl,
        |  c_t AS conv_treat, c_c AS conv_ctrl,
        |  round(c_t / CAST(nullif(n_t, 0) AS DOUBLE)
        |    - c_c / CAST(nullif(n_c, 0) AS DOUBLE), 4) AS uplift,
        |  round(ct - cc * nt / CAST(nullif(nc, 0) AS DOUBLE), 4)
        |    AS qini_cum
        |FROM q ORDER BY decile""") { (s, d) =>
      val u0 = Tables.events(s, d).groupBy(col("user_id"))
        .agg(sum(col("value").cast("decimal(18,4)"))
            .cast("decimal(18,4)").as("score"),
          max(when(col("event_type") === "purchase", 1).otherwise(0))
            .as("conv"))
      val u = u0.select(col("user_id"), col("score"), col("conv"),
        when(substring(md5(col("user_id").cast("string")), 1, 1) < "8",
          1).otherwise(0).as("treat"))
      val dc = Ranks.withNtile(u,
        Seq(col("score").desc, col("user_id")), 10, "decile")
      val g = dc.groupBy(col("decile")).agg(
        sum(col("treat")).cast("long").as("n_t"),
        sum(lit(1) - col("treat")).cast("long").as("n_c"),
        sum(when(col("treat") === 1, col("conv")).otherwise(0))
          .cast("long").as("c_t"),
        sum(when(col("treat") === 0, col("conv")).otherwise(0))
          .cast("long").as("c_c"))
      val w = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val q = g.select(col("decile"), col("n_t"), col("n_c"),
        col("c_t"), col("c_c"),
        sum(col("c_t")).over(w).as("ct"), sum(col("c_c")).over(w).as("cc"),
        sum(col("n_t")).over(w).as("nt"), sum(col("n_c")).over(w).as("nc"))
      q.select(col("decile"), col("n_t").as("n_treat"),
          col("n_c").as("n_ctrl"), col("c_t").as("conv_treat"),
          col("c_c").as("conv_ctrl"),
          round(col("c_t") / nullif(col("n_t"), lit(0L)).cast("double") -
            col("c_c") / nullif(col("n_c"), lit(0L)).cast("double"), 4)
            .as("uplift"),
          round(col("ct") - col("cc") * col("nt") /
            nullif(col("nc"), lit(0L)).cast("double"), 4).as("qini_cum"))
        .orderBy(col("decile"))
    },

    // GROUP-SEQUENTIAL TEST with O'Brien–Fleming boundaries — the
    // committee-grade interim-analysis design: four planned looks
    // (day cutoffs 8/16/23/31), and at each look the cumulative
    // two-proportion z compares against the LITERAL OBF ladder
    // 4.333 / 2.963 / 2.359 / 2.014 (alpha spent vanishingly early,
    // nearly-nominal at the final look — the opposite temperament to
    // eval_sprt's always-valid walk). A user enters at their first
    // event day and converts at their first qualifying purchase day,
    // so each look's population is exactly "users known by the
    // cutoff": one user-level rollup, a users×4 literal-grid stack
    // (linear), pooled-z arithmetic + one IEEE sqrt — no libm.
    Q("eval_group_sequential",
      """WITH u AS (SELECT user_id,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |      THEN 1 ELSE 0 END AS treat,
        |    min(extract(day FROM ts)) AS firstday,
        |    min(CASE WHEN event_type = 'purchase' AND "value" > 150
        |      THEN extract(day FROM ts) END) AS convday
        |  FROM events GROUP BY 1, 2),
        |lk AS (SELECT u.*, l.look, l.cutoff
        |  FROM u CROSS JOIN (VALUES (1, 8), (2, 16), (3, 23), (4, 31))
        |    AS l(look, cutoff)
        |  WHERE u.firstday <= l.cutoff),
        |g AS (SELECT look, max(cutoff) AS cutoff,
        |    CAST(sum(treat) AS BIGINT) AS n_a,
        |    CAST(sum(1 - treat) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN treat = 1 AND convday <= cutoff
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
        |    CAST(sum(CASE WHEN treat = 0 AND convday <= cutoff
        |      THEN 1 ELSE 0 END) AS BIGINT) AS c_b
        |  FROM lk GROUP BY 1),
        |z AS (SELECT look, n_a, n_b, c_a, c_b,
        |    CAST(CASE look WHEN 1 THEN 4.333 WHEN 2 THEN 2.963
        |      WHEN 3 THEN 2.359 ELSE 2.014 END AS DOUBLE) AS boundary,
        |    (c_a / CAST(n_a AS DOUBLE) - c_b / CAST(n_b AS DOUBLE))
        |      / nullif(sqrt(
        |        ((c_a + c_b) / CAST(n_a + n_b AS DOUBLE))
        |        * (1 - (c_a + c_b) / CAST(n_a + n_b AS DOUBLE))
        |        * (1.0 / n_a + 1.0 / n_b)), 0) AS zs
        |  FROM g)
        |SELECT look, n_a, n_b, c_a AS conv_a, c_b AS conv_b,
        |  round(zs, 4) AS z_stat, boundary,
        |  CAST(abs(zs) > boundary AS BOOLEAN) AS crossed
        |FROM z ORDER BY look""") { (s, d) =>
      val u = Tables.events(s, d).groupBy(col("user_id"),
          when(substring(md5(col("user_id").cast("string")), 1, 1) < "8",
            1).otherwise(0).as("treat"))
        .agg(min(dayofmonth(col("ts"))).as("firstday"),
          min(when(col("event_type") === "purchase" && col("value") > 150,
            dayofmonth(col("ts")))).as("convday"))
      import s.implicits._
      val looks = Seq((1, 8), (2, 16), (3, 23), (4, 31))
        .toDF("look", "cutoff")
      val lk = u.crossJoin(broadcast(looks))
        .filter(col("firstday") <= col("cutoff"))
      val g = lk.groupBy(col("look")).agg(
        max(col("cutoff")).as("cutoff"),
        sum(col("treat")).cast("long").as("n_a"),
        sum(lit(1) - col("treat")).cast("long").as("n_b"),
        sum(when(col("treat") === 1 && col("convday") <= col("cutoff"),
          1).otherwise(0)).cast("long").as("c_a"),
        sum(when(col("treat") === 0 && col("convday") <= col("cutoff"),
          1).otherwise(0)).cast("long").as("c_b"))
      val pp = (col("c_a") + col("c_b")) /
        (col("n_a") + col("n_b")).cast("double")
      val zs = (col("c_a") / col("n_a").cast("double") -
        col("c_b") / col("n_b").cast("double")) /
        nullif(sqrt(pp * (lit(1) - pp) *
          (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), lit(0d))
      g.select(col("look"), col("n_a"), col("n_b"),
          col("c_a").as("conv_a"), col("c_b").as("conv_b"),
          round(zs, 4).as("z_stat"),
          when(col("look") === 1, 4.333).when(col("look") === 2, 2.963)
            .when(col("look") === 3, 2.359).otherwise(2.014)
            .as("boundary"),
          (abs(zs) > when(col("look") === 1, 4.333)
            .when(col("look") === 2, 2.963)
            .when(col("look") === 3, 2.359).otherwise(2.014))
            .as("crossed"))
        .orderBy(col("look"))
    },

    // JARQUE-BERA NORMALITY TEST (Jarque & Bera 1980) per event type —
    // the distribution-shape gate a pipeline runs before parametric
    // tests (eval_ttest_welch assumes approximate normality; JB is the
    // cheap one-pass check of that assumption). Rides the agg_moments
    // machinery verbatim: per-row value powers quantize to DECIMAL so
    // the four power sums are ONE order-free hash aggregate
    // (partial+final, partition-count invariant); skewness g1 and
    // excess kurtosis g2 derive in double from the exact sums, and
    // JB = n·(g1²/6 + g2²/24) ~ χ²(2), whose survival function is the
    // CLOSED FORM exp(−JB/2) — no erf, no incomplete gamma. Powers are
    // spelled x*x (left-assoc) rather than pow(): std::pow carries no
    // correct-rounding guarantee while IEEE multiply does, so both
    // engines walk the identical rounding sequence. χ²(2) 0.95
    // critical value 5.991 gives the decision flag. At 100 TB: one
    // map-side-combinable scan, 5-row output.
    Q("eval_jarque_bera",
      """WITH t AS (SELECT event_type,
        |    CAST(value AS DECIMAL(18,6)) AS x1,
        |    CAST(value * value AS DECIMAL(28,8)) AS x2,
        |    CAST(value * value * value AS DECIMAL(28,6)) AS x3,
        |    CAST(value * value * value * value AS DECIMAL(32,4)) AS x4
        |  FROM events),
        |s AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(x1) AS DOUBLE) AS s1, CAST(sum(x2) AS DOUBLE) AS s2,
        |    CAST(sum(x3) AS DOUBLE) AS s3, CAST(sum(x4) AS DOUBLE) AS s4
        |  FROM t GROUP BY 1),
        |m AS (SELECT event_type, n, s1 / n AS mu,
        |    s2 / n - (s1 / n) * (s1 / n) AS m2,
        |    s3 / n - 3 * (s1 / n) * s2 / n
        |      + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
        |    s4 / n - 4 * (s1 / n) * s3 / n
        |      + 6 * (s1 / n) * (s1 / n) * s2 / n
        |      - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
        |  FROM s),
        |j AS (SELECT event_type, n,
        |    m3 / (m2 * sqrt(m2)) AS g1,
        |    m4 / (m2 * m2) - 3 AS g2
        |  FROM m),
        |jb AS (SELECT event_type, n, g1, g2,
        |    n * (g1 * g1 / 6 + g2 * g2 / 24) AS jb FROM j)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  round(g1, 4) AS skewness, round(g2, 4) AS ex_kurtosis,
        |  round(jb, 4) AS jb_stat,
        |  round(exp(-jb / 2), 4) AS p_value,
        |  CAST(jb > 5.991 AS BOOLEAN) AS reject_normal
        |FROM jb ORDER BY event_type""") { (s, d) =>
      val t = Tables.events(s, d).select(col("event_type"),
        col("value").cast("decimal(18,6)").as("x1"),
        (col("value") * col("value")).cast("decimal(28,8)").as("x2"),
        (col("value") * col("value") * col("value")).cast("decimal(28,6)")
          .as("x3"),
        (col("value") * col("value") * col("value") * col("value"))
          .cast("decimal(32,4)").as("x4"))
      val mu = col("s1") / col("n")
      val m = t.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("x1")).cast("double").as("s1"),
          sum(col("x2")).cast("double").as("s2"),
          sum(col("x3")).cast("double").as("s3"),
          sum(col("x4")).cast("double").as("s4"))
        .select(col("event_type"), col("n"),
          (col("s2") / col("n") - mu * mu).as("m2"),
          (col("s3") / col("n") - lit(3) * mu * col("s2") / col("n")
            + lit(2) * mu * mu * mu).as("m3"),
          (col("s4") / col("n") - lit(4) * mu * col("s3") / col("n")
            + lit(6) * mu * mu * col("s2") / col("n")
            - lit(3) * mu * mu * mu * mu).as("m4"))
      val g1 = col("m3") / (col("m2") * sqrt(col("m2")))
      val g2 = col("m4") / (col("m2") * col("m2")) - 3
      m.select(col("event_type"), col("n"), g1.as("g1"), g2.as("g2"),
          (col("n") * (g1 * g1 / 6 + g2 * g2 / 24)).as("jb"))
        .select(col("event_type"), col("n").cast("long").as("n"),
          round(col("g1"), 4).as("skewness"),
          round(col("g2"), 4).as("ex_kurtosis"),
          round(col("jb"), 4).as("jb_stat"),
          round(exp(-col("jb") / 2), 4).as("p_value"),
          (col("jb") > 5.991).as("reject_normal"))
        .orderBy(col("event_type"))
    },

    // BROWN-FORSYTHE VARIANCE-HOMOGENEITY TEST (Levene 1960 with
    // Brown & Forsythe 1974's median center) across the five event
    // types — the precondition check for pooled-variance tests and
    // for eval_anova_oneway: a one-way ANOVA on |x − median_g|, the
    // robust spread proxy. Two corpus passes, both distributed: the
    // per-group exact median (the agg_winsorized_mean pattern —
    // quantile_cont(DOUBLE) in DuckDB ≡ Spark percentile(); a KLL
    // sketch at 100 TB), then one rollup of the broadcast-joined
    // absolute deviations. Per-row deviations quantize to DECIMAL so
    // the group sums are exact; group-level between/within terms
    // quantize again before their 5-row sum — the whole statistic is
    // order-free. F critical value at (4, ∞) and α = .05 is 2.372.
    Q("eval_levene_bf",
      """WITH med AS (SELECT event_type,
        |    quantile_cont(CAST(value AS DOUBLE), 0.5) AS med
        |  FROM events GROUP BY 1),
        |z AS (SELECT e.event_type,
        |    CAST(round(abs(e.value - m.med), 6) AS DECIMAL(18,6)) AS z1,
        |    CAST(round(abs(e.value - m.med) * abs(e.value - m.med), 8)
        |      AS DECIMAL(28,8)) AS z2
        |  FROM events e JOIN med m ON m.event_type = e.event_type),
        |g AS (SELECT event_type, count(*) AS n,
        |    sum(z1) AS s1, sum(z2) AS s2 FROM z GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |    CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(s1) AS DOUBLE) / sum(n) AS grand FROM g),
        |q AS (SELECT t.nn, t.k,
        |    CAST(round(g.n * (CAST(g.s1 AS DOUBLE) / g.n - t.grand)
        |      * (CAST(g.s1 AS DOUBLE) / g.n - t.grand), 6)
        |      AS DECIMAL(28,6)) AS bterm,
        |    CAST(round(CAST(g.s2 AS DOUBLE)
        |      - CAST(g.s1 AS DOUBLE) * CAST(g.s1 AS DOUBLE) / g.n, 6)
        |      AS DECIMAL(28,6)) AS wterm
        |  FROM g CROSS JOIN t),
        |f AS (SELECT nn, k, CAST(sum(bterm) AS DOUBLE) AS between_ss,
        |    CAST(sum(wterm) AS DOUBLE) AS within_ss
        |  FROM q GROUP BY 1, 2)
        |SELECT nn AS n_total, k AS n_groups,
        |  CAST(k - 1 AS BIGINT) AS df1, CAST(nn - k AS BIGINT) AS df2,
        |  round(between_ss, 4) AS between_ss,
        |  round(within_ss, 4) AS within_ss,
        |  round(((nn - k) * between_ss) / ((k - 1) * within_ss), 4)
        |    AS f_stat,
        |  CAST(((nn - k) * between_ss) / ((k - 1) * within_ss) > 2.372
        |    AS BOOLEAN) AS reject_equal_var
        |FROM f""") { (s, d) =>
      val med = Tables.events(s, d).groupBy(col("event_type"))
        .agg(expr("percentile(CAST(value AS DOUBLE), 0.5)").as("med"))
      val dev = abs(col("value") - col("med"))
      val z = Tables.events(s, d)
        .join(broadcast(med.withColumnRenamed("event_type", "et")),
          col("event_type") === col("et"))
        .select(col("event_type"),
          round(dev, 6).cast("decimal(18,6)").as("z1"),
          round(dev * dev, 8).cast("decimal(28,8)").as("z2"))
      val g = z.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("z1")).as("s1"),
          sum(col("z2")).as("s2"))
      val t = g.agg(sum(col("n")).cast("long").as("nn"),
        count(lit(1)).cast("long").as("k"),
        (sum(col("s1")).cast("double") / sum(col("n"))).as("grand"))
      val gm = col("s1").cast("double") / col("n")
      val f = g.crossJoin(broadcast(t))
        .select(col("nn"), col("k"),
          round(col("n") * (gm - col("grand")) * (gm - col("grand")), 6)
            .cast("decimal(28,6)").as("bterm"),
          round(col("s2").cast("double")
            - col("s1").cast("double") * col("s1").cast("double") / col("n"),
            6).cast("decimal(28,6)").as("wterm"))
        .groupBy(col("nn"), col("k"))
        .agg(sum(col("bterm")).cast("double").as("between_ss"),
          sum(col("wterm")).cast("double").as("within_ss"))
      val fstat = ((col("nn") - col("k")) * col("between_ss")) /
        ((col("k") - 1) * col("within_ss"))
      f.select(col("nn").as("n_total"), col("k").as("n_groups"),
        (col("k") - 1).cast("long").as("df1"),
        (col("nn") - col("k")).cast("long").as("df2"),
        round(col("between_ss"), 4).as("between_ss"),
        round(col("within_ss"), 4).as("within_ss"),
        round(fstat, 4).as("f_stat"),
        (fstat > 2.372).as("reject_equal_var"))
    },

    // BENJAMINI-HOCHBERG FDR CONTROL (Benjamini & Hochberg 1995) over
    // the 35 (event_type × weekday) A/B hypotheses — the
    // multiple-testing correction every metrics platform needs once it
    // runs eval_ab_ztest per segment: without it, 35 tests at α = .05
    // expect ~2 false positives. Per-cell two-proportion z rides the
    // eval_ab_ztest arithmetic on event-level conversions (one hash
    // aggregate over the corpus — the only corpus-scale shuffle); the
    // two-sided p-value is erfc(|z|/√2) via the Abramowitz & Stegun
    // 7.1.26 rational approximation, spelled with explicit t·t·t
    // products (IEEE multiply is correctly rounded; std::pow isn't) so
    // both engines walk identical rounding sequences. The BH step-up
    // itself — rank by p, adj = min_{j≥i}(p_j·m/j) capped at 1 — is two
    // windows over the 35-row AGGREGATE-REDUCED relation (the
    // PlanHygiene-whitelisted shape: hypothesis count, not corpus,
    // bounds the window input). FDR level q = 0.10.
    Q("eval_fdr_bh",
      """WITH e AS (SELECT event_type,
        |    CAST(date_part('isodow', ts) - 1 AS INT) AS grp,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |      THEN 1 ELSE 0 END AS a,
        |    CASE WHEN value > 100 THEN 1 ELSE 0 END AS conv
        |  FROM events),
        |g AS (SELECT event_type, grp,
        |    sum(a) AS na, sum(a * conv) AS ca,
        |    sum(1 - a) AS nb, sum((1 - a) * conv) AS cb
        |  FROM e GROUP BY 1, 2),
        |z AS (SELECT event_type, grp,
        |    abs((ca / CAST(na AS DOUBLE) - cb / CAST(nb AS DOUBLE))
        |      / nullif(sqrt(((ca + cb) / CAST(na + nb AS DOUBLE))
        |        * (1 - (ca + cb) / CAST(na + nb AS DOUBLE))
        |        * (1.0 / na + 1.0 / nb)), 0)) AS az
        |  FROM g),
        |p AS (SELECT event_type, grp, az,
        |    (0.254829592 * (1 / (1 + 0.3275911 * (az * 0.7071067811865476)))
        |     - 0.284496736 * (1 / (1 + 0.3275911 * (az * 0.7071067811865476)))
        |       * (1 / (1 + 0.3275911 * (az * 0.7071067811865476)))
        |     + 1.421413741 * (1 / (1 + 0.3275911 * (az * 0.7071067811865476)))
        |       * (1 / (1 + 0.3275911 * (az * 0.7071067811865476)))
        |       * (1 / (1 + 0.3275911 * (az * 0.7071067811865476)))
        |     - 1.453152027 * (1 / (1 + 0.3275911 * (az * 0.7071067811865476)))
        |       * (1 / (1 + 0.3275911 * (az * 0.7071067811865476)))
        |       * (1 / (1 + 0.3275911 * (az * 0.7071067811865476)))
        |       * (1 / (1 + 0.3275911 * (az * 0.7071067811865476)))
        |     + 1.061405429 * (1 / (1 + 0.3275911 * (az * 0.7071067811865476)))
        |       * (1 / (1 + 0.3275911 * (az * 0.7071067811865476)))
        |       * (1 / (1 + 0.3275911 * (az * 0.7071067811865476)))
        |       * (1 / (1 + 0.3275911 * (az * 0.7071067811865476)))
        |       * (1 / (1 + 0.3275911 * (az * 0.7071067811865476))))
        |    * exp(-((az * 0.7071067811865476)
        |      * (az * 0.7071067811865476))) AS pv
        |  FROM z),
        |r AS (SELECT event_type, grp, az, pv,
        |    row_number() OVER (ORDER BY pv, event_type, grp) AS rk,
        |    count(*) OVER () AS m
        |  FROM p),
        |adj AS (SELECT event_type, grp, az, pv,
        |    least(min((pv * m) / rk) OVER (ORDER BY rk DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 1.0)
        |      AS p_adj
        |  FROM r)
        |SELECT event_type, grp, round(az, 4) AS abs_z,
        |  round(pv, 4) AS p_value, round(p_adj, 4) AS p_adj,
        |  CAST(p_adj <= 0.1 AS BOOLEAN) AS reject
        |FROM adj ORDER BY event_type, grp""") { (s, d) =>
      val e = Tables.events(s, d).select(col("event_type"),
        expr("weekday(ts)").cast("int").as("grp"),
        when(substring(md5(col("user_id").cast("string")), 1, 1) < "8", 1)
          .otherwise(0).as("a"),
        when(col("value") > 100, 1).otherwise(0).as("conv"))
      val g = e.groupBy(col("event_type"), col("grp"))
        .agg(sum(col("a")).as("na"), sum(col("a") * col("conv")).as("ca"),
          sum(lit(1) - col("a")).as("nb"),
          sum((lit(1) - col("a")) * col("conv")).as("cb"))
      val pp = (col("ca") + col("cb")) /
        (col("na") + col("nb")).cast("double")
      val az = abs((col("ca") / col("na").cast("double") -
        col("cb") / col("nb").cast("double")) /
        nullif(sqrt(pp * (lit(1) - pp) *
          (lit(1.0) / col("na") + lit(1.0) / col("nb"))), lit(0d)))
      // Abramowitz & Stegun 7.1.26 erfc on x = |z|/√2 — the Scala vals
      // build ONE shared expression tree, the exact arithmetic the SQL
      // text spells out longhand (lambda-less SQL can't bind t).
      val x = az * lit(0.7071067811865476)
      val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
      val pv = (lit(0.254829592) * t
        - lit(0.284496736) * t * t
        + lit(1.421413741) * t * t * t
        - lit(1.453152027) * t * t * t * t
        + lit(1.061405429) * t * t * t * t * t) * exp(-(x * x))
      val p = g.select(col("event_type"), col("grp"),
        az.as("az"), pv.as("pv"))
      val r = p
        .withColumn("rk", row_number().over(
          Window.orderBy(col("pv"), col("event_type"), col("grp"))))
        .withColumn("m", count(lit(1)).over(Window.partitionBy()))
      val wmin = Window.orderBy(col("rk").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      r.withColumn("p_adj",
          least(min((col("pv") * col("m")) / col("rk")).over(wmin),
            lit(1.0)))
        .select(col("event_type"), col("grp"),
          round(col("az"), 4).as("abs_z"),
          round(col("pv"), 4).as("p_value"),
          round(col("p_adj"), 4).as("p_adj"),
          (col("p_adj") <= 0.1).as("reject"))
        .orderBy(col("event_type"), col("grp"))
    },

    // BAYESIAN A/B POSTERIOR (Beta-Binomial, uniform Beta(1,1) prior) —
    // the decision layer teams increasingly prefer over eval_ab_ztest's
    // frequentist flag: P(B beats A) and a ship decision at 95%
    // confidence. Conversions ride the ztest fixture (per-user
    // high-value purchase, md5 arms); the posterior is conjugate so
    // means/variances are CLOSED FORM in the integer counts, and
    // P(B > A) uses the normal approximation to the Beta difference
    // (both posteriors have n ≫ 30) through the same A&S erfc
    // machinery as eval_fdr_bh — Φ(s) = erfc(−s/√2)/2 folded to the
    // sign-split form. One user rollup + a 2-row pivot: every number
    // after the corpus scan is O(1).
    Q("eval_bayes_ab",
      """WITH u AS (SELECT user_id,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |      THEN 'A' ELSE 'B' END AS arm,
        |    max(CASE WHEN event_type = 'purchase' AND value > 150
        |      THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1, 2),
        |g AS (SELECT arm, count(*) AS n, sum(conv) AS c FROM u GROUP BY 1),
        |w AS (SELECT
        |    max(CASE WHEN arm = 'A' THEN n END) AS na,
        |    max(CASE WHEN arm = 'A' THEN c END) AS ca,
        |    max(CASE WHEN arm = 'B' THEN n END) AS nb,
        |    max(CASE WHEN arm = 'B' THEN c END) AS cb
        |  FROM g),
        |b AS (SELECT na, ca, nb, cb,
        |    (1.0 + ca) / (2.0 + na) AS ma, (1.0 + cb) / (2.0 + nb) AS mb,
        |    ((1.0 + ca) * (1.0 + na - ca))
        |      / (((2.0 + na) * (2.0 + na)) * (3.0 + na)) AS va,
        |    ((1.0 + cb) * (1.0 + nb - cb))
        |      / (((2.0 + nb) * (2.0 + nb)) * (3.0 + nb)) AS vb
        |  FROM w),
        |sdef AS (SELECT na, ca, nb, cb, ma, mb,
        |    (mb - ma) / sqrt(va + vb) AS sc FROM b),
        |e AS (SELECT na, ca, nb, cb, ma, mb, sc,
        |    (0.254829592
        |       * (1 / (1 + 0.3275911 * (abs(sc) * 0.7071067811865476)))
        |     - 0.284496736
        |       * (1 / (1 + 0.3275911 * (abs(sc) * 0.7071067811865476)))
        |       * (1 / (1 + 0.3275911 * (abs(sc) * 0.7071067811865476)))
        |     + 1.421413741
        |       * (1 / (1 + 0.3275911 * (abs(sc) * 0.7071067811865476)))
        |       * (1 / (1 + 0.3275911 * (abs(sc) * 0.7071067811865476)))
        |       * (1 / (1 + 0.3275911 * (abs(sc) * 0.7071067811865476)))
        |     - 1.453152027
        |       * (1 / (1 + 0.3275911 * (abs(sc) * 0.7071067811865476)))
        |       * (1 / (1 + 0.3275911 * (abs(sc) * 0.7071067811865476)))
        |       * (1 / (1 + 0.3275911 * (abs(sc) * 0.7071067811865476)))
        |       * (1 / (1 + 0.3275911 * (abs(sc) * 0.7071067811865476)))
        |     + 1.061405429
        |       * (1 / (1 + 0.3275911 * (abs(sc) * 0.7071067811865476)))
        |       * (1 / (1 + 0.3275911 * (abs(sc) * 0.7071067811865476)))
        |       * (1 / (1 + 0.3275911 * (abs(sc) * 0.7071067811865476)))
        |       * (1 / (1 + 0.3275911 * (abs(sc) * 0.7071067811865476)))
        |       * (1 / (1 + 0.3275911 * (abs(sc) * 0.7071067811865476))))
        |    * exp(-((abs(sc) * 0.7071067811865476)
        |      * (abs(sc) * 0.7071067811865476))) AS ec
        |  FROM sdef)
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(ca AS BIGINT) AS conv_a,
        |  CAST(nb AS BIGINT) AS n_b, CAST(cb AS BIGINT) AS conv_b,
        |  round(ma, 4) AS post_mean_a, round(mb, 4) AS post_mean_b,
        |  round(CASE WHEN sc >= 0 THEN 1 - ec / 2 ELSE ec / 2 END, 4)
        |    AS prob_b_beats_a,
        |  CAST((CASE WHEN sc >= 0 THEN 1 - ec / 2 ELSE ec / 2 END) > 0.95
        |    AS BOOLEAN) AS ship_b
        |FROM e""") { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy(col("user_id"),
          when(substring(md5(col("user_id").cast("string")), 1, 1) < "8",
            "A").otherwise("B").as("arm"))
        .agg(max(when(col("event_type") === "purchase" && col("value") > 150,
          1).otherwise(0)).as("conv"))
      val w = u.groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
        .agg(max(when(col("arm") === "A", col("n"))).as("na"),
          max(when(col("arm") === "A", col("c"))).as("ca"),
          max(when(col("arm") === "B", col("n"))).as("nb"),
          max(when(col("arm") === "B", col("c"))).as("cb"))
      val ma = (lit(1.0) + col("ca")) / (lit(2.0) + col("na"))
      val mb = (lit(1.0) + col("cb")) / (lit(2.0) + col("nb"))
      val va = ((lit(1.0) + col("ca")) * (lit(1.0) + col("na") - col("ca"))) /
        (((lit(2.0) + col("na")) * (lit(2.0) + col("na"))) *
          (lit(3.0) + col("na")))
      val vb = ((lit(1.0) + col("cb")) * (lit(1.0) + col("nb") - col("cb"))) /
        (((lit(2.0) + col("nb")) * (lit(2.0) + col("nb"))) *
          (lit(3.0) + col("nb")))
      val b = w.select(col("na"), col("ca"), col("nb"), col("cb"),
        ma.as("ma"), mb.as("mb"),
        ((mb - ma) / sqrt(va + vb)).as("sc"))
      val x = abs(col("sc")) * lit(0.7071067811865476)
      val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
      val ec = (lit(0.254829592) * t
        - lit(0.284496736) * t * t
        + lit(1.421413741) * t * t * t
        - lit(1.453152027) * t * t * t * t
        + lit(1.061405429) * t * t * t * t * t) * exp(-(x * x))
      val prob = when(col("sc") >= 0, lit(1) - col("ec") / 2)
        .otherwise(col("ec") / 2)
      b.withColumn("ec", ec)
        .select(col("na").cast("long").as("n_a"),
          col("ca").cast("long").as("conv_a"),
          col("nb").cast("long").as("n_b"),
          col("cb").cast("long").as("conv_b"),
          round(col("ma"), 4).as("post_mean_a"),
          round(col("mb"), 4).as("post_mean_b"),
          round(prob, 4).as("prob_b_beats_a"),
          (prob > 0.95).as("ship_b"))
    },

    // COARSENED EXACT MATCHING ATT (Iacus, King & Porro 2012) — the
    // observational-causal estimator that actually DISTRIBUTES, unlike
    // nearest-neighbor propensity matching (whose global score-sorted
    // sweep is exactly the single-partition shape the window law
    // bans): confounders coarsen into explicit strata (activity-decile
    // ln-bins × active-day bins — fixed arithmetic bins, no global
    // rank), treated and control units match WITHIN a stratum
    // (one groupBy), strata missing either side drop, and the ATT is
    // the treated-weighted mean of within-stratum outcome differences.
    // The naive (unmatched) difference ships alongside so the
    // confounding correction is visible. Treatment here: the user made
    // a high-value purchase; outcome: non-purchase engagement spend;
    // confounders: event volume and active days — deliberately
    // correlated with treatment so CEM has something to fix. All exact
    // DECIMAL sums; stratum terms quantize before the final rollup.
    Q("eval_cem_att",
      """WITH u AS (SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 150
        |      THEN 1 ELSE 0 END) AS treat,
        |    sum(CASE WHEN event_type <> 'purchase'
        |      THEN CAST(value AS DECIMAL(18,4)) ELSE CAST(0 AS
        |      DECIMAL(18,4)) END) AS outcome,
        |    count(*) AS n_ev,
        |    count(DISTINCT CAST(ts AS DATE)) AS days
        |  FROM events GROUP BY 1),
        |c AS (SELECT user_id, treat, outcome,
        |    CAST(floor(ln(1 + n_ev) / 0.5) AS INT) AS b_ev,
        |    CAST(least(days, 8) AS INT) AS b_days
        |  FROM u),
        |s AS (SELECT b_ev, b_days,
        |    CAST(sum(treat) AS BIGINT) AS nt,
        |    CAST(count(*) - sum(treat) AS BIGINT) AS nc,
        |    sum(CASE WHEN treat = 1 THEN outcome END) AS st,
        |    sum(CASE WHEN treat = 0 THEN outcome END) AS sc
        |  FROM c GROUP BY 1, 2),
        |m AS (SELECT b_ev, b_days, nt, nc,
        |    CAST(round(nt * (CAST(st AS DOUBLE) / nt
        |      - CAST(sc AS DOUBLE) / nc), 6) AS DECIMAL(28,6)) AS term
        |  FROM s WHERE nt > 0 AND nc > 0),
        |att AS (SELECT CAST(sum(nt) AS BIGINT) AS n_treated_matched,
        |    CAST(sum(nc) AS BIGINT) AS n_control_matched,
        |    CAST(count(*) AS BIGINT) AS n_strata,
        |    CAST(sum(term) AS DOUBLE) / sum(nt) AS att
        |  FROM m),
        |naive AS (SELECT
        |    CAST(sum(CASE WHEN treat = 1 THEN outcome END) AS DOUBLE)
        |      / sum(treat)
        |    - CAST(sum(CASE WHEN treat = 0 THEN outcome END) AS DOUBLE)
        |      / (count(*) - sum(treat)) AS naive_diff
        |  FROM u)
        |SELECT att.n_treated_matched, att.n_control_matched,
        |  att.n_strata, round(att.att, 4) AS att,
        |  round(naive.naive_diff, 4) AS naive_diff
        |FROM att CROSS JOIN naive""") { (s, d) =>
      val u = Tables.events(s, d).groupBy(col("user_id"))
        .agg(
          max(when(col("event_type") === "purchase" && col("value") > 150,
            1).otherwise(0)).as("treat"),
          sum(when(col("event_type") =!= "purchase",
            col("value").cast("decimal(18,4)"))
            .otherwise(lit(0).cast("decimal(18,4)"))).as("outcome"),
          count(lit(1)).as("n_ev"),
          countDistinct(col("ts").cast("date")).as("days"))
      val c = u.select(col("treat"), col("outcome"),
        floor(log(lit(1) + col("n_ev")) / 0.5).cast("int").as("b_ev"),
        least(col("days"), lit(8)).cast("int").as("b_days"))
      val st = c.groupBy(col("b_ev"), col("b_days"))
        .agg(sum(col("treat")).cast("long").as("nt"),
          (count(lit(1)) - sum(col("treat"))).cast("long").as("nc"),
          sum(when(col("treat") === 1, col("outcome"))).as("st"),
          sum(when(col("treat") === 0, col("outcome"))).as("sc"))
      val m = st.filter(col("nt") > 0 && col("nc") > 0)
        .select(col("nt"), col("nc"),
          round(col("nt") * (col("st").cast("double") / col("nt")
            - col("sc").cast("double") / col("nc")), 6)
            .cast("decimal(28,6)").as("term"))
      val att = m.agg(sum(col("nt")).cast("long").as("n_treated_matched"),
        sum(col("nc")).cast("long").as("n_control_matched"),
        count(lit(1)).cast("long").as("n_strata"),
        (sum(col("term")).cast("double") / sum(col("nt"))).as("att"))
      val naive = u.agg(
        (sum(when(col("treat") === 1, col("outcome"))).cast("double") /
          sum(col("treat")) -
          sum(when(col("treat") === 0, col("outcome"))).cast("double") /
            (count(lit(1)) - sum(col("treat")))).as("naive_diff"))
      att.crossJoin(broadcast(naive))
        .select(col("n_treated_matched"), col("n_control_matched"),
          col("n_strata"), round(col("att"), 4).as("att"),
          round(col("naive_diff"), 4).as("naive_diff"))
    },

    // SHARP REGRESSION DISCONTINUITY (Thistlethwaite & Campbell 1960;
    // local-linear form) — the causal estimate at a POLICY CUTOFF:
    // users crossing total-spend 1000 get "treated" (sharp assignment
    // by construction), and the effect on engagement volume is the gap
    // between two local linear fits at the cutoff, each fit from
    // DECIMAL-quantized OLS sums within the ±600 bandwidth. Everything
    // is two stacked closed-form regressions on one user rollup — no
    // windows, no sort, the same sufficient-statistic discipline as
    // agg_regression/ts_adf. Output: both intercepts/slopes at the
    // cutoff, the RDD effect, and the side counts.
    Q("eval_rdd_effect",
      """WITH u AS (SELECT user_id,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS spend,
        |    count(*) AS n_ev
        |  FROM events GROUP BY 1),
        |b AS (SELECT CASE WHEN spend >= 1000 THEN 1 ELSE 0 END AS side,
        |    spend - 1000 AS x, CAST(n_ev AS DOUBLE) AS y
        |  FROM u WHERE spend >= 400 AND spend < 1600),
        |s AS (SELECT side, count(*) AS n,
        |    CAST(sum(CAST(round(x, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(round(y, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(round(x * x, 6) AS DECIMAL(28,6))) AS DOUBLE)
        |      AS sxx,
        |    CAST(sum(CAST(round(x * y, 6) AS DECIMAL(28,6))) AS DOUBLE)
        |      AS sxy
        |  FROM b GROUP BY 1),
        |f AS (SELECT side, n,
        |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
        |    (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
        |      AS icept
        |  FROM s),
        |w AS (SELECT
        |    max(CASE WHEN side = 0 THEN n END) AS n_left,
        |    max(CASE WHEN side = 1 THEN n END) AS n_right,
        |    max(CASE WHEN side = 0 THEN icept END) AS icept_left,
        |    max(CASE WHEN side = 1 THEN icept END) AS icept_right,
        |    max(CASE WHEN side = 0 THEN slope END) AS slope_left,
        |    max(CASE WHEN side = 1 THEN slope END) AS slope_right
        |  FROM f)
        |SELECT CAST(n_left AS BIGINT) AS n_left,
        |  CAST(n_right AS BIGINT) AS n_right,
        |  round(icept_left, 4) AS icept_left,
        |  round(icept_right, 4) AS icept_right,
        |  round(slope_left, 6) AS slope_left,
        |  round(slope_right, 6) AS slope_right,
        |  round(icept_right - icept_left, 4) AS rdd_effect
        |FROM w""") { (s, d) =>
      val u = Tables.events(s, d).groupBy(col("user_id"))
        .agg(sum(col("value").cast("decimal(18,4)")).cast("double")
          .as("spend"), count(lit(1)).as("n_ev"))
      val b = u.filter(col("spend") >= 400 && col("spend") < 1600)
        .select(when(col("spend") >= 1000, 1).otherwise(0).as("side"),
          (col("spend") - 1000).as("x"), col("n_ev").cast("double").as("y"))
      def qs(c: org.apache.spark.sql.Column) =
        sum(round(c, 6).cast("decimal(28,6)")).cast("double")
      val st = b.groupBy(col("side"))
        .agg(count(lit(1)).as("n"), qs(col("x")).as("sx"),
          qs(col("y")).as("sy"), qs(col("x") * col("x")).as("sxx"),
          qs(col("x") * col("y")).as("sxy"))
      val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
        (col("n") * col("sxx") - col("sx") * col("sx"))
      val f = st.select(col("side"), col("n"), slope.as("slope"),
        ((col("sy") - slope * col("sx")) / col("n")).as("icept"))
      f.agg(max(when(col("side") === 0, col("n"))).as("n_left"),
          max(when(col("side") === 1, col("n"))).as("n_right"),
          max(when(col("side") === 0, col("icept"))).as("icept_left"),
          max(when(col("side") === 1, col("icept"))).as("icept_right"),
          max(when(col("side") === 0, col("slope"))).as("slope_left"),
          max(when(col("side") === 1, col("slope"))).as("slope_right"))
        .select(col("n_left").cast("long").as("n_left"),
          col("n_right").cast("long").as("n_right"),
          round(col("icept_left"), 4).as("icept_left"),
          round(col("icept_right"), 4).as("icept_right"),
          round(col("slope_left"), 6).as("slope_left"),
          round(col("slope_right"), 6).as("slope_right"),
          round(col("icept_right") - col("icept_left"), 4)
            .as("rdd_effect"))
    },

    // SPLIT-CONFORMAL PREDICTION INTERVALS (Vovk et al.; Lei et al.
    // 2018 split form) — the distribution-free uncertainty wrapper a
    // serving pipeline puts around ANY point model: fit on the train
    // split (here the per-type mean — the model is deliberately
    // simple; conformal wraps anything), take the 90th percentile of
    // absolute residuals on the CALIBRATION split, and the interval
    // μ ± q̂ is guaranteed ≥ 90% coverage on exchangeable test data.
    // The three splits hash deterministically from event_id (mod 3 —
    // train/calibrate/test), the calibration quantile is the exact
    // percentile idiom (KLL at 100 TB), and the coverage check on the
    // held-out split is the oracle-verifiable readout: per type, the
    // empirical coverage must straddle the nominal 90%. Three linear
    // scans, per-type rollups — nothing global.
    Q("eval_conformal",
      """WITH tr AS (SELECT event_type,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*)
        |      AS mu
        |  FROM events WHERE event_id % 3 = 0 GROUP BY 1),
        |cal AS (SELECT e.event_type,
        |    quantile_cont(CAST(abs(e.value - tr.mu) AS DOUBLE), 0.9)
        |      AS qhat
        |  FROM events e JOIN tr ON tr.event_type = e.event_type
        |  WHERE e.event_id % 3 = 1 GROUP BY 1),
        |tst AS (SELECT e.event_type,
        |    count(*) AS n_test,
        |    sum(CASE WHEN abs(e.value - tr.mu) <= cal.qhat
        |      THEN 1 ELSE 0 END) AS covered
        |  FROM events e JOIN tr ON tr.event_type = e.event_type
        |  JOIN cal ON cal.event_type = e.event_type
        |  WHERE e.event_id % 3 = 2 GROUP BY 1)
        |SELECT t.event_type, round(tr.mu, 4) AS mu,
        |  round(cal.qhat, 4) AS q_hat,
        |  CAST(t.n_test AS BIGINT) AS n_test,
        |  round(t.covered / CAST(t.n_test AS DOUBLE), 4) AS coverage
        |FROM tst t JOIN tr ON tr.event_type = t.event_type
        |JOIN cal ON cal.event_type = t.event_type
        |ORDER BY t.event_type""") { (s, d) =>
      val ev = Tables.events(s, d)
      val tr = ev.filter(col("event_id") % 3 === 0)
        .groupBy(col("event_type"))
        .agg((sum(col("value").cast("decimal(18,4)")).cast("double") /
          count(lit(1))).as("mu"))
      val cal = ev.filter(col("event_id") % 3 === 1)
        .join(broadcast(tr.withColumnRenamed("event_type", "et")),
          col("event_type") === col("et"))
        .groupBy(col("event_type"))
        .agg(expr("percentile(CAST(abs(value - mu) AS DOUBLE), 0.9)")
          .as("qhat"))
      val tst = ev.filter(col("event_id") % 3 === 2)
        .join(broadcast(tr.withColumnRenamed("event_type", "et")),
          col("event_type") === col("et"))
        .join(broadcast(cal.withColumnRenamed("event_type", "ec")),
          col("event_type") === col("ec"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_test"),
          sum(when(abs(col("value") - col("mu")) <= col("qhat"), 1)
            .otherwise(0)).as("covered"))
      tst
        .join(broadcast(tr.withColumnRenamed("event_type", "et")),
          col("event_type") === col("et"))
        .join(broadcast(cal.withColumnRenamed("event_type", "ec")),
          col("event_type") === col("ec"))
        .select(col("event_type"), round(col("mu"), 4).as("mu"),
          round(col("qhat"), 4).as("q_hat"),
          col("n_test").cast("long").as("n_test"),
          round(col("covered") / col("n_test").cast("double"), 4)
            .as("coverage"))
        .orderBy(col("event_type"))
    },

    // PERMUTATION TEST on per-user spend (two-sample mean difference,
    // R = 200 re-randomizations) — the assumption-free significance
    // test for the metrics where eval_ttest_welch's normality and
    // eval_mannwhitney's rank model both feel wrong (heavy-tailed
    // revenue). The permutations are DETERMINISTIC: replicate r
    // re-assigns each user by the md5 of user:r (the same '8'-nibble
    // law as the real assignment), so both engines replay the
    // identical 200 shuffles — a fixed re-randomization protocol, not
    // RNG. Shape at 100 TB: the corpus collapses to the user-level
    // spend relation FIRST (the only corpus-scale shuffle); the ×200
    // replicate explode is entity-level and embarrassingly parallel
    // (users × 200 → 200 partial-aggregated rows), and per-user spend
    // is DECIMAL-exact so every T_r is the same IEEE double in both
    // engines — the |T_r| ≥ |T_obs| comparison needs no tolerance.
    // p = (1 + #extreme)/(R+1), the add-one permutation convention.
    Q("eval_permutation",
      """WITH u AS (SELECT user_id,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |      THEN 1 ELSE 0 END AS a,
        |    sum(CAST(value AS DECIMAL(18,4))) AS spend
        |  FROM events GROUP BY 1, 2),
        |obs AS (SELECT
        |    CAST(sum(CASE WHEN a = 1 THEN spend END) AS DOUBLE)
        |      / nullif(sum(a), 0)
        |    - CAST(sum(CASE WHEN a = 0 THEN spend END) AS DOUBLE)
        |      / nullif(sum(1 - a), 0) AS t_obs
        |  FROM u),
        |reps AS (SELECT unnest(range(1, 201)) AS r),
        |perm AS (SELECT r.r,
        |    CASE WHEN substr(md5(CAST(u.user_id AS VARCHAR) || ':'
        |      || CAST(r.r AS VARCHAR)), 1, 1) < '8' THEN 1 ELSE 0 END AS a,
        |    u.spend
        |  FROM u CROSS JOIN reps r),
        |ts AS (SELECT r,
        |    CAST(sum(CASE WHEN a = 1 THEN spend END) AS DOUBLE)
        |      / nullif(sum(a), 0)
        |    - CAST(sum(CASE WHEN a = 0 THEN spend END) AS DOUBLE)
        |      / nullif(sum(1 - a), 0) AS t_r
        |  FROM perm GROUP BY 1)
        |SELECT CAST(200 AS BIGINT) AS n_perm,
        |  round(o.t_obs, 4) AS t_obs,
        |  CAST(sum(CASE WHEN abs(ts.t_r) >= abs(o.t_obs) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_extreme,
        |  round((1 + sum(CASE WHEN abs(ts.t_r) >= abs(o.t_obs)
        |    THEN 1 ELSE 0 END)) / 201.0, 4) AS p_value
        |FROM ts CROSS JOIN obs o GROUP BY o.t_obs""") { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy(col("user_id"),
          when(substring(md5(col("user_id").cast("string")), 1, 1) < "8", 1)
            .otherwise(0).as("a"))
        .agg(sum(col("value").cast("decimal(18,4)")).as("spend"))
      // nullif-guarded: an all-one-side md5 draw (possible on tiny
      // inputs) yields a NULL T_r in both engines — it drops out of
      // the ≥ count instead of tripping ANSI divide-by-zero.
      def tdiff(df: org.apache.spark.sql.RelationalGroupedDataset) =
        df.agg((sum(when(col("a") === 1, col("spend"))).cast("double") /
          nullif(sum(col("a")), lit(0)) -
          sum(when(col("a") === 0, col("spend"))).cast("double") /
            nullif(sum(lit(1) - col("a")), lit(0))).as("t"))
      val obs = tdiff(u.groupBy()).select(col("t").as("t_obs"))
      val reps = s.range(1, 201).select(col("id").cast("int").as("r"))
      val perm = u.crossJoin(broadcast(reps))
        .select(col("r"),
          when(substring(md5(concat(col("user_id").cast("string"), lit(":"),
            col("r").cast("string"))), 1, 1) < "8", 1).otherwise(0).as("a"),
          col("spend"))
      val ts = tdiff(perm.groupBy(col("r"))).select(col("t").as("t_r"))
      ts.crossJoin(broadcast(obs))
        .groupBy(col("t_obs"))
        .agg(
          sum(when(abs(col("t_r")) >= abs(col("t_obs")), 1).otherwise(0))
            .cast("long").as("n_extreme"))
        .select(lit(200L).as("n_perm"),
          round(col("t_obs"), 4).as("t_obs"),
          col("n_extreme"),
          round((lit(1) + col("n_extreme")) / 201.0, 4).as("p_value"))
    },

    // CRAMÉR'S V (+ the Bergsma 2013 bias-corrected Ṽ) over the same
    // three feature×label contingency tables eval_chi2 scores — the
    // EFFECT SIZE the chi-square p-value doesn't give (χ² grows with n
    // even for a trivial association; V = sqrt(φ²/min(r−1,c−1)) is
    // scale-free, so it's the number a 100 TB feature screen actually
    // ranks by). φ̃² subtracts the (r−1)(c−1)/(n−1) chance inflation
    // and clamps at 0 — small-table Vs otherwise read as association
    // where there is none. Same quantized-term χ² machinery; the few
    // extra scalars ride the same per-feature rollup.
    Q("eval_cramers_v",
      s"""WITH e AS (SELECT CAST(date_part('isodow', ts) - 1 AS VARCHAR) AS wd,
         |    CAST(CAST(date_part('hour', ts) AS INT) // 4 AS VARCHAR) AS tod,
         |    CAST(CAST(floor(least(greatest(value, 0), 199.99)) AS INT)
         |      // 50 AS VARCHAR) AS vq,
         |    $lbl AS lbl FROM events),
         |u AS (SELECT 'weekday' AS feature, wd AS v, lbl FROM e
         |  UNION ALL SELECT 'tod4h', tod, lbl FROM e
         |  UNION ALL SELECT 'score_q', vq, lbl FROM e),
         |cells AS (SELECT feature, v, lbl, count(*) AS c FROM u GROUP BY 1,2,3),
         |rowm AS (SELECT feature, v, sum(c) AS rc FROM cells GROUP BY 1,2),
         |colm AS (SELECT feature, lbl, sum(c) AS cc FROM cells GROUP BY 1,2),
         |tot AS (SELECT feature, sum(c) AS n FROM cells GROUP BY 1),
         |x AS (SELECT rowm.feature,
         |    CAST((coalesce(cells.c, 0) - rc * cc / CAST(n AS DOUBLE))
         |         * (coalesce(cells.c, 0) - rc * cc / CAST(n AS DOUBLE))
         |         / (rc * cc / CAST(n AS DOUBLE)) AS DECIMAL(28,12)) AS term
         |  FROM rowm
         |  JOIN colm ON colm.feature = rowm.feature
         |  JOIN tot ON tot.feature = rowm.feature
         |  LEFT JOIN cells ON cells.feature = rowm.feature
         |    AND cells.v = rowm.v AND cells.lbl = colm.lbl),
         |k AS (SELECT feature,
         |    CAST(count(DISTINCT v) AS BIGINT) AS r,
         |    CAST(count(DISTINCT lbl) AS BIGINT) AS c,
         |    CAST(sum(c) AS BIGINT) AS n
         |  FROM cells GROUP BY 1),
         |s AS (SELECT x.feature, CAST(sum(term) AS DOUBLE) AS chi2
         |  FROM x GROUP BY 1),
         |f AS (SELECT k.feature, k.r, k.c, k.n, s.chi2,
         |    s.chi2 / k.n AS phi2,
         |    greatest(s.chi2 / k.n
         |      - (k.r - 1) * (k.c - 1) / CAST(k.n - 1 AS DOUBLE), 0) AS phi2t,
         |    k.r - (k.r - 1) * (k.r - 1) / CAST(k.n - 1 AS DOUBLE) AS rt,
         |    k.c - (k.c - 1) * (k.c - 1) / CAST(k.n - 1 AS DOUBLE) AS ct
         |  FROM k JOIN s ON s.feature = k.feature)
         |SELECT feature, CAST(r AS BIGINT) AS r, CAST(c AS BIGINT) AS c,
         |  round(chi2, 4) AS chi2,
         |  round(sqrt(phi2 / least(r - 1, c - 1)), 4) AS v,
         |  round(sqrt(phi2t / least(rt - 1, ct - 1)), 4) AS v_corrected
         |FROM f ORDER BY feature""") { (s, d) =>
      val e = Tables.events(s, d).select(
        expr("CAST(weekday(ts) AS STRING)").as("wd"),
        expr("CAST(CAST(hour(ts) AS INT) DIV 4 AS STRING)").as("tod"),
        // greatest(value, 0): Spark DIV truncates toward zero while
        // DuckDB // floors — they diverge on negatives, so the bucket
        // is clamped non-negative in BOTH dialects (round-13 ANSI-div
        // discipline) instead of silently relying on the fixture's min.
        expr("CAST(CAST(floor(least(greatest(value, 0), 199.99)) AS INT) DIV 50 AS STRING)").as("vq"),
        expr(lbl).as("lbl"))
      val u = e.select(expr(
        """stack(3, 'weekday', wd, 'tod4h', tod, 'score_q', vq)
          |  AS (feature, v)""".stripMargin), col("lbl"))
      val cells = u.groupBy(col("feature"), col("v"), col("lbl"))
        .agg(count(lit(1)).as("c")).cache()
      val rowm = cells.groupBy(col("feature"), col("v"))
        .agg(sum(col("c")).as("rc"))
      val colm = cells.groupBy(col("feature"), col("lbl"))
        .agg(sum(col("c")).as("cc"))
      val tot = cells.groupBy(col("feature")).agg(sum(col("c")).as("n"))
      val k = cells.groupBy(col("feature"))
        .agg(countDistinct(col("v")).cast("long").as("r"),
          countDistinct(col("lbl")).cast("long").as("c"),
          sum(col("c")).cast("long").as("n"))
      val chi2 = rowm
        .join(colm, Seq("feature"))
        .join(tot, Seq("feature"))
        .join(cells, Seq("feature", "v", "lbl"), "left")
        .select(col("feature"),
          expr("""CAST((coalesce(c, 0) - rc * cc / CAST(n AS DOUBLE))
                 |     * (coalesce(c, 0) - rc * cc / CAST(n AS DOUBLE))
                 |     / (rc * cc / CAST(n AS DOUBLE)) AS DECIMAL(28,12))""".stripMargin)
            .as("term"))
        .groupBy(col("feature"))
        .agg(sum(col("term")).cast("double").as("chi2"))
      k.join(chi2, Seq("feature"))
        .select(col("feature"), col("r"), col("c"), col("chi2"),
          (col("chi2") / col("n")).as("phi2"),
          greatest(col("chi2") / col("n") -
            (col("r") - 1) * (col("c") - 1) /
              (col("n") - 1).cast("double"), lit(0)).as("phi2t"),
          (col("r") - (col("r") - 1) * (col("r") - 1) /
            (col("n") - 1).cast("double")).as("rt"),
          (col("c") - (col("c") - 1) * (col("c") - 1) /
            (col("n") - 1).cast("double")).as("ct"))
        .select(col("feature"), col("r"), col("c"),
          round(col("chi2"), 4).as("chi2"),
          round(sqrt(col("phi2") / least(col("r") - 1, col("c") - 1)), 4)
            .as("v"),
          round(sqrt(col("phi2t") / least(col("rt") - 1, col("ct") - 1)), 4)
            .as("v_corrected"))
        .orderBy(col("feature"))
    },

    // GWET'S AC1 (Gwet 2008) on the same two-rater fixture eval_kappa
    // scores — the agreement coefficient that survives the "kappa
    // paradox" (skewed marginals drive Cohen's Pe toward Po, so two
    // raters agreeing 95% of the time can score κ ≈ 0; AC1's chance
    // term uses the MEAN marginal π_k(1−π_k)/(q−1), which stays small
    // under skew). Same two hash aggregates over the marginals; the
    // chance term is a q-row rollup with DECIMAL-quantized π terms.
    Q("eval_gwet_ac1",
      s"""WITH e AS (SELECT ${valClass("int")} AS a,
         |    (instr('0123456789abcdef',
         |           substring(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 1) % 5 AS b
         |  FROM events),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree
         |  FROM e),
         |pa AS (SELECT a AS k, count(*) AS ca FROM e GROUP BY 1),
         |pb AS (SELECT b AS k, count(*) AS cb FROM e GROUP BY 1),
         |ks AS (SELECT coalesce(pa.k, pb.k) AS k,
         |    coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
         |  FROM pa FULL OUTER JOIN pb ON pa.k = pb.k),
         |pe AS (SELECT CAST(count(*) AS BIGINT) AS q,
         |    CAST(sum(CAST(round(
         |      ((ca + cb) / (2.0 * (SELECT n FROM n)))
         |      * (1 - (ca + cb) / (2.0 * (SELECT n FROM n))), 12)
         |      AS DECIMAL(28,12))) AS DOUBLE) AS pik
         |  FROM ks)
         |SELECT n, q,
         |  round(agree / CAST(n AS DOUBLE), 4) AS po,
         |  round(pik / (q - 1), 4) AS pe_gamma,
         |  round((agree / CAST(n AS DOUBLE) - pik / (q - 1))
         |        / (1 - pik / (q - 1)), 4) AS ac1
         |FROM n, pe ORDER BY n""") { (s, d) =>
      val e = Tables.events(s, d).select(
        expr(valClass("int")).as("a"),
        expr("(instr('0123456789abcdef', substring(md5(CAST(event_id AS STRING)), 1, 1)) - 1) % 5").as("b"))
        .cache()
      val n = e.agg(count(lit(1)).cast("long").as("n"),
        sum(expr("CASE WHEN a = b THEN 1 ELSE 0 END")).cast("long")
          .as("agree"))
      val pa = e.groupBy(col("a").as("k")).agg(count(lit(1)).as("ca"))
      val pb = e.groupBy(col("b").as("k")).agg(count(lit(1)).as("cb"))
      val ks = pa.join(pb, Seq("k"), "full_outer")
        .select(coalesce(col("ca"), lit(0)).as("ca"),
          coalesce(col("cb"), lit(0)).as("cb"))
      val pe = ks.crossJoin(broadcast(n.select(col("n").as("nn"))))
        .select(
          round(((col("ca") + col("cb")) / (lit(2.0) * col("nn"))) *
            (lit(1) - (col("ca") + col("cb")) / (lit(2.0) * col("nn"))), 12)
            .cast("decimal(28,12)").as("pik_t"))
        .agg(count(lit(1)).cast("long").as("q"),
          sum(col("pik_t")).cast("double").as("pik"))
      n.crossJoin(broadcast(pe))
        .select(col("n"), col("q"),
          round(col("agree") / col("n").cast("double"), 4).as("po"),
          round(col("pik") / (col("q") - 1), 4).as("pe_gamma"),
          round((col("agree") / col("n").cast("double") -
            col("pik") / (col("q") - 1)) /
            (lit(1) - col("pik") / (col("q") - 1)), 4).as("ac1"))
        .orderBy(col("n"))
    },

    // SOMERS' D + GOODMAN-KRUSKAL GAMMA per weekday group — the full
    // concordance census behind eval_auc's rank statistic, as exact
    // integers: over all (positive, negative) pairs, C = concordant
    // (positive scored higher), D = discordant, T = score-tied. The
    // scale move is eval_auc's: collapse to (group, score) counts
    // first, then ONE window over the distinct scores yields all three
    // sums analytically — never a pairs join. Laws the spec pins:
    // C + D + T = pos·neg exactly, and somers_d = 2·AUC − 1.
    Q("eval_somers_gamma",
      s"""WITH e AS (SELECT CAST(date_part('isodow', ts) - 1 AS INT) AS grp,
         |    value AS score, $lbl AS lbl FROM events),
         |s AS (SELECT grp, score, count(*) AS cnt, sum(lbl) AS pos
         |  FROM e GROUP BY 1, 2),
         |r AS (SELECT grp, cnt, pos, cnt - pos AS neg,
         |    sum(cnt - pos) OVER (PARTITION BY grp ORDER BY score)
         |      - (cnt - pos) AS neg_below,
         |    sum(cnt - pos) OVER (PARTITION BY grp) AS neg_all
         |  FROM s),
         |a AS (SELECT grp,
         |    CAST(sum(pos * neg_below) AS BIGINT) AS c_pairs,
         |    CAST(sum(pos * (neg_all - neg_below - neg)) AS BIGINT) AS d_pairs,
         |    CAST(sum(pos * neg) AS BIGINT) AS t_pairs
         |  FROM r GROUP BY 1)
         |SELECT grp, c_pairs, d_pairs, t_pairs,
         |  round((c_pairs - d_pairs)
         |    / CAST(c_pairs + d_pairs + t_pairs AS DOUBLE), 4) AS somers_d,
         |  round((c_pairs - d_pairs)
         |    / CAST(nullif(c_pairs + d_pairs, 0) AS DOUBLE), 4) AS gamma
         |FROM a ORDER BY grp""") { (s, d) =>
      val e = Tables.events(s, d).select(
        expr("weekday(ts)").as("grp"), col("value").as("score"),
        expr(lbl).as("lbl"))
      val grouped = e.groupBy(col("grp"), col("score"))
        .agg(count(lit(1)).as("cnt"), sum(col("lbl")).as("pos"))
        .withColumn("neg", col("cnt") - col("pos"))
      val w = Window.partitionBy(col("grp")).orderBy(col("score"))
      val wa = Window.partitionBy(col("grp"))
      grouped
        .withColumn("neg_below", sum(col("neg")).over(w) - col("neg"))
        .withColumn("neg_all", sum(col("neg")).over(wa))
        .groupBy(col("grp"))
        .agg(sum(col("pos") * col("neg_below")).cast("long").as("c_pairs"),
          sum(col("pos") * (col("neg_all") - col("neg_below") - col("neg")))
            .cast("long").as("d_pairs"),
          sum(col("pos") * col("neg")).cast("long").as("t_pairs"))
        .select(col("grp"), col("c_pairs"), col("d_pairs"), col("t_pairs"),
          round((col("c_pairs") - col("d_pairs")) /
            (col("c_pairs") + col("d_pairs") + col("t_pairs"))
              .cast("double"), 4).as("somers_d"),
          round((col("c_pairs") - col("d_pairs")) /
            nullif((col("c_pairs") + col("d_pairs")).cast("double"), lit(0d)),
            4).as("gamma"))
        .orderBy(col("grp"))
    },

    // HOSMER-LEMESHOW goodness-of-fit for the deterministic sigmoid
    // model eval_brier/eval_calibration score — the single-number
    // calibration TEST next to their per-bin readouts: over 10
    // FIXED-WIDTH probability bins (decile-by-count needs a global
    // rank; fixed bins are the scale-free form and keep the statistic
    // a pure hash aggregate), Ĉ = Σ (O_b − E_b)² / (E_b (1 − E_b/n_b)),
    // df = bins − 2. E_b is a DECIMAL-quantized sum of p, and each
    // bin's term is quantized before the 10-row sum — bit-identical on
    // any partitioning. The sigmoid keeps p in [0.076, 0.924] on this
    // fixture, so no bin can zero the denominator.
    Q("eval_hosmer_lemeshow",
      s"""WITH e AS (SELECT
         |    least(CAST(floor((1 / (1 + exp(-(value - 100) / 40.0))) * 10)
         |      AS INT), 9) AS bin,
         |    1 / (1 + exp(-(value - 100) / 40.0)) AS p, $lbl AS lbl
         |  FROM events),
         |b AS (SELECT bin, count(*) AS n, CAST(sum(lbl) AS BIGINT) AS o,
         |    CAST(sum(CAST(round(p, 12) AS DECIMAL(28,12))) AS DOUBLE) AS ex
         |  FROM e GROUP BY 1),
         |t AS (SELECT bin, n, o, ex,
         |    CAST(round((o - ex) * (o - ex) / (ex * (1 - ex / n)), 12)
         |      AS DECIMAL(28,12)) AS term
         |  FROM b)
         |SELECT CAST(count(*) AS BIGINT) AS n_bins,
         |  CAST(count(*) - 2 AS BIGINT) AS df,
         |  round(CAST(sum(term) AS DOUBLE), 4) AS chi2_hl
         |FROM t""") { (s, d) =>
      Tables.events(s, d)
        .select(
          least(floor(expr("1 / (1 + exp(-(value - 100) / 40.0))") * 10)
            .cast("int"), lit(9)).as("bin"),
          expr("1 / (1 + exp(-(value - 100) / 40.0))").as("p"),
          expr(lbl).as("lbl"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("lbl")).cast("long").as("o"),
          sum(round(col("p"), 12).cast("decimal(28,12)")).cast("double")
            .as("ex"))
        .select(round((col("o") - col("ex")) * (col("o") - col("ex")) /
          (col("ex") * (lit(1) - col("ex") / col("n"))), 12)
          .cast("decimal(28,12)").as("term"))
        .agg(count(lit(1)).cast("long").as("n_bins"),
          (count(lit(1)) - 2).cast("long").as("df"),
          round(sum(col("term")).cast("double"), 4).as("chi2_hl"))
    },

    // ONE-WAY INTRACLASS CORRELATION ICC(1) (Shrout & Fleiss 1979)
    // with weekdays as the grouping factor — "how much of the score
    // variance is BETWEEN days": the random-effects ANOVA decomposition
    // every hierarchical-data pipeline runs before it decides whether
    // day must be a blocking factor. Unbalanced-design form: n0 =
    // (N − Σn_i²/N)/(k−1). Per-group sums ride welch's DECIMAL(18,4)
    // value quantization; the k-row combine quantizes each group's
    // s1²/n term before the 7-row sum, so the F-ratio is
    // partition-invariant to the last bit.
    Q("eval_icc",
      """WITH e AS (SELECT CAST(date_part('isodow', ts) - 1 AS INT) AS grp,
        |    CAST("value" AS DECIMAL(18,4)) AS x FROM events),
        |g AS (SELECT grp, count(*) AS n,
        |    CAST(sum(x) AS DOUBLE) AS s1,
        |    CAST(sum(x * x) AS DOUBLE) AS s2
        |  FROM e GROUP BY 1),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(n) AS BIGINT) AS nn,
        |    CAST(sum(CAST(round(s1, 6) AS DECIMAL(28,6))) AS DOUBLE) AS gs,
        |    CAST(sum(CAST(round(s1 * s1 / n, 8) AS DECIMAL(28,8)))
        |      AS DOUBLE) AS ssb_raw,
        |    CAST(sum(CAST(round(s2 - s1 * s1 / n, 8) AS DECIMAL(28,8)))
        |      AS DOUBLE) AS ssw,
        |    CAST(sum(CAST(n AS BIGINT) * CAST(n AS BIGINT)) AS BIGINT) AS sn2
        |  FROM g),
        |m AS (SELECT k, nn,
        |    (ssb_raw - gs * gs / nn) / (k - 1) AS msb,
        |    ssw / (nn - k) AS msw,
        |    (nn - sn2 / CAST(nn AS DOUBLE)) / (k - 1) AS n0
        |  FROM c)
        |SELECT CAST(k AS BIGINT) AS k, CAST(nn AS BIGINT) AS n,
        |  round(msb, 4) AS msb, round(msw, 4) AS msw,
        |  round(msb / msw, 4) AS f_stat,
        |  round((msb - msw) / (msb + (n0 - 1) * msw), 4) AS icc1
        |FROM m""") { (s, d) =>
      val e = Tables.events(s, d).select(
        expr("weekday(ts)").as("grp"),
        col("value").cast("decimal(18,4)").as("x"))
      val g = e.groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), sum(col("x")).cast("double").as("s1"),
          sum(col("x") * col("x")).cast("double").as("s2"))
      val c = g.agg(count(lit(1)).cast("long").as("k"),
        sum(col("n")).cast("long").as("nn"),
        sum(round(col("s1"), 6).cast("decimal(28,6)")).cast("double")
          .as("gs"),
        sum(round(col("s1") * col("s1") / col("n"), 8)
          .cast("decimal(28,8)")).cast("double").as("ssb_raw"),
        sum(round(col("s2") - col("s1") * col("s1") / col("n"), 8)
          .cast("decimal(28,8)")).cast("double").as("ssw"),
        sum(col("n").cast("long") * col("n").cast("long")).cast("long")
          .as("sn2"))
      c.select(col("k"), col("nn"),
          ((col("ssb_raw") - col("gs") * col("gs") / col("nn")) /
            (col("k") - 1)).as("msb"),
          (col("ssw") / (col("nn") - col("k"))).as("msw"),
          ((col("nn") - col("sn2") / col("nn").cast("double")) /
            (col("k") - 1)).as("n0"))
        .select(col("k"), col("nn").as("n"),
          round(col("msb"), 4).as("msb"), round(col("msw"), 4).as("msw"),
          round(col("msb") / col("msw"), 4).as("f_stat"),
          round((col("msb") - col("msw")) /
            (col("msb") + (col("n0") - 1) * col("msw")), 4).as("icc1"))
    },

    // LIN'S CONCORDANCE CORRELATION COEFFICIENT between two
    // deterministic score models (the sigmoid eval_brier scores and a
    // clamped linear value/200) — the agreement-with-the-45°-line
    // metric model-replacement reviews use where Pearson r is blind to
    // scale/location shifts: CCC = 2·cov / (var1 + var2 + (m1 − m2)²).
    // Population (biased) moments from one scan of DECIMAL-quantized
    // power sums; Pearson r rides the same sums for the comparison.
    Q("eval_lin_ccc",
      """WITH e AS (SELECT
        |    1 / (1 + exp(-("value" - 100) / 40.0)) AS p1,
        |    least(greatest("value" / 200.0, 0), 1) AS p2
        |  FROM events),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(p1, 12) AS DECIMAL(28,12))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(round(p2, 12) AS DECIMAL(28,12))) AS DOUBLE) AS s2,
        |    CAST(sum(CAST(round(p1 * p1, 12) AS DECIMAL(28,12))) AS DOUBLE) AS s11,
        |    CAST(sum(CAST(round(p2 * p2, 12) AS DECIMAL(28,12))) AS DOUBLE) AS s22,
        |    CAST(sum(CAST(round(p1 * p2, 12) AS DECIMAL(28,12))) AS DOUBLE) AS s12
        |  FROM e),
        |m AS (SELECT n, s1 / n AS m1, s2 / n AS m2,
        |    s11 / n - (s1 / n) * (s1 / n) AS v1,
        |    s22 / n - (s2 / n) * (s2 / n) AS v2,
        |    s12 / n - (s1 / n) * (s2 / n) AS cov
        |  FROM s)
        |SELECT n, round(m1, 4) AS mean1, round(m2, 4) AS mean2,
        |  round(cov / sqrt(v1 * v2), 4) AS pearson,
        |  round(2 * cov / (v1 + v2 + (m1 - m2) * (m1 - m2)), 4) AS ccc
        |FROM m""") { (s, d) =>
      def q12(c: org.apache.spark.sql.Column) =
        sum(round(c, 12).cast("decimal(28,12)")).cast("double")
      Tables.events(s, d)
        .select(expr("1 / (1 + exp(-(value - 100) / 40.0))").as("p1"),
          expr("least(greatest(value / 200.0, 0), 1)").as("p2"))
        .agg(count(lit(1)).cast("long").as("n"),
          q12(col("p1")).as("s1"), q12(col("p2")).as("s2"),
          q12(col("p1") * col("p1")).as("s11"),
          q12(col("p2") * col("p2")).as("s22"),
          q12(col("p1") * col("p2")).as("s12"))
        .select(col("n"),
          (col("s1") / col("n")).as("m1"), (col("s2") / col("n")).as("m2"),
          (col("s11") / col("n") - (col("s1") / col("n")) *
            (col("s1") / col("n"))).as("v1"),
          (col("s22") / col("n") - (col("s2") / col("n")) *
            (col("s2") / col("n"))).as("v2"),
          (col("s12") / col("n") - (col("s1") / col("n")) *
            (col("s2") / col("n"))).as("cov"))
        .select(col("n"), round(col("m1"), 4).as("mean1"),
          round(col("m2"), 4).as("mean2"),
          round(col("cov") / sqrt(col("v1") * col("v2")), 4).as("pearson"),
          round(lit(2) * col("cov") / (col("v1") + col("v2") +
            (col("m1") - col("m2")) * (col("m1") - col("m2"))), 4)
            .as("ccc"))
    },

    // CROSS-VALIDATED METRIC STABILITY — AUC per md5-hash USER fold
    // (grouped assignment: all of a user's events share a fold, the
    // CV discipline that keeps per-user correlation from leaking
    // between folds), plus the across-fold mean ± sd on every row.
    // The fold dispersion is the error bar a model-selection review
    // trusts when the DeLong assumptions don't hold; folds reuse
    // eval_auc's tie-corrected rank machinery (collapse to
    // (fold, score) counts, ONE window over distinct scores). The sd
    // combine quantizes the 5 per-fold AUCs before the 5-row moment
    // sums.
    Q("eval_auc_by_fold",
      s"""WITH e AS (SELECT
         |    (instr('0123456789abcdef',
         |      substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1) % 5
         |      AS fold,
         |    value AS score, $lbl AS lbl FROM events),
         |s AS (SELECT fold, score, count(*) AS cnt, sum(lbl) AS pos
         |  FROM e GROUP BY 1, 2),
         |r AS (SELECT fold, cnt, pos,
         |    sum(cnt) OVER (PARTITION BY fold ORDER BY score) - cnt
         |      AS cum_before
         |  FROM s),
         |a AS (SELECT fold,
         |    CAST(sum(pos) AS BIGINT) AS p_cnt,
         |    CAST(sum(cnt) - sum(pos) AS BIGINT) AS n_cnt,
         |    CAST(sum(pos * (2 * cum_before + cnt + 1)) AS BIGINT) AS two_s
         |  FROM r GROUP BY 1),
         |f AS (SELECT fold, p_cnt, n_cnt,
         |    (two_s / 2.0 - p_cnt * (p_cnt + 1) / 2.0)
         |      / (p_cnt * CAST(n_cnt AS DOUBLE)) AS auc
         |  FROM a),
         |m AS (SELECT count(*) AS k,
         |    CAST(sum(CAST(round(auc, 10) AS DECIMAL(28,10))) AS DOUBLE)
         |      AS s1,
         |    CAST(sum(CAST(round(auc * auc, 10) AS DECIMAL(28,10)))
         |      AS DOUBLE) AS s2
         |  FROM f)
         |SELECT fold, p_cnt, n_cnt, round(auc, 4) AS auc,
         |  round(s1 / k, 4) AS mean_auc,
         |  round(sqrt((s2 - s1 * s1 / k) / (k - 1)), 4) AS sd_auc
         |FROM f CROSS JOIN m ORDER BY fold""") { (s, d) =>
      val e = Tables.events(s, d).select(
        expr("(instr('0123456789abcdef', substring(md5(CAST(user_id AS STRING)), 1, 1)) - 1) % 5").as("fold"),
        col("value").as("score"), expr(lbl).as("lbl"))
      val grouped = e.groupBy(col("fold"), col("score"))
        .agg(count(lit(1)).as("cnt"), sum(col("lbl")).as("pos"))
      val w = Window.partitionBy(col("fold")).orderBy(col("score"))
      val f = grouped
        .withColumn("cum_before", sum(col("cnt")).over(w) - col("cnt"))
        .groupBy(col("fold"))
        .agg(sum(col("pos")).cast("long").as("p_cnt"),
          (sum(col("cnt")) - sum(col("pos"))).cast("long").as("n_cnt"),
          sum(col("pos") * (lit(2) * col("cum_before") + col("cnt") + 1))
            .cast("long").as("two_s"))
        .select(col("fold"), col("p_cnt"), col("n_cnt"),
          ((col("two_s") / 2.0 - col("p_cnt") * (col("p_cnt") + 1) / 2.0) /
            (col("p_cnt") * col("n_cnt").cast("double"))).as("auc"))
      val m = f.agg(count(lit(1)).as("k"),
        sum(round(col("auc"), 10).cast("decimal(28,10)")).cast("double")
          .as("s1"),
        sum(round(col("auc") * col("auc"), 10).cast("decimal(28,10)"))
          .cast("double").as("s2"))
      f.crossJoin(broadcast(m))
        .select(col("fold"), col("p_cnt"), col("n_cnt"),
          round(col("auc"), 4).as("auc"),
          round(col("s1") / col("k"), 4).as("mean_auc"),
          round(sqrt((col("s2") - col("s1") * col("s1") / col("k")) /
            (col("k") - 1)), 4).as("sd_auc"))
        .orderBy(col("fold"))
    },

    // COST-OPTIMAL DECISION THRESHOLD — the step after
    // eval_pr_thresholds that operations actually cares about: with
    // asymmetric error costs (FP = 1, FN = 5 — the "missed conversion
    // is 5× worse" contract), sweep the 9-point threshold grid over
    // the deterministic sigmoid score and pick argmin expected cost.
    // One scan × a 9-row literal grid (broadcast), exact integer
    // FP/FN counts, ties broken toward the LOWER threshold (prefer
    // recall when costs tie). The curve itself ships so the argmin is
    // auditable from the same readout.
    Q("eval_cost_threshold",
      s"""WITH g AS (SELECT unnest([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7,
         |    0.8, 0.9]) AS t),
         |e AS (SELECT 1 / (1 + exp(-(value - 100) / 40.0)) AS p, $lbl AS lbl
         |  FROM events),
         |c AS (SELECT g.t,
         |    CAST(sum(CASE WHEN e.p >= g.t AND e.lbl = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS fp,
         |    CAST(sum(CASE WHEN e.p < g.t AND e.lbl = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS fn
         |  FROM e CROSS JOIN g GROUP BY 1),
         |r AS (SELECT t, fp, fn, fp + 5 * fn AS cost,
         |    row_number() OVER (ORDER BY fp + 5 * fn, t) AS rk
         |  FROM c)
         |SELECT round(CAST(t AS DOUBLE), 1) AS threshold, fp, fn,
         |  CAST(cost AS BIGINT) AS cost,
         |  CAST(rk = 1 AS BOOLEAN) AS is_optimal
         |FROM r ORDER BY threshold""") { (s, d) =>
      import s.implicits._
      val g = Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9).toDF("t")
      val e = Tables.events(s, d).select(
        expr("1 / (1 + exp(-(value - 100) / 40.0))").as("p"),
        expr(lbl).as("lbl"))
      val c = e.crossJoin(broadcast(g))
        .groupBy(col("t"))
        .agg(sum(when(col("p") >= col("t") && col("lbl") === 0, 1)
          .otherwise(0)).cast("long").as("fp"),
          sum(when(col("p") < col("t") && col("lbl") === 1, 1)
            .otherwise(0)).cast("long").as("fn"))
      val w = Window.orderBy(col("fp") + lit(5) * col("fn"), col("t"))
      c.withColumn("rk", row_number().over(w))
        .select(round(col("t"), 1).as("threshold"), col("fp"), col("fn"),
          (col("fp") + lit(5) * col("fn")).cast("long").as("cost"),
          (col("rk") === 1).as("is_optimal"))
        .orderBy(col("threshold"))
    },

    // MATTHEWS CORRELATION + BALANCED ACCURACY at the 0.5 threshold —
    // the two IMBALANCE-ROBUST single numbers missing from
    // eval_confusion's grid: accuracy rewards predicting the majority
    // class; MCC = (TP·TN − FP·FN)/√((TP+FP)(TP+FN)(TN+FP)(TN+FN)) is
    // the ±1-bounded correlation of the confusion matrix, and
    // balanced accuracy = (TPR + TNR)/2 its rate-space sibling. All
    // four cells are exact integers from ONE scan; the only floats
    // are the final divisions (the √ runs on an exact integer
    // product — DOUBLE-cast first so a 100 TB cell product cannot
    // overflow BIGINT).
    Q("eval_mcc",
      s"""WITH e AS (SELECT
         |    CASE WHEN 1 / (1 + exp(-(value - 100) / 40.0)) >= 0.5
         |      THEN 1 ELSE 0 END AS pred,
         |    $lbl AS lbl FROM events),
         |c AS (SELECT
         |    CAST(sum(CASE WHEN pred = 1 AND lbl = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS tp,
         |    CAST(sum(CASE WHEN pred = 1 AND lbl = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS fp,
         |    CAST(sum(CASE WHEN pred = 0 AND lbl = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS fn,
         |    CAST(sum(CASE WHEN pred = 0 AND lbl = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS tn
         |  FROM e)
         |SELECT tp, fp, fn, tn,
         |  round((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
         |    / sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
         |         * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)),
         |    4) AS mcc,
         |  round((tp / CAST(tp + fn AS DOUBLE)
         |       + tn / CAST(tn + fp AS DOUBLE)) / 2, 4)
         |    AS balanced_accuracy,
         |  round((tp + tn) / CAST(tp + fp + fn + tn AS DOUBLE), 4)
         |    AS accuracy
         |FROM c""") { (s, d) =>
      Tables.events(s, d)
        .select(when(expr("1 / (1 + exp(-(value - 100) / 40.0))") >= 0.5, 1)
          .otherwise(0).as("pred"), expr(lbl).as("lbl"))
        .agg(
          sum(when(col("pred") === 1 && col("lbl") === 1, 1).otherwise(0))
            .cast("long").as("tp"),
          sum(when(col("pred") === 1 && col("lbl") === 0, 1).otherwise(0))
            .cast("long").as("fp"),
          sum(when(col("pred") === 0 && col("lbl") === 1, 1).otherwise(0))
            .cast("long").as("fn"),
          sum(when(col("pred") === 0 && col("lbl") === 0, 1).otherwise(0))
            .cast("long").as("tn"))
        .select(col("tp"), col("fp"), col("fn"), col("tn"),
          round((col("tp").cast("double") * col("tn") -
            col("fp").cast("double") * col("fn")) /
            sqrt((col("tp") + col("fp")).cast("double") *
              (col("tp") + col("fn")).cast("double") *
              (col("tn") + col("fp")).cast("double") *
              (col("tn") + col("fn")).cast("double")), 4).as("mcc"),
          round((col("tp") / (col("tp") + col("fn")).cast("double") +
            col("tn") / (col("tn") + col("fp")).cast("double")) / 2, 4)
            .as("balanced_accuracy"),
          round((col("tp") + col("tn")) /
            (col("tp") + col("fp") + col("fn") + col("tn")).cast("double"),
            4).as("accuracy"))
    }
  )
}
