package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Third-wave analytic surface: pivot/unpivot reshaping, statistical
  * aggregates, exact percentiles, distribution window functions, and
  * deterministic (hash-based) stratified sampling.
  *
  * Determinism notes: hash sampling uses an md5 nibble (identical hex in
  * both engines) rather than engine RNG — reproducible sampling is also
  * what a 100 TB pipeline wants (re-runs select the same rows, samples
  * are join-stable across tables). Covariance is exercised on the
  * small-magnitude pair (discount, tax): both engines stream co-moments
  * in different orders, and on ~1e5-magnitude pairs the float noise
  * reaches the 4th decimal; on ~1e-3 magnitudes it cannot.
  */
object AnalyticQueries {

  private val years = 1995 to 2001

  def all: Seq[Q] = Seq(

    // PIVOT: order counts per priority × order-year. Spark's pivot with
    // explicit values keeps the plan a single partial+final aggregate
    // (no per-year scans); explicit values also make it streaming-safe
    // and schema-stable — at 100 TB you never want a distinct-scan to
    // discover pivot columns.
    Q("pivot_year",
      s"""SELECT o_orderpriority,
         |${years.map(y =>
             s"  CAST(count(*) FILTER (WHERE year(o_orderdate) = $y) AS BIGINT) AS y$y")
           .mkString(",\n")}
         |FROM orders
         |GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""") { (s, d) =>
      val piv = Tables.orders(s, d)
        .withColumn("yr", year(col("o_orderdate")))
        .groupBy(col("o_orderpriority"))
        .pivot("yr", years.map(Integer.valueOf))
        .agg(count(lit(1)))
      years.foldLeft(piv) { (df, y) =>
        df.withColumn(s"y$y", coalesce(col(s"`$y`"), lit(0L))).drop(y.toString)
      }.orderBy(col("o_orderpriority"))
    },

    // UNPIVOT: the four lineitem measures melted to (metric, value) rows
    // then re-aggregated — the long-form reshape feature pipelines use
    // before per-metric normalization. Spark's unpivot is a zero-shuffle
    // Expand (each input row emits 4), so the only shuffle is the
    // 4-group aggregate.
    Q("unpivot_measures",
      """SELECT metric,
        |  CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total,
        |  round(avg(value), 4) AS mean,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM (
        |  SELECT 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        |  UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        |  UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
        |GROUP BY metric
        |ORDER BY metric""") { (s, d) =>
      Tables.lineitem(s, d)
        .unpivot(Array.empty,
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "value")
        .groupBy(col("metric"))
        .agg(
          expr("CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)").as("total"),
          round(avg(col("value")), 4).as("mean"),
          count(lit(1)).as("n"))
        .orderBy(col("metric"))
    },

    // Statistical aggregates: sample stddev/variance, correlation,
    // covariance — single-pass co-moment aggregates, partial+final like
    // any sum.
    Q("agg_stats",
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) AS sd_qty,
        |  round(var_samp(l_quantity), 4) AS var_qty,
        |  round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS corr_qty_price,
        |  round(covar_samp(l_discount, l_tax), 4) + 0.0 AS cov_disc_tax
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""") { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_quantity")), 4).as("var_qty"),
          // + 0.0 collapses IEEE -0.0 (a rounded tiny negative) to 0.0
          // identically in both engines
          (round(corr(col("l_quantity"), col("l_extendedprice")), 4) + 0.0).as("corr_qty_price"),
          (round(covar_samp(col("l_discount"), col("l_tax")), 4) + 0.0).as("cov_disc_tax"))
        .orderBy(col("l_returnflag"))
    },

    // Exact percentiles with linear interpolation (Spark `percentile` ==
    // DuckDB `quantile_cont`). Exact quantiles need a per-group sort; at
    // 100 TB swap in approx_percentile (t-digest) — declared rows-only
    // next to agg_approx_distinct for the same reason (sketch internals
    // are implementation-specific).
    Q("agg_percentiles",
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.25), 4) AS p25,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
        |  round(quantile_cont(l_quantity, 0.75), 4) AS p75,
        |  round(median(l_extendedprice), 4) AS med_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""") { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.25)"), 4).as("p25"),
          round(expr("percentile(l_quantity, 0.5)"), 4).as("p50"),
          round(expr("percentile(l_quantity, 0.75)"), 4).as("p75"),
          round(expr("median(l_extendedprice)"), 4).as("med_price"))
        .orderBy(col("l_returnflag"))
    },

    // The 100 TB percentile path: approx_percentile's mergeable sketch
    // needs no per-group sort — run here in its provably EXACT regime:
    // with accuracy (1000) ≥ group size (5 nation keys per region) the
    // QuantileSummaries rank error ε·n = n/accuracy < 1, so the sketch
    // returns exactly the order statistic at 0-based rank q·(n−1)
    // (integral for these quantiles at n=5, so no boundary ambiguity) —
    // which the oracle selects with a sorted-list index. The
    // large-cardinality estimation path (l_extendedprice) stays pinned
    // by SketchAccuracySpec's bracket law. element_at flattens the
    // array output to scalars (array columns don't hash in the gate).
    Q("agg_approx_percentiles",
      """WITH nr AS (SELECT r_name, CAST(n_nationkey AS DOUBLE) AS v
        |            FROM nation JOIN region ON n_regionkey = r_regionkey)
        |SELECT r_name,
        |  round((list_sort(list(v)))[CAST(0.25 * (count(*) - 1) AS INT) + 1], 4) AS approx_q25,
        |  round((list_sort(list(v)))[CAST(0.50 * (count(*) - 1) AS INT) + 1], 4) AS approx_q50,
        |  round((list_sort(list(v)))[CAST(0.75 * (count(*) - 1) AS INT) + 1], 4) AS approx_q75
        |FROM nr GROUP BY r_name
        |ORDER BY r_name""") { (s, d) =>
      val nr = Tables.nation(s, d).join(Tables.region(s, d),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name"), col("n_nationkey").cast("double").as("v"))
      nr.groupBy(col("r_name"))
        .agg(expr("approx_percentile(v, array(0.25, 0.5, 0.75), 1000)")
          .as("aq"))
        .select(col("r_name"),
          round(element_at(col("aq"), 1), 4).as("approx_q25"),
          round(element_at(col("aq"), 2), 4).as("approx_q50"),
          round(element_at(col("aq"), 3), 4).as("approx_q75"))
        .orderBy(col("r_name"))
    },

    // Distribution window functions: percent_rank, cume_dist, nth_value.
    // The window orders by (acctbal, custkey) — a unique composite, so
    // RANGE vs ROWS framing cannot diverge between engines.
    Q("win_percent_cume",
      """SELECT c_custkey, c_mktsegment,
        |  round(percent_rank() OVER w, 4) AS pr,
        |  round(cume_dist() OVER w, 4) AS cd,
        |  round(nth_value(c_acctbal, 3) OVER w, 4) AS third_bal
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_custkey""") { (s, d) =>
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"),
          round(percent_rank().over(w), 4).as("pr"),
          round(cume_dist().over(w), 4).as("cd"),
          round(nth_value(col("c_acctbal"), 3).over(w), 4).as("third_bal"))
        .orderBy(col("c_custkey"))
    },

    // Deterministic stratified sample: per-stratum rates driven by an
    // md5 nibble of the key — 4/16 of BUILDING customers, 2/16 of every
    // other segment. Reproducible, cluster-size-independent, and
    // join-stable (sampling customer and its orders by the same key
    // keeps referential integrity — the property pipelines need).
    Q("sample_stratified",
      """SELECT c_custkey, c_mktsegment
        |FROM customer
        |WHERE (strpos('0123456789abcdef',
        |         substring(md5(CAST(c_custkey AS VARCHAR)), 1, 1)) - 1)
        |      < CASE WHEN c_mktsegment = 'BUILDING' THEN 4 ELSE 2 END
        |ORDER BY c_custkey""") { (s, d) =>
      Tables.customer(s, d)
        .filter(
          (expr("instr('0123456789abcdef', substring(md5(CAST(c_custkey AS STRING)), 1, 1))") - 1)
            < when(col("c_mktsegment") === "BUILDING", 4).otherwise(2))
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },

    // Class-balanced downsampling: cap every language at 40 docs, chosen
    // by rank over a content-independent hash of the key — the per-class
    // twin of sample_stratified's per-row coin flip. Deterministic and
    // join-stable (same 40 docs on any cluster size, rerun, or engine);
    // the rank shuffles once on the class key, no engine RNG anywhere.
    Q("sample_balanced",
      """SELECT doc_id, lang, CAST(rk AS INT) AS rk
        |FROM (SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= 40
        |ORDER BY doc_id""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 40)
        .select(col("doc_id"), col("lang"), col("rk").cast("int").as("rk"))
        .orderBy(col("doc_id"))
    },

    // Ordered string aggregation (LISTAGG WITHIN GROUP — Spark 4 native).
    // The ORDER BY inside the aggregate is what makes the result
    // deterministic and therefore distributable: without it the
    // concatenation order would be partition-arrival order.
    Q("agg_string_agg",
      """SELECT c_nationkey,
        |  string_agg(c_name, '|' ORDER BY c_custkey) AS names,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM customer
        |WHERE c_custkey < 300
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""") { (s, d) =>
      Tables.customer(s, d)
        .filter(col("c_custkey") < 300)
        .groupBy(col("c_nationkey"))
        .agg(
          expr("listagg(c_name, '|') WITHIN GROUP (ORDER BY c_custkey)").as("names"),
          count(lit(1)).as("n"))
        .orderBy(col("c_nationkey"))
    },

    // Bitwise aggregates (bit_and / bit_or / bit_xor) — set-membership
    // and parity rollups over integer keys; all three are partial-
    // aggregable (associative + commutative), so the plan is the same
    // partial+final shape as sum().
    Q("agg_bitwise",
      """SELECT l_returnflag,
        |  CAST(bit_and(l_partkey) AS BIGINT) AS ba,
        |  CAST(bit_or(l_partkey) AS BIGINT) AS bo,
        |  CAST(bit_xor(l_partkey) AS BIGINT) AS bx
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""") { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(expr("bit_and(l_partkey)").as("ba"),
          expr("bit_or(l_partkey)").as("bo"),
          expr("bit_xor(l_partkey)").as("bx"))
        .orderBy(col("l_returnflag"))
    },

    // Equi-width histogram via width_bucket. Prices are quantized to
    // integer cents first so bucket boundaries are exact in both
    // engines (the DuckDB twin computes the same bucket arithmetically:
    // identical integer math, no float-boundary ties). Fixed [900.00,
    // 105000.00) domain, 20 buckets of 5205.00 — constants, not a
    // min/max pre-scan, so the histogram is one aggregate pass and
    // stable across scale factors.
    Q("agg_histogram",
      """WITH b AS (SELECT
        |    1 + CAST(least(greatest((CAST(round(l_extendedprice * 100) AS BIGINT) - 90000)
        |          // 520500, 0), 19) AS INT) AS bucket
        |  FROM lineitem)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS cnt
        |FROM b GROUP BY bucket
        |ORDER BY bucket""") { (s, d) =>
      // Clamped to 1..20 exactly like the oracle's arithmetic twin —
      // width_bucket alone would emit 0/21 for out-of-domain values
      // while the twin clamps, an asymmetry that in-domain data masks.
      Tables.lineitem(s, d)
        .select(expr(
          """least(greatest(width_bucket(CAST(round(l_extendedprice * 100) AS BIGINT),
            |  90000D, 10500000D, 20), 1L), 20L)""".stripMargin).cast("int").as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("bucket"))
    },

    // Z-order locality key: bit-interleave of two join keys — the
    // multi-dimensional clustering primitive behind data-skipping file
    // layouts (write sorted by z → min/max stats prune BOTH dimensions).
    // Pure integer bit math, identical in both engines; 6 bits per key
    // under the filter makes the interleave bijective, so z alone is a
    // unique ORDER BY key. At 100 TB this expression feeds
    // write.sortWithinPartitions(z) — the compute is the operator, the
    // layout win is the consequence.
    Q("sort_zorder",
      """WITH p AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        |           WHERE l_partkey < 64 AND l_suppkey < 64),
        |z AS (SELECT l_partkey, l_suppkey,
        |    CAST(list_sum(list_transform(range(0, 6),
        |      i -> ((l_partkey // CAST(pow(2, i) AS BIGINT)) % 2) * CAST(pow(4, i) AS BIGINT) * 2
        |         + ((l_suppkey // CAST(pow(2, i) AS BIGINT)) % 2) * CAST(pow(4, i) AS BIGINT)))
        |      AS BIGINT) AS zval
        |  FROM p)
        |SELECT zval, l_partkey, l_suppkey
        |FROM z
        |ORDER BY zval""") { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_partkey") < 64 && col("l_suppkey") < 64)
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .withColumn("zval", expr(
          """aggregate(transform(sequence(0, 5),
            |  i -> shiftleft(shiftright(l_partkey, i) & 1, 2*i + 1)
            |     + shiftleft(shiftright(l_suppkey, i) & 1, 2*i)),
            |  0L, (acc, v) -> acc + v)""".stripMargin))
        .select(col("zval"), col("l_partkey"), col("l_suppkey"))
        .orderBy(col("zval"))
    },

    // IGNORE NULLS window navigation: forward-fill (last non-null value
    // so far) and group-first backstop — the gap-filling idiom for
    // sparse telemetry. Every third event carries a reading; the rest
    // inherit the latest prior one.
    Q("win_ignore_nulls",
      """WITH r AS (SELECT event_id, event_type,
        |    CASE WHEN event_id % 3 = 0 THEN round(value, 4) END AS reading
        |  FROM events WHERE event_id < 20000)
        |SELECT event_id, event_type, reading,
        |  last_value(reading IGNORE NULLS) OVER (
        |    PARTITION BY event_type ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
        |  first_value(reading IGNORE NULLS) OVER (
        |    PARTITION BY event_type ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_seen
        |FROM r
        |ORDER BY event_id""") { (s, d) =>
      val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .filter(col("event_id") < 20000)
        .withColumn("reading",
          when(col("event_id") % 3 === 0, round(col("value"), 4)))
        .select(col("event_id"), col("event_type"), col("reading"),
          last(col("reading"), ignoreNulls = true).over(w).as("filled"),
          first(col("reading"), ignoreNulls = true).over(w).as("first_seen"))
        .orderBy(col("event_id"))
    },

    // Per-group OLS regression (value on time) from EXACT sufficient
    // statistics: instead of the engines' native regr_* aggregates
    // (double accumulation — order-dependent in the last ulps, so not
    // hash-comparable across engines), the six sums n/Σx/Σy/Σx²/Σxy/Σy²
    // accumulate as integers and 6dp DECIMALs (value is exact at ≤6dp),
    // making them partition-count-invariant; slope/intercept/r² then
    // derive with STRUCTURALLY IDENTICAL double expressions (IEEE
    // mult/div on identical inputs is bitwise deterministic — no libm).
    // x is hours since the corpus epoch, keeping every product inside
    // exact integer/decimal range. ONE map-side-combinable groupBy —
    // the cheapest possible distributed shape for model fitting.
    Q("agg_regression",
      """WITH b AS (SELECT event_type,
        |    epoch_us(ts) // 3600000000 - 473352 AS x,
        |    CAST(round(value, 6) AS DECIMAL(18,6)) AS y
        |  FROM events),
        |s AS (SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x*x) AS sxx, sum(x*y) AS sxy, sum(y*y) AS syy
        |  FROM b GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  round((n*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) /
        |        (n*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)), 4) AS slope,
        |  round((CAST(sy AS DOUBLE) - (n*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) /
        |        (n*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / n, 4) AS intercept,
        |  round(pow(n*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE), 2) /
        |        ((n*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) *
        |         (n*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 6) AS r2
        |FROM s ORDER BY event_type""") { (s, d) =>
      val b = Tables.events(s, d).select(col("event_type"),
        (expr("unix_micros(ts) div 3600000000") - lit(473352L)).as("x"),
        round(col("value"), 6).cast("decimal(18,6)").as("y"))
      val st = b.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x").cast("decimal(12,0)") * col("y")).as("sxy"),
        sum(col("y") * col("y")).as("syy"))
      val nD = col("n").cast("double")
      val sxD = col("sx").cast("double"); val syD = col("sy").cast("double")
      val sxxD = col("sxx").cast("double"); val sxyD = col("sxy").cast("double")
      val syyD = col("syy").cast("double")
      val num = nD * sxyD - sxD * syD
      val den = nD * sxxD - sxD * sxD
      st.select(col("event_type"), col("n"),
          round(num / den, 4).as("slope"),
          round((syD - num / den * sxD) / nD, 4).as("intercept"),
          round(pow(num, 2) / (den * (nD * syyD - syD * syD)), 6).as("r2"))
        .orderBy(col("event_type"))
    },

    // Impurity measures per group (Shannon entropy + Gini) over the
    // source→language distribution — the split-scoring primitives of
    // feature selection and the mixture-balance dashboard of a corpus.
    // Determinism: both measures reduce to the exact integer counts
    // (c_l, n); each entropy term −p·ln p and each p² quantizes to
    // DECIMAL(28,12) BEFORE the per-group sum, so accumulation order
    // can't leak ulps; the only libm call is one ln per (source, lang)
    // cell. Shape: one (source, lang) rollup + a source-keyed rollup
    // of a ≤|langs|-row relation — trivially 100 TB-safe.
    Q("agg_gini_entropy",
      """WITH c AS (SELECT source, lang, count(*) AS cl FROM documents GROUP BY 1, 2),
        |t AS (SELECT source, sum(cl) AS n FROM c GROUP BY 1),
        |e AS (SELECT c.source,
        |    CAST(-(CAST(cl AS DOUBLE)/n) * ln(CAST(cl AS DOUBLE)/n) AS DECIMAL(28,12)) AS ent,
        |    CAST((CAST(cl AS DOUBLE)/n) * (CAST(cl AS DOUBLE)/n) AS DECIMAL(28,12)) AS p2
        |  FROM c JOIN t ON t.source = c.source),
        |a AS (SELECT source,
        |    CAST(floor(CAST(sum(ent) AS DOUBLE) * 10000 + 0.5) / 10000.0 AS DOUBLE) AS entropy,
        |    CAST(sum(p2) AS DOUBLE) AS sp2 FROM e GROUP BY 1)
        |SELECT a.source, CAST(t.n AS BIGINT) AS n_docs, entropy,
        |  round(1 - sp2, 4) AS gini
        |FROM a JOIN t ON t.source = a.source ORDER BY a.source""") { (s, d) =>
      val c = Tables.documents(s, d)
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("cl"))
      val t = c.groupBy(col("source")).agg(sum(col("cl")).as("n"))
      val a = c.join(t, Seq("source"))
        .withColumn("ent", expr(
          "CAST(-(CAST(cl AS DOUBLE)/n) * ln(CAST(cl AS DOUBLE)/n) AS DECIMAL(28,12))"))
        .withColumn("p2", expr(
          "CAST((CAST(cl AS DOUBLE)/n) * (CAST(cl AS DOUBLE)/n) AS DECIMAL(28,12))"))
        .groupBy(col("source"))
        .agg(expr("CAST(floor(CAST(sum(ent) AS DOUBLE) * 10000 + 0.5) / 10000.0 AS DOUBLE)")
          .as("entropy"),
          sum(col("p2")).cast("double").as("sp2"))
      a.join(t, Seq("source"))
        .select(col("source"), col("n").cast("bigint").as("n_docs"),
          col("entropy"), round(lit(1) - col("sp2"), 4).as("gini"))
        .orderBy(col("source"))
    },

    // Gaps-and-islands: per-user consecutive-day activity streaks (the
    // engagement metric every product-analytics stack computes, and the
    // canonical run-length-encoding relational idiom). Distinct active
    // days collapse first (one hash aggregate), then the classic
    // day_index − row_number() difference keys each maximal run inside a
    // PER-USER window — a keyed shuffle bounded by each user's day
    // count, never a global sort. Output: per-user streak count, longest
    // streak, and the longest streak's start day (earliest on ties).
    Q("win_streaks",
      """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |  FROM events),
        |g AS (SELECT user_id, day,
        |    date_diff('day', DATE '2024-01-01', day)
        |      - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM days),
        |runs AS (SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len,
        |    min(day) AS start_day
        |  FROM g GROUP BY 1, 2)
        |SELECT user_id,
        |  CAST(count(*) AS BIGINT) AS n_streaks,
        |  max(len) AS max_streak,
        |  min(CASE WHEN len = (SELECT max(r2.len) FROM runs r2
        |                       WHERE r2.user_id = runs.user_id)
        |      THEN start_day END) AS best_start
        |FROM runs GROUP BY user_id ORDER BY user_id""") { (s, d) =>
      val days = Tables.events(s, d)
        .select(col("user_id"), col("ts").cast("date").as("day"))
        .distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val runs = days
        .withColumn("grp",
          datediff(col("day"), lit(java.sql.Date.valueOf("2024-01-01")))
            - row_number().over(w))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
      val best = Window.partitionBy(col("user_id"))
      runs
        .withColumn("mx", max(col("len")).over(best))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_streaks"),
          max(col("len")).as("max_streak"),
          min(when(col("len") === col("mx"), col("start_day"))).as("best_start"))
        .orderBy(col("user_id"))
    },

    // Exact weighted median (and the plain median beside it) of the
    // price distribution weighted by quantity, per return flag. The
    // scale shape mirrors eval_auc's rank trick: rows collapse to
    // (flag, price) -> weight by hash aggregate, ONE window over the
    // DISTINCT prices accumulates weight, and the median is the first
    // value whose doubled cumulative weight reaches the total — the
    // 2·cum >= tot comparison stays in exact DECIMAL, no float
    // boundary. min() picks it without a second shuffle.
    Q("agg_weighted_median",
      """WITH s AS (SELECT l_returnflag AS flag, l_extendedprice AS v,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT flag, v, w,
        |    sum(w) OVER (PARTITION BY flag ORDER BY v) AS cum,
        |    sum(w) OVER (PARTITION BY flag) AS tot
        |  FROM s)
        |SELECT flag,
        |  round(CAST(min(CASE WHEN tot - cum <= cum THEN v END) AS DOUBLE), 4)
        |    AS w_median,
        |  round(CAST(max(tot) AS DOUBLE), 4) AS total_weight
        |FROM c GROUP BY flag ORDER BY flag""") { (s, d) =>
      val runs = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("flag"), col("l_extendedprice").as("v"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(28,2)")
          .as("w"))
      val wOrd = Window.partitionBy(col("flag")).orderBy(col("v"))
      val wAll = Window.partitionBy(col("flag"))
      runs
        .withColumn("cum", sum(col("w")).over(wOrd))
        .withColumn("tot", sum(col("w")).over(wAll))
        .groupBy(col("flag"))
        // tot - cum <= cum ⟺ 2*cum >= tot, but never widens past the
        // window-sum's DECIMAL(38,2) — 2*cum can overflow→NULL non-ANSI.
        // Final columns surface as round(double, 4): the comparison runs
        // in exact DECIMAL, but DECIMAL output scales canonicalize
        // differently across engines — double@4dp is the stable wire
        // format the rest of the agg_* family uses.
        .agg(round(min(when(col("tot") - col("cum") <= col("cum"), col("v")))
          .cast("double"), 4).as("w_median"),
          round(max(col("tot")).cast("double"), 4).as("total_weight"))
        .orderBy(col("flag"))
    },

    // Per-group skewness/kurtosis via raw power sums — NOT the engines'
    // skewness()/kurtosis() builtins, whose bias conventions differ
    // between engines; the moment sums are per-row doubles quantized to
    // DECIMAL before ONE hash aggregate (associative, partial-merge —
    // the distributed-profiling shape), and g1 = m3/m2^1.5,
    // g2 = m4/m2² − 3 derive in double from the exact sums.
    Q("agg_moments",
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
        |    s3 / n - 3 * (s1 / n) * s2 / n + 2 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
        |    s4 / n - 4 * (s1 / n) * s3 / n + 6 * (s1 / n) * (s1 / n) * s2 / n
        |      - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
        |  FROM s)
        |SELECT event_type, CAST(n AS BIGINT) AS n, round(mu, 4) AS mean,
        |  round(m3 / pow(m2, 1.5), 4) AS skewness,
        |  round(m4 / (m2 * m2) - 3, 4) AS kurtosis
        |FROM m ORDER BY event_type""") { (s, d) =>
      val t = Tables.events(s, d).select(col("event_type"),
        col("value").cast("decimal(18,6)").as("x1"),
        (col("value") * col("value")).cast("decimal(28,8)").as("x2"),
        (col("value") * col("value") * col("value")).cast("decimal(28,6)")
          .as("x3"),
        (col("value") * col("value") * col("value") * col("value"))
          .cast("decimal(32,4)").as("x4"))
      t.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("x1")).cast("double").as("s1"),
          sum(col("x2")).cast("double").as("s2"),
          sum(col("x3")).cast("double").as("s3"),
          sum(col("x4")).cast("double").as("s4"))
        .select(col("event_type"), col("n"),
          (col("s1") / col("n")).as("mu"),
          (col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")))
            .as("m2"),
          (col("s3") / col("n") - lit(3) * (col("s1") / col("n")) * col("s2") / col("n")
            + lit(2) * (col("s1") / col("n")) * (col("s1") / col("n"))
              * (col("s1") / col("n"))).as("m3"),
          (col("s4") / col("n") - lit(4) * (col("s1") / col("n")) * col("s3") / col("n")
            + lit(6) * (col("s1") / col("n")) * (col("s1") / col("n"))
              * col("s2") / col("n")
            - lit(3) * (col("s1") / col("n")) * (col("s1") / col("n"))
              * (col("s1") / col("n")) * (col("s1") / col("n"))).as("m4"))
        .select(col("event_type"), col("n"), round(col("mu"), 4).as("mean"),
          round(col("m3") / pow(col("m2"), 1.5), 4).as("skewness"),
          round(col("m4") / (col("m2") * col("m2")) - 3, 4).as("kurtosis"))
        .orderBy(col("event_type"))
    },

    // Pairwise Pearson correlation matrix over three lineitem measures
    // in ONE aggregate pass: the 10 power/cross sums (n, Σx, Σx², Σxy
    // per pair) accumulate as DECIMAL — order-free, partition-count-
    // invariant — and every r derives from the same 1-row result, then
    // unpivots to the 3 pair rows. This is the feature-correlation
    // screen a training pipeline runs before mixing features; at 100 TB
    // it is exactly one map-side-combinable scan, constant-size state.
    Q("agg_corr_matrix",
      """WITH t AS (SELECT
        |    CAST(l_quantity AS DECIMAL(18,4)) AS q,
        |    CAST(l_extendedprice AS DECIMAL(18,4)) AS p,
        |    CAST(l_discount AS DECIMAL(18,6)) AS dc,
        |    CAST(l_quantity * l_quantity AS DECIMAL(28,4)) AS qq,
        |    CAST(l_extendedprice * l_extendedprice AS DECIMAL(32,4)) AS pp,
        |    CAST(l_discount * l_discount AS DECIMAL(28,8)) AS dd,
        |    CAST(l_quantity * l_extendedprice AS DECIMAL(32,4)) AS qp,
        |    CAST(l_quantity * l_discount AS DECIMAL(28,6)) AS qd,
        |    CAST(l_extendedprice * l_discount AS DECIMAL(32,6)) AS pd
        |  FROM lineitem),
        |s AS (SELECT count(*) AS n,
        |    CAST(sum(q) AS DOUBLE) AS sq, CAST(sum(p) AS DOUBLE) AS sp,
        |    CAST(sum(dc) AS DOUBLE) AS sd,
        |    CAST(sum(qq) AS DOUBLE) AS sqq, CAST(sum(pp) AS DOUBLE) AS spp,
        |    CAST(sum(dd) AS DOUBLE) AS sdd,
        |    CAST(sum(qp) AS DOUBLE) AS sqp, CAST(sum(qd) AS DOUBLE) AS sqd,
        |    CAST(sum(pd) AS DOUBLE) AS spd
        |  FROM t)
        |SELECT x_col, y_col, round(num / sqrt(dx * dy), 4) AS corr_r FROM (
        |  SELECT 'quantity' AS x_col, 'extendedprice' AS y_col,
        |    n * sqp - sq * sp AS num,
        |    n * sqq - sq * sq AS dx, n * spp - sp * sp AS dy FROM s
        |  UNION ALL
        |  SELECT 'quantity', 'discount', n * sqd - sq * sd,
        |    n * sqq - sq * sq, n * sdd - sd * sd FROM s
        |  UNION ALL
        |  SELECT 'extendedprice', 'discount', n * spd - sp * sd,
        |    n * spp - sp * sp, n * sdd - sd * sd FROM s)
        |ORDER BY x_col, y_col""") { (s, d) =>
      val t = Tables.lineitem(s, d).select(
        col("l_quantity").cast("decimal(18,4)").as("q"),
        col("l_extendedprice").cast("decimal(18,4)").as("p"),
        col("l_discount").cast("decimal(18,6)").as("dc"),
        (col("l_quantity") * col("l_quantity")).cast("decimal(28,4)").as("qq"),
        (col("l_extendedprice") * col("l_extendedprice"))
          .cast("decimal(32,4)").as("pp"),
        (col("l_discount") * col("l_discount")).cast("decimal(28,8)").as("dd"),
        (col("l_quantity") * col("l_extendedprice"))
          .cast("decimal(32,4)").as("qp"),
        (col("l_quantity") * col("l_discount")).cast("decimal(28,6)").as("qd"),
        (col("l_extendedprice") * col("l_discount"))
          .cast("decimal(32,6)").as("pd"))
      val sums = t.agg(count(lit(1)).as("n"),
        sum(col("q")).cast("double").as("sq"),
        sum(col("p")).cast("double").as("sp"),
        sum(col("dc")).cast("double").as("sd"),
        sum(col("qq")).cast("double").as("sqq"),
        sum(col("pp")).cast("double").as("spp"),
        sum(col("dd")).cast("double").as("sdd"),
        sum(col("qp")).cast("double").as("sqp"),
        sum(col("qd")).cast("double").as("sqd"),
        sum(col("pd")).cast("double").as("spd"))
      def pair(xn: String, yn: String, sxy: String, sx: String, sy: String,
          sxx: String, syy: String) =
        sums.select(lit(xn).as("x_col"), lit(yn).as("y_col"),
          (col("n") * col(sxy) - col(sx) * col(sy)).as("num"),
          (col("n") * col(sxx) - col(sx) * col(sx)).as("dx"),
          (col("n") * col(syy) - col(sy) * col(sy)).as("dy"))
      pair("quantity", "extendedprice", "sqp", "sq", "sp", "sqq", "spp")
        .unionByName(pair("quantity", "discount", "sqd", "sq", "sd", "sqq", "sdd"))
        .unionByName(pair("extendedprice", "discount", "spd", "sp", "sd", "spp", "sdd"))
        .select(col("x_col"), col("y_col"),
          round(col("num") / sqrt(col("dx") * col("dy")), 4).as("corr_r"))
        .orderBy(col("x_col"), col("y_col"))
    },

    // RUNNING distinct count per key — the window form SQL engines
    // cannot plan directly (COUNT(DISTINCT) OVER a running frame is
    // unsupported in Spark, and naive per-frame set state is O(n²)
    // memory). The scalable identity: a value's FIRST occurrence in its
    // (key, value) stream contributes exactly 1, so running distinct
    // count = running sum of the first-occurrence indicator — two
    // window passes over the same (key, time) partitioning, one
    // shuffle, no set state anywhere. Identical construction in both
    // dialects.
    Q("win_distinct_count",
      """WITH f AS (SELECT event_id, user_id, ts,
        |    CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS first_seen
        |  FROM events)
        |SELECT event_id, user_id,
        |  CAST(sum(first_seen) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS distinct_types_so_far
        |FROM f ORDER BY event_id""") { (s, d) =>
      val wFirst = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      val wRun = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("first_seen",
          when(row_number().over(wFirst) === 1, 1).otherwise(0))
        .select(col("event_id"), col("user_id"),
          sum(col("first_seen")).over(wRun).cast("long")
            .as("distinct_types_so_far"))
        .orderBy(col("event_id"))
    },

    // Per-group mode with a deterministic tie-break (lexicographic min
    // among the tied-for-max values) — the categorical summary SQL
    // engines surprisingly lack as an exact builtin. Counts collapse
    // first, the per-group max count is one more keyed rollup, and the
    // winner resolves by a conditional min — three hash aggregates, no
    // window, no sort of raw rows.
    Q("agg_mode",
      """WITH cnts AS (SELECT CAST(date_part('isodow', ts) - 1 AS INT) AS grp,
        |    event_type AS v, count(*) AS c FROM events GROUP BY 1, 2),
        |m AS (SELECT grp, max(c) AS mc, CAST(count(*) AS BIGINT) AS nd
        |  FROM cnts GROUP BY 1)
        |SELECT grp, min(CASE WHEN c = mc THEN v END) AS mode_value,
        |  CAST(max(mc) AS BIGINT) AS mode_count, max(nd) AS n_distinct
        |FROM cnts JOIN m USING (grp) GROUP BY grp ORDER BY grp""") { (s, d) =>
      val c = Tables.events(s, d)
        .groupBy(expr("weekday(ts)").as("grp"), col("event_type").as("v"))
        .agg(count(lit(1)).as("c"))
      val m = c.groupBy(col("grp"))
        .agg(max(col("c")).as("mc"), count(lit(1)).as("nd"))
      c.join(m, Seq("grp"))
        .groupBy(col("grp"))
        .agg(min(when(col("c") === col("mc"), col("v"))).as("mode_value"),
          max(col("mc")).as("mode_count"),
          max(col("nd")).as("n_distinct"))
        .orderBy(col("grp"))
    },

    // Weighted quantiles (p25/p50/p75) generalizing agg_weighted_median:
    // smallest value whose cumulative weight share reaches q. Values
    // collapse to (group, value) -> weight by hash aggregate first, so
    // the window runs over distinct values, not raw rows. The reach-q
    // test compares the cum/tot ratio as ONE IEEE division of two exact
    // decimals — deterministic in both engines, and it never widens the
    // DECIMAL(38,2) window sum (2*cum-style multiplies can overflow to
    // NULL under non-ANSI semantics; division cannot).
    Q("agg_weighted_quantile",
      """WITH s AS (SELECT l_returnflag AS flag, l_extendedprice AS v,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (SELECT flag, v,
        |    sum(w) OVER (PARTITION BY flag ORDER BY v)
        |      / CAST(sum(w) OVER (PARTITION BY flag) AS DOUBLE) AS share
        |  FROM s)
        |SELECT flag,
        |  round(CAST(min(CASE WHEN share >= 0.25 THEN v END) AS DOUBLE), 4) AS wq25,
        |  round(CAST(min(CASE WHEN share >= 0.5 THEN v END) AS DOUBLE), 4) AS wq50,
        |  round(CAST(min(CASE WHEN share >= 0.75 THEN v END) AS DOUBLE), 4) AS wq75
        |FROM c GROUP BY flag ORDER BY flag""") { (s, d) =>
      val runs = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("flag"), col("l_extendedprice").as("v"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("decimal(28,2)")
          .as("w"))
      val wOrd = Window.partitionBy(col("flag")).orderBy(col("v"))
      val wAll = Window.partitionBy(col("flag"))
      runs
        .withColumn("share",
          sum(col("w")).over(wOrd) / sum(col("w")).over(wAll).cast("double"))
        .groupBy(col("flag"))
        // double@4dp wire format — see agg_weighted_median's note on
        // DECIMAL output-scale canonicalization.
        .agg(
          round(min(when(col("share") >= 0.25, col("v"))).cast("double"), 4)
            .as("wq25"),
          round(min(when(col("share") >= 0.5, col("v"))).cast("double"), 4)
            .as("wq50"),
          round(min(when(col("share") >= 0.75, col("v"))).cast("double"), 4)
            .as("wq75"))
        .orderBy(col("flag"))
    },

    // Rolling exact median over the trailing 5-row frame per user — the
    // robust smoother a telemetry pipeline runs where a moving average
    // would chase spikes. Exact percentile as a WINDOW aggregate over a
    // bounded ROWS frame: per-frame work is O(5 log 5) regardless of
    // corpus size and the only shuffle is the keyed window partition.
    // Frame order is the unique (ts, event_id) composite so both
    // engines see identical frames; output restricted to a stable user
    // slice to keep the oracle diff small.
    Q("win_median",
      """SELECT user_id, event_id,
        |  round(median(value) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
        |    4) AS med5
        |FROM events WHERE user_id % 20 = 0
        |ORDER BY user_id, event_id""") { (s, d) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-4, Window.currentRow)
      Tables.events(s, d)
        .filter(col("user_id") % 20 === 0)
        .select(col("user_id"), col("event_id"),
          round(expr("percentile(value, 0.5)")
            .over(w) // Spark: any aggregate is window-able; exact median
            , 4).as("med5"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // 10%-trimmed mean per group — the robust centre the stats family
    // was missing between mean (agg_stats) and median (agg_percentiles):
    // exact p10/p90 bounds from one per-group percentile aggregate
    // (constant-size, broadcast back), then a DECIMAL-quantized
    // conditional average over the in-bounds rows. Two corpus passes,
    // both partial+final aggregable; the fence compare is row-local.
    Q("agg_trimmed_mean",
      """WITH q AS (SELECT l_returnflag AS flag,
        |    quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.1) AS lo,
        |    quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9) AS hi
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag AS flag,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN l.l_extendedprice >= q.lo
        |      AND l.l_extendedprice <= q.hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  round(CAST(sum(CASE WHEN l.l_extendedprice >= q.lo
        |        AND l.l_extendedprice <= q.hi
        |        THEN CAST(l.l_extendedprice AS DECIMAL(28,2)) END)
        |      AS DOUBLE)
        |    / sum(CASE WHEN l.l_extendedprice >= q.lo
        |        AND l.l_extendedprice <= q.hi THEN 1 ELSE 0 END), 4)
        |    AS trimmed_mean
        |FROM lineitem l JOIN q ON q.flag = l.l_returnflag
        |GROUP BY 1 ORDER BY flag""") { (s, d) =>
      val li = Tables.lineitem(s, d)
      val q = li.groupBy(col("l_returnflag").as("flag"))
        .agg(expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.1)").as("lo"),
          expr("percentile(CAST(l_extendedprice AS DOUBLE), 0.9)").as("hi"))
      val kept = col("l_extendedprice") >= col("lo") &&
        col("l_extendedprice") <= col("hi")
      li.join(broadcast(q), col("l_returnflag") === col("flag"))
        .groupBy(col("flag"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(when(kept, 1).otherwise(0)).cast("long").as("n_kept"),
          round(sum(when(kept,
              col("l_extendedprice").cast("decimal(28,2)"))).cast("double")
            / sum(when(kept, 1).otherwise(0)), 4).as("trimmed_mean"))
        .orderBy(col("flag"))
    },

    // Per-arm MEAN with 95% CONFIDENCE INTERVAL — the decision-grade
    // readout of an experiment: revenue-per-user by deterministic A/B
    // arm, with the normal-approximation interval mean ± 1.96·SE. Every
    // user contributes (zero-purchase users included — dropping them
    // biases the mean up), per-user revenue rides exact DECIMAL, and
    // the variance derives from (Σx, Σx²) sufficient statistics — Σx²
    // terms are per-user doubles quantized to DECIMAL before the ONE
    // mergeable hash aggregate, so the interval is partition-invariant.
    Q("agg_mean_ci",
      """WITH u AS (SELECT user_id,
        |    CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |      THEN 'A' ELSE 'B' END AS arm,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,4))
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(28,4)) AS x
        |  FROM events GROUP BY 1, 2),
        |q AS (SELECT arm, x,
        |    CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 6)
        |      AS DECIMAL(38,6)) AS xx FROM u),
        |g AS (SELECT arm, count(*) AS n, CAST(sum(x) AS DOUBLE) AS sx,
        |    CAST(sum(xx) AS DOUBLE) AS sxx
        |  FROM q GROUP BY 1)
        |SELECT arm, CAST(n AS BIGINT) AS n,
        |  round(sx / n, 4) AS mean_rev,
        |  round(sqrt((sxx - sx * sx / n) / nullif(n - 1, 0) / n), 4) AS se,
        |  round(sx / n - 1.96
        |    * sqrt((sxx - sx * sx / n) / nullif(n - 1, 0) / n), 4) AS ci_lo,
        |  round(sx / n + 1.96
        |    * sqrt((sxx - sx * sx / n) / nullif(n - 1, 0) / n), 4) AS ci_hi
        |FROM g ORDER BY arm""") { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy(col("user_id"),
          when(substring(md5(col("user_id").cast("string")), 1, 1) < "8", "A")
            .otherwise("B").as("arm"))
        .agg(sum(when(col("event_type") === "purchase",
            col("value").cast("decimal(18,4)"))
          .otherwise(lit(0).cast("decimal(18,4)")))
          .cast("decimal(28,4)").as("x"))
      val g = u
        .withColumn("xx",
          round(col("x").cast("double") * col("x").cast("double"), 6)
            .cast("decimal(38,6)"))
        .groupBy(col("arm"))
        .agg(count(lit(1)).as("n"), sum(col("x")).cast("double").as("sx"),
          sum(col("xx")).cast("double").as("sxx"))
      val mean = col("sx") / col("n")
      // nullif guard: a 1-user arm has no sample variance — the CI is
      // NULL (both engines) instead of an ANSI divide error.
      val se = sqrt((col("sxx") - col("sx") * col("sx") / col("n")) /
        nullif(col("n") - 1, lit(0L)) / col("n"))
      g.select(col("arm"), col("n").cast("long").as("n"),
          round(mean, 4).as("mean_rev"),
          round(se, 4).as("se"),
          round(mean - lit(1.96) * se, 4).as("ci_lo"),
          round(mean + lit(1.96) * se, 4).as("ci_hi"))
        .orderBy(col("arm"))
    },

    // MEAN FAMILIES — arithmetic, geometric, and harmonic means of
    // l_quantity per return flag (AM ≥ GM ≥ HM, the Pythagorean
    // inequality doubles as a built-in sanity check). Geometric rides
    // log-space (each ln term DECIMAL-quantized before the order-free
    // sum, one exp at the end absorbs the libm ulp in the 4dp round);
    // harmonic sums DECIMAL-quantized reciprocals. All three are
    // partial-aggregable single-pass rollups.
    Q("agg_mean_families",
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |    / count(*), 4) AS mean_arith,
        |  round(exp(CAST(sum(CAST(round(ln(l_quantity), 12)
        |    AS DECIMAL(28,12))) AS DOUBLE) / count(*)), 4) AS mean_geo,
        |  round(count(*) / CAST(sum(CAST(round(1.0 / l_quantity, 12)
        |    AS DECIMAL(28,12))) AS DOUBLE), 4) AS mean_harm
        |FROM lineitem WHERE l_quantity > 0
        |GROUP BY l_returnflag ORDER BY l_returnflag""") { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_quantity") > 0)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("long").as("n"),
          round(sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
            / count(lit(1)), 4).as("mean_arith"),
          round(exp(sum(round(log(col("l_quantity")), 12)
            .cast("decimal(28,12)")).cast("double") / count(lit(1))), 4)
            .as("mean_geo"),
          round(count(lit(1)) / sum(round(lit(1.0) / col("l_quantity"), 12)
            .cast("decimal(28,12)")).cast("double"), 4).as("mean_harm"))
        .orderBy(col("l_returnflag"))
    },

    // WINSORIZED MEAN per return flag — clamp to the exact [p05, p95]
    // band then average, the robust-mean alternative to
    // agg_trimmed_mean that KEEPS the tail rows (at their clamped
    // value) instead of dropping them — the standard estimator for
    // revenue metrics where discarding whales biases low. The clamped
    // values round to 4 decimals (finer than the data's cent scale)
    // then quantize to decimal for the order-free sum, so the mean is
    // bit-stable. Two passes at corpus scale: the per-group exact
    // percentile (KLL sketch at 100 TB) and one clamp+rollup with the
    // 3-row band broadcast back. The oracle casts the DECIMAL price to
    // DOUBLE before quantile_cont — DuckDB's DECIMAL overload truncates
    // the interpolated quantile to the column scale (cents), while
    // Spark's percentile() interpolates in full DOUBLE precision
    // (agg_trimmed_mean precedent).
    Q("agg_winsorized_mean",
      """WITH q AS (SELECT l_returnflag AS rf,
        |    quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.05) AS p05,
        |    quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.95) AS p95
        |  FROM lineitem GROUP BY 1),
        |w AS (SELECT l.l_returnflag AS rf, q.p05, q.p95,
        |    CAST(round(least(greatest(l.l_extendedprice, q.p05), q.p95), 4)
        |      AS DECIMAL(28,12)) AS xw
        |  FROM lineitem l JOIN q ON q.rf = l.l_returnflag)
        |SELECT rf AS l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  round(max(p05), 4) AS p05, round(max(p95), 4) AS p95,
        |  round(CAST(sum(xw) AS DOUBLE) / count(*), 4) AS winsorized_mean
        |FROM w GROUP BY rf ORDER BY rf""") { (s, d) =>
      val q = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("rf"))
        .agg(expr("percentile(l_extendedprice, 0.05)").as("p05"),
          expr("percentile(l_extendedprice, 0.95)").as("p95"))
      Tables.lineitem(s, d)
        .join(broadcast(q), col("l_returnflag") === col("rf"))
        .select(col("rf"), col("p05"), col("p95"),
          round(least(greatest(col("l_extendedprice"), col("p05")),
            col("p95")), 4).cast("decimal(28,12)").as("xw"))
        .groupBy(col("rf"))
        .agg(count(lit(1)).cast("long").as("n"),
          round(max(col("p05")), 4).as("p05"),
          round(max(col("p95")), 4).as("p95"),
          round(sum(col("xw")).cast("double") / count(lit(1)), 4)
            .as("winsorized_mean"))
        .select(col("rf").as("l_returnflag"), col("n"), col("p05"),
          col("p95"), col("winsorized_mean"))
        .orderBy(col("l_returnflag"))
    },

    // SYSTEMATIC SAMPLING — the classic every-k-th design on a hashed
    // frame: order the population by (md5(event_id), event_id) — a
    // deterministic pseudo-random total order both engines agree on —
    // and take rank ≡ 1 (mod 25). Unlike Bernoulli sampling the draw
    // count is EXACTLY ceil(n/25), and unlike reservoir sampling it
    // needs no k-sized state: the global rank comes from the
    // distributed range-partitioned Ranks machinery (per-partition
    // counts + offset join), so there is no single-task sort at any
    // scale; the SQL window below is the DuckDB oracle only. Reported
    // per stratum so the output is the frame-coverage audit (rate ≈
    // 1/25 everywhere is the law of the hashed frame).
    Q("sample_systematic",
      """WITH r AS (SELECT event_type,
        |    row_number() OVER (
        |      ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
        |  FROM events)
        |SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_total,
        |  CAST(sum(CASE WHEN (rn - 1) % 25 = 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_sampled,
        |  round(sum(CASE WHEN (rn - 1) % 25 = 0 THEN 1 ELSE 0 END)
        |    / CAST(count(*) AS DOUBLE), 4) AS rate
        |FROM r GROUP BY 1 ORDER BY 1""") { (s, d) =>
      val base = Tables.events(s, d).select(col("event_type"),
        md5(col("event_id").cast("string")).as("mk"), col("event_id"))
      val ranked = Ranks.withGlobalRowNumber(base,
        Seq(col("mk"), col("event_id")), "rn")
      ranked.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n_total"),
          sum(when((col("rn") - 1) % 25 === 0, 1).otherwise(0))
            .cast("long").as("n_sampled"))
        .select(col("event_type"), col("n_total"), col("n_sampled"),
          round(col("n_sampled") / col("n_total").cast("double"), 4)
            .as("rate"))
        .orderBy(col("event_type"))
    },

    // NEYMAN-ALLOCATION STRATIFIED SAMPLE (Neyman 1934) — the
    // variance-OPTIMAL upgrade of sample_stratified's fixed rates: a
    // budget of 1000 rows is allocated across event-type strata
    // proportional to N_h·S_h (population size × population std of
    // value), so high-variance strata get more of the budget — the
    // estimator-variance-minimizing design every metrics platform
    // wants for expensive human evals. Everything after the one
    // power-sum scan is EXACT INTEGER arithmetic: the allocation is
    // floor(1000·w + 1/2) on a double share, the per-stratum keep
    // threshold is (65536·alloc) // N_h, and the row coin is the
    // first 4 md5 hex digits of event_id — so realized counts are
    // bit-identical on any partitioning and engine. Two corpus scans
    // (stats, then the broadcast-threshold filter + sample rollup).
    Q("sample_neyman",
      """WITH st AS (SELECT event_type, count(*) AS nh,
        |    CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
        |    CAST(sum(CAST(value * value AS DECIMAL(28,8))) AS DOUBLE)
        |      AS s2
        |  FROM events GROUP BY 1),
        |sd AS (SELECT event_type, nh,
        |    sqrt(s2 / nh - (s1 / nh) * (s1 / nh)) AS sh FROM st),
        |tot AS (SELECT sum(CAST(round(nh * sh, 6) AS DECIMAL(28,6)))
        |    AS w FROM sd),
        |alloc AS (SELECT sd.event_type, sd.nh, sd.sh,
        |    CAST(floor(1000 * (nh * sh / CAST(tot.w AS DOUBLE)) + 0.5)
        |      AS BIGINT) AS n_alloc
        |  FROM sd CROSS JOIN tot),
        |thr AS (SELECT event_type, nh, sh, n_alloc,
        |    (65536 * n_alloc) // nh AS keep16 FROM alloc),
        |smp AS (SELECT e.event_type,
        |    count(*) AS n_sampled,
        |    sum(CAST(e.value AS DECIMAL(18,4))) AS sv
        |  FROM events e JOIN thr t ON t.event_type = e.event_type
        |  WHERE ('0x' || substr(md5(CAST(e.event_id AS VARCHAR)), 1, 4))
        |      ::BIGINT < t.keep16
        |  GROUP BY 1)
        |SELECT t.event_type, CAST(t.nh AS BIGINT) AS n_pop,
        |  round(t.sh, 4) AS sd_pop, t.n_alloc,
        |  CAST(coalesce(smp.n_sampled, 0) AS BIGINT) AS n_sampled,
        |  round(CAST(smp.sv AS DOUBLE) / smp.n_sampled, 4)
        |    AS sample_mean
        |FROM thr t LEFT JOIN smp ON smp.event_type = t.event_type
        |ORDER BY t.event_type""") { (s, d) =>
      val st = Tables.events(s, d).groupBy(col("event_type"))
        .agg(count(lit(1)).as("nh"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("s1"),
          sum((col("value") * col("value")).cast("decimal(28,8)"))
            .cast("double").as("s2"))
      val sd = st.select(col("event_type"), col("nh"),
        sqrt(col("s2") / col("nh") -
          (col("s1") / col("nh")) * (col("s1") / col("nh"))).as("sh"))
      val tot = sd.agg(sum(round(col("nh") * col("sh"), 6)
        .cast("decimal(28,6)")).as("w"))
      val thr = sd.crossJoin(broadcast(tot))
        .select(col("event_type"), col("nh"), col("sh"),
          floor(lit(1000) * (col("nh") * col("sh") /
            col("w").cast("double")) + 0.5).cast("long").as("n_alloc"))
        .withColumn("keep16",
          expr("(65536 * n_alloc) div nh"))
      val smp = Tables.events(s, d)
        .join(broadcast(thr.select(col("event_type"), col("keep16"))),
          Seq("event_type"))
        .filter(expr(
          "CAST(conv(substr(md5(CAST(event_id AS STRING)), 1, 4), 16, 10) AS BIGINT)")
          < col("keep16"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(col("value").cast("decimal(18,4)")).as("sv"))
      thr.join(smp, Seq("event_type"), "left_outer")
        .select(col("event_type"), col("nh").cast("long").as("n_pop"),
          round(col("sh"), 4).as("sd_pop"), col("n_alloc"),
          coalesce(col("n_sampled"), lit(0L)).cast("long").as("n_sampled"),
          round(col("sv").cast("double") / col("n_sampled"), 4)
            .as("sample_mean"))
        .orderBy(col("event_type"))
    },

    // INEQUALITY-INDEX SUITE (Theil T / Theil L (MLD) / Atkinson ε=½ /
    // Hoover) over positive event values — the concentration readouts
    // next to agg_gini_entropy that decompose (Theil is the one that
    // ADDS across subgroups, which is why pipelines prefer it to Gini
    // at scale). Two scans: one for the mean, one for the quantized
    // index terms against the broadcast 1-row μ; ε=½ keeps Atkinson a
    // sqrt (no libm pow). All terms DECIMAL-quantized → order-free.
    Q("agg_inequality",
      """WITH x AS (SELECT CAST(value AS DOUBLE) AS v FROM events
        |  WHERE value > 0),
        |m AS (SELECT count(*) AS n,
        |    CAST(sum(CAST(round(v, 6) AS DECIMAL(28,6))) AS DOUBLE)
        |      / count(*) AS mu
        |  FROM x),
        |t AS (SELECT n, mu,
        |    CAST(sum(CAST(round((v / mu) * ln(v / mu), 12)
        |      AS DECIMAL(28,12))) AS DOUBLE) AS st,
        |    CAST(sum(CAST(round(ln(mu / v), 12) AS DECIMAL(28,12)))
        |      AS DOUBLE) AS sl,
        |    CAST(sum(CAST(round(sqrt(v), 10) AS DECIMAL(28,10)))
        |      AS DOUBLE) AS ss,
        |    CAST(sum(CAST(round(abs(v - mu), 8) AS DECIMAL(28,8)))
        |      AS DOUBLE) AS sa
        |  FROM x CROSS JOIN m GROUP BY n, mu)
        |SELECT CAST(n AS BIGINT) AS n, round(mu, 4) AS mean,
        |  round(st / n, 4) AS theil_t,
        |  round(sl / n, 4) AS theil_l,
        |  round(1 - ((ss / n) * (ss / n)) / mu, 4) AS atkinson_05,
        |  round(sa / (2 * n * mu), 4) AS hoover
        |FROM t""") { (s, d) =>
      val x = Tables.events(s, d).filter(col("value") > 0)
        .select(col("value").cast("double").as("v"))
      val m = x.agg((sum(round(col("v"), 6).cast("decimal(28,6)"))
        .cast("double") / count(lit(1))).as("mu"),
        count(lit(1)).as("n"))
      def qs(c: org.apache.spark.sql.Column, scale: Int) =
        sum(round(c, scale).cast(s"decimal(28,$scale)")).cast("double")
      x.crossJoin(broadcast(m))
        .groupBy(col("n"), col("mu"))
        .agg(qs((col("v") / col("mu")) * log(col("v") / col("mu")), 12)
          .as("st"),
          qs(log(col("mu") / col("v")), 12).as("sl"),
          qs(sqrt(col("v")), 10).as("ss"),
          qs(abs(col("v") - col("mu")), 8).as("sa"))
        .select(col("n").cast("long").as("n"), round(col("mu"), 4)
          .as("mean"),
          round(col("st") / col("n"), 4).as("theil_t"),
          round(col("sl") / col("n"), 4).as("theil_l"),
          round(lit(1) - ((col("ss") / col("n")) * (col("ss") / col("n")))
            / col("mu"), 4).as("atkinson_05"),
          round(col("sa") / (lit(2) * col("n") * col("mu")), 4)
            .as("hoover"))
    })
}
