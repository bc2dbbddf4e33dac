package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal join operators the reference's event model implies but no
  * Spark built-in expresses directly — chiefly the AS-OF join ("enrich
  * each event with the most recent prior state"), the time-series twin
  * of the reference's lookup-cache join (k8sclient.go:124-159 resolves
  * each event against the object state current AT THAT MOMENT; the cache
  * approximates as-of with a TTL).
  *
  * Spark-first strategy: NOT a range join (quadratic candidates, ~no
  * pushdown). Both sides are tagged, unioned, and swept with one
  * `last(..., ignoreNulls)` window over (key, time) — a single shuffle
  * on the key, one sort, one linear pass. This is the shape that
  * survives 100 TB: shuffle width = key cardinality, no pair blow-up,
  * and AQE handles key skew as for any other keyed sort.
  */
object TemporalQueries {

  def all: Seq[Q] = Seq(

    // Gap-based session NUMBERING: a 30-minute silence starts a new
    // session; the session id is the running count of breaks — the
    // explicit-id sessionization the session_window aggregate can't
    // give you (per-event session membership for downstream joins).
    // Two windows over one user-keyed shuffle; micros arithmetic keeps
    // the gap test integer-exact in both engines.
    Q("sess_ids",
      """WITH o AS (SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) IS NULL
        |         OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id)) > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (SELECT user_id, ts,
        |    sum(brk) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS sess_id
        |  FROM o)
        |SELECT user_id, CAST(sess_id AS INT) AS sess_id,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
        |  CAST(epoch_us(max(ts)) AS BIGINT) AS end_us
        |FROM s
        |GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_id""") { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val o = Tables.events(s, d)
        .withColumn("prev_us", lag(expr("unix_micros(ts)"), 1).over(w))
        .withColumn("brk", when(col("prev_us").isNull ||
          expr("unix_micros(ts)") - col("prev_us") > 1800000000L, 1)
          .otherwise(0))
        .withColumn("sess_id", sum(col("brk")).over(w))
      o.groupBy(col("user_id"), col("sess_id").cast("int").as("sess_id"))
        .agg(count(lit(1)).as("n_events"),
          expr("unix_micros(min(ts))").as("start_us"),
          expr("unix_micros(max(ts))").as("end_us"))
        .orderBy(col("user_id"), col("sess_id"))
    },

    // Downsampling/resample: 6-hour buckets per event type with count,
    // decimal-exact mean, and LAST value in deterministic (ts, event_id)
    // order — the telemetry-rollup shape (avg for rates, last for
    // gauges). The aggregate and the last-row window share the
    // (event_type, bucket) key, so Catalyst reuses one exchange for
    // both sides of the final join.
    Q("ts_resample",
      """WITH b AS (SELECT event_type,
        |    CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS bucket,
        |    ts, event_id, "value"
        |  FROM events),
        |l AS (SELECT event_type, bucket, "value" AS lv,
        |    row_number() OVER (PARTITION BY event_type, bucket
        |      ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM b),
        |a AS (SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS n,
        |    CAST(floor(CAST(sum(CAST("value" AS DECIMAL(18,4))) AS DOUBLE)
        |         / count(*) * 10000 + 0.5) / 10000.0 AS DOUBLE) AS avg_value
        |  FROM b GROUP BY 1, 2)
        |SELECT a.event_type, a.bucket, a.n, a.avg_value,
        |  CAST(floor(l.lv * 10000 + 0.5) / 10000.0 AS DOUBLE) AS last_value
        |FROM a JOIN l ON l.event_type = a.event_type
        |  AND l.bucket = a.bucket AND l.rn = 1
        |ORDER BY a.event_type, a.bucket""") { (s, d) =>
      val b = Tables.events(s, d).select(col("event_type"),
        expr("CAST(floor(unix_timestamp(ts) / 21600) * 21600 AS BIGINT)")
          .as("bucket"),
        col("ts"), col("event_id"), col("value"))
      val w = Window.partitionBy(col("event_type"), col("bucket"))
        .orderBy(col("ts").desc, col("event_id").desc)
      val l = b.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("bucket"),
          // floor-quantized, not round()ed: engine round() tie rules
          // diverge on quotients an ulp from a .xxxx5 boundary
          expr("CAST(floor(value * 10000 + 0.5) / 10000.0 AS DOUBLE)")
            .as("last_value"))
      val a = b.groupBy(col("event_type"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          expr("""CAST(floor(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
            |/ count(1) * 10000 + 0.5) / 10000.0 AS DOUBLE)""".stripMargin)
            .as("avg_value"))
      a.join(l, Seq("event_type", "bucket"))
        .select(col("event_type"), col("bucket"), col("n"),
          col("avg_value"), col("last_value"))
        .orderBy(col("event_type"), col("bucket"))
    },

    // Exponentially-weighted moving average over the 6-hour resampled
    // series, α = 0.5 — the time-series smoothing twin of win_moving_avg
    // (EWMA is RECURSIVE, so no window frame expresses it directly).
    // Determinism by construction: α = 0.5 makes every decay weight an
    // EXACT power of two (pow(0.5, k) is exact in IEEE doubles in both
    // engines — no libm divergence), each weighted term quantizes to
    // DECIMAL(28,12) before the order-free exact sum, and the closed
    // form ewma_t = Σ_{j≤t} w(j,t)·x_j (w = 0.5^{t−j+1}, full weight
    // 0.5^{t−1} for j = 1) replaces the recursion with a per-key
    // pair join. Scale posture: the quadratic pair join is per-KEY and
    // the per-key series is the bucketed resample (bounded by the
    // retention window ÷ 6 h), so the join is small-n² × many keys —
    // embarrassingly parallel; an unbounded series would use the
    // segmented-scan form instead.
    Q("ts_ewma",
      """WITH b AS (SELECT event_type,
        |    CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) AS bucket,
        |    "value" FROM events),
        |x AS (SELECT event_type, bucket,
        |    CAST(floor(CAST(sum(CAST("value" AS DECIMAL(18,4))) AS DOUBLE)
        |         / count(*) * 10000 + 0.5) / 10000.0 AS DOUBLE) AS xv
        |  FROM b GROUP BY 1, 2),
        |r AS (SELECT event_type, bucket, xv,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY bucket) AS INT) AS rn
        |  FROM x)
        |SELECT t.event_type, t.bucket, t.xv,
        |  CAST(floor(CAST(sum(CAST(j.xv *
        |      (CASE WHEN j.rn = 1 THEN pow(0.5, t.rn - 1)
        |            ELSE pow(0.5, t.rn - j.rn + 1) END)
        |    AS DECIMAL(28,12))) AS DOUBLE) * 10000 + 0.5) / 10000.0
        |    AS DOUBLE) AS ewma
        |FROM r t JOIN r j ON j.event_type = t.event_type AND j.rn <= t.rn
        |GROUP BY t.event_type, t.bucket, t.xv
        |ORDER BY t.event_type, t.bucket""") { (s, d) =>
      val b = Tables.events(s, d).select(col("event_type"),
        expr("CAST(floor(unix_timestamp(ts) / 21600) * 21600 AS BIGINT)")
          .as("bucket"),
        col("value"))
      val x = b.groupBy(col("event_type"), col("bucket"))
        .agg(expr("""CAST(floor(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
          |/ count(1) * 10000 + 0.5) / 10000.0 AS DOUBLE)""".stripMargin)
          .as("xv"))
      val r = x.withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("bucket")))
        .cast("int"))
      val t = r.select(col("event_type"), col("bucket"), col("xv"),
        col("rn"))
      val j = r.select(col("event_type"), col("xv").as("jxv"),
        col("rn").as("jrn"))
      t.join(j, Seq("event_type"))
        .filter(col("jrn") <= col("rn"))
        .withColumn("term", expr(
          """CAST(jxv * (CASE WHEN jrn = 1 THEN pow(0.5, rn - 1)
            |ELSE pow(0.5, rn - jrn + 1) END) AS DECIMAL(28,12))""".stripMargin))
        .groupBy(col("event_type"), col("bucket"), col("xv"))
        .agg(expr(
          """CAST(floor(CAST(sum(term) AS DOUBLE) * 10000 + 0.5) / 10000.0
            |AS DOUBLE)""".stripMargin).as("ewma"))
        .orderBy(col("event_type"), col("bucket"))
    },

    // SCD2 historization from an event log: collapse each user's event
    // stream into type-2 dimension intervals — a row per CHANGE of
    // event_type carrying [valid_from, valid_to) in epoch micros, open
    // interval (NULL valid_to) for the current state. Two windows over
    // ONE user-keyed shuffle (lag detects the change, lead closes the
    // interval — same partitioning, Catalyst reuses the exchange); the
    // canonical warehouse dimension build, linear at any scale.
    Q("dim_scd2_intervals",
      """WITH o AS (SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |chg AS (SELECT user_id, event_type, epoch_us(ts) AS valid_from, event_id
        |  FROM o WHERE prev_type IS NULL OR prev_type <> event_type),
        |iv AS (SELECT user_id, event_type, valid_from,
        |    lead(valid_from) OVER (PARTITION BY user_id
        |      ORDER BY valid_from, event_id) AS valid_to
        |  FROM chg)
        |SELECT user_id, event_type, CAST(valid_from AS BIGINT) AS valid_from,
        |  CAST(valid_to AS BIGINT) AS valid_to
        |FROM iv
        |ORDER BY user_id, valid_from, event_type""") { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val chg = Tables.events(s, d)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(ts)").as("valid_from"), col("event_id"))
      val w2 = Window.partitionBy(col("user_id"))
        .orderBy(col("valid_from"), col("event_id"))
      chg.withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
        .select(col("user_id"), col("event_type"), col("valid_from"),
          col("valid_to"))
        .orderBy(col("user_id"), col("valid_from"), col("event_type"))
    },

    // AS-OF join: each purchase picks the latest click by the same user
    // at-or-before the purchase time (ties on ts broken by highest
    // event_id — both engines pin the same winner). LEFT semantics:
    // purchases with no prior click keep nulls.
    Q("join_asof",
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |     b AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id, p.ts,
        |       l.click_id, l.click_ts, l.click_value
        |FROM p LEFT JOIN LATERAL (
        |  SELECT b.event_id AS click_id, b.ts AS click_ts,
        |         round(b.value, 4) AS click_value
        |  FROM b WHERE b.user_id = p.user_id AND b.ts <= p.ts
        |  ORDER BY b.ts DESC, b.event_id DESC LIMIT 1
        |) l ON true
        |ORDER BY p.event_id""") { (s, d) =>
      val ev = Tables.events(s, d)
      val probe = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("side"),
          col("event_id").as("src_id"), col("value").as("src_value"))
      val build = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(0).as("side"),
          col("event_id").as("src_id"), col("value").as("src_value"))
      // side=0 sorts before side=1 at equal ts: an equal-timestamp click
      // is visible to the purchase (inclusive as-of, b.ts <= p.ts).
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"), col("src_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      build.unionByName(probe)
        .withColumn("b", when(col("side") === 0,
          struct(col("ts").as("click_ts"), col("src_id").as("click_id"),
            col("src_value").as("click_value"))))
        .withColumn("asof", last(col("b"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("src_id").as("event_id"), col("user_id"), col("ts"),
          col("asof.click_id").as("click_id"),
          col("asof.click_ts").as("click_ts"),
          round(col("asof.click_value"), 4).as("click_value"))
        .orderBy(col("event_id"))
    },

    // FORWARD as-of: each click picks the NEXT purchase at-or-after its
    // time (the time-to-conversion lookup) — the same one-shuffle tagged
    // union + last(ignoreNulls) sweep as the backward form, run over the
    // DESCENDING time order. Equal-ts purchases are visible (inclusive);
    // ties resolve to the smallest purchase id, which the DESC sweep
    // realizes by ordering build rows id-descending so the LAST seen is
    // the minimum.
    Q("join_asof_fwd",
      """WITH c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |     b AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id,
        |  l.purchase_id, CAST(l.wait_us AS BIGINT) AS wait_us
        |FROM c LEFT JOIN LATERAL (
        |  SELECT b.event_id AS purchase_id,
        |         epoch_us(b.ts) - epoch_us(c.ts) AS wait_us
        |  FROM b WHERE b.user_id = c.user_id AND b.ts >= c.ts
        |  ORDER BY b.ts ASC, b.event_id ASC LIMIT 1
        |) l ON true
        |ORDER BY c.event_id""") { (s, d) =>
      val ev = Tables.events(s, d)
      val probe = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(1).as("side"),
          col("event_id").as("src_id"))
      val build = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(0).as("side"),
          col("event_id").as("src_id"))
      // DESC time scan: at a click row, the last-seen build row is the
      // earliest purchase >= click ts; side ASC puts the equal-ts
      // purchase before the click, src_id DESC makes the last equal-ts
      // purchase the minimum id — matching the lateral's ASC/ASC LIMIT 1.
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("side").asc, col("src_id").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      build.unionByName(probe)
        .withColumn("b", when(col("side") === 0,
          struct(col("ts").as("p_ts"), col("src_id").as("p_id"))))
        .withColumn("nxt", last(col("b"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("src_id").as("event_id"), col("user_id"),
          col("nxt.p_id").as("purchase_id"),
          (expr("unix_micros(nxt.p_ts)") - expr("unix_micros(ts)"))
            .as("wait_us"))
        .orderBy(col("event_id"))
    },

    // NEAREST as-of: each purchase picks the click closest in time in
    // EITHER direction (|Δt| min; tie → the backward one, then the
    // largest click id) — the remaining mode of the as-of family
    // (pandas merge_asof direction='nearest'). Still ONE shuffle: both
    // directional candidates come from two window sweeps over the SAME
    // user-keyed exchange (ascending and descending time order reuse
    // the exchange; only the sort differs), then a pure per-row
    // comparison picks the nearer — no range join, no candidate
    // blow-up, the same shape that survives 100 TB.
    Q("join_asof_nearest",
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |     b AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id,
        |  l.click_id, CAST(l.delta_us AS BIGINT) AS delta_us
        |FROM p LEFT JOIN LATERAL (
        |  SELECT b.event_id AS click_id,
        |         epoch_us(b.ts) - epoch_us(p.ts) AS delta_us
        |  FROM b WHERE b.user_id = p.user_id
        |  ORDER BY abs(epoch_us(b.ts) - epoch_us(p.ts)) ASC,
        |           (b.ts > p.ts) ASC, b.event_id DESC LIMIT 1
        |) l ON true
        |ORDER BY p.event_id""") { (s, d) =>
      val ev = Tables.events(s, d)
      val probe = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("side"),
          col("event_id").as("src_id"))
      val build = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), lit(0).as("side"),
          col("event_id").as("src_id"))
      val u = build.unionByName(probe)
        .withColumn("b", when(col("side") === 0,
          struct(col("ts").as("b_ts"), col("src_id").as("b_id"))))
      // Backward pick = largest ts <= p.ts, tie largest id (src_id ASC →
      // last seen is the max id, matching join_asof's lateral).
      val wBack = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"), col("src_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // Forward pick = smallest ts >= p.ts, tie largest id: in the DESC
      // sweep the row nearest above the probe within the equal-ts group
      // ordered id-ASC is that group's max id.
      val wFwd = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("side").asc, col("src_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      u.withColumn("back", last(col("b"), ignoreNulls = true).over(wBack))
        .withColumn("fwd", last(col("b"), ignoreNulls = true).over(wFwd))
        .filter(col("side") === 1)
        .withColumn("d_back",
          expr("unix_micros(ts) - unix_micros(back.b_ts)"))
        .withColumn("d_fwd",
          expr("unix_micros(fwd.b_ts) - unix_micros(ts)"))
        .withColumn("pick",
          when(col("back").isNull, col("fwd"))
            .when(col("fwd").isNull, col("back"))
            .when(col("d_back") <= col("d_fwd"), col("back"))
            .otherwise(col("fwd")))
        .select(col("src_id").as("event_id"), col("user_id"),
          col("pick.b_id").as("click_id"),
          (expr("unix_micros(pick.b_ts)") - expr("unix_micros(ts)"))
            .as("delta_us"))
        .orderBy(col("event_id"))
    },

    // Hourly-count z-score anomaly flags: per event type, hours whose
    // event count sits >= 2 sample standard deviations from that type's
    // mean hourly count — the basic volume-anomaly monitor over a
    // metrics stream. Statistics stay EXACT until the last step: count,
    // Σc and Σc² are integer aggregates, mean/variance/z derive from
    // them with identical double expressions in both engines (no
    // engine-owned stddev whose summation order could differ). Two
    // keyed shuffles (hour rollup, per-type stats) and a broadcast of
    // the 5-row stats relation — scan-shaped at any corpus size.
    Q("ts_zscore",
      """WITH c AS (SELECT event_type, date_trunc('hour', ts) AS hour,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, count(*) AS n,
        |    sum(cnt) AS s1, sum(cnt * cnt) AS s2
        |  FROM c GROUP BY 1)
        |SELECT c.event_type, c.hour, CAST(cnt AS BIGINT) AS cnt,
        |  round((cnt - CAST(s1 AS DOUBLE) / n) /
        |    sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)),
        |    4) AS z
        |FROM c JOIN st ON c.event_type = st.event_type
        |WHERE abs((cnt - CAST(s1 AS DOUBLE) / n) /
        |    sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1)))
        |  >= 2.0
        |ORDER BY c.event_type, c.hour""") { (s, d) =>
      val c = Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("cnt"))
      val st = c.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s1"),
          sum(col("cnt") * col("cnt")).as("s2"))
      val z = expr(
        """(cnt - CAST(s1 AS DOUBLE) / n) /
          |sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / (n - 1))"""
          .stripMargin)
      c.join(broadcast(st), Seq("event_type"))
        .filter(abs(z) >= 2.0)
        .select(col("event_type"), col("hour"), col("cnt"),
          round(z, 4).as("z"))
        .orderBy(col("event_type"), col("hour"))
    },

    // Additive seasonal decomposition of the hourly event-count series
    // (classical trend/seasonal/residual split, the moving-average core
    // of STL): trend = centered ±12h RANGE-frame mean (only hours whose
    // frame holds all 25 observations decompose — edges and gap-
    // shortened frames are excluded, so the "moving average" is a real
    // time window, not a row window that silently spans gaps);
    // seasonal = per-(type, hour-of-day) mean of the detrended series.
    // EXACT arithmetic until the final division: the frame emits the
    // integer Σcnt (s25), the seasonal mean is the integer identity
    // avg(cnt − s25/25) = (25·Σcnt − Σs25)/(25·m), and trend/seasonal/
    // resid derive from those ints with identical double expressions in
    // both engines — no double accumulation whose order could differ.
    // One (type,hour) rollup + one RANGE window over the same keyed
    // exchange + a ≤|types|·24-row broadcast — scan-shaped at 100 TB.
    Q("ts_decompose",
      """WITH c AS (SELECT event_type, date_trunc('hour', ts) AS hour,
        |    epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2, 3),
        |w AS (SELECT *, sum(cnt) OVER win AS s25, count(*) OVER win AS n25
        |  FROM c WINDOW win AS (PARTITION BY event_type ORDER BY hr
        |    RANGE BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |d AS (SELECT * FROM w WHERE n25 = 25),
        |se AS (SELECT event_type, hr % 24 AS hod,
        |    25 * sum(cnt) - sum(s25) AS num, 25 * count(*) AS den
        |  FROM d GROUP BY 1, 2)
        |SELECT d.event_type, d.hour, CAST(d.cnt AS BIGINT) AS cnt,
        |  round(s25 / 25.0, 4) AS trend,
        |  round(CAST(num AS DOUBLE) / den, 4) AS seasonal,
        |  round(d.cnt - s25 / 25.0 - CAST(num AS DOUBLE) / den, 4) AS resid
        |FROM d JOIN se ON se.event_type = d.event_type
        |  AND se.hod = d.hr % 24
        |ORDER BY d.event_type, d.hour""") { (s, d) =>
      val c = Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("hr", expr("unix_micros(hour) div 3600000000"))
      val win = Window.partitionBy(col("event_type")).orderBy(col("hr"))
        .rangeBetween(-12, 12)
      val dd = c.withColumn("s25", sum(col("cnt")).over(win))
        .withColumn("n25", count(lit(1)).over(win))
        .filter(col("n25") === 25)
      val se = dd.groupBy(col("event_type").as("se_type"),
          (col("hr") % 24).as("hod"))
        .agg((lit(25) * sum(col("cnt")) - sum(col("s25"))).as("num"),
          (lit(25) * count(lit(1))).as("den"))
      dd.join(broadcast(se),
          col("se_type") === col("event_type") &&
            col("hod") === col("hr") % 24)
        .select(col("event_type"), col("hour"), col("cnt"),
          round(col("s25") / 25.0, 4).as("trend"),
          round(col("num").cast("double") / col("den"), 4).as("seasonal"),
          round(col("cnt") - col("s25") / 25.0 -
            col("num").cast("double") / col("den"), 4).as("resid"))
        .orderBy(col("event_type"), col("hour"))
    },

    // Seasonality / trend STRENGTH per series (Hyndman & Athanasopoulos,
    // FPP3 §4.4, Wang-Smith-Hyndman features): Fs = max(0, 1 −
    // Var(R)/Var(S+R)) and Ft = max(0, 1 − Var(R)/Var(T+R)) over the
    // ts_decompose split — the one-number-per-series answer to "is this
    // metric actually seasonal, or is the hod profile noise". Components
    // derive from the SAME exact integers as ts_decompose (cnt, Σcnt
    // frame, seasonal num/den); each squared term quantizes to
    // DECIMAL(28,12) before its order-free sum, so the variances are
    // partition-invariant. Costs one extra constant-size rollup on top
    // of the decompose plan.
    Q("ts_seasonality_strength",
      """WITH c AS (SELECT event_type, date_trunc('hour', ts) AS hour,
        |    epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr,
        |    count(*) AS cnt
        |  FROM events GROUP BY 1, 2, 3),
        |w AS (SELECT *, sum(cnt) OVER win AS s25, count(*) OVER win AS n25
        |  FROM c WINDOW win AS (PARTITION BY event_type ORDER BY hr
        |    RANGE BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |d AS (SELECT * FROM w WHERE n25 = 25),
        |se AS (SELECT event_type, hr % 24 AS hod,
        |    25 * sum(cnt) - sum(s25) AS num, 25 * count(*) AS den
        |  FROM d GROUP BY 1, 2),
        |comp AS (SELECT d.event_type,
        |    d.cnt - s25 / 25.0 - CAST(num AS DOUBLE) / den AS r,
        |    d.cnt - s25 / 25.0 AS sr,
        |    d.cnt - CAST(num AS DOUBLE) / den AS tr
        |  FROM d JOIN se ON se.event_type = d.event_type
        |    AND se.hod = d.hr % 24),
        |v AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
        |    CAST(sum(CAST(r AS DECIMAL(28,12))) AS DOUBLE) AS s_r,
        |    CAST(sum(CAST(r * r AS DECIMAL(28,12))) AS DOUBLE) AS s_rr,
        |    CAST(sum(CAST(sr AS DECIMAL(28,12))) AS DOUBLE) AS s_sr,
        |    CAST(sum(CAST(sr * sr AS DECIMAL(28,12))) AS DOUBLE) AS s_srsr,
        |    CAST(sum(CAST(tr AS DECIMAL(28,12))) AS DOUBLE) AS s_tr,
        |    CAST(sum(CAST(tr * tr AS DECIMAL(28,12))) AS DOUBLE) AS s_trtr
        |  FROM comp GROUP BY 1)
        |SELECT event_type, n_hours,
        |  round(greatest(0.0, 1 - ((s_rr - s_r * s_r / n_hours))
        |    / ((s_srsr - s_sr * s_sr / n_hours))), 4) AS seasonal_strength,
        |  round(greatest(0.0, 1 - ((s_rr - s_r * s_r / n_hours))
        |    / ((s_trtr - s_tr * s_tr / n_hours))), 4) AS trend_strength
        |FROM v ORDER BY event_type""") { (s, d) =>
      val c = Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("hr", expr("unix_micros(hour) div 3600000000"))
      val win = Window.partitionBy(col("event_type")).orderBy(col("hr"))
        .rangeBetween(-12, 12)
      val dd = c.withColumn("s25", sum(col("cnt")).over(win))
        .withColumn("n25", count(lit(1)).over(win))
        .filter(col("n25") === 25)
      val se = dd.groupBy(col("event_type").as("se_type"),
          (col("hr") % 24).as("hod"))
        .agg((lit(25) * sum(col("cnt")) - sum(col("s25"))).as("num"),
          (lit(25) * count(lit(1))).as("den"))
      val comp = dd.join(broadcast(se),
          col("se_type") === col("event_type") &&
            col("hod") === col("hr") % 24)
        .select(col("event_type"),
          (col("cnt") - col("s25") / 25.0 -
            col("num").cast("double") / col("den")).as("r"),
          (col("cnt") - col("s25") / 25.0).as("sr"),
          (col("cnt") - col("num").cast("double") / col("den")).as("tr"))
      comp.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n_hours"),
          sum(col("r").cast("decimal(28,12)")).cast("double").as("s_r"),
          sum((col("r") * col("r")).cast("decimal(28,12)"))
            .cast("double").as("s_rr"),
          sum(col("sr").cast("decimal(28,12)")).cast("double").as("s_sr"),
          sum((col("sr") * col("sr")).cast("decimal(28,12)"))
            .cast("double").as("s_srsr"),
          sum(col("tr").cast("decimal(28,12)")).cast("double").as("s_tr"),
          sum((col("tr") * col("tr")).cast("decimal(28,12)"))
            .cast("double").as("s_trtr"))
        .select(col("event_type"), col("n_hours"),
          round(greatest(lit(0.0), lit(1) -
            (col("s_rr") - col("s_r") * col("s_r") / col("n_hours")) /
              (col("s_srsr") - col("s_sr") * col("s_sr") / col("n_hours"))), 4)
            .as("seasonal_strength"),
          round(greatest(lit(0.0), lit(1) -
            (col("s_rr") - col("s_r") * col("s_r") / col("n_hours")) /
              (col("s_trtr") - col("s_tr") * col("s_tr") / col("n_hours"))), 4)
            .as("trend_strength"))
        .orderBy(col("event_type"))
    },

    // AS-OF with tolerance: same sweep, but a match older than 6 hours
    // is discarded (the reference's TTL'd cache analog: stale state is a
    // miss, k8sclient.go TTL 3600s). Demonstrates that the window sweep
    // composes with a post-predicate instead of needing a range join.
    Q("join_asof_tolerance",
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |     b AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup')
        |SELECT p.event_id, p.user_id, l.signup_id
        |FROM p LEFT JOIN LATERAL (
        |  SELECT b.event_id AS signup_id
        |  FROM b WHERE b.user_id = p.user_id AND b.ts <= p.ts
        |    AND b.ts >= p.ts - INTERVAL 6 HOUR
        |  ORDER BY b.ts DESC, b.event_id DESC LIMIT 1
        |) l ON true
        |ORDER BY p.event_id""") { (s, d) =>
      val ev = Tables.events(s, d)
      val probe = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(1).as("side"), col("event_id").as("src_id"))
      val build = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), lit(0).as("side"), col("event_id").as("src_id"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("side"), col("src_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      build.unionByName(probe)
        .withColumn("b", when(col("side") === 0,
          struct(col("ts").as("b_ts"), col("src_id").as("b_id"))))
        .withColumn("asof", last(col("b"), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("src_id").as("event_id"), col("user_id"),
          when(col("asof.b_ts") >= col("ts") - expr("INTERVAL 6 HOUR"),
            col("asof.b_id")).as("signup_id"))
        .orderBy(col("event_id"))
    },

    // Interval coalescing (gaps-and-islands): each event opens a 30-min
    // activity interval; overlapping/touching intervals per user merge
    // into one. The classic two-window resolution — running max of
    // prior interval ends marks the breaks, a running sum of breaks
    // numbers the islands — so the merge is ONE user-keyed sort-window
    // pass (both windows share the same (user, ts, event_id) exchange
    // and sort; no self-join, no iterative chaining). All arithmetic
    // is timestamp+constant and integer flags — exact in both engines.
    // Scale: per-user windows over a keyed exchange; island count never
    // materializes globally — 100 TB-safe.
    Q("ts_interval_merge",
      """WITH s AS (SELECT user_id, ts, event_id,
        |    max(ts + INTERVAL 30 MINUTE) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
        |  FROM events),
        |f AS (SELECT *, CASE WHEN prev_end IS NULL OR ts > prev_end
        |    THEN 1 ELSE 0 END AS brk FROM s),
        |g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS isl FROM f)
        |SELECT user_id, CAST(isl AS BIGINT) AS interval_id,
        |  min(ts) AS start_ts, max(ts + INTERVAL 30 MINUTE) AS end_ts,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM g GROUP BY 1, 2
        |ORDER BY user_id, interval_id""") { (s, d) =>
      val endCol = col("ts") + expr("INTERVAL 30 MINUTES")
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_end", max(endCol)
          .over(ord.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("brk", when(col("prev_end").isNull ||
          col("ts") > col("prev_end"), 1).otherwise(0))
        .withColumn("interval_id", sum(col("brk"))
          .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("interval_id"))
        .agg(min(col("ts")).as("start_ts"), max(endCol).as("end_ts"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"), col("interval_id"))
    },

    // CUSUM change-point score per event type: daily counts, centered on
    // the type's own mean rate, accumulated left-to-right — the peak
    // |cusum| marks the most likely level-shift day (Page's test
    // statistic). Days collapse to one (type, day) rollup; the centered
    // terms are DECIMAL-quantized so the running sum is exact, the
    // cumulative window is keyed per type (bounded by calendar days, not
    // rows), and the argmax resolves via one more keyed aggregate with
    // earliest-day tiebreak. No raw-event sort anywhere.
    Q("ts_cusum",
      """WITH dc AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type,
        |    sum(c) / CAST(count(*) AS DOUBLE) AS mu FROM dc GROUP BY 1),
        |cs AS (SELECT dc.event_type, day,
        |    sum(CAST(c - mu AS DECIMAL(28,12)))
        |      OVER (PARTITION BY dc.event_type ORDER BY day) AS s
        |  FROM dc JOIN m ON m.event_type = dc.event_type),
        |pk AS (SELECT event_type, max(abs(s)) AS peak FROM cs GROUP BY 1)
        |SELECT cs.event_type,
        |  floor(CAST(pk.peak AS DOUBLE) * 10000 + 0.5) / 10000.0 AS max_dev,
        |  min(CASE WHEN abs(s) = peak THEN day END) AS peak_day,
        |  CAST(count(*) AS BIGINT) AS n_days
        |FROM cs JOIN pk ON pk.event_type = cs.event_type
        |GROUP BY cs.event_type, pk.peak ORDER BY cs.event_type""") { (s, d) =>
      val dc = Tables.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("c"))
      val m = dc.groupBy(col("event_type"))
        .agg((sum(col("c")) / count(lit(1)).cast("double")).as("mu"))
      val wc = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val cs = dc.join(m, Seq("event_type"))
        .withColumn("s", sum(expr("CAST(c - mu AS DECIMAL(28,12))")).over(wc))
      val wp = Window.partitionBy(col("event_type"))
      cs
        .withColumn("peak", max(abs(col("s"))).over(wp))
        .groupBy(col("event_type"), col("peak"))
        .agg(
          expr("CAST(floor(CAST(max(peak) AS DOUBLE) * 10000 + 0.5) / 10000.0 AS DOUBLE)")
            .as("max_dev"),
          min(when(abs(col("s")) === col("peak"), col("day"))).as("peak_day"),
          count(lit(1)).as("n_days"))
        .drop("peak")
        .orderBy(col("event_type"))
    },

    // Lag-k autocorrelation of the daily event rate (k = 1 and 7 — the
    // seasonality screen: r7 spikes on weekly-periodic streams). Days
    // collapse to one (type, day) rollup; lead() runs in a keyed window
    // bounded by calendar days; each centered product is
    // DECIMAL-quantized before its order-free sum, so
    // r_k = Σ(x_t−μ)(x_{t+k}−μ) / Σ(x_t−μ)² is partition-invariant.
    Q("ts_autocorr",
      """WITH dc AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type,
        |    sum(c) / CAST(count(*) AS DOUBLE) AS mu FROM dc GROUP BY 1),
        |x AS (SELECT dc.event_type, day, c, mu,
        |    lead(c, 1) OVER (PARTITION BY dc.event_type ORDER BY day) AS c1,
        |    lead(c, 7) OVER (PARTITION BY dc.event_type ORDER BY day) AS c7
        |  FROM dc JOIN m ON m.event_type = dc.event_type),
        |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(CAST((c - mu) * (c - mu) AS DECIMAL(28,12))) AS DOUBLE) AS s0,
        |    CAST(sum(CASE WHEN c1 IS NOT NULL
        |      THEN CAST((c - mu) * (c1 - mu) AS DECIMAL(28,12)) END) AS DOUBLE) AS s1,
        |    CAST(sum(CASE WHEN c7 IS NOT NULL
        |      THEN CAST((c - mu) * (c7 - mu) AS DECIMAL(28,12)) END) AS DOUBLE) AS s7
        |  FROM x GROUP BY 1)
        |SELECT event_type, n_days,
        |  floor(s1 / s0 * 10000 + 0.5) / 10000.0 AS r1,
        |  floor(s7 / s0 * 10000 + 0.5) / 10000.0 AS r7
        |FROM a ORDER BY event_type""") { (s, d) =>
      val dc = Tables.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("c"))
      val m = dc.groupBy(col("event_type"))
        .agg((sum(col("c")) / count(lit(1)).cast("double")).as("mu"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      dc.join(m, Seq("event_type"))
        .withColumn("c1", lead(col("c"), 1).over(w))
        .withColumn("c7", lead(col("c"), 7).over(w))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          expr("CAST(sum(CAST((c - mu) * (c - mu) AS DECIMAL(28,12))) AS DOUBLE)").as("s0"),
          expr("""CAST(sum(CASE WHEN c1 IS NOT NULL
                 |  THEN CAST((c - mu) * (c1 - mu) AS DECIMAL(28,12)) END) AS DOUBLE)""".stripMargin).as("s1"),
          expr("""CAST(sum(CASE WHEN c7 IS NOT NULL
                 |  THEN CAST((c - mu) * (c7 - mu) AS DECIMAL(28,12)) END) AS DOUBLE)""".stripMargin).as("s7"))
        .select(col("event_type"), col("n_days"),
          expr("CAST(floor(s1 / s0 * 10000 + 0.5) / 10000.0 AS DOUBLE)").as("r1"),
          expr("CAST(floor(s7 / s0 * 10000 + 0.5) / 10000.0 AS DOUBLE)").as("r7"))
        .orderBy(col("event_type"))
    },

    // Seasonal-naive forecast backtest: predict each day's per-type
    // event count with the value 7 rows back in the daily series, score
    // with MAPE. Per-term DECIMAL quantization before the sum keeps the
    // score partition-count invariant; the whole operator is one daily
    // rollup plus one keyed window — the same single-shuffle shape as
    // the EWMA/z-score family, so it scales with the rollup, not the
    // raw corpus.
    Q("ts_forecast_naive",
      """WITH dc AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |f AS (SELECT event_type, day, c,
        |    lag(c, 7) OVER (PARTITION BY event_type ORDER BY day) AS fc
        |  FROM dc)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(abs(c - fc)) AS BIGINT) AS abs_err,
        |  round(CAST(sum(CAST(abs(c - fc) / CAST(c AS DOUBLE)
        |      AS DECIMAL(18,8))) AS DOUBLE) / count(*), 4) AS mape
        |FROM f WHERE fc IS NOT NULL
        |GROUP BY 1 ORDER BY event_type""") { (s, d) =>
      val dc = Tables.events(s, d)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val seq = Window.partitionBy(col("event_type")).orderBy(col("day"))
      dc.withColumn("fc", lag(col("c"), 7).over(seq))
        .filter(col("fc").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(abs(col("c") - col("fc"))).as("abs_err"),
          round((sum((abs(col("c") - col("fc")) / col("c").cast("double"))
            .cast("decimal(18,8)")).cast("double") / count(lit(1))), 4)
            .as("mape"))
        .orderBy(col("event_type"))
    },

    // Point-in-interval fact→SCD2-dimension join: every purchase fact
    // picks up the dimension row whose [valid_from, valid_to) interval
    // contains its event time — the standard effective-dated dimension
    // lookup (type-2 warehouse join). The join is an EQUI-join on
    // user_id with the interval predicate as residual, so Spark runs a
    // keyed sort-merge join — the dimension and fact co-partition on
    // the user key at any scale, never a range-only cross pairing.
    Q("join_scd2_dim",
      """WITH o AS (SELECT user_id, event_type, ts, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |chg AS (SELECT user_id, event_type, epoch_us(ts) AS valid_from, event_id
        |  FROM o WHERE prev_type IS NULL OR prev_type <> event_type),
        |iv AS (SELECT user_id, event_type, valid_from,
        |    lead(valid_from) OVER (PARTITION BY user_id
        |      ORDER BY valid_from, event_id) AS valid_to
        |  FROM chg),
        |f AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
        |  WHERE event_type = 'purchase')
        |SELECT f.event_id, f.user_id, iv.event_type AS state_at,
        |  CAST(iv.valid_from AS BIGINT) AS valid_from
        |FROM f JOIN iv ON iv.user_id = f.user_id
        |  AND f.ts_us >= iv.valid_from
        |  AND (iv.valid_to IS NULL OR f.ts_us < iv.valid_to)
        |ORDER BY event_id""") { (s, d) =>
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val chg = Tables.events(s, d)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(ts)").as("valid_from"), col("event_id"))
      val w2 = Window.partitionBy(col("user_id"))
        .orderBy(col("valid_from"), col("event_id"))
      val iv = chg.withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
        .select(col("user_id").as("d_user"), col("event_type").as("state_at"),
          col("valid_from"), col("valid_to"))
      val f = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          expr("unix_micros(ts)").as("ts_us"))
      f.join(iv,
          col("user_id") === col("d_user") &&
            col("ts_us") >= col("valid_from") &&
            (col("valid_to").isNull || col("ts_us") < col("valid_to")))
        .select(col("event_id"), col("user_id"), col("state_at"),
          col("valid_from"))
        .orderBy(col("event_id"))
    },

    // Interval concurrency (sweep line): each event holds a resource
    // for floor(value)+1 seconds; the peak number simultaneously held,
    // per type, is the classic capacity-planning question. The sweep is
    // ±1 deltas ordered by the unique (t, delta, event_id) composite —
    // delta asc closes before it opens at the same instant (half-open
    // intervals), so both engines walk the identical sequence — and ONE
    // keyed running-sum window; peak is a rollup of the window output.
    Q("ts_concurrency",
      """WITH pts AS (
        |  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |    1 AS delta, event_id FROM events
        |  UNION ALL
        |  SELECT event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) + CAST(floor(value) AS BIGINT) + 1,
        |    -1, event_id FROM events),
        |run AS (SELECT event_type,
        |    sum(delta) OVER (PARTITION BY event_type
        |      ORDER BY t, delta, event_id) AS conc
        |  FROM pts)
        |SELECT event_type,
        |  CAST(max(conc) AS BIGINT) AS peak_concurrency,
        |  CAST(count(*) / 2 AS BIGINT) AS n_intervals
        |FROM run GROUP BY 1 ORDER BY event_type""") { (s, d) =>
      val ev = Tables.events(s, d)
      val opens = ev.select(col("event_type"),
        unix_timestamp(col("ts")).as("t"), lit(1).as("delta"),
        col("event_id"))
      val closes = ev.select(col("event_type"),
        (unix_timestamp(col("ts")) + floor(col("value")).cast("long") + 1)
          .as("t"), lit(-1).as("delta"), col("event_id"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("t"), col("delta"), col("event_id"))
      opens.unionByName(closes)
        .select(col("event_type"), sum(col("delta")).over(w).as("conc"))
        .groupBy(col("event_type"))
        .agg(max(col("conc")).cast("long").as("peak_concurrency"),
          (count(lit(1)) / 2).cast("long").as("n_intervals"))
        .orderBy(col("event_type"))
    },

    // Lagged cross-correlation between two daily series (view count vs
    // purchase count at lag 0 and lag 1) — "does today's browsing
    // predict tomorrow's buying". Series collapse to per-day counts
    // first (one hash aggregate); each lag is one day-keyed equi-join
    // of the two TINY series; Pearson r derives from exact integer
    // power sums (DECIMAL against 100 TB-scale daily counts), so the
    // answer is partition-invariant — engine corr() builtins stream
    // co-moments in float order and are NOT.
    Q("ts_xcorr",
      """WITH dc AS (SELECT CAST(ts AS DATE) AS day, event_type,
        |    count(*) AS c FROM events GROUP BY 1, 2),
        |v AS (SELECT day, c FROM dc WHERE event_type = 'view'),
        |p AS (SELECT day, c FROM dc WHERE event_type = 'purchase'),
        |pairs AS (
        |  SELECT 0 AS lag, v.c AS x, p.c AS y FROM v
        |    JOIN p ON p.day = v.day
        |  UNION ALL
        |  SELECT 1, v.c, p.c FROM v
        |    JOIN p ON p.day = v.day + INTERVAL 1 DAY),
        |a AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(x AS DECIMAL(28,0))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(y AS DECIMAL(28,0))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(x AS DECIMAL(28,0)) * y) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(x AS DECIMAL(28,0)) * x) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(y AS DECIMAL(28,0)) * y) AS DOUBLE) AS syy
        |  FROM pairs GROUP BY 1)
        |SELECT lag, n,
        |  round((n * sxy - sx * sy)
        |    / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 4) AS r
        |FROM a ORDER BY lag""") { (s, d) =>
      val dc = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      val v = dc.filter(col("event_type") === "view")
        .select(col("day"), col("c").as("x"))
      val p = dc.filter(col("event_type") === "purchase")
        .select(col("day").as("pday"), col("c").as("y"))
      val lag0 = v.join(p, col("pday") === col("day"))
        .select(lit(0).as("lag"), col("x"), col("y"))
      val lag1 = v.join(p, col("pday") === date_add(col("day"), 1))
        .select(lit(1).as("lag"), col("x"), col("y"))
      lag0.unionByName(lag1)
        .groupBy(col("lag"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("x").cast("decimal(28,0)")).cast("double").as("sx"),
          sum(col("y").cast("decimal(28,0)")).cast("double").as("sy"),
          sum(col("x").cast("decimal(28,0)") * col("y"))
            .cast("double").as("sxy"),
          sum(col("x").cast("decimal(28,0)") * col("x"))
            .cast("double").as("sxx"),
          sum(col("y").cast("decimal(28,0)") * col("y"))
            .cast("double").as("syy"))
        .select(col("lag"), col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy"))
            / sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
              * (col("n") * col("syy") - col("sy") * col("sy"))), 4)
            .as("r"))
        .orderBy(col("lag"))
    },

    // Inter-arrival-time profile per event type: the distribution of
    // gaps between consecutive events — the burstiness/SLA statistic a
    // capacity planner reads next to the concurrency peak. One keyed
    // lag window on the unique (ts, event_id) order produces integer
    // second gaps; the rollup is exact percentiles + a DECIMAL mean —
    // all partial+final aggregable after the single window shuffle.
    Q("ts_interarrival",
      """WITH g AS (SELECT event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT)
        |      - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
        |        PARTITION BY event_type ORDER BY ts, event_id) AS gap
        |  FROM events)
        |SELECT event_type, CAST(count(gap) AS BIGINT) AS n_gaps,
        |  round(quantile_cont(CAST(gap AS DOUBLE), 0.5), 4) AS p50_sec,
        |  round(quantile_cont(CAST(gap AS DOUBLE), 0.95), 4) AS p95_sec,
        |  round(CAST(sum(CAST(gap AS DECIMAL(28,0))) AS DOUBLE)
        |    / count(gap), 4) AS mean_sec
        |FROM g GROUP BY 1 ORDER BY event_type""") { (s, d) =>
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_type"),
          (unix_timestamp(col("ts"))
            - lag(unix_timestamp(col("ts")), 1).over(w)).as("gap"))
        .groupBy(col("event_type"))
        .agg(count(col("gap")).cast("long").as("n_gaps"),
          round(expr("percentile(CAST(gap AS DOUBLE), 0.5)"), 4)
            .as("p50_sec"),
          round(expr("percentile(CAST(gap AS DOUBLE), 0.95)"), 4)
            .as("p95_sec"),
          round(sum(col("gap").cast("decimal(28,0)")).cast("double")
            / count(col("gap")), 4).as("mean_sec"))
        .orderBy(col("event_type"))
    },

    // BINARY-SEGMENTATION change-point detection (first split of the
    // classic binseg/PELT family): per event type, the day boundary
    // that maximizes the within-segment SSE reduction over the daily
    // count series. Everything derives from exact BIGINT prefix sums
    // (Σc, Σc²) in ONE keyed window pass — SSE(a..b) = S2 − S1²/n needs
    // no second scan, so candidate splits cost O(days) after the day
    // rollup, not O(days²). The winning split is picked on the gain
    // rounded to 6dp (ulp-robust cross-engine) with earliest-day
    // tie-break. This is the alarm the drift/CUSUM family escalates to
    // when "did the level shift, and WHEN" needs an answer.
    Q("ts_changepoint_binseg",
      """WITH dc AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |p AS (SELECT event_type, day, c,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
        |    sum(c) OVER (PARTITION BY event_type ORDER BY day) AS s1,
        |    sum(c * c) OVER (PARTITION BY event_type ORDER BY day) AS s2
        |  FROM dc),
        |tot AS (SELECT event_type, max(t) AS n, max(s1) AS s1n,
        |    max(s2) AS s2n FROM p GROUP BY 1),
        |g AS (SELECT p.event_type, p.day, p.t, tot.n, p.s1, tot.s1n,
        |    (tot.s2n - CAST(tot.s1n AS DOUBLE) * tot.s1n / tot.n)
        |      - (p.s2 - CAST(p.s1 AS DOUBLE) * p.s1 / p.t)
        |      - ((tot.s2n - p.s2) - CAST(tot.s1n - p.s1 AS DOUBLE)
        |          * (tot.s1n - p.s1) / (tot.n - p.t)) AS gain
        |  FROM p JOIN tot USING (event_type) WHERE p.t < tot.n),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY round(gain, 6) DESC, day) AS rk FROM g)
        |SELECT event_type, day AS split_day,
        |  CAST(t AS BIGINT) AS n_left, CAST(n - t AS BIGINT) AS n_right,
        |  round(s1 / CAST(t AS DOUBLE), 4) AS mean_left,
        |  round((s1n - s1) / CAST(n - t AS DOUBLE), 4) AS mean_right,
        |  round(gain, 4) AS gain
        |FROM r WHERE rk = 1 ORDER BY event_type""") { (s, d) =>
      val dc = Tables.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val p = dc
        .withColumn("t", row_number().over(w))
        .withColumn("s1", sum(col("c")).over(w))
        .withColumn("s2", sum(col("c") * col("c")).over(w))
      val tot = p.groupBy(col("event_type"))
        .agg(max(col("t")).as("n"), max(col("s1")).as("s1n"),
          max(col("s2")).as("s2n"))
      val gain =
        (col("s2n") - col("s1n").cast("double") * col("s1n") / col("n")) -
        (col("s2") - col("s1").cast("double") * col("s1") / col("t")) -
        ((col("s2n") - col("s2")) - (col("s1n") - col("s1")).cast("double") *
          (col("s1n") - col("s1")) / (col("n") - col("t")))
      val wr = Window.partitionBy(col("event_type"))
        .orderBy(round(col("gain"), 6).desc, col("day"))
      p.join(broadcast(tot), Seq("event_type"))
        .filter(col("t") < col("n"))
        .withColumn("gain", gain)
        .withColumn("rk", row_number().over(wr))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("day").as("split_day"),
          col("t").cast("long").as("n_left"),
          (col("n") - col("t")).cast("long").as("n_right"),
          round(col("s1") / col("t").cast("double"), 4).as("mean_left"),
          round((col("s1n") - col("s1")) / (col("n") - col("t"))
            .cast("double"), 4).as("mean_right"),
          round(col("gain"), 4).as("gain"))
        .orderBy(col("event_type"))
    },

    // ROBUST (median/MAD) daily-volume anomaly census — the outlier
    // screen ts_zscore's mean/stddev version gets WRONG when the
    // anomaly itself inflates the baseline: modified z-score
    // 0.6745·(c − median)/MAD (Iglewicz & Hoaglin 1993), |z| > 3.5
    // flags. Two exact-percentile aggregates over the (type, day)
    // rollup (days ≪ rows — the percentile runs on the bounded day
    // relation, never raw events), medians broadcast back; MAD = 0
    // (constant series) yields NULL z via nullif rather than a
    // divide error, counting zero anomalies.
    Q("ts_anomaly_mad",
      """WITH dc AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
        |md AS (SELECT event_type,
        |    quantile_cont(CAST(c AS DOUBLE), 0.5) AS med FROM dc GROUP BY 1),
        |ad AS (SELECT dc.event_type,
        |    quantile_cont(abs(c - med), 0.5) AS mad
        |  FROM dc JOIN md USING (event_type) GROUP BY 1),
        |z AS (SELECT dc.event_type, day, c,
        |    0.6745 * (c - med) / nullif(mad, 0) AS mz
        |  FROM dc JOIN md USING (event_type) JOIN ad USING (event_type))
        |SELECT z.event_type, CAST(count(*) AS BIGINT) AS n_days,
        |  round(max(md.med), 4) AS med, round(max(ad.mad), 4) AS mad,
        |  CAST(sum(CASE WHEN abs(mz) > 3.5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_anomalies,
        |  min(CASE WHEN abs(mz) > 3.5 THEN day END) AS first_anomaly
        |FROM z JOIN md ON md.event_type = z.event_type
        |JOIN ad ON ad.event_type = z.event_type
        |GROUP BY z.event_type ORDER BY z.event_type""") { (s, d) =>
      val dc = Tables.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("c"))
      val md = dc.groupBy(col("event_type"))
        .agg(expr("percentile(CAST(c AS DOUBLE), 0.5)").as("med"))
      val ad = dc.join(broadcast(md), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(expr("percentile(abs(c - med), 0.5)").as("mad"))
      val z = dc.join(broadcast(md), Seq("event_type"))
        .join(broadcast(ad), Seq("event_type"))
        .withColumn("mz",
          lit(0.6745) * (col("c") - col("med")) / nullif(col("mad"), lit(0d)))
      z.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          round(max(col("med")), 4).as("med"),
          round(max(col("mad")), 4).as("mad"),
          sum(when(abs(col("mz")) > 3.5, 1).otherwise(0)).cast("long")
            .as("n_anomalies"),
          min(when(abs(col("mz")) > 3.5, col("day"))).as("first_anomaly"))
        .orderBy(col("event_type"))
    },

    // BOLLINGER BANDS over the daily purchase-revenue series: 7-day
    // trailing SMA ± 2σ with a breakout flag — the volatility-band
    // anomaly screen (finance's take on ts_zscore, but with a moving
    // baseline so level shifts don't poison the band). Daily totals are
    // EXACT decimal sums, so both engines feed identical doubles into
    // the window moments; only full 7-row frames emit (rn ≥ 7), so no
    // partially-warmed band ever flags. Scale: one date rollup then a
    // single-series window — at 100 TB the rollup is the only
    // corpus-scale pass and the window runs on days, not events (a
    // per-key PARTITION BY makes it many independent small series).
    Q("ts_bollinger",
      """WITH dt AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST("value" AS DECIMAL(18,4))) AS DECIMAL(18,4))
        |      AS total
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |w AS (SELECT day, CAST(total AS DOUBLE) AS tot,
        |    row_number() OVER (ORDER BY day) AS rn,
        |    avg(CAST(total AS DOUBLE)) OVER (ORDER BY day
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS sma,
        |    stddev_samp(CAST(total AS DOUBLE)) OVER (ORDER BY day
        |      ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS sd
        |  FROM dt)
        |SELECT day, round(tot, 2) AS total,
        |  round(sma, 4) AS sma7, round(sd, 4) AS sd7,
        |  round(sma + 2 * sd, 4) AS upper_band,
        |  round(sma - 2 * sd, 4) AS lower_band,
        |  CAST(tot > sma + 2 * sd OR tot < sma - 2 * sd AS BOOLEAN)
        |    AS breakout
        |FROM w WHERE rn >= 7 ORDER BY day""") { (s, d) =>
      val dt = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(col("value").cast("decimal(18,4)"))
          .cast("decimal(18,4)").as("total"))
      val frame = Window.orderBy(col("day")).rowsBetween(-6, 0)
      val w = dt.select(col("day"), col("total").cast("double").as("tot"))
        .withColumn("rn", row_number().over(Window.orderBy(col("day"))))
        .withColumn("sma", avg(col("tot")).over(frame))
        .withColumn("sd", stddev_samp(col("tot")).over(frame))
      w.filter(col("rn") >= 7)
        .select(col("day"), round(col("tot"), 2).as("total"),
          round(col("sma"), 4).as("sma7"), round(col("sd"), 4).as("sd7"),
          round(col("sma") + lit(2) * col("sd"), 4).as("upper_band"),
          round(col("sma") - lit(2) * col("sd"), 4).as("lower_band"),
          (col("tot") > col("sma") + lit(2) * col("sd") ||
            col("tot") < col("sma") - lit(2) * col("sd")).as("breakout"))
        .orderBy(col("day"))
    },

    // ROLLING 7-day CORRELATION between the daily click and purchase
    // count series — the co-movement monitor that catches a funnel
    // decoupling (clicks up, purchases flat) before absolute-volume
    // alarms fire. The engine-native window corr() is deliberately NOT
    // used: its internal co-moment accumulation order differs between
    // engines and its zero-variance behavior diverges (NaN vs NULL).
    // Instead the five window sums (Σx, Σy, Σxy, Σx², Σy²) are exact
    // integers and Pearson r is assembled once per row with a
    // nullif-guarded denominator — bit-stable, and NULL (not NaN) on a
    // constant window in both engines. Scale: same day-rollup-then-
    // bounded-window shape as ts_bollinger.
    Q("ts_rolling_corr",
      """WITH dt AS (SELECT CAST(ts AS DATE) AS day,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
        |  FROM events GROUP BY 1),
        |w AS (SELECT day, x, y,
        |    row_number() OVER (ORDER BY day) AS rn,
        |    sum(x) OVER w7 AS sx, sum(y) OVER w7 AS sy,
        |    sum(x * y) OVER w7 AS sxy,
        |    sum(x * x) OVER w7 AS sxx, sum(y * y) OVER w7 AS syy
        |  FROM dt
        |  WINDOW w7 AS (ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT day, CAST(x AS BIGINT) AS clicks, CAST(y AS BIGINT)
        |    AS purchases,
        |  round((7.0 * sxy - sx * sy)
        |    / nullif(sqrt((7.0 * sxx - CAST(sx * sx AS DOUBLE))
        |      * (7.0 * syy - sy * sy)), 0), 4) AS corr7
        |FROM w WHERE rn >= 7 ORDER BY day""") { (s, d) =>
      val dt = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(when(col("event_type") === "click", 1).otherwise(0)).as("x"),
          sum(when(col("event_type") === "purchase", 1).otherwise(0)).as("y"))
      val w7 = Window.orderBy(col("day")).rowsBetween(-6, 0)
      val w = dt
        .withColumn("rn", row_number().over(Window.orderBy(col("day"))))
        .withColumn("sx", sum(col("x")).over(w7))
        .withColumn("sy", sum(col("y")).over(w7))
        .withColumn("sxy", sum(col("x") * col("y")).over(w7))
        .withColumn("sxx", sum(col("x") * col("x")).over(w7))
        .withColumn("syy", sum(col("y") * col("y")).over(w7))
      w.filter(col("rn") >= 7)
        .select(col("day"), col("x").cast("long").as("clicks"),
          col("y").cast("long").as("purchases"),
          round((lit(7.0) * col("sxy") - col("sx") * col("sy")) /
            nullif(sqrt((lit(7.0) * col("sxx") -
              (col("sx") * col("sx")).cast("double")) *
              (lit(7.0) * col("syy") - col("sy") * col("sy"))), lit(0d)), 4)
            .as("corr7"))
        .orderBy(col("day"))
    },

    // SMA CROSSOVER signal (fast 5-day vs slow 15-day moving average of
    // daily revenue) — the classic trend-change detector; the emitted
    // `crossover` rows are exactly the regime flips. The comparison
    // trick makes the signal bit-stable across engines: instead of
    // comparing two float averages (sum5/5 > sum15/15, each division
    // rounding differently), it compares 3·sum5 > sum15 on EXACT
    // decimal window sums — same predicate, zero float ops. Averages
    // are emitted (rounded) for display only. Scale posture matches
    // ts_bollinger: day-grained window after a corpus rollup.
    Q("ts_sma_crossover",
      """WITH dt AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST("value" AS DECIMAL(18,4))) AS DECIMAL(18,4))
        |      AS total
        |  FROM events GROUP BY 1),
        |w AS (SELECT day,
        |    row_number() OVER (ORDER BY day) AS rn,
        |    sum(total) OVER (ORDER BY day
        |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS s5,
        |    sum(total) OVER (ORDER BY day
        |      ROWS BETWEEN 14 PRECEDING AND CURRENT ROW) AS s15
        |  FROM dt),
        |b AS (SELECT day, s5, s15, 3 * s5 > s15 AS golden
        |  FROM w WHERE rn >= 15)
        |SELECT day, round(CAST(s5 AS DOUBLE) / 5, 4) AS sma5,
        |  round(CAST(s15 AS DOUBLE) / 15, 4) AS sma15, golden,
        |  coalesce(golden <> lag(golden) OVER (ORDER BY day), false)
        |    AS crossover
        |FROM b ORDER BY day""") { (s, d) =>
      val dt = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(col("value").cast("decimal(18,4)"))
          .cast("decimal(18,4)").as("total"))
      val w = dt
        .withColumn("rn", row_number().over(Window.orderBy(col("day"))))
        .withColumn("s5",
          sum(col("total")).over(Window.orderBy(col("day")).rowsBetween(-4, 0)))
        .withColumn("s15",
          sum(col("total")).over(Window.orderBy(col("day")).rowsBetween(-14, 0)))
      val b = w.filter(col("rn") >= 15)
        .select(col("day"), col("s5"), col("s15"),
          (col("s5") * 3 > col("s15")).as("golden"))
      b.select(col("day"),
          round(col("s5").cast("double") / 5, 4).as("sma5"),
          round(col("s15").cast("double") / 15, 4).as("sma15"),
          col("golden"),
          coalesce(col("golden") =!= lag(col("golden"), 1)
            .over(Window.orderBy(col("day"))), lit(false)).as("crossover"))
        .orderBy(col("day"))
    },

    // DRAWDOWN series over the cumulative daily net value (purchases
    // positive, errors negative — a series that can actually fall):
    // running peak, per-day drawdown from peak, and the underwater
    // flag. Max drawdown is THE risk statistic for any cumulative KPI
    // (revenue net of refunds, model-quality score, cache hit rate).
    // Both cumulative sum and running max are windows over EXACT
    // decimals, so peak/cum comparisons are bit-stable; only the final
    // ratio touches floats. Day-grained window after one corpus rollup,
    // same scale shape as the rest of the ts_* family.
    Q("ts_drawdown",
      """WITH dt AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |        THEN CAST("value" AS DECIMAL(18,4))
        |      WHEN event_type = 'error'
        |        THEN -CAST("value" AS DECIMAL(18,4))
        |      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DECIMAL(18,4)) AS net
        |  FROM events GROUP BY 1),
        |c AS (SELECT day, net,
        |    sum(net) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM dt),
        |p AS (SELECT day, net, cum,
        |    max(cum) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM c)
        |SELECT day, round(CAST(net AS DOUBLE), 2) AS net,
        |  round(CAST(cum AS DOUBLE), 2) AS cum,
        |  round(CAST(peak AS DOUBLE), 2) AS peak,
        |  round(CAST(peak - cum AS DOUBLE), 2) AS drawdown,
        |  round(CAST(peak - cum AS DOUBLE)
        |    / nullif(CAST(peak AS DOUBLE), 0), 4) + 0.0 AS drawdown_frac,
        |  CAST(cum < peak AS BOOLEAN) AS underwater
        |FROM p ORDER BY day""") { (s, d) =>
      val dec = col("value").cast("decimal(18,4)")
      val dt = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(when(col("event_type") === "purchase", dec)
            .when(col("event_type") === "error", -dec)
            .otherwise(lit(0).cast("decimal(18,4)")))
          .cast("decimal(18,4)").as("net"))
      val cumw = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val p = dt
        .withColumn("cum", sum(col("net")).over(cumw))
        .withColumn("peak", max(col("cum")).over(cumw))
      p.select(col("day"),
          round(col("net").cast("double"), 2).as("net"),
          round(col("cum").cast("double"), 2).as("cum"),
          round(col("peak").cast("double"), 2).as("peak"),
          round((col("peak") - col("cum")).cast("double"), 2).as("drawdown"),
          (round((col("peak") - col("cum")).cast("double") /
            nullif(col("peak").cast("double"), lit(0d)), 4) + lit(0.0))
            .as("drawdown_frac"),
          (col("cum") < col("peak")).as("underwater"))
        .orderBy(col("day"))
    },

    // HAMPEL DESPIKER — the robust outlier filter for sensor-style
    // series: flag a point when it sits more than 3·1.4826·MAD from
    // its rolling-window median (window = 5 trailing same-user
    // events). Both the median and the MAD are computed EXACTLY from
    // the 5-element frame array (odd size → middle element, no
    // interpolation, no engine aggregate differences): collect the
    // frame, sort, index — per-row O(w log w) on a constant w, fused
    // into one keyed window pass. The classic use: de-spiking a
    // metric BEFORE ts_zscore/ts_cusum so one glitch doesn't poison
    // the baseline.
    Q("ts_hampel",
      """WITH w AS (SELECT user_id, event_id, "value",
        |    list("value") OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS fr
        |  FROM events WHERE user_id % 20 = 0),
        |m AS (SELECT user_id, event_id, "value",
        |    list_sort(fr)[3] AS med
        |  FROM w WHERE len(fr) = 5),
        |h AS (SELECT m.user_id, m.event_id, m."value", m.med,
        |    list_sort(list_transform(w.fr, x -> abs(x - m.med)))[3] AS mad
        |  FROM m JOIN w ON w.user_id = m.user_id
        |    AND w.event_id = m.event_id)
        |SELECT user_id, event_id, round("value", 2) AS value,
        |  round(med, 2) AS med5, round(mad, 2) AS mad5,
        |  CAST(abs("value" - med) > 3 * 1.4826 * mad AS BOOLEAN)
        |    AS is_spike
        |FROM h ORDER BY user_id, event_id""") { (s, d) =>
      val win = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-4, Window.currentRow)
      val w = Tables.events(s, d)
        .filter(col("user_id") % 20 === 0)
        .select(col("user_id"), col("event_id"), col("value"),
          collect_list(col("value")).over(win).as("fr"))
        .filter(size(col("fr")) === 5)
      val med = element_at(sort_array(col("fr")), 3)
      w.select(col("user_id"), col("event_id"), col("value"),
          med.as("med"), col("fr"))
        .select(col("user_id"), col("event_id"), col("value"), col("med"),
          element_at(sort_array(expr("transform(fr, x -> abs(x - med))")), 3)
            .as("mad"))
        .select(col("user_id"), col("event_id"),
          round(col("value"), 2).as("value"),
          round(col("med"), 2).as("med5"),
          round(col("mad"), 2).as("mad5"),
          (abs(col("value") - col("med")) >
            lit(3) * lit(1.4826) * col("mad")).as("is_spike"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // MANN-KENDALL trend test over the daily revenue series — the
    // nonparametric "is this metric trending?" check (no linearity or
    // normality assumed; the question is pure pair concordance).
    // S = Σ_{i<j} sign(x_j − x_i) with the tie-corrected variance;
    // the pair join runs on the AGGREGATED day relation (30 days →
    // 435 pairs), the same collapse-then-quadratic shape as
    // eval_kendall_tau. Day totals are exact decimals, so sign
    // comparisons, tie groups, and S are all integer-exact; only the
    // final z touches floats.
    Q("ts_trend_mk",
      """WITH dt AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST("value" AS DECIMAL(18,4))) AS DECIMAL(18,4))
        |      AS x
        |  FROM events GROUP BY 1),
        |p AS (SELECT CASE WHEN b.x > a.x THEN 1
        |    WHEN b.x < a.x THEN -1 ELSE 0 END AS sgn
        |  FROM dt a JOIN dt b ON a.day < b.day),
        |sv AS (SELECT sum(sgn) AS s_stat FROM p),
        |n AS (SELECT count(*) AS n FROM dt),
        |tie AS (SELECT coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)
        |    AS tt FROM (SELECT count(*) AS t FROM dt GROUP BY x
        |      HAVING count(*) > 1)),
        |z AS (SELECT s_stat, n.n, tie.tt,
        |    (n.n * (n.n - 1) * (2 * n.n + 5) - tie.tt) / 18.0 AS var_s
        |  FROM sv CROSS JOIN n CROSS JOIN tie)
        |SELECT CAST(n AS BIGINT) AS n_days,
        |  CAST(s_stat AS BIGINT) AS s_stat,
        |  round(var_s, 4) AS var_s,
        |  round(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
        |    WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
        |    ELSE 0.0 END, 4) AS z_stat,
        |  CAST(abs(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
        |    WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
        |    ELSE 0.0 END) > 1.96 AS BOOLEAN) AS trending
        |FROM z""") { (s, d) =>
      val dt = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(col("value").cast("decimal(18,4)"))
          .cast("decimal(18,4)").as("x"))
      val p = dt.as("a").join(dt.as("b"), col("a.day") < col("b.day"))
        .select(when(col("b.x") > col("a.x"), 1)
          .when(col("b.x") < col("a.x"), -1).otherwise(0).as("sgn"))
      val sv = p.agg(sum(col("sgn")).as("s_stat"))
      val n = dt.agg(count(lit(1)).as("n"))
      val tie = dt.groupBy(col("x")).agg(count(lit(1)).as("t"))
        .filter(col("t") > 1)
        .agg(coalesce(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)),
          lit(0L)).as("tt"))
      val z = sv.crossJoin(broadcast(n)).crossJoin(broadcast(tie))
        .select(col("s_stat"), col("n"), col("tt"),
          ((col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) - col("tt"))
            / 18.0).as("var_s"))
      val zs = when(col("s_stat") > 0,
          (col("s_stat") - 1) / sqrt(col("var_s")))
        .when(col("s_stat") < 0, (col("s_stat") + 1) / sqrt(col("var_s")))
        .otherwise(lit(0.0))
      z.select(col("n").cast("long").as("n_days"),
        col("s_stat").cast("long").as("s_stat"),
        round(col("var_s"), 4).as("var_s"),
        round(zs, 4).as("z_stat"),
        (abs(zs) > 1.96).as("trending"))
    },

    // THEIL-SEN slope — the robust trend magnitude to pair with
    // ts_trend_mk's direction test: the MEDIAN of all pairwise slopes
    // (x_j − x_i)/(j − i), immune to outlier days that wreck an OLS
    // fit. Pairs again come from the aggregated day relation; the
    // slope set is exact-decimal differences divided by exact integer
    // day gaps (identical doubles in both engines), and the median is
    // the same exact-percentile machinery as agg_percentiles. The OLS
    // slope rides along for the robustness gap report.
    Q("ts_slope_theil_sen",
      """WITH dt AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST("value" AS DECIMAL(18,4))) AS DECIMAL(18,4))
        |      AS x
        |  FROM events GROUP BY 1),
        |ix AS (SELECT day, x,
        |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
        |  FROM dt),
        |sl AS (SELECT CAST(b.x - a.x AS DOUBLE) / (b.i - a.i) AS slope
        |  FROM ix a JOIN ix b ON a.i < b.i),
        |ts AS (SELECT count(*) AS n_pairs,
        |    quantile_cont(slope, 0.5) AS theil_sen FROM sl),
        |ols AS (SELECT CAST(count(*) * sum(i * x) - sum(i) * sum(x)
        |      AS DOUBLE)
        |    / (count(*) * sum(i * i) - sum(i) * sum(i)) AS b1
        |  FROM ix)
        |SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
        |  round(theil_sen, 4) AS theil_sen_slope,
        |  round(b1, 4) AS ols_slope
        |FROM ts CROSS JOIN ols""") { (s, d) =>
      val dt = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(col("value").cast("decimal(18,4)"))
          .cast("decimal(18,4)").as("x"))
      val ix = dt.withColumn("i",
        row_number().over(Window.orderBy(col("day"))).cast("long"))
      val sl = ix.as("a").join(ix.as("b"), col("a.i") < col("b.i"))
        .select(((col("b.x") - col("a.x")).cast("double") /
          (col("b.i") - col("a.i"))).as("slope"))
      val ts = sl.agg(count(lit(1)).as("n_pairs"),
        expr("percentile(slope, 0.5)").as("theil_sen"))
      val ols = ix.agg(
        ((count(lit(1)) * sum(col("i") * col("x"))
          - sum(col("i")) * sum(col("x"))).cast("double")
          / (count(lit(1)) * sum(col("i") * col("i"))
            - sum(col("i")) * sum(col("i")))).as("b1"))
      ts.crossJoin(broadcast(ols))
        .select(col("n_pairs").cast("long").as("n_pairs"),
          round(col("theil_sen"), 4).as("theil_sen_slope"),
          round(col("b1"), 4).as("ols_slope"))
    },

    // SIMPLE EXPONENTIAL SMOOTHING (Brown 1956) over the daily revenue
    // series — the level-tracking forecaster between ts_forecast_naive
    // (no memory) and ts_ewma (whose span is an API choice): S_t =
    // α·y_t + (1−α)·S_{t−1}, S_1 = y_1, one-step-ahead forecast
    // ŷ_{t+1} = S_t. α is pinned at the DYADIC value 0.5 so every
    // weight in the unrolled form S_t = Σ_{i<t−1} 0.5^{i+1} y_{t−i} +
    // 0.5^{t−1} y_1 is an exact power of two: the weight is computed as
    // 1/(1<<k) (integer shift, never libm pow), the product w·y is an
    // exact IEEE scaling, and each term DECIMAL-quantizes before the
    // order-free sum — the recursion computes identically on any
    // partitioning and any engine. The day relation is bounded (30
    // rows), so the unrolled pair join is |days|²/2 on an aggregated
    // relation — the same collapse-then-quadratic shape as ts_trend_mk.
    Q("ts_ses",
      """WITH y AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(round("value", 6) AS DECIMAL(18,6)))
        |      AS DOUBLE) AS yv
        |  FROM events GROUP BY 1),
        |r AS (SELECT day, yv,
        |    row_number() OVER (ORDER BY day) AS rn FROM y),
        |s AS (SELECT a.day, a.yv, a.rn,
        |    CAST(sum(CAST(round(b.yv /
        |        (CAST(1 AS BIGINT) << least(CASE WHEN b.rn = 1 THEN a.rn - 1
        |               ELSE a.rn - b.rn + 1 END, 50)), 10)
        |      AS DECIMAL(28,10))) AS DOUBLE) AS ses
        |  FROM r a JOIN r b ON b.rn <= a.rn
        |  GROUP BY 1, 2, 3)
        |SELECT day, round(yv, 4) AS revenue,
        |  round(ses, 4) AS ses_level,
        |  round(abs(yv - ses), 4) AS abs_err
        |FROM s ORDER BY day""") { (s, d) =>
      val y = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(sum(round(col("value"), 6).cast("decimal(18,6)"))
          .cast("double").as("yv"))
      val r = y.select(col("day"), col("yv"),
        row_number().over(Window.orderBy(col("day"))).as("rn"))
      val sdf = r.as("a").join(r.as("b"), col("b.rn") <= col("a.rn"))
        .groupBy(col("a.day").as("day"), col("a.yv").as("yv"),
          col("a.rn").as("rn"))
        // shift clamped at 50: a 2^-50 weight is below the quantization
        // floor anyway, and an unclamped 1<<k overflows past day 62
        .agg(sum(round(col("b.yv") /
            expr("""shiftleft(1L, least(CASE WHEN b.rn = 1 THEN a.rn - 1
                   |  ELSE a.rn - b.rn + 1 END, 50))""".stripMargin), 10)
            .cast("decimal(28,10)"))
          .cast("double").as("ses"))
      sdf.select(col("day"), round(col("yv"), 4).as("revenue"),
          round(col("ses"), 4).as("ses_level"),
          round(abs(col("yv") - col("ses")), 4).as("abs_err"))
        .orderBy(col("day"))
    },

    // CLASSICAL SEASONAL DECOMPOSITION (moving-average STL-lite):
    // daily volume = trend + weekly seasonal + residual. Trend is the
    // centered 7-day MA (defined only where the full 7-day frame
    // exists — edge days get NULL, never a shrunken-window estimate);
    // seasonal is the day-of-week mean of the detrended series with
    // the detrended values quantized to DECIMAL(18,6) BEFORE the
    // order-free per-dow sum (the pagerank/entropy quantization law);
    // residual is what remains. Day-of-week is epoch-day arithmetic
    // ((days since 1970-01-01 + 4) % 7 — Thursday anchor), no locale
    // week rules in either engine. Everything rides the day-level
    // rollup: the windows are aggregate-reduced (≤|days| rows), the
    // raw scan is one hash aggregate — the ts_* scale shape.
    Q("ts_stl_ma",
      """WITH dd AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
        |tr AS (SELECT day, n,
        |    CAST((day - DATE '1970-01-01') + 4 AS BIGINT) % 7 AS dow,
        |    CASE WHEN count(*) OVER w = 7
        |      THEN CAST(sum(n) OVER w AS DOUBLE) / 7 END AS trend
        |  FROM dd
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |de AS (SELECT day, n, dow, trend,
        |    CAST(round(n - trend, 6) AS DECIMAL(18,6)) AS detr
        |  FROM tr),
        |se AS (SELECT dow,
        |    CAST(sum(detr) AS DOUBLE) / count(detr) AS seasonal
        |  FROM de WHERE detr IS NOT NULL GROUP BY 1)
        |SELECT CAST(de.day AS VARCHAR) AS day, de.n,
        |  round(de.trend, 4) AS trend,
        |  round(se.seasonal, 4) AS seasonal,
        |  round(CAST(de.detr AS DOUBLE) - se.seasonal, 4) AS residual
        |FROM de LEFT JOIN se ON se.dow = de.dow
        |ORDER BY de.day""") { (s, d) =>
      val dd = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.orderBy(col("day")).rowsBetween(-3, 3)
      val tr = dd.select(col("day"), col("n"),
        (datediff(col("day"), lit("1970-01-01").cast("date")) + 4)
          .cast("long").mod(7).as("dow"),
        when(count(lit(1)).over(w) === 7,
          sum(col("n")).over(w).cast("double") / 7).as("trend"))
      val de = tr.withColumn("detr",
        round(col("n") - col("trend"), 6).cast("decimal(18,6)"))
      val se = de.filter(col("detr").isNotNull)
        .groupBy(col("dow"))
        .agg((sum(col("detr")).cast("double") / count(col("detr")))
          .as("seasonal"))
      de.join(se, Seq("dow"), "left_outer")
        .select(col("day").cast("string").as("day"), col("n"),
          round(col("trend"), 4).as("trend"),
          round(col("seasonal"), 4).as("seasonal"),
          round(col("detr").cast("double") - col("seasonal"), 4)
            .as("residual"))
        .orderBy(col("day"))
    },

    // HOLT LINEAR TREND (double exponential smoothing) — the
    // trend-aware step past ts_ses: level + trend state folded through
    // the per-type daily count series with EXACT DYADIC smoothing
    // weights (α = 1/2, β = 1/4: every multiply is /2, /4, ·3/4 — no
    // libm anywhere, and both engines execute the IDENTICAL
    // left-to-right IEEE fold, so the state is bit-stable without
    // quantization). The recurrence does not unroll into a weighted
    // sum the way SES does, so the execution shape is a per-key FOLD:
    // Spark `aggregate()` over the sorted day array, DuckDB
    // `list_reduce` over `list(... ORDER BY day)` — one hash
    // aggregate per series, state O(1), series length bounded by the
    // calendar (days), keys unbounded — the scalable axis is the key
    // count, exactly where groupBy scales. Init: l₀ = y₁, b₀ = y₂−y₁
    // (the classical two-point init); forecast_7 = level + 7·trend.
    Q("ts_holt",
      """WITH y AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS DOUBLE) AS yv
        |  FROM events GROUP BY 1, 2),
        |ser AS (SELECT event_type, list(yv ORDER BY day) AS ys,
        |    count(*) AS n_days
        |  FROM y GROUP BY 1 HAVING count(*) >= 2),
        |st AS (SELECT event_type, n_days,
        |    list_reduce(
        |      list_prepend([ys[2] / 2 + (ys[1] + (ys[2] - ys[1])) / 2,
        |                    ((ys[2] / 2 + (ys[1] + (ys[2] - ys[1])) / 2)
        |                      - ys[1]) / 4 + ((ys[2] - ys[1]) * 3) / 4],
        |        list_transform(list_slice(ys, 3, len(ys)), v -> [v, v])),
        |      (a, p) -> [p[1] / 2 + (a[1] + a[2]) / 2,
        |        ((p[1] / 2 + (a[1] + a[2]) / 2) - a[1]) / 4
        |          + (a[2] * 3) / 4]) AS s
        |  FROM ser)
        |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
        |  round(s[1], 4) AS level, round(s[2], 4) AS trend,
        |  round(s[1] + 7 * s[2], 4) AS forecast_7
        |FROM st ORDER BY event_type""") { (s, d) =>
      val y = Tables.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).cast("double").as("yv"))
      val ser = y.groupBy(col("event_type"))
        .agg(expr("transform(array_sort(collect_list(struct(day, yv))), x -> x.yv)")
            .as("ys"),
          count(lit(1)).as("n_days"))
        .filter(col("n_days") >= 2)
      // The seed applies the t=2 update to (l0=y1, b0=y2−y1) so the
      // fold body is uniform from t=3 on; the level expression is
      // repeated inside the trend term because SQL lambdas cannot
      // bind intermediates — both engines compute it identically.
      val st = ser.withColumn("s", expr(
        """aggregate(slice(ys, 3, greatest(size(ys) - 2, 0)),
          |  named_struct(
          |    'l', ys[1] / 2D + (ys[0] + (ys[1] - ys[0])) / 2D,
          |    'b', ((ys[1] / 2D + (ys[0] + (ys[1] - ys[0])) / 2D)
          |      - ys[0]) / 4D + ((ys[1] - ys[0]) * 3D) / 4D),
          |  (a, v) -> named_struct(
          |    'l', v / 2D + (a.l + a.b) / 2D,
          |    'b', ((v / 2D + (a.l + a.b) / 2D) - a.l) / 4D
          |      + (a.b * 3D) / 4D))""".stripMargin))
      st.select(col("event_type"), col("n_days").cast("long").as("n_days"),
          round(col("s.l"), 4).as("level"),
          round(col("s.b"), 4).as("trend"),
          round(col("s.l") + lit(7) * col("s.b"), 4).as("forecast_7"))
        .orderBy(col("event_type"))
    },

    // 1-D KALMAN LEVEL FILTER — the probabilistically-weighted cousin
    // of ts_ses: a random-walk state with literal process noise
    // q = 1/4 and observation noise r = 1 filtered through each
    // type's daily-mean series. Unlike fixed-α smoothing the gain is
    // TIME-VARYING — k_t = (p+q)/(p+q+r) — which is exactly what the
    // fold shape buys: state [level, error variance, Σ innovation²]
    // advances left-to-right through the sorted day array (Spark
    // `aggregate()`, DuckDB `list_reduce`), and because +,−,×,/ are
    // all IEEE-correctly-rounded, the identical fold is bit-stable
    // across engines with NO quantization and no libm (the one sqrt
    // at output is correctly rounded too). Per-key state O(1), series
    // bounded by the calendar, keys unbounded — the groupBy axis.
    // Init: l₀ = y₁, p₀ = 1; innovations accumulate from t = 2.
    Q("ts_kalman_level",
      """WITH y AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST("value" AS DECIMAL(18,4))) AS DOUBLE)
        |      / count(*) AS yv
        |  FROM events GROUP BY 1, 2),
        |ser AS (SELECT event_type, list(yv ORDER BY day) AS ys,
        |    count(*) AS n_days
        |  FROM y GROUP BY 1 HAVING count(*) >= 2),
        |st AS (SELECT event_type, n_days,
        |    list_reduce(
        |      list_prepend([ys[1], CAST(1 AS DOUBLE), CAST(0 AS DOUBLE)],
        |        list_transform(list_slice(ys, 2, len(ys)),
        |          v -> [v, v, v])),
        |      (a, p) -> [
        |        a[1] + ((a[2] + 0.25) / (a[2] + 1.25)) * (p[1] - a[1]),
        |        (1 - (a[2] + 0.25) / (a[2] + 1.25)) * (a[2] + 0.25),
        |        a[3] + (p[1] - a[1]) * (p[1] - a[1])]) AS s
        |  FROM ser)
        |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
        |  round(s[1], 4) AS level,
        |  round(s[2], 6) AS err_var,
        |  round(sqrt(s[3] / (n_days - 1)), 4) AS innov_rmse
        |FROM st ORDER BY event_type""") { (s, d) =>
      val y = Tables.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg((sum(col("value").cast("decimal(18,4)")).cast("double") /
          count(lit(1))).as("yv"))
      val ser = y.groupBy(col("event_type"))
        .agg(expr("transform(array_sort(collect_list(struct(day, yv))), x -> x.yv)")
            .as("ys"),
          count(lit(1)).as("n_days"))
        .filter(col("n_days") >= 2)
      // The gain expression repeats inside level/variance because SQL
      // lambdas cannot bind intermediates — both engines compute the
      // identical IEEE sequence.
      val st = ser.withColumn("s", expr(
        """aggregate(slice(ys, 2, greatest(size(ys) - 1, 0)),
          |  named_struct('l', ys[0], 'p', CAST(1 AS DOUBLE),
          |    'q', CAST(0 AS DOUBLE)),
          |  (a, v) -> named_struct(
          |    'l', a.l + ((a.p + 0.25D) / (a.p + 1.25D)) * (v - a.l),
          |    'p', (1D - (a.p + 0.25D) / (a.p + 1.25D)) * (a.p + 0.25D),
          |    'q', a.q + (v - a.l) * (v - a.l)))""".stripMargin))
      st.select(col("event_type"),
          col("n_days").cast("long").as("n_days"),
          round(col("s.l"), 4).as("level"),
          round(col("s.p"), 6).as("err_var"),
          round(sqrt(col("s.q") / (col("n_days") - 1)), 4)
            .as("innov_rmse"))
        .orderBy(col("event_type"))
    },

    // HOLT-WINTERS ADDITIVE SEASONAL smoothing (triple exponential,
    // weekly period m = 7, α = 1/2, β = 1/4, γ = 1/4 — all dyadic, so
    // every update is IEEE-exact and the fold is bit-identical across
    // engines with no quantization) — the seasonal-aware forecast
    // ts_holt can't produce: level, trend AND a 7-slot seasonal
    // profile advance left-to-right through each type's daily series.
    // The seasonal state is a QUEUE, not an indexed array: each step
    // consumes the head (this weekday's seasonal), appends the updated
    // value at the tail — which keeps the lambda free of index
    // arithmetic in both engines (Spark `aggregate`, DuckDB
    // `list_reduce` over 9-wide arrays [l, b, s1..s7]). Seed: l₀ =
    // mean of the first week (explicit left-assoc sum), b₀ = 0,
    // sᵢ = yᵢ − l₀. Per-key state O(1), series calendar-bounded, keys
    // unbounded — the groupBy axis, same contract as ts_holt/ts_ses.
    Q("ts_holt_winters",
      """WITH y AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS DOUBLE) AS yv
        |  FROM events GROUP BY 1, 2),
        |ser AS (SELECT event_type, list(yv ORDER BY day) AS ys,
        |    count(*) AS n_days
        |  FROM y GROUP BY 1 HAVING count(*) >= 8),
        |sd AS (SELECT event_type, n_days, ys,
        |    ((((((ys[1] + ys[2]) + ys[3]) + ys[4]) + ys[5]) + ys[6])
        |      + ys[7]) / 7 AS l0
        |  FROM ser),
        |st AS (SELECT event_type, n_days,
        |    list_reduce(
        |      list_prepend([l0, CAST(0 AS DOUBLE),
        |          ys[1] - l0, ys[2] - l0, ys[3] - l0, ys[4] - l0,
        |          ys[5] - l0, ys[6] - l0, ys[7] - l0],
        |        list_transform(list_slice(ys, 8, len(ys)),
        |          v -> [v, v, v, v, v, v, v, v, v])),
        |      (a, p) -> [
        |        (p[1] - a[3]) / 2 + (a[1] + a[2]) / 2,
        |        (((p[1] - a[3]) / 2 + (a[1] + a[2]) / 2) - a[1]) / 4
        |          + (a[2] * 3) / 4,
        |        a[4], a[5], a[6], a[7], a[8], a[9],
        |        (p[1] - ((p[1] - a[3]) / 2 + (a[1] + a[2]) / 2)) / 4
        |          + (a[3] * 3) / 4]) AS s
        |  FROM sd)
        |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
        |  round(s[1], 4) AS level, round(s[2], 4) AS trend,
        |  round(s[3], 4) AS s_next,
        |  round((s[1] + s[2]) + s[3], 4) AS forecast_1
        |FROM st ORDER BY event_type""") { (s, d) =>
      val y = Tables.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).cast("double").as("yv"))
      val ser = y.groupBy(col("event_type"))
        .agg(expr("transform(array_sort(collect_list(struct(day, yv))), x -> x.yv)")
            .as("ys"),
          count(lit(1)).as("n_days"))
        .filter(col("n_days") >= 8)
        .withColumn("l0", expr(
          """((((((ys[0] + ys[1]) + ys[2]) + ys[3]) + ys[4]) + ys[5])
            |  + ys[6]) / 7""".stripMargin))
      // The level expression repeats inside trend/seasonal because SQL
      // lambdas cannot bind intermediates — both engines compute the
      // identical IEEE sequence. The seasonal queue rotates via
      // slice+append: a.s[0] is always "this step's weekday".
      val st = ser.withColumn("s", expr(
        """aggregate(slice(ys, 8, greatest(size(ys) - 7, 0)),
          |  named_struct('l', l0, 'b', CAST(0 AS DOUBLE),
          |    's', array(ys[0] - l0, ys[1] - l0, ys[2] - l0, ys[3] - l0,
          |      ys[4] - l0, ys[5] - l0, ys[6] - l0)),
          |  (a, v) -> named_struct(
          |    'l', (v - a.s[0]) / 2D + (a.l + a.b) / 2D,
          |    'b', (((v - a.s[0]) / 2D + (a.l + a.b) / 2D) - a.l) / 4D
          |      + (a.b * 3D) / 4D,
          |    's', concat(slice(a.s, 2, 6),
          |      array((v - ((v - a.s[0]) / 2D + (a.l + a.b) / 2D)) / 4D
          |        + (a.s[0] * 3D) / 4D))))""".stripMargin))
      st.select(col("event_type"), col("n_days").cast("long").as("n_days"),
          round(col("s.l"), 4).as("level"),
          round(col("s.b"), 4).as("trend"),
          round(col("s.s")(0), 4).as("s_next"),
          round((col("s.l") + col("s.b")) + col("s.s")(0), 4)
            .as("forecast_1"))
        .orderBy(col("event_type"))
    },

    // PEAK DETECTION over each type's daily-count series — strict
    // local maxima (greater than BOTH neighbors, so plateaus and
    // series edges never fire) with the neighbor-gap prominence proxy
    // every alerting stack ranks spikes by. Counts stay BIGINT end to
    // end: the peak predicate and the prominence are exact integer
    // comparisons, immune to partitioning and engine float quirks.
    // All windows partition by event_type over the day-level rollup —
    // the calendar bounds the window input, keys scale out.
    Q("ts_peaks",
      """WITH y AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    count(*) AS yv
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day, yv,
        |    lag(yv) OVER (PARTITION BY event_type ORDER BY day) AS pv,
        |    lead(yv) OVER (PARTITION BY event_type ORDER BY day) AS nv
        |  FROM y),
        |pk AS (SELECT event_type, day, yv,
        |    yv - greatest(pv, nv) AS prominence
        |  FROM w WHERE pv IS NOT NULL AND nv IS NOT NULL
        |    AND yv > pv AND yv > nv),
        |r AS (SELECT event_type, day, yv, prominence,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY prominence DESC, day) AS rk
        |  FROM pk)
        |SELECT event_type, day, CAST(yv AS BIGINT) AS yv,
        |  CAST(prominence AS BIGINT) AS prominence,
        |  CAST(rk = 1 AS BOOLEAN) AS is_top_peak
        |FROM r ORDER BY event_type, day""") { (s, d) =>
      val y = Tables.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("yv"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val pk = y
        .withColumn("pv", lag(col("yv"), 1).over(w))
        .withColumn("nv", lead(col("yv"), 1).over(w))
        .filter(col("pv").isNotNull && col("nv").isNotNull &&
          col("yv") > col("pv") && col("yv") > col("nv"))
        .withColumn("prominence", col("yv") - greatest(col("pv"), col("nv")))
      val wr = Window.partitionBy(col("event_type"))
        .orderBy(col("prominence").desc, col("day"))
      pk.withColumn("rk", row_number().over(wr))
        .select(col("event_type"), col("day"),
          col("yv").cast("long").as("yv"),
          col("prominence").cast("long").as("prominence"),
          (col("rk") === 1).as("is_top_peak"))
        .orderBy(col("event_type"), col("day"))
    },

    // GOERTZEL-STYLE PERIODOGRAM at candidate periods {2,3,5,7,14}
    // days — single-bin DFT power per (type, period), the seasonality
    // DETECTOR behind ts_seasonality_strength's fixed weekly
    // assumption: argue the period from the data instead of assuming
    // it. The trig argument is reduced EXACTLY before libm sees it —
    // 2π·(t mod p)/p with integer t mod p — so both engines evaluate
    // cos/sin at the same ≤14 small arguments (never a 300-radian
    // argument whose reduction could diverge); per-term products
    // quantize to DECIMAL before the order-free sum, the family law.
    // Demeaning kills the DC leak; power normalizes by series length.
    // Shape: day-level rollup × a 5-row literal period grid, one hash
    // aggregate — corpus-scale work is the events→day rollup only.
    Q("ts_periodogram",
      """WITH y AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    count(*) AS yv
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, day, yv,
        |    datediff('day', min(day) OVER (PARTITION BY event_type), day)
        |      AS t,
        |    avg(yv) OVER (PARTITION BY event_type) AS mu
        |  FROM y),
        |g AS (SELECT b.event_type, p.p, b.t, b.yv - b.mu AS x
        |  FROM b CROSS JOIN (SELECT unnest([2, 3, 5, 7, 14]) AS p) p),
        |s AS (SELECT event_type, p, count(*) AS n,
        |    CAST(sum(CAST(round(x * cos(2 * pi() * (t % p) / p), 12)
        |      AS DECIMAL(28,12))) AS DOUBLE) AS c,
        |    CAST(sum(CAST(round(x * sin(2 * pi() * (t % p) / p), 12)
        |      AS DECIMAL(28,12))) AS DOUBLE) AS sn
        |  FROM g GROUP BY 1, 2),
        |pw AS (SELECT event_type, p, n,
        |    (c * c + sn * sn) / n AS power FROM s),
        |r AS (SELECT event_type, p, n, power,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY power DESC, p) AS rk
        |  FROM pw)
        |SELECT event_type, CAST(p AS INT) AS period,
        |  CAST(n AS BIGINT) AS n_days, round(power, 4) AS power,
        |  CAST(rk = 1 AS BOOLEAN) AS is_dominant
        |FROM r ORDER BY event_type, period""") { (s, d) =>
      import s.implicits._
      val y = Tables.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("yv"))
      val wt = Window.partitionBy(col("event_type"))
      val b = y
        .withColumn("t", datediff(col("day"), min(col("day")).over(wt)))
        .withColumn("mu", avg(col("yv")).over(wt))
      val grid = Seq(2, 3, 5, 7, 14).toDF("p")
      val ang = lit(2) * expr("pi()") * (col("t") % col("p")) / col("p")
      val x = col("yv") - col("mu")
      val g = b.crossJoin(broadcast(grid))
        .select(col("event_type"), col("p"),
          round(x * cos(ang), 12).cast("decimal(28,12)").as("tc"),
          round(x * sin(ang), 12).cast("decimal(28,12)").as("tsn"))
      val sdf = g.groupBy(col("event_type"), col("p"))
        .agg(count(lit(1)).as("n"),
          sum(col("tc")).cast("double").as("c"),
          sum(col("tsn")).cast("double").as("sn"))
      val pw = sdf.withColumn("power",
        (col("c") * col("c") + col("sn") * col("sn")) / col("n"))
      val wr = Window.partitionBy(col("event_type"))
        .orderBy(col("power").desc, col("p"))
      pw.withColumn("rk", row_number().over(wr))
        .select(col("event_type"), col("p").cast("int").as("period"),
          col("n").cast("long").as("n_days"),
          round(col("power"), 4).as("power"),
          (col("rk") === 1).as("is_dominant"))
        .orderBy(col("event_type"), col("period"))
    },

    // FORECAST ACCURACY SCORECARD (MAE / MAPE / sMAPE / bias) for the
    // seasonal-naive baseline — the backtest every forecasting
    // pipeline runs BEFORE trusting a fancier model (a model that
    // can't beat lag-7 naive is noise; ts_forecast_naive produces the
    // forecast, this scores it). Per type: ŷ_t = y_{t−7} via one
    // lag-7 window over the day grid, then the four error aggregates
    // with per-term DECIMAL quantization (MAPE and sMAPE denominators
    // are strictly positive by construction — yv is a per-day
    // count(*) ≥ 1, so no zero guard is needed or present). Integer
    // counts keep every error term exact until the final divisions —
    // partition-invariant to the last bit.
    Q("ts_forecast_accuracy",
      """WITH y AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    count(*) AS yv
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, day, yv,
        |    lag(yv, 7) OVER (PARTITION BY event_type ORDER BY day) AS fc
        |  FROM y),
        |e AS (SELECT event_type, yv, fc,
        |    abs(yv - fc) AS ae, yv - fc AS err
        |  FROM l WHERE fc IS NOT NULL),
        |s AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(ae) AS BIGINT) AS sae,
        |    CAST(sum(err) AS BIGINT) AS serr,
        |    CAST(sum(CAST(round(ae / CAST(yv AS DOUBLE), 10)
        |      AS DECIMAL(28,10))) AS DOUBLE) AS sape,
        |    CAST(sum(CAST(round(2.0 * ae / CAST(yv + fc AS DOUBLE), 10)
        |      AS DECIMAL(28,10))) AS DOUBLE) AS ssm
        |  FROM e GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n_scored,
        |  round(sae / CAST(n AS DOUBLE), 4) AS mae,
        |  round(serr / CAST(n AS DOUBLE), 4) AS bias,
        |  round(sape / n, 4) AS mape,
        |  round(ssm / n, 4) AS smape
        |FROM s ORDER BY event_type""") { (s, d) =>
      val y = Tables.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("yv"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val e = y.withColumn("fc", lag(col("yv"), 7).over(w))
        .filter(col("fc").isNotNull)
        .select(col("event_type"), col("yv"), col("fc"),
          abs(col("yv") - col("fc")).as("ae"),
          (col("yv") - col("fc")).as("err"))
      e.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("ae")).cast("long").as("sae"),
          sum(col("err")).cast("long").as("serr"),
          sum(round(col("ae") / col("yv").cast("double"),
            10).cast("decimal(28,10)")).cast("double").as("sape"),
          sum(round(lit(2.0) * col("ae") /
            (col("yv") + col("fc")).cast("double"), 10)
            .cast("decimal(28,10)")).cast("double").as("ssm"))
        .select(col("event_type"), col("n").cast("long").as("n_scored"),
          round(col("sae") / col("n").cast("double"), 4).as("mae"),
          round(col("serr") / col("n").cast("double"), 4).as("bias"),
          round(col("sape") / col("n"), 4).as("mape"),
          round(col("ssm") / col("n"), 4).as("smape"))
        .orderBy(col("event_type"))
    },

    // SEASONAL-HYBRID ESD ANOMALY DETECTION (Twitter's S-H-ESD shape,
    // Hochenbaum et al. 2017; simplified to a fixed z-threshold λ = 2
    // instead of the t-based ESD ladder) — the MASKING-ROBUST upgrade
    // of ts_zscore/ts_anomaly_mad: one giant spike inflates the global
    // σ and hides smaller anomalies, so ESD re-estimates mean/σ after
    // REMOVING each detected point and tests again, three rounds. The
    // decomposition follows the paper's ROBUSTNESS prescription: the
    // day-of-week seasonal is the per-(type, dow) MEDIAN of the
    // MA-detrended counts (a mean seasonal lets one spike pollute its
    // whole weekday — the pollution then reads as four phantom
    // negative anomalies), and the level is the per-type MEDIAN of the
    // raw counts (the paper swaps the trend for exactly this median,
    // because the centered-MA trend smears a spike into its ±3-day
    // neighborhood). Both medians are exact (KLL at 100 TB). Each ESD
    // round is one hash aggregate over the surviving residuals
    // (quantized power sums → exact mean/σ) plus a per-type rank —
    // the day grid bounds every window, types scale out. Output: the
    // removed anomalies with the round that caught them (round 2-3
    // hits are exactly the points a single-pass z-test MASKS).
    Q("ts_shesd",
      """WITH dd AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |tr AS (SELECT event_type, day, n,
        |    CAST((day - DATE '1970-01-01') + 4 AS BIGINT) % 7 AS dow,
        |    CASE WHEN count(*) OVER w = 7
        |      THEN CAST(sum(n) OVER w AS DOUBLE) / 7 END AS trend
        |  FROM dd
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |de AS (SELECT event_type, day, n, dow, trend,
        |    CAST(round(n - trend, 6) AS DECIMAL(18,6)) AS detr
        |  FROM tr),
        |se AS (SELECT event_type, dow,
        |    quantile_cont(CAST(detr AS DOUBLE), 0.5) AS seasonal
        |  FROM de WHERE detr IS NOT NULL GROUP BY 1, 2),
        |lv AS (SELECT event_type,
        |    quantile_cont(CAST(n AS DOUBLE), 0.5) AS lev
        |  FROM de GROUP BY 1),
        |r0 AS (SELECT de.event_type, de.day, de.n,
        |    CAST(round(de.n - se.seasonal - lv.lev, 6)
        |      AS DECIMAL(18,6)) AS resid
        |  FROM de JOIN se ON se.event_type = de.event_type
        |    AND se.dow = de.dow
        |  JOIN lv ON lv.event_type = de.event_type),
        |s1 AS (SELECT event_type, count(*) AS m,
        |    CAST(sum(resid) AS DOUBLE) AS a1,
        |    CAST(sum(CAST(round(CAST(resid AS DOUBLE)
        |      * CAST(resid AS DOUBLE), 6) AS DECIMAL(28,6))) AS DOUBLE)
        |      AS a2
        |  FROM r0 GROUP BY 1),
        |w1 AS (SELECT r.*, (CAST(r.resid AS DOUBLE) - s.a1 / s.m)
        |      / nullif(sqrt(s.a2 / s.m - (s.a1 / s.m) * (s.a1 / s.m)), 0)
        |      AS z,
        |    row_number() OVER (PARTITION BY r.event_type ORDER BY
        |      abs((CAST(r.resid AS DOUBLE) - s.a1 / s.m)
        |        / nullif(sqrt(s.a2 / s.m - (s.a1 / s.m) * (s.a1 / s.m)),
        |          0)) DESC, r.day) AS rk
        |  FROM r0 r JOIN s1 s ON s.event_type = r.event_type),
        |rm1 AS (SELECT event_type, day, n, resid, z, 1 AS esd_round
        |  FROM w1 WHERE rk = 1 AND abs(z) > 2.0),
        |r1 AS (SELECT event_type, day, n, resid FROM w1
        |  WHERE NOT (rk = 1 AND abs(z) > 2.0)),
        |s2 AS (SELECT event_type, count(*) AS m,
        |    CAST(sum(resid) AS DOUBLE) AS a1,
        |    CAST(sum(CAST(round(CAST(resid AS DOUBLE)
        |      * CAST(resid AS DOUBLE), 6) AS DECIMAL(28,6))) AS DOUBLE)
        |      AS a2
        |  FROM r1 GROUP BY 1),
        |w2 AS (SELECT r.*, (CAST(r.resid AS DOUBLE) - s.a1 / s.m)
        |      / nullif(sqrt(s.a2 / s.m - (s.a1 / s.m) * (s.a1 / s.m)), 0)
        |      AS z,
        |    row_number() OVER (PARTITION BY r.event_type ORDER BY
        |      abs((CAST(r.resid AS DOUBLE) - s.a1 / s.m)
        |        / nullif(sqrt(s.a2 / s.m - (s.a1 / s.m) * (s.a1 / s.m)),
        |          0)) DESC, r.day) AS rk
        |  FROM r1 r JOIN s2 s ON s.event_type = r.event_type),
        |rm2 AS (SELECT event_type, day, n, resid, z, 2 AS esd_round
        |  FROM w2 WHERE rk = 1 AND abs(z) > 2.0),
        |r2 AS (SELECT event_type, day, n, resid FROM w2
        |  WHERE NOT (rk = 1 AND abs(z) > 2.0)),
        |s3 AS (SELECT event_type, count(*) AS m,
        |    CAST(sum(resid) AS DOUBLE) AS a1,
        |    CAST(sum(CAST(round(CAST(resid AS DOUBLE)
        |      * CAST(resid AS DOUBLE), 6) AS DECIMAL(28,6))) AS DOUBLE)
        |      AS a2
        |  FROM r2 GROUP BY 1),
        |w3 AS (SELECT r.*, (CAST(r.resid AS DOUBLE) - s.a1 / s.m)
        |      / nullif(sqrt(s.a2 / s.m - (s.a1 / s.m) * (s.a1 / s.m)), 0)
        |      AS z,
        |    row_number() OVER (PARTITION BY r.event_type ORDER BY
        |      abs((CAST(r.resid AS DOUBLE) - s.a1 / s.m)
        |        / nullif(sqrt(s.a2 / s.m - (s.a1 / s.m) * (s.a1 / s.m)),
        |          0)) DESC, r.day) AS rk
        |  FROM r2 r JOIN s3 s ON s.event_type = r.event_type),
        |rm3 AS (SELECT event_type, day, n, resid, z, 3 AS esd_round
        |  FROM w3 WHERE rk = 1 AND abs(z) > 2.0),
        |allrm AS (SELECT * FROM rm1 UNION ALL SELECT * FROM rm2
        |  UNION ALL SELECT * FROM rm3)
        |SELECT event_type, CAST(day AS VARCHAR) AS day, n,
        |  round(CAST(resid AS DOUBLE), 4) AS resid, round(z, 4) AS z,
        |  CAST(esd_round AS INT) AS esd_round
        |FROM allrm ORDER BY event_type, day""") { (s, d) =>
      val dd = Tables.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-3, 3)
      val tr = dd.select(col("event_type"), col("day"), col("n"),
        (datediff(col("day"), lit("1970-01-01").cast("date")) + 4)
          .cast("long").mod(7).as("dow"),
        when(count(lit(1)).over(w) === 7,
          sum(col("n")).over(w).cast("double") / 7).as("trend"))
      val de = tr.withColumn("detr",
        round(col("n") - col("trend"), 6).cast("decimal(18,6)"))
      val se = de.filter(col("detr").isNotNull)
        .groupBy(col("event_type").as("et"), col("dow").as("sdow"))
        .agg(expr("percentile(CAST(detr AS DOUBLE), 0.5)").as("seasonal"))
      val lv = de.groupBy(col("event_type").as("lt"))
        .agg(expr("percentile(CAST(n AS DOUBLE), 0.5)").as("lev"))
      // The residual day-grid is tiny (types × days) while its lineage
      // holds the full event scan + three aggregation branches; every
      // ESD round reads its input TWICE (power-sum stats + the join
      // probe) and the final rm1∪rm2∪rm3 union re-evaluates every
      // earlier round's branch. Materialize the grid once (eager
      // localCheckpoint) and each round's surviving rows likewise, so
      // the event table is scanned exactly once and the ladder iterates
      // over materialized day-grid rows — the S-H-ESD paper's shape
      // (guide §1.2/§2.4: one pass over the big input, iterate on the
      // small residual state). Values are unchanged: resid is
      // DECIMAL-quantized before any order-sensitive use.
      val r0 = de.join(se, col("et") === col("event_type") &&
          col("sdow") === col("dow"))
        .join(lv, col("lt") === col("event_type"))
        .select(col("event_type"), col("day"), col("n"),
          round(col("n") - col("seasonal") - col("lev"), 6)
            .cast("decimal(18,6)").as("resid"))
        .localCheckpoint(true)
      // One ESD round: quantized power-sum stats per type, the worst
      // |z| row removed if it clears λ = 2. Returns (removed, kept).
      def esdRound(r: org.apache.spark.sql.DataFrame, k: Int,
          keepSurvivors: Boolean = true)
          : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
        val st = r.groupBy(col("event_type").as("et"))
          .agg(count(lit(1)).as("m"),
            sum(col("resid")).cast("double").as("a1"),
            sum(round(col("resid").cast("double") *
                col("resid").cast("double"), 6).cast("decimal(28,6)"))
              .cast("double").as("a2"))
        val mu = col("a1") / col("m")
        val z = (col("resid").cast("double") - mu) /
          nullif(sqrt(col("a2") / col("m") - mu * mu), lit(0d))
        val wv = r.join(st, col("et") === col("event_type"))
          .withColumn("z", z)
        val wr = Window.partitionBy(col("event_type"))
          .orderBy(abs(col("z")).desc, col("day"))
        val ranked = wv.withColumn("rk", row_number().over(wr))
        val hit = col("rk") === 1 && abs(col("z")) > 2.0
        (ranked.filter(hit)
           .select(col("event_type"), col("day"), col("n"), col("resid"),
             col("z"), lit(k).as("esd_round")),
         {
           val kept = ranked.filter(!hit)
             .select(col("event_type"), col("day"), col("n"), col("resid"))
           // the last round's survivors feed nothing — skip the job
           if (keepSurvivors) kept.localCheckpoint(true) else kept
         })
      }
      val (rm1, r1) = esdRound(r0, 1)
      val (rm2, r2) = esdRound(r1, 2)
      val (rm3, _) = esdRound(r2, 3, keepSurvivors = false)
      rm1.unionByName(rm2).unionByName(rm3)
        .select(col("event_type"), col("day").cast("string").as("day"),
          col("n"), round(col("resid").cast("double"), 4).as("resid"),
          round(col("z"), 4).as("z"),
          col("esd_round").cast("int").as("esd_round"))
        .orderBy(col("event_type"), col("day"))
    },

    // AR(2) VIA YULE-WALKER over the per-type day-count series — the
    // in-engine autoregressive fit next to ts_holt/ts_ses: the lag-1/
    // lag-2 autocovariance SUMS come from ts_autocorr's machinery
    // (available-pairs convention, DECIMAL-quantized terms), then the
    // 2×2 Yule-Walker system solves in closed form on the per-type
    // 1-row relation: φ1 = r1(1−r2)/(1−r1²), φ2 = (r2−r1²)/(1−r1²).
    // The 1-step forecast re-centers the last two observations (picked
    // by a conditional max over the rank window, not a driver sort):
    // ŷ = μ + φ1(y_n − μ) + φ2(y_{n−1} − μ). Day grids are calendar-
    // bounded; types scale out.
    Q("ts_ar2_yw",
      """WITH dc AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type,
        |    sum(c) / CAST(count(*) AS DOUBLE) AS mu FROM dc GROUP BY 1),
        |x AS (SELECT dc.event_type, day, c, mu,
        |    lead(c, 1) OVER (PARTITION BY dc.event_type ORDER BY day) AS c1,
        |    lead(c, 2) OVER (PARTITION BY dc.event_type ORDER BY day) AS c2,
        |    row_number() OVER (PARTITION BY dc.event_type ORDER BY day DESC)
        |      AS rk
        |  FROM dc JOIN m ON m.event_type = dc.event_type),
        |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    max(mu) AS mu,
        |    max(CASE WHEN rk = 1 THEN c END) AS yn,
        |    max(CASE WHEN rk = 2 THEN c END) AS yn1,
        |    CAST(sum(CAST((c - mu) * (c - mu) AS DECIMAL(28,12))) AS DOUBLE) AS s0,
        |    CAST(sum(CASE WHEN c1 IS NOT NULL
        |      THEN CAST((c - mu) * (c1 - mu) AS DECIMAL(28,12)) END) AS DOUBLE) AS s1,
        |    CAST(sum(CASE WHEN c2 IS NOT NULL
        |      THEN CAST((c - mu) * (c2 - mu) AS DECIMAL(28,12)) END) AS DOUBLE) AS s2
        |  FROM x GROUP BY 1),
        |f AS (SELECT event_type, n_days, mu, yn, yn1,
        |    (s1 / s0) * (1 - s2 / s0) / (1 - (s1 / s0) * (s1 / s0)) AS phi1,
        |    (s2 / s0 - (s1 / s0) * (s1 / s0))
        |      / (1 - (s1 / s0) * (s1 / s0)) AS phi2
        |  FROM a)
        |SELECT event_type, n_days,
        |  round(phi1, 4) AS phi1, round(phi2, 4) AS phi2,
        |  round(mu + phi1 * (yn - mu) + phi2 * (yn1 - mu), 4) AS forecast
        |FROM f ORDER BY event_type""") { (s, d) =>
      val dc = Tables.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("c"))
      val m = dc.groupBy(col("event_type"))
        .agg((sum(col("c")) / count(lit(1)).cast("double")).as("mu"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val wd = Window.partitionBy(col("event_type"))
        .orderBy(col("day").desc)
      val a = dc.join(m, Seq("event_type"))
        .withColumn("c1", lead(col("c"), 1).over(w))
        .withColumn("c2", lead(col("c"), 2).over(w))
        .withColumn("rk", row_number().over(wd))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"), max(col("mu")).as("mu"),
          max(when(col("rk") === 1, col("c"))).as("yn"),
          max(when(col("rk") === 2, col("c"))).as("yn1"),
          expr("CAST(sum(CAST((c - mu) * (c - mu) AS DECIMAL(28,12))) AS DOUBLE)").as("s0"),
          expr("""CAST(sum(CASE WHEN c1 IS NOT NULL
                 |  THEN CAST((c - mu) * (c1 - mu) AS DECIMAL(28,12)) END) AS DOUBLE)""".stripMargin).as("s1"),
          expr("""CAST(sum(CASE WHEN c2 IS NOT NULL
                 |  THEN CAST((c - mu) * (c2 - mu) AS DECIMAL(28,12)) END) AS DOUBLE)""".stripMargin).as("s2"))
      a.select(col("event_type"), col("n_days"), col("mu"), col("yn"),
          col("yn1"),
          ((col("s1") / col("s0")) * (lit(1) - col("s2") / col("s0")) /
            (lit(1) - (col("s1") / col("s0")) * (col("s1") / col("s0"))))
            .as("phi1"),
          ((col("s2") / col("s0") - (col("s1") / col("s0")) *
            (col("s1") / col("s0"))) /
            (lit(1) - (col("s1") / col("s0")) * (col("s1") / col("s0"))))
            .as("phi2"))
        .select(col("event_type"), col("n_days"),
          round(col("phi1"), 4).as("phi1"), round(col("phi2"), 4).as("phi2"),
          round(col("mu") + col("phi1") * (col("yn") - col("mu")) +
            col("phi2") * (col("yn1") - col("mu")), 4).as("forecast"))
        .orderBy(col("event_type"))
    },

    // LJUNG-BOX PORTMANTEAU TEST (lags 1..7) on the per-type day-count
    // series — "is there ANY autocorrelation left": Q = n(n+2)·
    // Σ_k ρ_k²/(n−k), df = 7, rejected against the χ²₀.₉₅,₇ = 14.0671
    // critical value (a literal — no CDF needed at a fixed df). The 7
    // lag products ride ONE window pass (7 leads over the same day
    // order), every term DECIMAL-quantized; the per-type statistic is
    // a single rollup — the standard residual-whiteness gate after
    // ts_ar2_yw / ts_holt_winters fits.
    Q("ts_ljung_box", {
      val leadsSql = (1 to 7).map(k =>
        s"lead(c, $k) OVER (PARTITION BY dc.event_type ORDER BY day) AS c$k")
        .mkString(",\n        |    ")
      val sumsSql = (1 to 7).map(k =>
        s"""CAST(sum(CASE WHEN c$k IS NOT NULL
           |      THEN CAST((c - mu) * (c$k - mu) AS DECIMAL(28,12)) END)
           |      AS DOUBLE) AS s$k""".stripMargin).mkString(",\n    ")
      val qTerms = (1 to 7).map(k =>
        s"(s$k / s0) * (s$k / s0) / (n_days - $k)").mkString("\n        |    + ")
      s"""WITH dc AS (SELECT event_type, CAST(ts AS DATE) AS day,
         |    CAST(count(*) AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2),
         |m AS (SELECT event_type,
         |    sum(c) / CAST(count(*) AS DOUBLE) AS mu FROM dc GROUP BY 1),
         |x AS (SELECT dc.event_type, day, c, mu,
         |    $leadsSql
         |  FROM dc JOIN m ON m.event_type = dc.event_type),
         |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
         |    CAST(sum(CAST((c - mu) * (c - mu) AS DECIMAL(28,12))) AS DOUBLE) AS s0,
         |    $sumsSql
         |  FROM x GROUP BY 1)
         |SELECT event_type, n_days,
         |  round(n_days * (n_days + 2.0) * ($qTerms), 4) AS q_stat,
         |  CAST(7 AS INT) AS df,
         |  CAST(n_days * (n_days + 2.0) * ($qTerms) > 14.0671 AS BOOLEAN)
         |    AS reject_white
         |FROM a ORDER BY event_type""".stripMargin
    }) { (s, d) =>
      val dc = Tables.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("c"))
      val m = dc.groupBy(col("event_type"))
        .agg((sum(col("c")) / count(lit(1)).cast("double")).as("mu"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      var x = dc.join(m, Seq("event_type"))
      for (k <- 1 to 7) x = x.withColumn(s"c$k", lead(col("c"), k).over(w))
      val aggs = count(lit(1)).as("n_days") +:
        expr("CAST(sum(CAST((c - mu) * (c - mu) AS DECIMAL(28,12))) AS DOUBLE)").as("s0") +:
        (1 to 7).map(k => expr(
          s"""CAST(sum(CASE WHEN c$k IS NOT NULL
             |  THEN CAST((c - mu) * (c$k - mu) AS DECIMAL(28,12)) END)
             |  AS DOUBLE)""".stripMargin).as(s"s$k"))
      val a = x.groupBy(col("event_type")).agg(aggs.head, aggs.tail: _*)
      val qTerms = (1 to 7).map(k =>
        s"(s$k / s0) * (s$k / s0) / (n_days - $k)").mkString(" + ")
      a.select(col("event_type"), col("n_days"),
          round(expr(s"n_days * (n_days + 2.0) * ($qTerms)"), 4)
            .as("q_stat"),
          lit(7).as("df"),
          expr(s"n_days * (n_days + 2.0) * ($qTerms) > 14.0671")
            .as("reject_white"))
        .orderBy(col("event_type"))
    },

    // LTTB DOWNSAMPLING (largest-triangle-three-buckets, Steinarsson
    // 2013; PARALLEL centroid variant) of the per-type day series to
    // 20 points — the chart-decimation operator every dashboard layer
    // runs before plotting a year of per-minute data. The sequential
    // original anchors each bucket's triangle on the PREVIOUS
    // SELECTION (an inherently serial chain); the variant every
    // distributed downsampler ships anchors on the neighbor buckets'
    // CENTROIDS instead, which drops the serial dependency at a
    // negligible visual cost — each bucket's argmax is then one
    // window rank, fully parallel. First/last points are kept
    // verbatim (the LTTB convention). Centroids are integer-sum /
    // count divisions — exact. Buckets are by row_number over the
    // calendar-bounded day grid, so the global window is bounded by
    // days, never corpus rows.
    Q("ts_lttb",
      """WITH dc AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |ix AS (SELECT event_type, day, c,
        |    CAST(datediff('day', min(day) OVER (PARTITION BY event_type),
        |      day) AS BIGINT) AS xi,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) - 1
        |      AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS nd
        |  FROM dc),
        |bk AS (SELECT event_type, day, c, xi,
        |    least(CAST(rn * 20 // nd AS INT), 19) AS b, rn, nd
        |  FROM ix),
        |cen AS (SELECT event_type, b,
        |    sum(xi) / CAST(count(*) AS DOUBLE) AS cx,
        |    sum(c) / CAST(count(*) AS DOUBLE) AS cy
        |  FROM bk GROUP BY 1, 2),
        |ar AS (SELECT bk.event_type, bk.b, bk.day, bk.c, bk.rn, bk.nd,
        |    abs((p.cx - q.cx) * (bk.c - p.cy)
        |      - (p.cx - bk.xi) * (q.cy - p.cy)) AS area
        |  FROM bk
        |  LEFT JOIN cen p ON p.event_type = bk.event_type
        |    AND p.b = bk.b - 1
        |  LEFT JOIN cen q ON q.event_type = bk.event_type
        |    AND q.b = bk.b + 1),
        |rk AS (SELECT event_type, b, day, c, rn, nd,
        |    row_number() OVER (PARTITION BY event_type, b
        |      ORDER BY CASE WHEN rn = 0 OR rn = nd - 1 THEN 1 ELSE 0 END
        |        DESC, area DESC NULLS LAST, day) AS pick
        |  FROM ar)
        |SELECT event_type, CAST(b AS INT) AS bucket,
        |  CAST(day AS VARCHAR) AS day, c AS yv
        |FROM rk WHERE pick = 1
        |ORDER BY event_type, bucket""") { (s, d) =>
      val dc = Tables.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("c"))
      val wt = Window.partitionBy(col("event_type"))
      val wo = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val bk = dc
        .withColumn("xi",
          datediff(col("day"), min(col("day")).over(wt)).cast("long"))
        .withColumn("rn", row_number().over(wo) - 1)
        .withColumn("nd", count(lit(1)).over(wt))
        .withColumn("b",
          least((col("rn") * 20).cast("long").divide(col("nd"))
            .cast("int"), lit(19)))
      val cen = bk.groupBy(col("event_type"), col("b"))
        .agg((sum(col("xi")) / count(lit(1)).cast("double")).as("cx"),
          (sum(col("c")) / count(lit(1)).cast("double")).as("cy"))
      val ar = bk
        .join(cen.select(col("event_type"), (col("b") + 1).as("b"),
          col("cx").as("pcx"), col("cy").as("pcy")),
          Seq("event_type", "b"), "left")
        .join(cen.select(col("event_type"), (col("b") - 1).as("b"),
          col("cx").as("qcx"), col("cy").as("qcy")),
          Seq("event_type", "b"), "left")
        .withColumn("area",
          abs((col("pcx") - col("qcx")) * (col("c") - col("pcy")) -
            (col("pcx") - col("xi")) * (col("qcy") - col("pcy"))))
      val wp = Window.partitionBy(col("event_type"), col("b"))
        .orderBy(
          when(col("rn") === 0 || col("rn") === col("nd") - 1, 1)
            .otherwise(0).desc,
          col("area").desc_nulls_last, col("day"))
      ar.withColumn("pick", row_number().over(wp))
        .filter(col("pick") === 1)
        .select(col("event_type"), col("b").cast("int").as("bucket"),
          col("day").cast("string").as("day"), col("c").as("yv"))
        .orderBy(col("event_type"), col("bucket"))
    },

    // HURST EXPONENT via rescaled-range (R/S) analysis over block
    // sizes {8, 16, 32} — the long-memory census (H > 0.5 persistent,
    // < 0.5 mean-reverting) run on the per-type day series: complete
    // blocks of w days get an in-block cumulative-deviation window
    // (max − min = R) over the block mean, S is the in-block
    // population σ from quantized power sums, mean R/S per (type, w)
    // (σ = 0 blocks drop via nullif), and H is the closed-form
    // 3-point log-log OLS slope. Every window is (type, w, block)-
    // partitioned — calendar-bounded; types scale out.
    Q("ts_hurst",
      """WITH dc AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |ix AS (SELECT event_type, day, c,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day) - 1
        |      AS rn
        |  FROM dc),
        |g AS (SELECT w, event_type, CAST(rn // w AS BIGINT) AS blk, day, c
        |  FROM ix CROSS JOIN (SELECT unnest([8, 16, 32]) AS w)),
        |bstat AS (SELECT w, event_type, blk, count(*) AS bn,
        |    sum(c) / CAST(count(*) AS DOUBLE) AS bmu,
        |    CAST(sum(CAST(c AS DECIMAL(28,6))) AS DOUBLE) AS bs1,
        |    CAST(sum(CAST(c * c AS DECIMAL(28,6))) AS DOUBLE) AS bs2
        |  FROM g GROUP BY 1, 2, 3),
        |z AS (SELECT g.w, g.event_type, g.blk, bn, bmu, bs1, bs2,
        |    sum(CAST(round(g.c - bmu, 8) AS DECIMAL(28,8)))
        |      OVER (PARTITION BY g.w, g.event_type, g.blk ORDER BY g.day)
        |      AS cum
        |  FROM g JOIN bstat ON bstat.w = g.w
        |    AND bstat.event_type = g.event_type AND bstat.blk = g.blk),
        |rs AS (SELECT w, event_type, blk, max(bn) AS bn,
        |    CAST(max(cum) - min(cum) AS DOUBLE) AS r,
        |    sqrt((max(bs2) - max(bs1) * max(bs1) / max(bn)) / max(bn)) AS sd
        |  FROM z GROUP BY 1, 2, 3),
        |mrs AS (SELECT event_type, w,
        |    CAST(sum(CAST(round(r / nullif(sd, 0), 10) AS DECIMAL(28,10)))
        |      AS DOUBLE)
        |      / count(CASE WHEN sd > 0 THEN 1 END) AS mean_rs
        |  FROM rs WHERE bn = w GROUP BY 1, 2),
        |pt AS (SELECT event_type, ln(CAST(w AS DOUBLE)) AS lx,
        |    ln(mean_rs) AS ly FROM mrs),
        |ols AS (SELECT event_type, count(*) AS k,
        |    CAST(sum(CAST(round(lx * ly, 12) AS DECIMAL(28,12))) AS DOUBLE) AS sxy,
        |    CAST(sum(CAST(round(lx * lx, 12) AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(round(lx, 12) AS DECIMAL(28,12))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(round(ly, 12) AS DECIMAL(28,12))) AS DOUBLE) AS sy
        |  FROM pt GROUP BY 1)
        |SELECT event_type,
        |  round((sxy - sx * sy / k) / (sxx - sx * sx / k), 4) AS hurst
        |FROM ols ORDER BY event_type""") { (s, d) =>
      import s.implicits._
      val dc = Tables.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("c"))
      val wo = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val ix = dc.withColumn("rn", row_number().over(wo) - 1)
      val ws = Seq(8, 16, 32).toDF("w")
      val g = ix.crossJoin(broadcast(ws))
        .withColumn("blk", (col("rn") / col("w")).cast("long"))
      val bstat = g.groupBy(col("w"), col("event_type"), col("blk"))
        .agg(count(lit(1)).as("bn"),
          (sum(col("c")) / count(lit(1)).cast("double")).as("bmu"),
          sum(col("c").cast("decimal(28,6)")).cast("double").as("bs1"),
          sum((col("c") * col("c")).cast("decimal(28,6)")).cast("double")
            .as("bs2"))
      val wz = Window.partitionBy(col("w"), col("event_type"), col("blk"))
        .orderBy(col("day"))
      val z = g.join(bstat, Seq("w", "event_type", "blk"))
        .withColumn("cum",
          sum(round(col("c") - col("bmu"), 8).cast("decimal(28,8)"))
            .over(wz))
      val rs = z.groupBy(col("w"), col("event_type"), col("blk"))
        .agg(max(col("bn")).as("bn"),
          (max(col("cum")) - min(col("cum"))).cast("double").as("r"),
          sqrt((max(col("bs2")) - max(col("bs1")) * max(col("bs1")) /
            max(col("bn"))) / max(col("bn"))).as("sd"))
      val mrs = rs.filter(col("bn") === col("w"))
        .groupBy(col("event_type"), col("w"))
        .agg((sum(round(col("r") / nullif(col("sd"), lit(0)), 10)
          .cast("decimal(28,10)")).cast("double") /
          count(when(col("sd") > 0, 1))).as("mean_rs"))
      val pt = mrs.select(col("event_type"),
        log(col("w").cast("double")).as("lx"), log(col("mean_rs")).as("ly"))
      def q12(c: org.apache.spark.sql.Column) =
        sum(round(c, 12).cast("decimal(28,12)")).cast("double")
      pt.groupBy(col("event_type"))
        .agg(count(lit(1)).as("k"), q12(col("lx")).as("sx"),
          q12(col("ly")).as("sy"), q12(col("lx") * col("ly")).as("sxy"),
          q12(col("lx") * col("lx")).as("sxx"))
        .select(col("event_type"),
          round((col("sxy") - col("sx") * col("sy") / col("k")) /
            (col("sxx") - col("sx") * col("sx") / col("k")), 4).as("hurst"))
        .orderBy(col("event_type"))
    },

    // TIME-WEIGHTED AVERAGE — the correct mean for an IRREGULARLY
    // SAMPLED step signal (prices, gauge readings, config values): a
    // value "holds" until the next observation, so the mean weights
    // each value by its holding interval instead of giving a burst of
    // rapid-fire samples a burst of influence. Per type: one lead()
    // window over (ts, event_id) — the composite break ties
    // deterministically — then an integer-second interval, a
    // DECIMAL-quantized value·dt sum, and one divide. The simple mean
    // rides the same scan; the gap between the two IS the sampling-
    // bias readout. Zero-length intervals (same-timestamp bursts)
    // contribute zero weight by construction.
    Q("ts_time_weighted_avg",
      """WITH e AS (SELECT event_type, ts, event_id, CAST(value AS DOUBLE) AS v
        |  FROM events),
        |l AS (SELECT event_type, v,
        |    CAST(date_diff('second', ts,
        |      lead(ts) OVER (PARTITION BY event_type
        |        ORDER BY ts, event_id)) AS BIGINT) AS dt
        |  FROM e),
        |a AS (SELECT event_type,
        |    CAST(count(*) AS BIGINT) AS n_intervals,
        |    CAST(sum(dt) AS BIGINT) AS total_seconds,
        |    CAST(sum(CAST(round(v * dt, 6) AS DECIMAL(28,6))) AS DOUBLE)
        |      AS swv,
        |    CAST(sum(CAST(round(v, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sv
        |  FROM l WHERE dt IS NOT NULL GROUP BY 1)
        |SELECT event_type, n_intervals, total_seconds,
        |  round(swv / total_seconds, 4) AS twa,
        |  round(sv / n_intervals, 4) AS simple_avg
        |FROM a ORDER BY event_type""") { (s, d) =>
      val e = Tables.events(s, d).select(col("event_type"), col("ts"),
        col("event_id"), col("value").cast("double").as("v"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      e.withColumn("dt",
          (unix_timestamp(lead(col("ts"), 1).over(w)) -
            unix_timestamp(col("ts"))).cast("long"))
        .filter(col("dt").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n_intervals"),
          sum(col("dt")).cast("long").as("total_seconds"),
          sum(round(col("v") * col("dt"), 6).cast("decimal(28,6)"))
            .cast("double").as("swv"),
          sum(round(col("v"), 6).cast("decimal(28,6)")).cast("double")
            .as("sv"))
        .select(col("event_type"), col("n_intervals"), col("total_seconds"),
          round(col("swv") / col("total_seconds"), 4).as("twa"),
          round(col("sv") / col("n_intervals"), 4).as("simple_avg"))
        .orderBy(col("event_type"))
    },

    // POISSON + GAMMA DEVIANCE of the seasonal-naive forecast — the
    // COUNT-DATA scorecard next to ts_forecast_accuracy's MAE/MAPE:
    // squared error treats a miss of 5 on a mean of 10 like a miss of
    // 5 on a mean of 10,000; the Poisson deviance
    // 2Σ[y·ln(y/μ) − (y−μ)] is the likelihood-correct loss for counts
    // (and the gamma deviance 2Σ[−ln(y/μ) + (y−μ)/μ] the
    // multiplicative-error twin). Same lag-7 window over the day
    // grid; y and μ are counts ≥ 1 so every log is finite. Per-term
    // DECIMAL quantization → partition-invariant.
    Q("ts_forecast_deviance",
      """WITH y AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS yv
        |  FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, yv,
        |    lag(yv, 7) OVER (PARTITION BY event_type ORDER BY day) AS fc
        |  FROM y),
        |e AS (SELECT event_type, yv, fc FROM l WHERE fc IS NOT NULL),
        |s AS (SELECT event_type, count(*) AS n,
        |    CAST(sum(CAST(round(yv * ln(yv / CAST(fc AS DOUBLE))
        |      - (yv - fc), 10) AS DECIMAL(28,10))) AS DOUBLE) AS pd,
        |    CAST(sum(CAST(round(-ln(yv / CAST(fc AS DOUBLE))
        |      + (yv - fc) / CAST(fc AS DOUBLE), 10) AS DECIMAL(28,10)))
        |      AS DOUBLE) AS gd
        |  FROM e GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n_scored,
        |  round(2 * pd, 4) AS poisson_dev,
        |  round(2 * pd / n, 4) AS poisson_dev_mean,
        |  round(2 * gd, 4) AS gamma_dev
        |FROM s ORDER BY event_type""") { (s, d) =>
      val y = Tables.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("yv"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      y.withColumn("fc", lag(col("yv"), 7).over(w))
        .filter(col("fc").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("yv") * log(col("yv") / col("fc").cast("double")) -
            (col("yv") - col("fc")), 10).cast("decimal(28,10)"))
            .cast("double").as("pd"),
          sum(round(-log(col("yv") / col("fc").cast("double")) +
            (col("yv") - col("fc")) / col("fc").cast("double"), 10)
            .cast("decimal(28,10)")).cast("double").as("gd"))
        .select(col("event_type"), col("n").cast("long").as("n_scored"),
          round(lit(2) * col("pd"), 4).as("poisson_dev"),
          round(lit(2) * col("pd") / col("n"), 4).as("poisson_dev_mean"),
          round(lit(2) * col("gd"), 4).as("gamma_dev"))
        .orderBy(col("event_type"))
    },

    // PARTIAL AUTOCORRELATION (lags 1-3) via Durbin-Levinson — the
    // AR-order picker next to ts_autocorr/ts_ar2_yw: ACF says "is
    // there memory", PACF says "at which LAG does new memory stop"
    // (an AR(p) cuts off after lag p). The three lag-covariance sums
    // ride ts_autocorr's quantized machinery; the recursion is pure
    // closed-form scalar algebra on the per-type 1-row relation:
    // φ11 = r1; φ22 = (r2 − r1²)/(1 − r1²); φ21 = r1(1 − φ22);
    // φ33 = (r3 − φ21·r2 − φ22·r1)/(1 − φ21·r1 − φ22·r2). Spelled
    // identically in both dialects via the staged intermediates.
    Q("ts_pacf",
      """WITH dc AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type,
        |    sum(c) / CAST(count(*) AS DOUBLE) AS mu FROM dc GROUP BY 1),
        |x AS (SELECT dc.event_type, day, c, mu,
        |    lead(c, 1) OVER (PARTITION BY dc.event_type ORDER BY day) AS c1,
        |    lead(c, 2) OVER (PARTITION BY dc.event_type ORDER BY day) AS c2,
        |    lead(c, 3) OVER (PARTITION BY dc.event_type ORDER BY day) AS c3
        |  FROM dc JOIN m ON m.event_type = dc.event_type),
        |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(CAST((c - mu) * (c - mu) AS DECIMAL(28,12))) AS DOUBLE) AS s0,
        |    CAST(sum(CASE WHEN c1 IS NOT NULL
        |      THEN CAST((c - mu) * (c1 - mu) AS DECIMAL(28,12)) END) AS DOUBLE) AS s1,
        |    CAST(sum(CASE WHEN c2 IS NOT NULL
        |      THEN CAST((c - mu) * (c2 - mu) AS DECIMAL(28,12)) END) AS DOUBLE) AS s2,
        |    CAST(sum(CASE WHEN c3 IS NOT NULL
        |      THEN CAST((c - mu) * (c3 - mu) AS DECIMAL(28,12)) END) AS DOUBLE) AS s3
        |  FROM x GROUP BY 1),
        |r AS (SELECT event_type, n_days,
        |    s1 / s0 AS r1, s2 / s0 AS r2, s3 / s0 AS r3 FROM a),
        |d2 AS (SELECT event_type, n_days, r1, r2, r3,
        |    (r2 - r1 * r1) / (1 - r1 * r1) AS p22 FROM r),
        |d3 AS (SELECT event_type, n_days, r1, r2, r3, p22,
        |    r1 * (1 - p22) AS p21 FROM d2)
        |SELECT event_type, n_days,
        |  round(r1, 4) AS pacf1,
        |  round(p22, 4) AS pacf2,
        |  round((r3 - p21 * r2 - p22 * r1)
        |    / (1 - p21 * r1 - p22 * r2), 4) AS pacf3
        |FROM d3 ORDER BY event_type""") { (s, d) =>
      val dc = Tables.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("c"))
      val m = dc.groupBy(col("event_type"))
        .agg((sum(col("c")) / count(lit(1)).cast("double")).as("mu"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      var x = dc.join(m, Seq("event_type"))
      for (k <- 1 to 3) x = x.withColumn(s"c$k", lead(col("c"), k).over(w))
      val a = x.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          expr("CAST(sum(CAST((c - mu) * (c - mu) AS DECIMAL(28,12))) AS DOUBLE)").as("s0"),
          expr("""CAST(sum(CASE WHEN c1 IS NOT NULL
                 |  THEN CAST((c - mu) * (c1 - mu) AS DECIMAL(28,12)) END) AS DOUBLE)""".stripMargin).as("s1"),
          expr("""CAST(sum(CASE WHEN c2 IS NOT NULL
                 |  THEN CAST((c - mu) * (c2 - mu) AS DECIMAL(28,12)) END) AS DOUBLE)""".stripMargin).as("s2"),
          expr("""CAST(sum(CASE WHEN c3 IS NOT NULL
                 |  THEN CAST((c - mu) * (c3 - mu) AS DECIMAL(28,12)) END) AS DOUBLE)""".stripMargin).as("s3"))
      a.select(col("event_type"), col("n_days"),
          (col("s1") / col("s0")).as("r1"), (col("s2") / col("s0")).as("r2"),
          (col("s3") / col("s0")).as("r3"))
        .withColumn("p22",
          (col("r2") - col("r1") * col("r1")) /
            (lit(1) - col("r1") * col("r1")))
        .withColumn("p21", col("r1") * (lit(1) - col("p22")))
        .select(col("event_type"), col("n_days"),
          round(col("r1"), 4).as("pacf1"),
          round(col("p22"), 4).as("pacf2"),
          round((col("r3") - col("p21") * col("r2") -
            col("p22") * col("r1")) /
            (lit(1) - col("p21") * col("r1") - col("p22") * col("r2")), 4)
            .as("pacf3"))
        .orderBy(col("event_type"))
    })
}
