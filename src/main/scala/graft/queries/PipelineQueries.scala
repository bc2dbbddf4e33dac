package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-5 additions: search-index construction, sequence packing,
  * robust statistics, random-projection embedding reduction, and the
  * zip/outer-generator scalar surface.
  *
  * Determinism notes follow the established discipline: no engine RNG
  * (hashes derive from md5 hex, identical in both engines), per-row
  * higher-order-function arithmetic (sequential fold — both engines
  * evaluate list aggregation left-to-right, so double sums are
  * bit-identical), and every query ends in an ORDER BY over its output
  * columns.
  */
object PipelineQueries {

  def all: Seq[Q] = Seq(

    // Per-source quota sampling (source mixing): cap each source's
    // contribution at 10 documents, chosen in deterministic md5 order —
    // the "domain quota" pass every web-scale corpus applies so no
    // single crawl bucket dominates the mixture. One window shuffle
    // keyed by source; at 100 TB the same plan (the quota cut happens
    // inside the per-source sort, nothing global). md5(doc_id) is the
    // engine-portable deterministic shuffle both samplers already use.
    Q("sample_cap_per_source",
      """SELECT source, doc_id
        |FROM documents
        |QUALIFY row_number() OVER (PARTITION BY source
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 10
        |ORDER BY source, doc_id""") { (s, d) =>
      val w = Window.partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= 10)
        .select(col("source"), col("doc_id"))
        .orderBy(col("source"), col("doc_id"))
    },

    // Mixture-weighted corpus composition — the data-mixing step of a
    // pretraining pipeline: sources roll up into domains (web/books/
    // code), each domain contributes a FIXED quota of the 200-doc
    // budget (100/60/40 = the 0.5/0.3/0.2 mixture), and which docs fill
    // a quota is decided by the md5 order (deterministic on any cluster
    // size, stable under corpus growth within the non-sampled tail).
    // One window rank per domain over one domain-keyed shuffle — at
    // 100 TB the rank is per-domain-partition and the non-selected tail
    // never leaves the scan stage. Quotas are integer literals, not
    // float products, so both engines agree exactly.
    Q("pipeline_mix_sources",
      """WITH dom AS (SELECT doc_id, source,
        |    CASE WHEN CAST(substr(source, 4) AS INT) < 7 THEN 'web'
        |         WHEN CAST(substr(source, 4) AS INT) < 14 THEN 'books'
        |         ELSE 'code' END AS domain
        |  FROM documents)
        |SELECT domain, doc_id, source
        |FROM dom
        |QUALIFY row_number() OVER (PARTITION BY domain
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <=
        |  CASE domain WHEN 'web' THEN 100 WHEN 'books' THEN 60 ELSE 40 END
        |ORDER BY domain, doc_id""") { (s, d) =>
      val dom = Tables.documents(s, d)
        .withColumn("domain",
          when(expr("CAST(substr(source, 4) AS INT)") < 7, "web")
            .when(expr("CAST(substr(source, 4) AS INT)") < 14, "books")
            .otherwise("code"))
      val w = Window.partitionBy(col("domain"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      dom.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= when(col("domain") === "web", 100)
          .when(col("domain") === "books", 60).otherwise(40))
        .select(col("domain"), col("doc_id"), col("source"))
        .orderBy(col("domain"), col("doc_id"))
    },

    // Winsorization: clamp a value column to its per-group [p05, p95]
    // band — the outlier-capping pass robust feature pipelines apply
    // before normalization. Percentile bounds come from ONE exact-
    // percentile aggregation over the fact scan (at 100 TB: swap in the
    // mergeable approx_percentile, same join shape); the tiny per-group
    // bounds relation broadcast-joins back and the clamp is a pure map.
    // Decimal-quantized sums keep both engines' averages bit-identical.
    Q("text_winsorize",
      """WITH b AS (SELECT event_type,
        |    quantile_cont("value", 0.05) AS p05,
        |    quantile_cont("value", 0.95) AS p95
        |  FROM events GROUP BY 1)
        |SELECT e.event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN e."value" < b.p05 OR e."value" > b.p95
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_capped,
        |  round(CAST(sum(CAST(e."value" AS DECIMAL(18,4))) AS DOUBLE)
        |        / count(*), 4) AS avg_raw,
        |  round(CAST(sum(CAST(least(greatest(e."value", b.p05), b.p95)
        |        AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_capped
        |FROM events e JOIN b ON e.event_type = b.event_type
        |GROUP BY e.event_type
        |ORDER BY e.event_type""") { (s, d) =>
      val e = Tables.events(s, d)
      val b = e.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.05)").as("p05"),
          expr("percentile(value, 0.95)").as("p95"))
      e.join(broadcast(b), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") < col("p05") ||
            col("value") > col("p95"), 1).otherwise(0)).as("n_capped"),
          round(expr("CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE)") /
            count(lit(1)), 4).as("avg_raw"),
          round(expr(
            """CAST(sum(CAST(least(greatest(value, p05), p95)
              |AS DECIMAL(18,4))) AS DOUBLE)""".stripMargin) /
            count(lit(1)), 4).as("avg_capped"))
        .orderBy(col("event_type"))
    },

    // Inverted-index build (term → posting list) — the search-index side
    // of a corpus pipeline. One tokenize pass; (term, doc) dedup and the
    // posting aggregation are the same keyed shuffle. Posting lists are
    // emitted as a joined string: the operator's value is the grouped
    // sorted-list construction, and a string column hash-compares
    // identically in both engines (array columns render differently
    // between the parquet reader and DuckDB). At 100 TB the same plan
    // holds — postings shuffle once on term; the df >= 30 cut keeps the
    // hot stopword lists from dominating the output, exactly where a
    // real index build drops stopwords.
    Q("text_postings",
      """WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents)
        |SELECT term, CAST(count(*) AS BIGINT) AS df,
        |  array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings
        |FROM tok
        |GROUP BY term
        |HAVING count(*) >= 30
        |ORDER BY term""") { (s, d) =>
      // ONE shuffle: collect_set dedups (term, doc) inside the aggregate
      // (map-side partial sets combine), instead of a distinct shuffle
      // followed by a groupBy shuffle; df is the set's size.
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
        .groupBy(col("term"))
        .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) >= 30)
        .select(col("term"), size(col("ids")).cast("bigint").as("df"),
          array_join(col("ids"), ",").as("postings"))
        .orderBy(col("term"))
    },

    // Sequence packing: non-overlapping 32-token chunks packed into
    // 256-token training sequences ("bins") per source shard, in
    // (doc_id, chunk_idx) order — the step between chunking and batch
    // assembly in an LLM data pipeline. Bin assignment is the exclusive
    // running token total div capacity (contiguous packing with
    // overflow), a pure window computation: packing parallelizes per
    // shard (the window partitions by source), which is the 100 TB
    // discipline — never a global sequential pass.
    Q("pack_sequences",
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
        |c AS (SELECT doc_id, source, unnest(range(0, len(toks), 32)) AS start, toks
        |  FROM t),
        |k AS (SELECT doc_id, source, CAST(start // 32 AS INT) AS chunk_idx,
        |    len(list_slice(toks, start + 1, start + 32)) AS n
        |  FROM c),
        |b AS (SELECT source, doc_id, chunk_idx, n,
        |    coalesce(sum(n) OVER (PARTITION BY source ORDER BY doc_id, chunk_idx
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |  FROM k)
        |SELECT source, CAST(cum // 256 AS INT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(n) AS BIGINT) AS n_tokens,
        |  round(sum(n) / 256.0, 4) AS fill
        |FROM b
        |GROUP BY source, cum // 256
        |ORDER BY source, bin""") { (s, d) =>
      val chunks = Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"), col("source"), col("toks"),
          explode(expr("sequence(0, size(toks) - 1, 32)")).as("start"))
        .select(col("doc_id"), col("source"),
          expr("CAST(start div 32 AS INT)").as("chunk_idx"),
          expr("size(slice(toks, start + 1, 32))").as("n"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("doc_id"), col("chunk_idx"))
        .rowsBetween(Window.unboundedPreceding, -1)
      chunks
        .withColumn("cum", coalesce(sum(col("n")).over(w), lit(0L)))
        .withColumn("bin", expr("CAST(cum div 256 AS INT)"))
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_chunks"), sum(col("n")).as("n_tokens"),
          round(sum(col("n")) / 256.0, 4).as("fill"))
        .orderBy(col("source"), col("bin"))
    },

    // Median absolute deviation per group — the robust dispersion
    // statistic an outlier-tolerant quality gate uses where stddev is
    // skew-dominated. Two exact-percentile aggregations bridged by a
    // broadcast join of the 3-row median relation (never a shuffle of
    // the fact side for the second pass's key lookup).
    Q("agg_mad",
      """WITH m AS (SELECT l_returnflag, median(l_quantity) AS med
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag, round(any_value(m.med), 4) AS med,
        |  round(median(abs(l.l_quantity - m.med)), 4) AS mad
        |FROM lineitem l JOIN m ON l.l_returnflag = m.l_returnflag
        |GROUP BY l.l_returnflag
        |ORDER BY l.l_returnflag""") { (s, d) =>
      val li = Tables.lineitem(s, d)
      val med = li.groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("med"))
      li.join(broadcast(med), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(round(first(col("med")), 4).as("med"),
          round(expr("percentile(abs(l_quantity - med), 0.5)"), 4).as("mad"))
        .orderBy(col("l_returnflag"))
    },

    // zip_with / element-wise array algebra: per-row arrays combined
    // element-wise (max, product-sum) — the HOF surface a vector
    // pipeline leans on. Per-row sequential folds: double arithmetic is
    // order-deterministic in both engines. lineitem has no compact
    // unique key, so the output orders by the full composite.
    Q("arr_zip_funcs",
      """WITH t AS (SELECT l_orderkey, l_linenumber, l_partkey,
        |    l_extendedprice, l_quantity,
        |    [l_quantity, l_extendedprice, l_discount, l_tax] AS a,
        |    [l_tax, l_discount, l_extendedprice, l_quantity] AS b
        |  FROM lineitem WHERE l_orderkey < 100)
        |SELECT l_orderkey, l_linenumber, l_partkey,
        |  round(l_extendedprice, 4) AS price,
        |  round(list_sum(list_transform(range(1, 5), i -> greatest(a[i], b[i]))), 4) AS zmax_sum,
        |  round(list_sum(list_transform(range(1, 5), i -> a[i] * b[i])), 4) AS zprod_sum
        |FROM t
        |ORDER BY l_orderkey, l_linenumber, l_partkey, price, l_quantity""") { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 100)
        .withColumn("a", array(col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_tax")))
        .withColumn("b", array(col("l_tax"), col("l_discount"),
          col("l_extendedprice"), col("l_quantity")))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          round(col("l_extendedprice"), 4).as("price"),
          round(expr("aggregate(zip_with(a, b, (x, y) -> greatest(x, y)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"), 4).as("zmax_sum"),
          round(expr("aggregate(zip_with(a, b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"), 4).as("zprod_sum"),
          col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("price"), col("l_quantity"))
        .drop("l_quantity")
    },

    // explode_outer: the null-preserving generator — rows whose array is
    // empty (or null) survive as a single null-element row, where plain
    // explode would drop the parent row entirely. DuckDB's unnest has no
    // outer form; the twin substitutes [NULL] for the degenerate array,
    // which is exactly explode_outer's semantics.
    Q("arr_explode_outer",
      """WITH t AS (SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN []
        |         ELSE list_slice(string_split(text, ' '), 1, 2) END AS arr
        |  FROM documents WHERE doc_id < 100)
        |SELECT doc_id,
        |  unnest(CASE WHEN len(arr) = 0 THEN [CAST(NULL AS VARCHAR)] ELSE arr END) AS tok
        |FROM t
        |ORDER BY doc_id, tok NULLS FIRST""") { (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .withColumn("arr",
          when(col("doc_id") % 5 === 0, array().cast("array<string>"))
            .otherwise(slice(split(col("text"), " "), 1, 2)))
        .select(col("doc_id"), explode_outer(col("arr")).as("tok"))
        .orderBy(col("doc_id"), col("tok").asc_nulls_first)
    },

    // Time-series gap filling: the hourly event-count series per event
    // type, with MISSING hours materialized as rows (cnt = 0) and the
    // last observed hourly sum carried forward — the resample step
    // telemetry pipelines run before any rolling computation. The hour
    // spine is sequence+explode over the type's own [min, max] range (a
    // per-group generator, not a driver loop); the fill is one
    // last(_, ignoreNulls) window sweep. Spine ⋈ observed is an equi
    // join on (event_type, hour) — plain keyed shuffle at any scale.
    Q("ts_gapfill",
      """WITH obs AS (SELECT event_type,
        |    CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hr,
        |    count(*) AS cnt,
        |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS val_sum
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT event_type, min(hr) AS lo, max(hr) AS hi
        |  FROM obs GROUP BY 1),
        |spine AS (SELECT event_type, unnest(range(lo, hi + 1)) AS hr FROM bounds),
        |fill AS (SELECT s.event_type, s.hr,
        |    coalesce(o.cnt, 0) AS cnt,
        |    last_value(o.val_sum IGNORE NULLS) OVER (
        |      PARTITION BY s.event_type ORDER BY s.hr
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried
        |  FROM spine s LEFT JOIN obs o
        |    ON s.event_type = o.event_type AND s.hr = o.hr)
        |SELECT event_type, hr, CAST(cnt AS BIGINT) AS cnt,
        |  CAST(carried AS DOUBLE) AS carried
        |FROM fill
        |ORDER BY event_type, hr""") { (s, d) =>
      val obs = Tables.events(s, d)
        .groupBy(col("event_type"),
          expr("CAST(floor(unix_timestamp(ts) / 3600) AS BIGINT)").as("hr"))
        .agg(count(lit(1)).as("cnt"),
          expr("CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4))").as("val_sum"))
        // feeds both the spine bounds and the join probe — without this
        // the events scan + aggregation execute twice in one query
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val spine = obs.groupBy(col("event_type"))
        .agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
        .select(col("event_type"), explode(expr("sequence(lo, hi)")).as("hr"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(obs, Seq("event_type", "hr"), "left_outer")
        .select(col("event_type"), col("hr"),
          coalesce(col("cnt"), lit(0L)).as("cnt"),
          last(col("val_sum"), ignoreNulls = true).over(w)
            .cast("double").as("carried"))
        .orderBy(col("event_type"), col("hr"))
    },

    // One-pass data-quality audit — the constraint scan a pipeline runs
    // before promoting a batch: null/range/cross-column violations as
    // conditional aggregates of a single fact scan (partial-aggregable,
    // no shuffle beyond the 1-row combine), plus referential orphans as
    // a left anti join. The output is one row per rule: rule name,
    // violation count, violation rate.
    Q("dq_audit",
      """WITH n AS (SELECT count(*) AS total FROM lineitem),
        |scan AS (
        |  SELECT 'null_shipdate' AS rule,
        |      count(*) FILTER (WHERE l_shipdate IS NULL) AS viol FROM lineitem
        |  UNION ALL
        |  SELECT 'nonpositive_qty', count(*) FILTER (WHERE l_quantity <= 0) FROM lineitem
        |  UNION ALL
        |  SELECT 'discount_range', count(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.1) FROM lineitem
        |  UNION ALL
        |  SELECT 'shipdate_range', count(*) FILTER (WHERE l_shipdate < DATE '1992-01-01' OR l_shipdate > DATE '1998-12-31') FROM lineitem
        |  UNION ALL
        |  SELECT 'returnflag_domain', count(*) FILTER (WHERE l_returnflag NOT IN ('A', 'N', 'R')) FROM lineitem
        |  UNION ALL
        |  SELECT 'orphan_orderkey', count(*) FROM lineitem l
        |    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |SELECT rule, CAST(viol AS BIGINT) AS viol,
        |  round(CAST(viol AS DOUBLE) / n.total, 4) AS rate
        |FROM scan CROSS JOIN n
        |ORDER BY rule""") { (s, d) =>
      val li = Tables.lineitem(s, d)
      // Every rule — the five row-local checks AND the referential one —
      // rides a single pass: one left join against the orders key column
      // (o_orderkey is the orders PK, so row count is preserved and a
      // null right side IS the orphan flag), then one partial-aggregable
      // conditional aggregation. One scan of each table, one 1-row
      // combine.
      val wide = li
        .join(Tables.orders(s, d).select(col("o_orderkey")),
          col("l_orderkey") === col("o_orderkey"), "left_outer")
        .agg(
          count(when(col("l_shipdate").isNull, 1)).as("null_shipdate"),
          count(when(col("l_quantity") <= 0, 1)).as("nonpositive_qty"),
          count(when(col("l_discount") < 0 || col("l_discount") > 0.1, 1)).as("discount_range"),
          count(when(col("l_shipdate") < lit("1992-01-01").cast("date") ||
            col("l_shipdate") > lit("1998-12-31").cast("date"), 1)).as("shipdate_range"),
          count(when(!col("l_returnflag").isin("A", "N", "R"), 1)).as("returnflag_domain"),
          count(when(col("o_orderkey").isNull, 1)).as("orphan_orderkey"),
          count(lit(1)).as("__total"))
      wide.unpivot(
          Array(col("__total")),
          Array(col("null_shipdate"), col("nonpositive_qty"),
            col("discount_range"), col("shipdate_range"),
            col("returnflag_domain"), col("orphan_orderkey")),
          "rule", "viol")
        .select(col("rule"), col("viol"),
          round(col("viol").cast("double") / col("__total"), 4).as("rate"))
        .orderBy(col("rule"))
    },

    // Incremental dedup — the daily-increment shape: a new batch (docs
    // with doc_id ≥ 400; history is everything below) deduped against
    // the already-ingested history AND within itself, keeping only first
    // occurrences. The natural corpus carries few duplicates, so the
    // dedup semantics themselves are pinned by PipelineQueriesSpec's
    // planted-duplicate fixture (history kill + within-batch keep-first
    // + pass-through); the oracle parity run checks the relational
    // plumbing at both SFs. History
    // lookup is an anti join on the content hash (at 100 TB: the history
    // side is a bucketed hash table paid for once, or a bloom
    // pre-filter); within-batch dedup is the usual min-per-hash window.
    // The output is the batch's survivors — the rows the increment
    // actually adds to the corpus.
    Q("dedup_incremental",
      """WITH hist AS (SELECT DISTINCT md5(lower(trim(text))) AS h
        |  FROM documents WHERE doc_id < 400),
        |batch AS (SELECT doc_id, md5(lower(trim(text))) AS h
        |  FROM documents WHERE doc_id >= 400),
        |fresh AS (SELECT b.doc_id, b.h FROM batch b
        |  WHERE NOT EXISTS (SELECT 1 FROM hist x WHERE x.h = b.h)),
        |keep AS (SELECT doc_id, h,
        |    row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
        |  FROM fresh)
        |SELECT doc_id, h FROM keep WHERE rn = 1
        |ORDER BY doc_id""") { (s, d) =>
      val docs = Tables.documents(s, d)
        .withColumn("h", md5(lower(trim(col("text")))))
      val hist = docs.filter(col("doc_id") < 400).select(col("h")).distinct()
      val batch = docs.filter(col("doc_id") >= 400).select(col("doc_id"), col("h"))
      val w = Window.partitionBy(col("h")).orderBy(col("doc_id"))
      batch.join(hist, Seq("h"), "left_anti")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("h"))
        .orderBy(col("doc_id"))
    },

    // Key-skew profile — the diagnostic a pipeline runs BEFORE deciding
    // to salt a join (join_salted is the cure; this is the detection):
    // per-key frequencies, the hottest keys with their share of all
    // rows. The total rides a broadcast 1-row scalar (never a shuffle of
    // the profile); share = cnt/total is a single division per row, so
    // it is bit-identical across engines with no sum-order noise.
    Q("skew_profile",
      """WITH f AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
        |t AS (SELECT sum(cnt) AS total FROM f),
        |r AS (SELECT user_id, cnt,
        |    row_number() OVER (ORDER BY cnt DESC, user_id) AS rk
        |  FROM f)
        |SELECT CAST(rk AS INT) AS rk, user_id, CAST(cnt AS BIGINT) AS cnt,
        |  floor(cnt / total * 10000 + 0.5) / 10000.0 AS share
        |FROM r CROSS JOIN t
        |WHERE rk <= 5
        |ORDER BY rk""") { (s, d) =>
      val f = Tables.events(s, d)
        .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      val t = f.agg(sum(col("cnt")).as("total"))
      val w = Window.orderBy(col("cnt").desc, col("user_id"))
      f.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .crossJoin(broadcast(t))
        // floor-form quantization, not round(): engine round() tie rules
        // differ on quotients an ulp from a .xxxx5 boundary; floor of the
        // identical double product cannot (share ≥ 0).
        .select(col("rk").cast("int").as("rk"), col("user_id"), col("cnt"),
          (floor(col("cnt") / col("total") * 10000 + 0.5) / 10000.0).as("share"))
        .orderBy(col("rk"))
    },

    // Equi-depth histogram — the complement of agg_histogram's equi-WIDTH
    // buckets: four buckets holding (as near as possible) equal row
    // counts, via ntile semantics over a fully-tiebroken total order.
    // Rank-based bucketing dodges the cross-engine trap of comparing
    // rows against interpolated float boundaries (a 1-ulp percentile
    // difference can flip a boundary row's bucket); ntile is pure
    // integer arithmetic on row positions. The Spark side computes that
    // arithmetic DISTRIBUTED (Ranks.withNtile: range-repartition +
    // per-partition rank + offset rollup — no single-partition
    // WindowExec anywhere in the plan), so the raw-row relation never
    // funnels onto one core at any corpus size; the DuckDB oracle keeps
    // the literal ntile text, and hash parity proves the two forms
    // position-identical.
    Q("agg_histogram_eqdepth",
      """WITH t AS (SELECT l_extendedprice,
        |    ntile(4) OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber,
        |      l_partkey, l_quantity) AS bucket
        |  FROM lineitem WHERE l_partkey < 2000)
        |SELECT CAST(bucket AS INT) AS bucket, CAST(count(*) AS BIGINT) AS n,
        |  round(min(l_extendedprice), 4) AS lo,
        |  round(max(l_extendedprice), 4) AS hi
        |FROM t GROUP BY bucket
        |ORDER BY bucket""") { (s, d) =>
      val ord = Seq(col("l_extendedprice"), col("l_orderkey"),
        col("l_linenumber"), col("l_partkey"), col("l_quantity"))
      Ranks.withNtile(
          Tables.lineitem(s, d).filter(col("l_partkey") < 2000),
          ord, 4, "bucket")
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
          round(min(col("l_extendedprice")), 4).as("lo"),
          round(max(col("l_extendedprice")), 4).as("hi"))
        .select(col("bucket").cast("int").as("bucket"), col("n"),
          col("lo"), col("hi"))
        .orderBy(col("bucket"))
    },

    // Quality-weighted sampling: each document's keep probability scales
    // with its own quality signal (token count capped at 256 → rate in
    // [0.25, 0.75]) — the curriculum/downsampling step that keeps more
    // of the better data, as a deterministic per-row coin: two md5
    // nibbles of the doc key form a 1/256-granular uniform that is
    // reproducible, join-stable, and cluster-size-independent (the same
    // discipline as sample_stratified's fixed-rate coin; no engine RNG).
    // Zero shuffles before the output sort — the filter fuses into the
    // scan at any corpus size.
    Q("sample_weighted",
      """WITH t AS (SELECT doc_id, lang,
        |    0.25 + 0.5 * least(len(string_split(text, ' ')), 256) / 256.0 AS rate,
        |    ((strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 +
        |     (strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)) / 256.0 AS u
        |  FROM documents)
        |SELECT doc_id, lang, round(rate, 4) AS rate
        |FROM t WHERE u < rate
        |ORDER BY doc_id""") { (s, d) =>
      Tables.documents(s, d)
        .withColumn("rate",
          lit(0.25) + lit(0.5) * least(size(split(col("text"), " ")), lit(256)) / 256.0)
        .withColumn("u",
          ((expr("instr('0123456789abcdef', substring(md5(CAST(doc_id AS STRING)), 1, 1))") - 1) * 16 +
           (expr("instr('0123456789abcdef', substring(md5(CAST(doc_id AS STRING)), 2, 1))") - 1)) / 256.0)
        .filter(col("u") < col("rate"))
        .select(col("doc_id"), col("lang"), round(col("rate"), 4).as("rate"))
        .orderBy(col("doc_id"))
    },

    // Deterministic epoch shuffle: the training-data global reorder.
    // The shuffle key is md5(seed || doc_id) — changing the epoch seed
    // re-shuffles the corpus with zero configuration or stored state,
    // and the order is reproducible on any cluster size (the property
    // torn-run resumption needs). At 100 TB this is one range-
    // partitioned sort on the key; no window, no single-partition
    // stage — the ORDER BY itself IS the operator.
    Q("shuffle_epoch",
      """SELECT md5('epoch7-' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
        |  doc_id
        |FROM documents
        |ORDER BY shuffle_key, doc_id""") { (s, d) =>
      Tables.documents(s, d)
        .select(md5(concat(lit("epoch7-"), col("doc_id").cast("string")))
          .as("shuffle_key"), col("doc_id"))
        .orderBy(col("shuffle_key"), col("doc_id"))
    },

    // Deterministic train/val/test split: one md5 nibble of the doc key
    // partitions the corpus ~81/12.5/6.5 — disjoint, exhaustive,
    // reproducible, and stable under corpus growth (a doc's split never
    // changes when other docs arrive, unlike row_number-based splits).
    // The split is a scan-fused per-row expression; the only shuffle is
    // the report's 15-group aggregate.
    Q("split_train_val",
      """SELECT split, lang, CAST(count(*) AS BIGINT) AS docs
        |FROM (SELECT lang, CASE
        |    WHEN nib < 13 THEN 'train'
        |    WHEN nib < 15 THEN 'val'
        |    ELSE 'test' END AS split
        |  FROM (SELECT lang,
        |      strpos('0123456789abcdef',
        |        substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS nib
        |    FROM documents))
        |GROUP BY split, lang
        |ORDER BY split, lang""") { (s, d) =>
      Tables.documents(s, d)
        .withColumn("nib",
          expr("instr('0123456789abcdef', substring(md5(CAST(doc_id AS STRING)), 1, 1))") - 1)
        .withColumn("split",
          when(col("nib") < 13, "train")
            .when(col("nib") < 15, "val").otherwise("test"))
        .groupBy("split", "lang").agg(count(lit(1)).as("docs"))
        .orderBy("split", "lang")
    },

    // Signed random projection: 64-dim float embeddings reduced to 8
    // dims with a deterministic ±1 matrix derived from md5(i_j) — the
    // Johnson-Lindenstrauss reduction a 100 TB similarity pipeline runs
    // before indexing (Achlioptas, "Database-friendly random
    // projections", PODS'01). Pure per-row HOF arithmetic over a
    // broadcast 8-row axis relation: no shuffle before the output sort,
    // and the projection matrix is code, not data — nothing to ship.
    Q("sim_rp_project",
      """SELECT vec_id, CAST(r.j AS INT) AS j,
        |  round(list_sum(list_transform(range(1, 65),
        |    i -> CAST(embedding[i] AS DOUBLE) *
        |      CASE WHEN (strpos('0123456789abcdef',
        |          substring(md5(CAST(i AS VARCHAR) || '_' || CAST(r.j AS VARCHAR)), 1, 1)) - 1) % 2 = 1
        |        THEN 1.0 ELSE -1.0 END)), 4) + 0.0 AS y
        |FROM embeddings, range(0, 8) r(j)
        |ORDER BY vec_id, j""") { (s, d) =>
      // The ±1 matrix is a function of (i, j) only — compute the 512
      // signs ONCE driver-side (same md5 first-nibble rule the oracle
      // evaluates) and ship them as literal array columns on the 8-row
      // axis relation, instead of re-hashing 512 constant cells for
      // every embedding row.
      val md = java.security.MessageDigest.getInstance("MD5")
      def sign(i: Int, j: Int): Double = {
        val nib = (md.digest(s"${i}_$j".getBytes("UTF-8"))(0) >> 4) & 0xF
        if (nib % 2 == 1) 1.0 else -1.0
      }
      val axes = (0 until 8).map(j =>
        (j, (1 to 64).map(i => sign(i, j)).toArray))
      import s.implicits._
      val proj = axes.toDF("j", "signs")
      Tables.embeddings(s, d)
        .crossJoin(broadcast(proj))
        .select(col("vec_id"), col("j").cast("int").as("j"),
          (round(expr(
            """aggregate(sequence(1, 64), CAST(0.0 AS DOUBLE), (acc, i) ->
              |  acc + CAST(embedding[i-1] AS DOUBLE) * signs[i-1])""".stripMargin), 4) + 0.0).as("y"))
        .orderBy(col("vec_id"), col("j"))
    },

    // Deterministic negative sampling (contrastive-training prep): for
    // each urgent order, draw 4 catalog parts the order did NOT buy.
    // Candidates are md5-keyed pseudo-draws (10 per order — enough that
    // 4 always survive the positives anti-join at TPC-H basket sizes),
    // so the "random" sample is reproducible on any cluster size and
    // identical in both engines. Shape: per-row hash → anti-join on the
    // (order, part) positives key → two bounded windows (≤10 rows per
    // order) — the catalog bound rides a 1-row broadcast; nothing
    // scans the candidate×catalog space. 100 TB-safe.
    Q("pipe_negative_sample",
      """WITH mp AS (SELECT max(p_partkey) AS mp FROM part),
        |pos AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
        |cand AS (SELECT o_orderkey AS ok, j,
        |    1 + ('0x' || substr(md5(o_orderkey || ':' || j), 1, 12))::BIGINT % mp AS pk
        |  FROM orders, range(0, 10) r(j), mp
        |  WHERE o_orderpriority = '1-URGENT'),
        |an AS (SELECT c.ok, c.j, c.pk FROM cand c ANTI JOIN pos p USING (ok, pk)),
        |dd AS (SELECT *, row_number() OVER (PARTITION BY ok, pk ORDER BY j) AS dup
        |  FROM an),
        |rk AS (SELECT ok, pk, row_number() OVER (PARTITION BY ok ORDER BY j) AS rk
        |  FROM dd WHERE dup = 1)
        |SELECT ok AS o_orderkey, CAST(rk AS INT) AS rk, pk AS neg_partkey
        |FROM rk WHERE rk <= 4 ORDER BY o_orderkey, rk""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val mp = Tables.part(s, d).agg(max(col("p_partkey")).as("mp"))
      // NO distinct (r15): left-anti probes an existence set — the join
      // dedups by construction, and the distinct paid a full extra
      // exchange + aggregate over the fact table before the join.
      val pos = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      val cand = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("ok"))
        .crossJoin(broadcast(mp))
        .select(col("ok"), explode(sequence(lit(0), lit(9))).as("j"), col("mp"))
        .withColumn("pk", lit(1) +
          expr("CAST(conv(substr(md5(concat(CAST(ok AS STRING), ':', CAST(j AS STRING))), 1, 12), 16, 10) AS BIGINT)")
            % col("mp"))
      // dup-cut as a keyed MIN, not a row_number window: each j maps to
      // exactly one pk, so min(j) per (ok, pk) IS the dup=1 row and the
      // j values surviving per ok stay pairwise distinct (row_number
      // over them is unambiguous). Hash aggregate with map-side partials
      // replaces a full sort — same rows, same order, one less sort.
      cand.join(pos, Seq("ok", "pk"), "left_anti")
        .groupBy(col("ok"), col("pk")).agg(min(col("j")).as("j"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("ok")).orderBy(col("j"))))
        .filter(col("rk") <= 4)
        .select(col("ok").as("o_orderkey"), col("rk").cast("int").as("rk"),
          col("pk").as("neg_partkey"))
        .orderBy(col("o_orderkey"), col("rk"))
    },

    // Data-quality profile (the schema-health pass a pipeline runs
    // before training): per column of the widest table — row count,
    // null count, exact distinct count — unpivoted to one row per
    // column. ONE scan: the 11 exact count-distincts share a single
    // aggregate (Catalyst plans them via Expand — 11× the rows map-
    // side, still one shuffle, no per-column rescans), then the
    // constant-width result explodes to the profile relation. All
    // integer counts — exact in both engines. At 100 TB the Expand
    // fan-out is the standard cost of exact multi-column NDV; the
    // approx_count_distinct tier (agg_approx_distinct) is the
    // cheap-scan alternative already shipped.
    Q("dq_profile",
      """SELECT 'l_discount' AS col, count(*) AS n,
        |    CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
        |    count(DISTINCT l_discount) AS n_distinct FROM lineitem
        |UNION ALL SELECT 'l_extendedprice', count(*),
        |    CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT l_extendedprice) FROM lineitem
        |UNION ALL SELECT 'l_linenumber', count(*),
        |    CAST(sum(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT l_linenumber) FROM lineitem
        |UNION ALL SELECT 'l_linestatus', count(*),
        |    CAST(sum(CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT l_linestatus) FROM lineitem
        |UNION ALL SELECT 'l_orderkey', count(*),
        |    CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT l_orderkey) FROM lineitem
        |UNION ALL SELECT 'l_partkey', count(*),
        |    CAST(sum(CASE WHEN l_partkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT l_partkey) FROM lineitem
        |UNION ALL SELECT 'l_quantity', count(*),
        |    CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT l_quantity) FROM lineitem
        |UNION ALL SELECT 'l_returnflag', count(*),
        |    CAST(sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT l_returnflag) FROM lineitem
        |UNION ALL SELECT 'l_shipdate', count(*),
        |    CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT l_shipdate) FROM lineitem
        |UNION ALL SELECT 'l_suppkey', count(*),
        |    CAST(sum(CASE WHEN l_suppkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT l_suppkey) FROM lineitem
        |UNION ALL SELECT 'l_tax', count(*),
        |    CAST(sum(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    count(DISTINCT l_tax) FROM lineitem
        |ORDER BY col""") { (s, d) =>
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      val aggs = cols.flatMap(c => Seq(
        sum(when(col(c).isNull, 1).otherwise(0)).as(s"null_$c"),
        countDistinct(col(c)).as(s"dist_$c"))) :+ count(lit(1)).as("n")
      val one = Tables.lineitem(s, d).agg(aggs.head, aggs.tail: _*)
      one.select(explode(array(cols.map(c => struct(
          lit(c).as("col"), col("n"),
          col(s"null_$c").as("n_null"),
          col(s"dist_$c").as("n_distinct"))): _*)).as("x"))
        .select(col("x.col").as("col"), col("x.n").as("n"),
          col("x.n_null").as("n_null"), col("x.n_distinct").as("n_distinct"))
        .orderBy(col("col"))
    },

    // Feature hashing (the hashing trick, Weinberger et al. 2009):
    // tokens map to a fixed 256-bucket space through md5 — the
    // vocabulary-free featurizer whose output width is independent of
    // corpus size (no vocab table to build, ship, or keep in sync).
    // md5 gives identical buckets in both engines; counts are exact
    // ints. Shape: pure per-row hash + one (doc, bucket)-keyed
    // map-side-combinable rollup — embarrassingly parallel, the
    // cheapest featurizer shape there is at 100 TB.
    Q("pipe_feature_hash",
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |h AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 8))::BIGINT % 256 AS bucket FROM t)
        |SELECT doc_id, CAST(bucket AS INT) AS bucket, CAST(count(*) AS BIGINT) AS cnt
        |FROM h GROUP BY 1, 2 ORDER BY doc_id, bucket""") { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .select(col("doc_id"),
          expr("CAST(conv(substr(md5(w), 1, 8), 16, 10) AS BIGINT) % 256").as("bucket"))
        .groupBy(col("doc_id"), col("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("doc_id"), col("bucket").cast("int").as("bucket"), col("cnt"))
        .orderBy(col("doc_id"), col("bucket"))
    },

    // Quantile normalization across sources: each event type's score
    // distribution maps onto the POOLED distribution by rank (the
    // cross-shard score-calibration step before mixing ranked corpora —
    // a score's meaning becomes "its quantile", immune to per-source
    // scale drift). Both distributions collapse to DISTINCT-value
    // relations first; each source point's forward match (min pooled
    // value whose CDF ≥ the point's CDF) resolves by the union-merge
    // as-of idiom join_asof_fwd pins: one window over the merged
    // distinct-value relation, source rows before pooled rows at equal
    // CDF so an exact tie matches itself. Output is a per-type
    // certificate (value count, DECIMAL-quantized mean |shift|, max
    // shift) — bounded by |types|, never by rows.
    Q("norm_quantile",
      """WITH ev AS (SELECT event_type AS t, value AS v FROM events),
        |src AS (SELECT t, v, count(*) AS c FROM ev GROUP BY 1, 2),
        |st AS (SELECT t, CAST(sum(c) AS BIGINT) AS nt FROM src GROUP BY 1),
        |sf AS (SELECT src.t, v, c,
        |    sum(c) OVER (PARTITION BY src.t ORDER BY v) / CAST(nt AS DOUBLE) AS frac
        |  FROM src JOIN st ON st.t = src.t),
        |p AS (SELECT v AS vp, count(*) AS cp FROM ev GROUP BY 1),
        |tot AS (SELECT CAST(sum(cp) AS BIGINT) AS n FROM p),
        |pfr AS (SELECT vp,
        |    sum(cp) OVER (ORDER BY vp) / CAST(n AS DOUBLE) AS pf FROM p, tot),
        |nm AS (SELECT t, v, c,
        |    (SELECT min(vp) FROM pfr WHERE pf >= frac) AS norm FROM sf)
        |SELECT t AS event_type, CAST(count(*) AS BIGINT) AS n_vals,
        |  CAST(sum(c) AS BIGINT) AS n_rows,
        |  floor(CAST(sum(CAST(c * abs(norm - v) AS DECIMAL(28,12))) AS DOUBLE)
        |        / sum(c) * 10000 + 0.5) / 10000.0 AS mean_shift,
        |  round(max(abs(norm - v)), 4) AS max_shift
        |FROM nm GROUP BY t ORDER BY event_type""") { (s, d) =>
      val ev = Tables.events(s, d)
        .select(col("event_type").as("t"), col("value").as("v"))
      val src = ev.groupBy(col("t"), col("v")).agg(count(lit(1)).as("c"))
      val st = src.groupBy(col("t")).agg(sum(col("c")).as("nt"))
      val wSrc = Window.partitionBy(col("t")).orderBy(col("v"))
      val sf = src.join(st, Seq("t"))
        .withColumn("frac",
          sum(col("c")).over(wSrc) / col("nt").cast("double"))
      val p = ev.groupBy(col("v").as("vp")).agg(count(lit(1)).as("cp"))
      val tot = p.agg(sum(col("cp")).as("n"))
      val wP = Window.orderBy(col("vp"))
      val pfr = p.crossJoin(broadcast(tot))
        .withColumn("pf", sum(col("cp")).over(wP) / col("n").cast("double"))
        .select(col("vp"), col("pf"))
      // Forward as-of via union-merge: a single window ordered by
      // (cdf, tag) over the two DISTINCT-value relations (source points
      // tag 0 first, pooled tag 1 after, so pf == frac is eligible);
      // min-following pooled value = the forward match. The global
      // window runs over distinct-collapsed rows (the eval_lift /
      // eval_auc precedent), never the raw events.
      val merged = sf
        .select(col("t"), col("v"), col("c"), col("frac"),
          lit(null).cast("double").as("vp"), lit(0).as("tag"))
        .unionByName(pfr.select(
          lit(null).cast("string").as("t"), lit(null).cast("double").as("v"),
          lit(null).cast("long").as("c"), col("pf").as("frac"),
          col("vp"), lit(1).as("tag")))
      val wM = Window.orderBy(col("frac"), col("tag"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      merged
        .withColumn("norm", min(col("vp")).over(wM))
        .filter(col("tag") === 0)
        .groupBy(col("t").as("event_type"))
        .agg(count(lit(1)).as("n_vals"),
          sum(col("c")).as("n_rows"),
          expr("""CAST(floor(CAST(sum(CAST(c * abs(norm - v) AS DECIMAL(28,12))) AS DOUBLE)
                 |      / sum(c) * 10000 + 0.5) / 10000.0 AS DOUBLE)""".stripMargin)
            .as("mean_shift"),
          round(max(abs(col("norm") - col("v"))), 4).as("max_shift"))
        .orderBy(col("event_type"))
    },

    // CONTENT-ADDRESSED SHARD MANIFEST — per shard: row count, byte
    // volume, and a FINGERPRINT (md5 over the shard's sorted per-doc
    // content hashes). The manifest is what makes a pipeline
    // INCREMENTAL: re-run the corpus, diff fingerprints, reprocess
    // only shards whose digest moved (pipe_dataset_diff's row-level
    // diff, lifted to shard granularity where the scheduler works).
    // The order-sensitive digest is made deterministic by sorting the
    // hash list INSIDE each shard group before concatenation — an
    // 8-shard grouped sort of short strings, bounded per shard.
    Q("pipe_shard_manifest",
      """WITH h AS (SELECT
        |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2))::INT
        |      % 8 AS shard,
        |    md5(text) AS ch, length(text) AS b
        |  FROM documents),
        |m AS (SELECT shard, count(*) AS n_docs, sum(b) AS n_bytes,
        |    md5(string_agg(ch, '' ORDER BY ch)) AS fingerprint
        |  FROM h GROUP BY 1)
        |SELECT shard, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_bytes AS BIGINT) AS n_bytes, fingerprint
        |FROM m ORDER BY shard""") { (s, d) =>
      val h = Tables.documents(s, d).select(
        (expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 2), 16, 10) AS INT)")
          % 8).as("shard"),
        md5(col("text")).as("ch"), length(col("text")).as("b"))
      h.groupBy(col("shard"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("b")).cast("long").as("n_bytes"),
          md5(concat_ws("", sort_array(collect_list(col("ch")))))
            .as("fingerprint"))
        .orderBy(col("shard"))
    },

    // MINORITY-CLASS OVERSAMPLING PLAN — the deterministic rebalance
    // table a training pipeline applies before class-sensitive
    // finetuning: per language, an integer replication factor
    // ceil(max_class / class) capped at 4× (unbounded oversampling of
    // a tiny class just memorizes it), the post-rebalance counts, and
    // both share columns. Exact integer arithmetic throughout (ceil
    // division as (a + b − 1) div b); the class rollup is one hash
    // aggregate × a broadcast 1-row max — dimension-bounded at any
    // corpus size. The REALIZATION is a generator (explode over a
    // factor-length sequence) a loader applies per shard; this is the
    // audited plan.
    Q("pipe_oversample_minority",
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1),
        |m AS (SELECT max(n) AS maxn, sum(n) AS tot FROM c),
        |f AS (SELECT c.lang, c.n,
        |    CAST(least((m.maxn + c.n - 1) // c.n, 4) AS BIGINT) AS factor,
        |    m.tot
        |  FROM c CROSS JOIN m),
        |t AS (SELECT sum(n * factor) AS tot_after FROM f)
        |SELECT f.lang, f.n AS n_docs, f.factor,
        |  CAST(f.n * f.factor AS BIGINT) AS n_after,
        |  round(f.n / CAST(f.tot AS DOUBLE), 4) AS share_before,
        |  round(f.n * f.factor / CAST(t.tot_after AS DOUBLE), 4)
        |    AS share_after
        |FROM f CROSS JOIN t
        |ORDER BY f.lang""") { (s, d) =>
      val c = Tables.documents(s, d)
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      val m = c.agg(max(col("n")).as("maxn"), sum(col("n")).as("tot"))
      val f = c.crossJoin(broadcast(m))
        .select(col("lang"), col("n"),
          least(expr("(maxn + n - 1) div n"), lit(4L)).cast("long")
            .as("factor"),
          col("tot"))
      val t = f.agg(sum(col("n") * col("factor")).as("tot_after"))
      f.crossJoin(broadcast(t))
        .select(col("lang"), col("n").as("n_docs"), col("factor"),
          (col("n") * col("factor")).cast("long").as("n_after"),
          round(col("n") / col("tot").cast("double"), 4).as("share_before"),
          round(col("n") * col("factor") / col("tot_after").cast("double"), 4)
            .as("share_after"))
        .orderBy(col("lang"))
    },

    // GLOBAL TRAINING SHUFFLE — the deterministic corpus-wide
    // presentation order every epoch-0 training run needs: order =
    // global row_number over (md5(doc_id), doc_id). The md5 key makes
    // the order pseudo-random but reproducible (no engine RNG, rule
    // 12), join-stable, and independent of partitioning; the rank
    // itself is Ranks.withGlobalRowNumber — range-repartition on the
    // hash + per-partition row_number + a 32-row offset rollup — so
    // the "shuffle" never single-tasks the corpus (DETERMINISM.md
    // rule 20). The DuckDB oracle is the literal one-window form;
    // hash parity proves the distributed rank position-identical.
    Q("pipe_global_shuffle",
      """WITH r AS (SELECT doc_id,
        |    md5(CAST(doc_id AS VARCHAR)) AS h FROM documents)
        |SELECT doc_id,
        |  CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS ord
        |FROM r ORDER BY doc_id""") { (s, d) =>
      val r = Tables.documents(s, d)
        .select(col("doc_id"), md5(col("doc_id").cast("string")).as("h"))
      Ranks.withGlobalRowNumber(r, Seq(col("h"), col("doc_id")), "ord")
        .select(col("doc_id"), col("ord"))
        .orderBy(col("doc_id"))
    },

    // TOKEN-BUDGET SHARDING — contiguous training shards cut by
    // CUMULATIVE TOKEN COUNT (not doc count): walk the corpus in the
    // deterministic md5 shuffle order and start a new shard each time
    // the running token total crosses a 25k-token budget; a doc
    // belongs to the shard its FIRST token lands in ((cum − tok) div
    // budget — greedy sequential packing, the unit of work a data
    // loader actually streams). The running sum is
    // Ranks.withRankAndCumSum — per-partition cumsum + a 32-row sum
    // offset rollup in exact LONG arithmetic — never an unpartitioned
    // running-sum window; the oracle keeps the literal
    // sum() OVER (ORDER BY ...) text. Output is the shard manifest
    // (docs, tokens) — exact integers.
    Q("pipe_token_budget_split",
      """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS tok,
        |    md5(CAST(doc_id AS VARCHAR)) AS h FROM documents),
        |w AS (SELECT doc_id, tok,
        |    sum(tok) OVER (ORDER BY h, doc_id) AS cum FROM t)
        |SELECT CAST((cum - tok) // 25000 AS INT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(tok) AS BIGINT) AS n_tokens
        |FROM w GROUP BY 1 ORDER BY shard""") { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("tok"),
          md5(col("doc_id").cast("string")).as("h"))
      Ranks.withRankAndCumSum(t, Seq(col("h"), col("doc_id")), col("tok"),
          "rk", "cum", "tot", "nn")
        .select(expr("CAST((cum - tok) div 25000 AS INT)").as("shard"),
          col("tok"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("tok")).cast("long").as("n_tokens"))
        .orderBy(col("shard"))
    },

    // FILTER ABLATION over the quality-gate rule stack — for each rule
    // (lang, too_short, low_stopword, repetitive): how many docs it
    // flags, and how many it SOLELY rejects (n_flags = 1) — the number
    // that answers "what does dropping this filter buy back?". Same
    // per-row signals as pipeline_quality_gate, one boolean rollup;
    // rule rows come from a 4-way sum over the flag columns, so the
    // corpus is scanned once and shuffled once at any SF.
    Q("pipe_filter_ablation",
      """WITH t AS (SELECT doc_id, lang,
        |    string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id,
        |    CASE WHEN lang <> 'en' THEN 1 ELSE 0 END AS f_lang,
        |    CASE WHEN len(toks) < 20 THEN 1 ELSE 0 END AS f_short,
        |    CASE WHEN CAST(len(list_filter(toks,
        |        x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
        |        / len(toks) < 0.02 THEN 1 ELSE 0 END AS f_stop,
        |    CASE WHEN CAST(list_max(list_transform(list_distinct(toks),
        |        x -> len(list_filter(toks, y -> y = x)))) AS DOUBLE)
        |        / len(toks) > 0.15 THEN 1 ELSE 0 END AS f_rep
        |  FROM t),
        |n AS (SELECT *, f_lang + f_short + f_stop + f_rep AS nf FROM s),
        |r AS (
        |  SELECT 'lang' AS rule, sum(f_lang) AS n_flagged,
        |    sum(CASE WHEN f_lang = 1 AND nf = 1 THEN 1 ELSE 0 END)
        |      AS n_sole, count(*) AS n FROM n
        |  UNION ALL SELECT 'low_stopword', sum(f_stop),
        |    sum(CASE WHEN f_stop = 1 AND nf = 1 THEN 1 ELSE 0 END),
        |    count(*) FROM n
        |  UNION ALL SELECT 'repetitive', sum(f_rep),
        |    sum(CASE WHEN f_rep = 1 AND nf = 1 THEN 1 ELSE 0 END),
        |    count(*) FROM n
        |  UNION ALL SELECT 'too_short', sum(f_short),
        |    sum(CASE WHEN f_short = 1 AND nf = 1 THEN 1 ELSE 0 END),
        |    count(*) FROM n)
        |SELECT rule, CAST(n_flagged AS BIGINT) AS n_flagged,
        |  CAST(n_sole AS BIGINT) AS n_sole_reject,
        |  round(n_flagged / CAST(n AS DOUBLE), 4) AS frac_flagged
        |FROM r ORDER BY rule""") { (s, d) =>
      val sig = Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          when(col("lang") =!= "en", 1).otherwise(0).as("f_lang"),
          when(size(col("toks")) < 20, 1).otherwise(0).as("f_short"),
          when(expr("""CAST(size(filter(toks,
              |x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)"""
              .stripMargin) / size(col("toks")) < 0.02, 1)
            .otherwise(0).as("f_stop"),
          when(expr("""CAST(array_max(transform(array_distinct(toks),
              |x -> size(filter(toks, y -> y = x)))) AS DOUBLE)"""
              .stripMargin) / size(col("toks")) > 0.15, 1)
            .otherwise(0).as("f_rep"))
        .withColumn("nf",
          col("f_lang") + col("f_short") + col("f_stop") + col("f_rep"))
      // ONE aggregate emits all 12 measures (2 per rule + the count),
      // then a 4-row stack() unpivots — the corpus really is tokenized
      // and scanned once (the union-of-4-aggregates form recomputed the
      // per-token lambda signals 4×).
      def sole(f: String) =
        sum(when(col(f) === 1 && col("nf") === 1, 1).otherwise(0))
      sig.agg(
          sum(col("f_lang")).as("fl"), sole("f_lang").as("sl"),
          sum(col("f_stop")).as("fs"), sole("f_stop").as("ss"),
          sum(col("f_rep")).as("fr"), sole("f_rep").as("sr"),
          sum(col("f_short")).as("fh"), sole("f_short").as("sh"),
          count(lit(1)).as("n"))
        .select(expr("""stack(4,
            |  'lang', fl, sl,
            |  'low_stopword', fs, ss,
            |  'repetitive', fr, sr,
            |  'too_short', fh, sh) AS (rule, n_flagged, n_sole)"""
            .stripMargin), col("n"))
        .select(col("rule"), col("n_flagged").cast("long").as("n_flagged"),
          col("n_sole").cast("long").as("n_sole_reject"),
          round(col("n_flagged") / col("n").cast("double"), 4)
            .as("frac_flagged"))
        .orderBy(col("rule"))
    },

    // MIN-MAX scaling per group — the third normalizer of the family
    // (quantile → distribution match, robust → median/IQR, minmax →
    // [0,1] range): per event type the exact (min, max) frame and the
    // scaled-value distribution summary. The per-group extrema are a
    // 5-row broadcast back onto the fact, so the fact is scanned twice
    // and shuffled once; (x − min)/(max − min) runs on identical
    // doubles in both engines (extrema are exact), nullif guards the
    // constant-group case with NULL in both.
    Q("norm_minmax",
      """WITH st AS (SELECT event_type AS t, min("value") AS mn,
        |    max("value") AS mx FROM events GROUP BY 1),
        |sc AS (SELECT st.t, ("value" - mn) / nullif(mx - mn, 0) AS z
        |  FROM events JOIN st ON st.t = events.event_type)
        |SELECT sc.t AS event_type, CAST(count(*) AS BIGINT) AS n,
        |  round(max(st2.mn), 4) AS v_min, round(max(st2.mx), 4) AS v_max,
        |  floor(CAST(sum(CAST(z AS DECIMAL(28,12))) AS DOUBLE)
        |    / count(*) * 10000 + 0.5) / 10000.0 AS scaled_mean,
        |  CAST(sum(CASE WHEN z < 0.1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_low_decile
        |FROM sc JOIN st st2 ON st2.t = sc.t
        |GROUP BY sc.t ORDER BY event_type""") { (s, d) =>
      val st = Tables.events(s, d)
        .groupBy(col("event_type").as("t"))
        .agg(min(col("value")).as("mn"), max(col("value")).as("mx"))
      val sc = Tables.events(s, d)
        .join(broadcast(st), col("t") === col("event_type"))
        .select(col("t"), col("mn"), col("mx"),
          ((col("value") - col("mn")) /
            nullif(col("mx") - col("mn"), lit(0d))).as("z"))
      sc.groupBy(col("t"))
        .agg(count(lit(1)).cast("long").as("n"),
          round(max(col("mn")), 4).as("v_min"),
          round(max(col("mx")), 4).as("v_max"),
          expr("""CAST(floor(CAST(sum(CAST(z AS DECIMAL(28,12))) AS DOUBLE)
                 |  / count(1) * 10000 + 0.5) / 10000.0 AS DOUBLE)"""
            .stripMargin).as("scaled_mean"),
          sum(when(col("z") < 0.1, 1).otherwise(0)).cast("long")
            .as("n_low_decile"))
        .select(col("t").as("event_type"), col("n"), col("v_min"),
          col("v_max"), col("scaled_mean"), col("n_low_decile"))
        .orderBy(col("event_type"))
    },

    // Robust (median/IQR) scaling summary per group: exact interpolated
    // quartiles, the Tukey 1.5·IQR outlier census, and the fences — the
    // feature-normalization profile a training pipeline computes before
    // winsorizing. The quartile aggregate collapses the fact once; the
    // census joins the 5-row quartile frame back broadcast, so the fact
    // is scanned exactly twice and shuffled once at any SF.
    Q("norm_robust",
      """WITH q AS (SELECT event_type,
        |    quantile_cont(value, 0.25) AS q1,
        |    quantile_cont(value, 0.50) AS med,
        |    quantile_cont(value, 0.75) AS q3
        |  FROM events GROUP BY 1)
        |SELECT e.event_type,
        |  round(med, 4) AS med,
        |  round(q3 - q1, 4) AS iqr,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN e.value < q1 - 1.5 * (q3 - q1)
        |       OR e.value > q3 + 1.5 * (q3 - q1) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM events e JOIN q ON e.event_type = q.event_type
        |GROUP BY e.event_type, med, q1, q3
        |ORDER BY e.event_type""") { (s, d) =>
      val ev = Tables.events(s, d)
      val q = ev.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.25)").as("q1"),
          expr("percentile(value, 0.50)").as("med"),
          expr("percentile(value, 0.75)").as("q3"))
      ev.join(broadcast(q), Seq("event_type"))
        .groupBy(col("event_type"), col("med"), col("q1"), col("q3"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") < col("q1") - lit(1.5) * (col("q3") - col("q1")) ||
            col("value") > col("q3") + lit(1.5) * (col("q3") - col("q1")), 1)
            .otherwise(0)).as("n_outliers"))
        .select(col("event_type"), round(col("med"), 4).as("med"),
          round(col("q3") - col("q1"), 4).as("iqr"),
          col("n"), col("n_outliers"))
        .orderBy(col("event_type"))
    },

    // Entity-resolution blocking + pairwise edit-distance match: part
    // names block on their first token and candidate pairs form ONLY
    // within a block — but the pairwise DP runs on the DISTINCT-name
    // relation weighted by name multiplicity, never on fact rows. A
    // row-pair rollup over a block is exactly recoverable from the
    // name-pair rollup: cross-name pairs contribute cnt_a·cnt_b, the
    // same-name diagonal contributes C(cnt,2) pairs at distance 0. So
    // the edit-distance work is Σ block² over the name VOCABULARY
    // (constant in data size), while the per-block pair counts still
    // describe the full fact table — the only shape that survives
    // 100× data, where row-level Σ block² grows quadratically. A cheap
    // length-difference prefilter skips the DP for hopeless pairs.
    Q("er_blocking",
      """WITH n AS (SELECT string_split(p_name, ' ')[1] AS blk, p_name,
        |    CAST(count(*) AS BIGINT) AS cnt FROM part GROUP BY 1, 2),
        |pr AS (SELECT a.blk, a.cnt * b.cnt AS pairs,
        |    CASE WHEN abs(length(a.p_name) - length(b.p_name)) <= 10
        |      THEN levenshtein(a.p_name, b.p_name) END AS dist
        |  FROM n a JOIN n b
        |    ON a.blk = b.blk AND a.p_name < b.p_name
        |  UNION ALL
        |  SELECT blk, cnt * (cnt - 1) // 2 AS pairs, 0 AS dist
        |  FROM n WHERE cnt >= 2)
        |SELECT blk, CAST(sum(pairs) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN dist <= 10 THEN pairs ELSE 0 END) AS BIGINT)
        |    AS n_matches,
        |  CAST(min(dist) AS BIGINT) AS min_dist
        |FROM pr GROUP BY blk ORDER BY blk""") { (s, d) =>
      val n = Tables.part(s, d)
        .groupBy(split(col("p_name"), " ").getItem(0).as("blk"), col("p_name"))
        .agg(count(lit(1)).as("cnt"))
      val cross = n.as("a").join(n.as("b"),
          col("a.blk") === col("b.blk") && col("a.p_name") < col("b.p_name"))
        .select(col("a.blk").as("blk"),
          (col("a.cnt") * col("b.cnt")).as("pairs"),
          when(abs(length(col("a.p_name")) - length(col("b.p_name"))) <= 10,
            levenshtein(col("a.p_name"), col("b.p_name"))).as("dist"))
      val diag = n.filter(col("cnt") >= 2)
        .select(col("blk"), expr("cnt * (cnt - 1) div 2").as("pairs"),
          lit(0).as("dist"))
      cross.unionByName(diag)
        .groupBy(col("blk"))
        .agg(sum(col("pairs")).as("n_pairs"),
          sum(when(col("dist") <= 10, col("pairs")).otherwise(0))
            .as("n_matches"),
          min(col("dist")).as("min_dist"))
        .orderBy(col("blk"))
    },

    // Fuzzy linkage with JARO-WINKLER scoring — the record-linkage
    // scorer (Winkler 1990) that er_blocking's Levenshtein cannot
    // replace: JW rewards shared prefixes and normalizes to [0,1], so
    // one threshold works across name lengths. Spark has no Jaro
    // builtin — the scorer is this engine's codegen'd Catalyst
    // expression (functions/JaroWinkler.scala, one invokestatic inside
    // the WholeStageCodegen loop), pinned numerically to DuckDB's
    // jaro_winkler_similarity incl. integer transposition halving and
    // the 0.7 boost threshold. Same vocabulary-blocked scale shape as
    // er_blocking: JW runs once per DISTINCT-name pair within a
    // first-token block, weighted back to row-pair counts by name
    // multiplicity (same-name diagonal pairs are JW = 1 by identity);
    // both engines round to 4 decimals BEFORE thresholding so the
    // match-count comparison is ulp-robust.
    Q("link_jw_names",
      """WITH n AS (SELECT string_split(p_name, ' ')[1] AS blk, p_name,
        |    CAST(count(*) AS BIGINT) AS cnt FROM part GROUP BY 1, 2),
        |pr AS (SELECT a.blk, a.cnt * b.cnt AS pairs,
        |    round(jaro_winkler_similarity(a.p_name, b.p_name), 4) AS jw
        |  FROM n a JOIN n b
        |    ON a.blk = b.blk AND a.p_name < b.p_name
        |  UNION ALL
        |  SELECT blk, cnt * (cnt - 1) // 2 AS pairs, 1.0 AS jw
        |  FROM n WHERE cnt >= 2)
        |SELECT blk, CAST(sum(pairs) AS BIGINT) AS n_pairs,
        |  CAST(sum(CASE WHEN jw >= 0.92 THEN pairs ELSE 0 END) AS BIGINT)
        |    AS n_close,
        |  round(max(jw), 4) AS best_jw
        |FROM pr GROUP BY blk ORDER BY blk""") { (s, d) =>
      import graft.functions.GraftFunctions.jaro_winkler
      val n = Tables.part(s, d)
        .groupBy(split(col("p_name"), " ").getItem(0).as("blk"), col("p_name"))
        .agg(count(lit(1)).as("cnt"))
      val cross = n.as("a").join(n.as("b"),
          col("a.blk") === col("b.blk") && col("a.p_name") < col("b.p_name"))
        .select(col("a.blk").as("blk"),
          (col("a.cnt") * col("b.cnt")).as("pairs"),
          round(jaro_winkler(col("a.p_name"), col("b.p_name")), 4).as("jw"))
      val diag = n.filter(col("cnt") >= 2)
        .select(col("blk"), expr("cnt * (cnt - 1) div 2").as("pairs"),
          lit(1.0).as("jw"))
      cross.unionByName(diag)
        .groupBy(col("blk"))
        .agg(sum(col("pairs")).as("n_pairs"),
          sum(when(col("jw") >= 0.92, col("pairs")).otherwise(0)).as("n_close"),
          round(max(col("jw")), 4).as("best_jw"))
        .orderBy(col("blk"))
    },

    // GOLDEN RECORD construction — the end of the entity-resolution
    // pipeline er_blocking starts: match pairs (same block, Levenshtein
    // ≤ 10) become edges, connected components resolve transitive
    // matches into entities (the same large-star/small-star contraction
    // the dedup family uses — O(log n) rounds, no driver graph), and
    // each entity fuses one canonical record: longest name (ties →
    // lexicographic max — deterministic without a sort of members) and
    // the best (min) price across members. The oracle reaches identical
    // clusters by recursive transitive closure. At 100 TB the match
    // join and contraction run on the name VOCABULARY (distances never
    // touch the fact table — see the in-body note), and the fuse step
    // is two keyed rollups over the facts.
    Q("er_golden_record",
      """WITH RECURSIVE p0 AS (SELECT p_partkey AS id, p_name, p_retailprice,
        |    string_split(p_name, ' ')[1] AS blk FROM part),
        |e AS (SELECT a.id AS v, b.id AS u FROM p0 a JOIN p0 b
        |  ON a.blk = b.blk AND a.id < b.id
        |    AND abs(length(a.p_name) - length(b.p_name)) <= 10
        |    AND levenshtein(a.p_name, b.p_name) <= 10),
        |sym AS (SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e),
        |reach(u, v) AS (
        |  SELECT id, id FROM p0
        |  UNION
        |  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
        |lab AS (SELECT u AS id, min(v) AS cluster_rep FROM reach GROUP BY 1),
        |m AS (SELECT lab.cluster_rep, p0.id, p0.p_name, p0.p_retailprice
        |  FROM lab JOIN p0 USING (id)),
        |g AS (SELECT cluster_rep, CAST(count(*) AS BIGINT) AS n_members,
        |    max(length(p_name)) AS ml,
        |    round(min(p_retailprice), 4) AS best_price FROM m GROUP BY 1)
        |SELECT g.cluster_rep, g.n_members,
        |  max(CASE WHEN length(m.p_name) = g.ml THEN m.p_name END) AS canon_name,
        |  g.best_price
        |FROM g JOIN m ON m.cluster_rep = g.cluster_rep
        |GROUP BY g.cluster_rep, g.n_members, g.best_price
        |ORDER BY g.cluster_rep""") { (s0, d) =>
      val s = graft.Sessions.withShufflePartitions(s0, 8)
      val p0 = Tables.part(s, d)
        .select(col("p_partkey").as("id"), col("p_name"), col("p_retailprice"),
          split(col("p_name"), " ").getItem(0).as("blk"))
      // Matching + CC run on the DISTINCT-NAME relation, not the fact
      // table: two same-named parts are always an edge (lev = 0), so
      // part-level components are exactly name-level components
      // expanded — and with each name's node id = min(part id) of that
      // name, the name-component min IS the part-component min, i.e.
      // cluster_rep is unchanged. Edit distance work drops from
      // Σ block² over ROWS (quadratic in data, the 100×-scale killer)
      // to Σ block² over the name VOCABULARY (constant in data); the
      // 3-arg levenshtein(a, b, 10) band abandons hopeless DPs early.
      val nm = p0.groupBy(col("p_name"), col("blk"))
        .agg(min(col("id")).as("nid"))
      val ne = nm.as("a").join(nm.as("b"),
          col("a.blk") === col("b.blk") && col("a.nid") < col("b.nid") &&
            abs(length(col("a.p_name")) - length(col("b.p_name"))) <= 10 &&
            levenshtein(col("a.p_name"), col("b.p_name"), 10) >= 0)
        .select(col("b.nid").as("u"), col("a.nid").as("v")) // v < u
        .localCheckpoint(true)
      val labels = ClusterQueries.starLabels(ne)
      val nameRep = nm
        .join(labels.withColumnRenamed("doc_id", "nid"), Seq("nid"), "left_outer")
        .select(col("p_name"),
          coalesce(col("rep"), col("nid")).as("cluster_rep"))
      // Vocabulary-sized label map broadcasts back onto the fact table.
      val all = p0.join(broadcast(nameRep), Seq("p_name"))
        .select(col("id"), col("cluster_rep"), col("p_name"),
          col("p_retailprice"))
      val g = all.groupBy(col("cluster_rep"))
        .agg(count(lit(1)).as("n_members"),
          max(length(col("p_name"))).as("ml"),
          round(min(col("p_retailprice")), 4).as("best_price"))
      all.join(g, Seq("cluster_rep"))
        .groupBy(col("cluster_rep"), col("n_members"), col("best_price"))
        .agg(max(when(length(col("p_name")) === col("ml"), col("p_name")))
          .as("canon_name"))
        .select(col("cluster_rep"), col("n_members"), col("canon_name"),
          col("best_price"))
        .orderBy(col("cluster_rep"))
    },

    // Tokenizer-vocabulary COVERAGE audit: given the top-50 corpus
    // vocabulary (by frequency, term-lexicographic tie-break — the
    // deterministic cut text_vocab_encode also uses), measure per doc
    // how much of it the vocab covers — token OOV rate and distinct-
    // type OOV rate. This is the check run before freezing a tokenizer:
    // a vocab whose OOV rate is high on a target source will shred that
    // source into unknowns. Corpus work = one term rollup (the vocab,
    // broadcast back) + one doc-keyed rollup; integers until the final
    // ratios.
    Q("pipe_tokenizer_coverage",
      """WITH tw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |v AS (SELECT w FROM (SELECT w, count(*) AS c FROM tw GROUP BY 1)
        |  ORDER BY c DESC, w LIMIT 50),
        |f AS (SELECT tw.doc_id, tw.w,
        |    CASE WHEN v.w IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM tw LEFT JOIN v ON v.w = tw.w)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(oov) AS BIGINT) AS n_oov,
        |  round(sum(oov) / CAST(count(*) AS DOUBLE), 4) AS oov_rate,
        |  round(count(DISTINCT CASE WHEN oov = 1 THEN w END)
        |    / CAST(count(DISTINCT w) AS DOUBLE), 4) AS type_oov_rate
        |FROM f GROUP BY doc_id ORDER BY doc_id""") { (s, d) =>
      val tw = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val v = tw.groupBy(col("w")).agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w")).limit(50)
        .select(col("w"), lit(1).as("in_vocab"))
      tw.join(broadcast(v), Seq("w"), "left_outer")
        .select(col("doc_id"), col("w"),
          when(col("in_vocab").isNull, 1).otherwise(0).as("oov"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(col("oov")).as("n_oov"),
          round(sum(col("oov")) / count(lit(1)).cast("double"), 4)
            .as("oov_rate"),
          round(countDistinct(when(col("oov") === 1, col("w"))) /
            countDistinct(col("w")).cast("double"), 4).as("type_oov_rate"))
        .orderBy(col("doc_id"))
    },

    // CROSS-FIELD value-consistency audit — the sibling of
    // dq_referential that checks VALUES, not keys: recompute each
    // order's total from its lineitems (extendedprice·(1−discount)·
    // (1+tax), each term quantized DECIMAL(18,4) before the exact
    // per-order sum) and measure disagreement with the stored
    // o_totalprice per order status. On a consistent warehouse the
    // mismatch rate is 0; here it measures the synthetic generator's
    // (deliberate) independence — either way the audit is exact and
    // deterministic. One lineitem rollup + one order join, integers/
    // DECIMAL throughout until the final ratios.
    Q("dq_cross_field",
      """WITH lr AS (SELECT l_orderkey,
        |    sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
        |      AS DECIMAL(18,4))) AS recomputed
        |  FROM lineitem GROUP BY 1),
        |j AS (SELECT o.o_orderstatus,
        |    abs(CAST(lr.recomputed AS DOUBLE) - o.o_totalprice) AS adiff
        |  FROM orders o JOIN lr ON lr.l_orderkey = o.o_orderkey)
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CASE WHEN adiff > 0.01 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_mismatch,
        |  round(max(adiff), 2) AS max_abs_diff,
        |  round(CAST(sum(CAST(adiff AS DECIMAL(18,4))) AS DOUBLE)
        |    / count(*), 2) AS avg_abs_diff
        |FROM j GROUP BY 1 ORDER BY o_orderstatus""") { (s, d) =>
      val lr = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))).cast("decimal(18,4)")).as("recomputed"))
      Tables.orders(s, d)
        .join(lr, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderstatus"),
          abs(col("recomputed").cast("double") - col("o_totalprice"))
            .as("adiff"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(when(col("adiff") > 0.01, 1).otherwise(0)).as("n_mismatch"),
          round(max(col("adiff")), 2).as("max_abs_diff"),
          round(sum(col("adiff").cast("decimal(18,4)")).cast("double") /
            count(lit(1)), 2).as("avg_abs_diff"))
        .orderBy(col("o_orderstatus"))
    },

    // DATASET SNAPSHOT DIFF — the data-versioning audit between two
    // corpus snapshots: per source, how many documents were added,
    // removed, changed, or untouched. Snapshot B derives
    // deterministically from A inside the query (every 10th doc
    // removed, every 7th edited, every 13th cloned to a new id) so both
    // engines diff the identical pair; in production B is simply the
    // next day's table. The diff itself is the scale shape that
    // matters: ONE full-outer join on doc_id comparing md5 content
    // digests — no row content ever leaves its partition except as a
    // 16-byte hash.
    Q("pipe_dataset_diff",
      """WITH a AS (SELECT doc_id, source, md5(text) AS h FROM documents),
        |b AS (
        |  SELECT doc_id, source,
        |    CASE WHEN doc_id % 7 = 2 THEN md5(text || ' changed')
        |         ELSE md5(text) END AS h
        |  FROM documents WHERE doc_id % 10 <> 3
        |  UNION ALL
        |  SELECT doc_id + 1000000, source, md5(text || ' new')
        |  FROM documents WHERE doc_id % 13 = 5),
        |d AS (SELECT coalesce(a.source, b.source) AS source,
        |    CASE WHEN a.doc_id IS NULL THEN 'added'
        |         WHEN b.doc_id IS NULL THEN 'removed'
        |         WHEN a.h <> b.h THEN 'changed'
        |         ELSE 'unchanged' END AS st
        |  FROM a FULL JOIN b ON a.doc_id = b.doc_id)
        |SELECT source,
        |  CAST(sum(CASE WHEN st = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
        |  CAST(sum(CASE WHEN st = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
        |  CAST(sum(CASE WHEN st = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
        |  CAST(sum(CASE WHEN st = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
        |FROM d GROUP BY source ORDER BY source""") { (s, d) =>
      val docs = Tables.documents(s, d)
      val a = docs.select(col("doc_id"), col("source"), md5(col("text")).as("h"))
      val b = docs.filter(col("doc_id") % 10 =!= 3)
        .select(col("doc_id"), col("source"),
          when(col("doc_id") % 7 === 2, md5(concat(col("text"), lit(" changed"))))
            .otherwise(md5(col("text"))).as("h"))
        .unionByName(docs.filter(col("doc_id") % 13 === 5)
          .select((col("doc_id") + 1000000).as("doc_id"), col("source"),
            md5(concat(col("text"), lit(" new"))).as("h")))
      a.as("a").join(b.as("b"), col("a.doc_id") === col("b.doc_id"), "full_outer")
        .select(coalesce(col("a.source"), col("b.source")).as("source"),
          when(col("a.doc_id").isNull, "added")
            .when(col("b.doc_id").isNull, "removed")
            .when(col("a.h") =!= col("b.h"), "changed")
            .otherwise("unchanged").as("st"))
        .groupBy(col("source"))
        .agg(sum(when(col("st") === "added", 1).otherwise(0)).as("n_added"),
          sum(when(col("st") === "removed", 1).otherwise(0)).as("n_removed"),
          sum(when(col("st") === "changed", 1).otherwise(0)).as("n_changed"),
          sum(when(col("st") === "unchanged", 1).otherwise(0)).as("n_unchanged"))
        .orderBy(col("source"))
    },

    // K-ANONYMITY audit (Sweeney 2002) over a quasi-identifier tuple —
    // the privacy gate run before releasing or training on tabular
    // data: group orders by the QI (customer nation, order priority,
    // order week), then for each k ∈ {2, 5, 10} report how many
    // equivalence classes and rows fall below k — rows in small classes
    // are the re-identifiable ones. One QI rollup (the only
    // corpus-scale shuffle) + a 3-row threshold grid over the
    // class-size relation; all-integer until the final rate.
    Q("pipe_privacy_kanon",
      """WITH q AS (SELECT c.c_nationkey AS nat, o.o_orderpriority AS pri,
        |    date_trunc('week', o.o_orderdate) AS wk
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
        |cls AS (SELECT nat, pri, wk, count(*) AS sz FROM q GROUP BY 1, 2, 3),
        |tr AS (SELECT sum(sz) AS total_rows FROM cls)
        |SELECT k,
        |  CAST(sum(CASE WHEN sz < k THEN 1 ELSE 0 END) AS BIGINT)
        |    AS classes_below,
        |  CAST(sum(CASE WHEN sz < k THEN sz ELSE 0 END) AS BIGINT)
        |    AS rows_below,
        |  round(sum(CASE WHEN sz < k THEN sz ELSE 0 END)
        |    / CAST(tr.total_rows AS DOUBLE), 4) AS risk_rate
        |FROM cls CROSS JOIN (SELECT unnest([2, 5, 10]) AS k) ks
        |CROSS JOIN tr
        |GROUP BY k, tr.total_rows ORDER BY k""") { (s, d) =>
      val q = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .select(col("c_nationkey").as("nat"), col("o_orderpriority").as("pri"),
          date_trunc("week", col("o_orderdate")).as("wk"))
      val cls = q.groupBy(col("nat"), col("pri"), col("wk"))
        .agg(count(lit(1)).as("sz"))
      val tr = cls.agg(sum(col("sz")).as("total_rows"))
      val ks = s.range(0, 3).select(
        element_at(typedLit(Seq(2, 5, 10)), col("id").cast("int") + 1).as("k"))
      cls.crossJoin(broadcast(ks)).crossJoin(broadcast(tr))
        .groupBy(col("k"), col("total_rows"))
        .agg(sum(when(col("sz") < col("k"), 1).otherwise(0))
            .as("classes_below"),
          sum(when(col("sz") < col("k"), col("sz")).otherwise(0))
            .as("rows_below"),
          round(sum(when(col("sz") < col("k"), col("sz")).otherwise(0)) /
            col("total_rows").cast("double"), 4).as("risk_rate"))
        .select(col("k"), col("classes_below"), col("rows_below"),
          col("risk_rate"))
        .orderBy(col("k"))
    },

    // Benford first-significant-digit screen on order totals — the
    // data-quality/fraud heuristic for "does this monetary column look
    // organic": exact digit counts in one hash aggregate, expected
    // Benford mass log10(1 + 1/d) per digit, and the mean-absolute-
    // deviation summary (MAD < 0.006 ≈ conforming, > 0.015 ≈ suspect
    // under Nigrini's thresholds). Integer counts until the final
    // ratios; the 9-row digit relation is driver-free at any SF.
    Q("dq_benford",
      """WITH d AS (SELECT CAST(substring(CAST(CAST(floor(o_totalprice)
        |      AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM orders WHERE o_totalprice >= 1),
        |c AS (SELECT digit, count(*) AS c FROM d GROUP BY 1),
        |n AS (SELECT sum(c) AS n FROM c)
        |SELECT digit, CAST(c AS BIGINT) AS cnt,
        |  round(c / CAST(n.n AS DOUBLE), 4) AS observed,
        |  round(log10(1 + 1.0 / digit), 4) AS expected,
        |  round(abs(c / CAST(n.n AS DOUBLE) - log10(1 + 1.0 / digit)), 4)
        |    AS abs_dev
        |FROM c CROSS JOIN n ORDER BY digit""") { (s, d) =>
      val dd = Tables.orders(s, d)
        .filter(col("o_totalprice") >= 1)
        .select(expr("""CAST(substring(CAST(CAST(floor(o_totalprice)
              |  AS BIGINT) AS STRING), 1, 1) AS INT)""".stripMargin)
          .as("digit"))
      val c = dd.groupBy(col("digit")).agg(count(lit(1)).as("c"))
      val n = c.agg(sum(col("c")).as("n"))
      c.crossJoin(broadcast(n))
        .select(col("digit"), col("c").as("cnt"),
          round(col("c") / col("n").cast("double"), 4).as("observed"),
          round(log10(lit(1) + lit(1.0) / col("digit")), 4).as("expected"),
          round(abs(col("c") / col("n").cast("double") -
            log10(lit(1) + lit(1.0) / col("digit"))), 4).as("abs_dev"))
        .orderBy(col("digit"))
    },

    // IQR outlier screen per event type: exact q1/q3 by linear
    // interpolation, Tukey 1.5·IQR fences, and the count/share of rows
    // outside them — the data-quality gate run before a training mix is
    // frozen. Two passes: a per-group exact-percentile aggregate
    // (constant-size result, broadcast back) and one counting scan —
    // never a global sort; the fence compare is row-local.
    Q("dq_outlier_iqr",
      """WITH q AS (SELECT event_type,
        |    quantile_cont(value, 0.25) AS q1,
        |    quantile_cont(value, 0.75) AS q3
        |  FROM events GROUP BY 1)
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
        |  round(max(q.q1), 4) AS q1, round(max(q.q3), 4) AS q3,
        |  CAST(sum(CASE WHEN e.value < q.q1 - 1.5 * (q.q3 - q.q1)
        |        OR e.value > q.q3 + 1.5 * (q.q3 - q.q1)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS outliers
        |FROM events e JOIN q ON e.event_type = q.event_type
        |GROUP BY 1 ORDER BY e.event_type""") { (s, d) =>
      val ev = Tables.events(s, d)
      val q = ev.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.25)").as("q1"),
          expr("percentile(value, 0.75)").as("q3"))
      ev.join(broadcast(q), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast("long").as("n"),
          round(max(col("q1")), 4).as("q1"),
          round(max(col("q3")), 4).as("q3"),
          sum(when(col("value") <
              col("q1") - lit(1.5) * (col("q3") - col("q1")), 1)
            .when(col("value") >
              col("q3") + lit(1.5) * (col("q3") - col("q1")), 1)
            .otherwise(0)).cast("long").as("outliers"))
        .orderBy(col("event_type"))
    },

    // Deterministic k-fold cross-validation assignment: fold = first
    // md5 nibble of doc_id mod 5 — reproducible on any cluster size,
    // join-stable (the same doc lands in the same fold everywhere), and
    // auditable: the query reports per-(fold, lang) counts plus each
    // fold's share, which is exactly the disjoint-cover evidence a
    // pipeline wants before training k models. Pure projection + one
    // hash aggregate; no shuffle beyond the rollup.
    Q("pipe_kfold",
      """WITH f AS (SELECT lang,
        |    (strpos('0123456789abcdef',
        |      substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) % 5 AS fold
        |  FROM documents),
        |n AS (SELECT count(*) AS n FROM documents)
        |SELECT fold, lang, CAST(count(*) AS BIGINT) AS docs,
        |  round(count(*) / CAST(max(n.n) AS DOUBLE), 4) AS share
        |FROM f CROSS JOIN n GROUP BY fold, lang ORDER BY fold, lang""") {
      (s, d) =>
        val docs = Tables.documents(s, d)
        val f = docs.select(col("lang"),
          (expr("instr('0123456789abcdef', substring(md5(CAST(doc_id AS STRING)), 1, 1))")
            - 1) % 5 as "fold")
        val n = docs.agg(count(lit(1)).as("n"))
        f.crossJoin(broadcast(n))
          .groupBy(col("fold"), col("lang"))
          .agg(count(lit(1)).cast("long").as("docs"),
            round(count(lit(1)) / max(col("n")).cast("double"), 4)
              .as("share"))
          .orderBy(col("fold"), col("lang"))
    },

    // Output-shard balance audit: assign every event to one of 32
    // md5-derived shards (the deterministic partitioner a 100 TB write
    // would use) and report per-shard counts, shares, and the χ²
    // uniformity contribution — the evenness evidence read before
    // committing a layout (a hot shard here is a straggler executor
    // there). One projection + one 32-group hash aggregate; the grand
    // total is a broadcast single row.
    Q("pipe_shard_balance",
      """WITH s AS (SELECT
        |    ('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 2))::INT
        |      % 32 AS shard
        |  FROM events),
        |c AS (SELECT shard, count(*) AS cnt FROM s GROUP BY 1),
        |n AS (SELECT sum(cnt) AS n FROM c)
        |SELECT shard, CAST(cnt AS BIGINT) AS cnt,
        |  round(cnt / CAST(n.n AS DOUBLE), 4) AS share,
        |  round((cnt - n.n / 32.0) * (cnt - n.n / 32.0) / (n.n / 32.0), 4)
        |    AS chi2_term
        |FROM c CROSS JOIN n ORDER BY shard""") { (s, d) =>
      val sh = Tables.events(s, d).select(
        (expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 2), 16, 10) AS INT)")
          % 32).as("shard"))
      val c = sh.groupBy(col("shard")).agg(count(lit(1)).as("cnt"))
      val n = c.agg(sum(col("cnt")).as("n"))
      c.crossJoin(broadcast(n))
        .select(col("shard"), col("cnt").cast("long").as("cnt"),
          round(col("cnt") / col("n").cast("double"), 4).as("share"),
          round((col("cnt") - col("n") / 32.0)
            * (col("cnt") - col("n") / 32.0) / (col("n") / 32.0), 4)
            .as("chi2_term"))
        .orderBy(col("shard"))
    },

    // Referential-integrity audit across the fact chain: orphan counts
    // for lineitem→orders and orders→customer — the FK health check a
    // warehouse runs after every ingest batch. Each check is one
    // LEFT ANTI join on the key (hash/broadcast-joinable, never a
    // scan×scan), collapsed to a single count; results union to a tiny
    // named-relation report.
    Q("dq_referential",
      """WITH l AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT)
        |      AS n_orphans
        |  FROM lineitem li LEFT JOIN orders o
        |    ON li.l_orderkey = o.o_orderkey),
        |o2 AS (SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT)
        |      AS n_orphans
        |  FROM orders o LEFT JOIN customer c
        |    ON o.o_custkey = c.c_custkey)
        |SELECT 'lineitem->orders' AS relation, n_rows, n_orphans FROM l
        |UNION ALL
        |SELECT 'orders->customer' AS relation, n_rows, n_orphans FROM o2
        |ORDER BY relation""") { (s, d) =>
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val cu = Tables.customer(s, d)
      def audit(name: String, fact: org.apache.spark.sql.DataFrame,
          factKey: String, dim: org.apache.spark.sql.DataFrame,
          dimKey: String): org.apache.spark.sql.DataFrame =
        fact.join(dim.select(col(dimKey)),
            col(factKey) === col(dimKey), "left")
          .agg(count(lit(1)).cast("long").as("n_rows"),
            count(when(col(dimKey).isNull, 1)).cast("long").as("n_orphans"))
          .select(lit(name).as("relation"), col("n_rows"), col("n_orphans"))
      audit("lineitem->orders", li, "l_orderkey", o, "o_orderkey")
        .unionAll(audit("orders->customer", o, "o_custkey", cu, "c_custkey"))
        .orderBy(col("relation"))
    },

    // Per-source data card: the one-pass "datasheet" a corpus publishes
    // per provenance source — doc count, char-length stats, dominant
    // language + its share, and distinct-language breadth. ONE hash
    // aggregate over documents plus a vocab-sized (source, lang)
    // rollup for the mode; no window over raw rows.
    Q("pipe_source_card",
      """WITH sl AS (SELECT source, lang, count(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |m AS (SELECT source, max(c) AS mc, CAST(sum(c) AS BIGINT) AS docs,
        |    CAST(count(*) AS BIGINT) AS n_langs FROM sl GROUP BY 1),
        |top AS (SELECT sl.source,
        |    min(CASE WHEN sl.c = m.mc THEN sl.lang END) AS top_lang,
        |    max(m.mc) AS mc
        |  FROM sl JOIN m ON m.source = sl.source GROUP BY 1),
        |st AS (SELECT source, CAST(count(*) AS BIGINT) AS docs,
        |    CAST(min(n_chars) AS BIGINT) AS min_chars,
        |    CAST(max(n_chars) AS BIGINT) AS max_chars,
        |    round(sum(n_chars) / CAST(count(*) AS DOUBLE), 2) AS avg_chars
        |  FROM documents GROUP BY 1)
        |SELECT st.source, st.docs, st.min_chars, st.max_chars, st.avg_chars,
        |  m.n_langs, top.top_lang,
        |  round(top.mc / CAST(st.docs AS DOUBLE), 4) AS top_lang_share
        |FROM st JOIN m ON m.source = st.source
        |JOIN top ON top.source = st.source
        |ORDER BY st.source""") { (s, d) =>
      val docs = Tables.documents(s, d)
      val sl = docs.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("c"))
      val m = sl.groupBy(col("source"))
        .agg(max(col("c")).as("mc"), sum(col("c")).cast("long").as("docs2"),
          count(lit(1)).cast("long").as("n_langs"))
      val top = sl.join(m, Seq("source"))
        .groupBy(col("source"))
        .agg(min(when(col("c") === col("mc"), col("lang"))).as("top_lang"),
          max(col("mc")).as("mc"))
      val st = docs.groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("docs"),
          min(col("n_chars")).cast("long").as("min_chars"),
          max(col("n_chars")).cast("long").as("max_chars"),
          round(sum(col("n_chars")) / count(lit(1)).cast("double"), 2)
            .as("avg_chars"))
      st.join(m.select(col("source"), col("n_langs")), Seq("source"))
        .join(top, Seq("source"))
        .select(col("source"), col("docs"), col("min_chars"),
          col("max_chars"), col("avg_chars"), col("n_langs"),
          col("top_lang"),
          round(col("mc") / col("docs").cast("double"), 4)
            .as("top_lang_share"))
        .orderBy(col("source"))
    },

    // Freshness / staleness audit: per event type, the lag between its
    // newest record and the corpus watermark (global max ts) plus daily
    // arrival coverage — the "is any source silently stalled" check an
    // ingest pipeline alerts on. Per-type extrema come from one hash
    // aggregate; the watermark is a broadcast single row.
    Q("dq_freshness",
      """WITH t AS (SELECT event_type, max(ts) AS max_ts, min(ts) AS min_ts,
        |    CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days
        |  FROM events GROUP BY 1),
        |w AS (SELECT max(max_ts) AS wm FROM t)
        |SELECT event_type,
        |  CAST(date_diff('second', max_ts, w.wm) AS BIGINT) AS lag_sec,
        |  CAST(date_diff('day', CAST(min_ts AS DATE), CAST(max_ts AS DATE))
        |    + 1 AS BIGINT) AS span_days,
        |  active_days,
        |  round(active_days / CAST(date_diff('day', CAST(min_ts AS DATE),
        |    CAST(max_ts AS DATE)) + 1 AS DOUBLE), 4) AS day_coverage
        |FROM t CROSS JOIN w ORDER BY event_type""") { (s, d) =>
      val t = Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(max(col("ts")).as("max_ts"), min(col("ts")).as("min_ts"),
          countDistinct(col("ts").cast("date")).cast("long")
            .as("active_days"))
      val w = t.agg(max(col("max_ts")).as("wm"))
      t.crossJoin(broadcast(w))
        .select(col("event_type"),
          (unix_timestamp(col("wm")) - unix_timestamp(col("max_ts")))
            .cast("long").as("lag_sec"),
          (datediff(col("max_ts").cast("date"), col("min_ts").cast("date"))
            + 1).cast("long").as("span_days"),
          col("active_days"),
          round(col("active_days") /
            (datediff(col("max_ts").cast("date"),
              col("min_ts").cast("date")) + 1).cast("double"), 4)
            .as("day_coverage"))
        .orderBy(col("event_type"))
    },

    // Semi-structured key profile: which top-level keys appear in the
    // JSON props column and in what share of rows — the schema-drift
    // report a pipeline runs over raw event payloads before promoting
    // fields to real columns. One key-explode pass (pure projection)
    // + one vocab-sized hash rollup; the row total is a broadcast
    // single row.
    Q("json_key_profile",
      """WITH k AS (SELECT unnest(json_keys(props)) AS key FROM events
        |  WHERE props IS NOT NULL AND json_valid(props)),
        |n AS (SELECT count(*) AS n FROM events)
        |SELECT key, CAST(count(*) AS BIGINT) AS cnt,
        |  round(count(*) / CAST(max(n.n) AS DOUBLE), 4) AS row_share
        |FROM k CROSS JOIN n GROUP BY key ORDER BY key""") { (s, d) =>
      val ev = Tables.events(s, d)
      val k = ev
        .filter(col("props").isNotNull &&
          expr("get_json_object(props, '$') IS NOT NULL"))
        .select(explode(expr("json_object_keys(props)")).as("key"))
      val n = ev.agg(count(lit(1)).as("n"))
      k.crossJoin(broadcast(n))
        .groupBy(col("key"))
        .agg(count(lit(1)).cast("long").as("cnt"),
          round(count(lit(1)) / max(col("n")).cast("double"), 4)
            .as("row_share"))
        .orderBy(col("key"))
    },

    // TEMPERATURE-SCALED domain mixing (the α-sampling every
    // multi-source LLM corpus uses — upweight small domains, damp the
    // head: w_s ∝ share_s^α with α = 0.5): per-source weights from one
    // vocab-sized rollup, integer targets from a fixed pick budget, and
    // the realized sample drawn by deterministic md5 order so the same
    // corpus always yields the same mixture. The α-power weights are
    // quantized to DECIMAL(18,12) BEFORE normalization so the weight
    // denominator is an exact decimal sum (partition-invariant), not an
    // order-dependent float reduction. Corpus-scale work: one source
    // rollup + one per-source-partitioned rank window.
    Q("pipe_domain_temperature",
      """WITH n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1),
        |t AS (SELECT sum(n_docs) AS total FROM n),
        |w AS (SELECT source, n_docs,
        |    CAST(round(sqrt(n_docs / CAST(t.total AS DOUBLE)), 12)
        |      AS DECIMAL(18,12)) AS wq
        |  FROM n CROSS JOIN t),
        |z AS (SELECT sum(wq) AS zq FROM w),
        |tgt AS (SELECT w.source, w.n_docs,
        |    round(w.n_docs / CAST(t.total AS DOUBLE), 4) AS share,
        |    round(CAST(w.wq AS DOUBLE) / CAST(z.zq AS DOUBLE), 4) AS weight,
        |    CAST(floor(200 * CAST(w.wq AS DOUBLE) / CAST(z.zq AS DOUBLE))
        |      AS BIGINT) AS target
        |  FROM w CROSS JOIN t CROSS JOIN z),
        |r AS (SELECT d.source, row_number() OVER (PARTITION BY d.source
        |    ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id) AS rn
        |  FROM documents d),
        |sel AS (SELECT r.source, count(*) AS realized
        |  FROM r JOIN tgt ON tgt.source = r.source AND r.rn <= tgt.target
        |  GROUP BY 1)
        |SELECT tgt.source, tgt.n_docs, tgt.share, tgt.weight, tgt.target,
        |  CAST(coalesce(sel.realized, 0) AS BIGINT) AS realized
        |FROM tgt LEFT JOIN sel USING (source) ORDER BY source""") { (s, d) =>
      val docs = Tables.documents(s, d)
      val n = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      val t = n.agg(sum(col("n_docs")).as("total"))
      val w = n.crossJoin(broadcast(t))
        .select(col("source"), col("n_docs"),
          round(sqrt(col("n_docs") / col("total").cast("double")), 12)
            .cast("decimal(18,12)").as("wq"),
          col("total"))
      val z = w.agg(sum(col("wq")).as("zq"))
      val tgt = w.crossJoin(broadcast(z))
        .select(col("source"), col("n_docs"),
          round(col("n_docs") / col("total").cast("double"), 4).as("share"),
          round(col("wq").cast("double") / col("zq").cast("double"), 4)
            .as("weight"),
          floor(lit(200) * col("wq").cast("double") /
            col("zq").cast("double")).cast("long").as("target"))
      val rw = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      val sel = docs
        .select(col("source"), row_number().over(rw).as("rn"))
        .join(broadcast(tgt.select(col("source"), col("target"))), Seq("source"))
        .filter(col("rn") <= col("target"))
        .groupBy(col("source")).agg(count(lit(1)).as("realized"))
      tgt.join(sel, Seq("source"), "left_outer")
        .select(col("source"), col("n_docs"), col("share"), col("weight"),
          col("target"), coalesce(col("realized"), lit(0L)).as("realized"))
        .orderBy(col("source"))
    },

    // CURRICULUM ordering (easy→hard training schedule): docs bucket
    // into length quartiles from ONE exact-percentile aggregate
    // (broadcast 1-row bounds — never a global raw-row ntile window,
    // which would single-partition the corpus), and the training order
    // index is bucket-offset + md5-rank within the bucket — a
    // deterministic total order computed with only per-bucket windows
    // and a 4-row offset rollup. Re-runnable: same corpus, same
    // schedule, on any partitioning.
    Q("pipe_curriculum_order",
      """WITH q AS (SELECT quantile_cont(CAST(n_chars AS DOUBLE), 0.25) AS q1,
        |    quantile_cont(CAST(n_chars AS DOUBLE), 0.5) AS q2,
        |    quantile_cont(CAST(n_chars AS DOUBLE), 0.75) AS q3
        |  FROM documents),
        |b AS (SELECT doc_id,
        |    CASE WHEN n_chars <= q.q1 THEN 1 WHEN n_chars <= q.q2 THEN 2
        |         WHEN n_chars <= q.q3 THEN 3 ELSE 4 END AS bucket
        |  FROM documents CROSS JOIN q),
        |c AS (SELECT bucket, count(*) AS bn FROM b GROUP BY 1),
        |o AS (SELECT bucket,
        |    sum(bn) OVER (ORDER BY bucket) - bn AS off FROM c),
        |r AS (SELECT b.doc_id, b.bucket,
        |    row_number() OVER (PARTITION BY b.bucket
        |      ORDER BY md5(CAST(b.doc_id AS VARCHAR)), b.doc_id) AS rn
        |  FROM b)
        |SELECT r.doc_id, CAST(r.bucket AS INT) AS bucket,
        |  CAST(o.off + r.rn AS BIGINT) AS ord
        |FROM r JOIN o ON o.bucket = r.bucket
        |ORDER BY doc_id""") { (s, d) =>
      val docs = Tables.documents(s, d)
      val q = docs.agg(
        expr("percentile(CAST(n_chars AS DOUBLE), 0.25)").as("q1"),
        expr("percentile(CAST(n_chars AS DOUBLE), 0.5)").as("q2"),
        expr("percentile(CAST(n_chars AS DOUBLE), 0.75)").as("q3"))
      val b = docs.crossJoin(broadcast(q))
        .select(col("doc_id"),
          when(col("n_chars") <= col("q1"), 1)
            .when(col("n_chars") <= col("q2"), 2)
            .when(col("n_chars") <= col("q3"), 3)
            .otherwise(4).as("bucket"))
      val c = b.groupBy(col("bucket")).agg(count(lit(1)).as("bn"))
      val ow = org.apache.spark.sql.expressions.Window.orderBy(col("bucket"))
      val o = c // 4-row relation: the only unpartitioned window is here
        .withColumn("off", sum(col("bn")).over(ow) - col("bn"))
        .select(col("bucket"), col("off"))
      val rw = org.apache.spark.sql.expressions.Window
        .partitionBy(col("bucket"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      b.withColumn("rn", row_number().over(rw))
        .join(broadcast(o), Seq("bucket"))
        .select(col("doc_id"), col("bucket").cast("int").as("bucket"),
          (col("off") + col("rn")).cast("long").as("ord"))
        .orderBy(col("doc_id"))
    },

    // L-DIVERSITY audit (Machanavajjhala 2007) — the follow-up to
    // pipe_privacy_kanon's k-anonymity: a class can be large (k-safe)
    // yet still leak if every member shares the same SENSITIVE value.
    // Same QI classes (nation, priority, order week), sensitive
    // attribute = order status; per class, l = distinct sensitive
    // values and the entropy of the sensitive distribution (entropy
    // l-diversity), rolled up by l. Entropy terms are DECIMAL-quantized
    // per (class, value) before summing so the per-class entropy is
    // partition-invariant; everything else is exact integers.
    Q("pipe_privacy_ldiversity",
      """WITH q AS (SELECT c.c_nationkey AS nat, o.o_orderpriority AS pri,
        |    date_trunc('week', o.o_orderdate) AS wk, o.o_orderstatus AS sens
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey),
        |cs AS (SELECT nat, pri, wk, sens, count(*) AS c FROM q
        |  GROUP BY 1, 2, 3, 4),
        |cls AS (SELECT nat, pri, wk, sum(c) AS sz, count(*) AS l
        |  FROM cs GROUP BY 1, 2, 3),
        |ent AS (SELECT cs.nat, cs.pri, cs.wk,
        |    sum(CAST(round(-(cs.c / CAST(cls.sz AS DOUBLE))
        |      * ln(cs.c / CAST(cls.sz AS DOUBLE)), 9) AS DECIMAL(18,9)))
        |      AS ent
        |  FROM cs JOIN cls USING (nat, pri, wk) GROUP BY 1, 2, 3)
        |SELECT CAST(cls.l AS INT) AS l,
        |  CAST(count(*) AS BIGINT) AS n_classes,
        |  CAST(sum(cls.sz) AS BIGINT) AS n_rows,
        |  round(CAST(min(ent.ent) AS DOUBLE), 4) AS min_entropy,
        |  round(CAST(sum(ent.ent) AS DOUBLE) / count(*), 4) AS avg_entropy
        |FROM cls JOIN ent USING (nat, pri, wk)
        |GROUP BY 1 ORDER BY 1""") { (s, d) =>
      val q = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .select(col("c_nationkey").as("nat"), col("o_orderpriority").as("pri"),
          date_trunc("week", col("o_orderdate")).as("wk"),
          col("o_orderstatus").as("sens"))
      val cs = q.groupBy(col("nat"), col("pri"), col("wk"), col("sens"))
        .agg(count(lit(1)).as("c"))
      val cls = cs.groupBy(col("nat"), col("pri"), col("wk"))
        .agg(sum(col("c")).as("sz"), count(lit(1)).as("l"))
      val p = col("c") / col("sz").cast("double")
      val ent = cs.join(cls, Seq("nat", "pri", "wk"))
        .select(col("nat"), col("pri"), col("wk"),
          round(-p * log(p), 9).cast("decimal(18,9)").as("term"))
        .groupBy(col("nat"), col("pri"), col("wk"))
        .agg(sum(col("term")).as("ent"))
      cls.join(ent, Seq("nat", "pri", "wk"))
        .groupBy(col("l").cast("int").as("l"))
        .agg(count(lit(1)).as("n_classes"),
          sum(col("sz")).as("n_rows"),
          round(min(col("ent")).cast("double"), 4).as("min_entropy"),
          round(sum(col("ent")).cast("double") / count(lit(1)), 4)
            .as("avg_entropy"))
        .orderBy(col("l"))
    },

    // LENGTH-BUCKETED BATCHING audit — group documents into 8
    // equal-population token-length buckets (NTILE over a total order)
    // and measure the padding waste each bucket would incur when padded
    // to its max length. This is the batch-shaping decision every
    // training loader makes: random batching pads everything to the
    // global max; length bucketing bounds waste to the within-bucket
    // spread. All quantities are exact integers; the NTILE order is
    // total (tok, doc_id), so bucket membership is deterministic in
    // both engines. Scale: the bucketization is Ranks.withNtile —
    // range-repartition + per-partition rank + offset rollup, never a
    // single-partition window — so the global sort is Spark's
    // distributed ORDER BY machinery and the audit runs at any corpus
    // size; the DuckDB oracle keeps the literal ntile text.
    Q("pipe_length_buckets",
      """WITH t AS (SELECT doc_id,
        |    len(string_split(text, ' ')) AS tok FROM documents),
        |b AS (SELECT doc_id, tok,
        |    ntile(8) OVER (ORDER BY tok, doc_id) AS bucket FROM t)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(tok) AS BIGINT) AS min_tok,
        |  CAST(max(tok) AS BIGINT) AS max_tok,
        |  round(avg(tok), 4) AS avg_tok,
        |  CAST(max(tok) * count(*) - sum(tok) AS BIGINT) AS pad_waste,
        |  round(1.0 - sum(tok) / CAST(max(tok) * count(*) AS DOUBLE), 4)
        |    AS pad_frac
        |FROM b GROUP BY 1 ORDER BY bucket""") { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"), size(split(col("text"), " ")).as("tok"))
      val b = Ranks.withNtile(t, Seq(col("tok"), col("doc_id")), 8, "bucket")
      b.groupBy(col("bucket"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          min(col("tok")).cast("long").as("min_tok"),
          max(col("tok")).cast("long").as("max_tok"),
          round(avg(col("tok")), 4).as("avg_tok"),
          (max(col("tok")) * count(lit(1)) - sum(col("tok"))).cast("long")
            .as("pad_waste"),
          round(lit(1.0) - sum(col("tok")) /
            (max(col("tok")) * count(lit(1))).cast("double"), 4)
            .as("pad_frac"))
        .orderBy(col("bucket"))
    },

    // CONTEXT-LENGTH PLANNING CURVE — for a grid of candidate sequence
    // lengths, the exact corpus-wide consequences of choosing that
    // length: docs that overflow (truncation loss in tokens), the
    // bin-count lower bound for packing the kept tokens, and the best
    // achievable utilization. This is the table a pipeline owner reads
    // BEFORE committing pack_sequences to one length. Every quantity
    // is an exact integer off one token-count rollup crossed with the
    // 3-row literal grid — a constant-size broadcast, not a data join.
    Q("pipe_pack_curve",
      """WITH t AS (SELECT doc_id,
        |    len(string_split(text, ' ')) AS tok FROM documents),
        |g AS (SELECT unnest([128, 256, 512]) AS len),
        |c AS (SELECT g.len,
        |    count(*) AS n_docs,
        |    sum(CASE WHEN t.tok > g.len THEN 1 ELSE 0 END) AS n_over,
        |    sum(greatest(t.tok - g.len, 0)) AS trunc_tokens,
        |    sum(least(t.tok, g.len)) AS kept_tokens
        |  FROM t CROSS JOIN g GROUP BY 1)
        |SELECT CAST(len AS INT) AS len, CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_over AS BIGINT) AS n_over,
        |  CAST(trunc_tokens AS BIGINT) AS trunc_tokens,
        |  CAST(kept_tokens AS BIGINT) AS kept_tokens,
        |  CAST(ceil(kept_tokens / CAST(len AS DOUBLE)) AS BIGINT)
        |    AS bins_lb,
        |  round(kept_tokens / (ceil(kept_tokens / CAST(len AS DOUBLE))
        |    * len), 4) AS util_ub
        |FROM c ORDER BY len""") { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"), size(split(col("text"), " ")).as("tok"))
      val g = s.range(0, 3).select(
        when(col("id") === 0, 128).when(col("id") === 1, 256)
          .otherwise(512).as("len"))
      val c = t.crossJoin(broadcast(g))
        .groupBy(col("len"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("tok") > col("len"), 1).otherwise(0)).as("n_over"),
          sum(greatest(col("tok") - col("len"), lit(0))).as("trunc_tokens"),
          sum(least(col("tok"), col("len"))).as("kept_tokens"))
      val bins = ceil(col("kept_tokens") / col("len").cast("double"))
      c.select(col("len").cast("int").as("len"),
          col("n_docs").cast("long").as("n_docs"),
          col("n_over").cast("long").as("n_over"),
          col("trunc_tokens").cast("long").as("trunc_tokens"),
          col("kept_tokens").cast("long").as("kept_tokens"),
          bins.cast("long").as("bins_lb"),
          round(col("kept_tokens") / (bins * col("len")), 4).as("util_ub"))
        .orderBy(col("len"))
    },

    // DSIR-style IMPORTANCE WEIGHTS (Xie et al. 2023, "Data Selection
    // for Language Models via Importance Resampling") — score every
    // document by how much its unigram distribution looks like a
    // TARGET domain (here: source src0) vs the general corpus:
    // w(d) = (1/|d|) Σ_w c_d(w)·[ln p̂_tgt(w) − ln p̂_all(w)] with
    // add-1 smoothing over the corpus vocabulary. The curation op
    // behind domain-targeted pretraining mixes. Determinism: both ln
    // terms evaluate per DISTINCT WORD (vocab-sized relation) and
    // their difference quantizes to DECIMAL(28,12) BEFORE the per-doc
    // Σ c_d(w)·term (decimal × integer, order-free exact); corpus
    // scalars ride a 1-row broadcast. Scale: tokenize-once rollups, a
    // vocab-keyed join, one doc rollup — no all-pairs anywhere.
    Q("pipe_dsir_weights",
      """WITH tok AS (SELECT doc_id, source, unnest(string_split(text, ' '))
        |    AS w FROM documents),
        |dw AS (SELECT doc_id, source, w, count(*) AS c
        |  FROM tok GROUP BY 1, 2, 3),
        |vt AS (SELECT w, sum(CASE WHEN source = 'src0' THEN c ELSE 0 END)
        |      AS ct, sum(c) AS ca
        |  FROM dw GROUP BY 1),
        |tot AS (SELECT sum(ct) AS nt, sum(ca) AS na,
        |    CAST(count(*) AS BIGINT) AS v FROM vt),
        |term AS (SELECT vt.w,
        |    CAST(round(ln((vt.ct + 1.0) / (tot.nt + tot.v))
        |      - ln((vt.ca + 1.0) / (tot.na + tot.v)), 12)
        |      AS DECIMAL(28,12)) AS lt
        |  FROM vt CROSS JOIN tot),
        |docw AS (SELECT dw.doc_id, dw.source,
        |    CAST(sum(dw.c * term.lt) AS DOUBLE) / sum(dw.c) AS wt
        |  FROM dw JOIN term ON term.w = dw.w GROUP BY 1, 2)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(avg(wt), 4) AS mean_weight,
        |  round(sum(CASE WHEN wt > 0 THEN 1 ELSE 0 END)
        |    / CAST(count(*) AS DOUBLE), 4) AS frac_target_like
        |FROM docw GROUP BY 1 ORDER BY source""") { (s, d) =>
      val dw = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("w"))
        .groupBy(col("doc_id"), col("source"), col("w"))
        .agg(count(lit(1)).as("c"))
      val vt = dw.groupBy(col("w"))
        .agg(sum(when(col("source") === "src0", col("c")).otherwise(0))
            .as("ct"),
          sum(col("c")).as("ca"))
      val tot = vt.agg(sum(col("ct")).as("nt"), sum(col("ca")).as("na"),
        count(lit(1)).cast("long").as("v"))
      val term = vt.crossJoin(broadcast(tot))
        .select(col("w"),
          round(log((col("ct") + 1.0) / (col("nt") + col("v")))
            - log((col("ca") + 1.0) / (col("na") + col("v"))), 12)
            .cast("decimal(28,12)").as("lt"))
      val docw = dw.join(term, Seq("w"))
        .groupBy(col("doc_id"), col("source"))
        .agg((sum(col("c") * col("lt")).cast("double") / sum(col("c")))
          .as("wt"))
      docw.groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          round(avg(col("wt")), 4).as("mean_weight"),
          round(sum(when(col("wt") > 0, 1).otherwise(0))
            / count(lit(1)).cast("double"), 4).as("frac_target_like"))
        .orderBy(col("source"))
    },

    // SEQUENCE-GAP AUDIT over an id ledger — the completeness check a
    // billing/ingest ledger runs ("did we skip ids?"): the audited
    // sequence is the click events' id set (a genuinely sparse subset
    // of the dense event_id space, so the machinery meets real gaps).
    // Every statistic avoids a global window over the key relation:
    // missing_total is pure aggregates ((max−min+1) − n_distinct),
    // gap RUNS are an anti-self-join (ids whose successor id is
    // absent, excluding the ledger max) — both scale as one shuffle
    // on the id hash, no sort, no corpus-scale window (the lifecycle
    // grid's present/absent idiom on an integer sequence).
    Q("dq_sequence_gaps",
      """WITH k AS (SELECT DISTINCT event_id AS id FROM events
        |  WHERE event_type = 'click'),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(min(id) AS BIGINT) AS key_min,
        |    CAST(max(id) AS BIGINT) AS key_max FROM k),
        |runs AS (SELECT CAST(count(*) AS BIGINT) AS n_gap_runs
        |  FROM k a LEFT JOIN k b ON b.id = a.id + 1
        |  CROSS JOIN agg
        |  WHERE b.id IS NULL AND a.id < agg.key_max)
        |SELECT n_keys, key_min, key_max,
        |  key_max - key_min + 1 - n_keys AS missing_total,
        |  n_gap_runs,
        |  round((key_max - key_min + 1 - n_keys)
        |    / CAST(nullif(n_gap_runs, 0) AS DOUBLE), 4) AS avg_gap_len,
        |  round(n_keys / CAST(key_max - key_min + 1 AS DOUBLE), 4)
        |    AS density
        |FROM agg CROSS JOIN runs""") { (s, d) =>
      val k = Tables.events(s, d)
        .filter(col("event_type") === "click")
        .select(col("event_id").as("id")).distinct()
      val agg = k.agg(count(lit(1)).as("n_keys"),
        min(col("id")).as("key_min"), max(col("id")).as("key_max"))
      val runs = k.as("a")
        .join(k.select((col("id") - 1).as("id"), lit(1).as("nx")).as("b"),
          Seq("id"), "left_outer")
        .crossJoin(broadcast(agg))
        .filter(col("nx").isNull && col("id") < col("key_max"))
        .agg(count(lit(1)).as("n_gap_runs"))
      agg.crossJoin(broadcast(runs))
        .select(col("n_keys").cast("long").as("n_keys"),
          col("key_min").cast("long").as("key_min"),
          col("key_max").cast("long").as("key_max"),
          (col("key_max") - col("key_min") + 1 - col("n_keys"))
            .cast("long").as("missing_total"),
          col("n_gap_runs").cast("long").as("n_gap_runs"),
          round((col("key_max") - col("key_min") + 1 - col("n_keys"))
            / nullif(col("n_gap_runs"), lit(0L)).cast("double"), 4)
            .as("avg_gap_len"),
          round(col("n_keys")
            / (col("key_max") - col("key_min") + 1).cast("double"), 4)
            .as("density"))
    },

    // GOPHER-STYLE RULE CENSUS (Rae et al. 2021, "Scaling Language
    // Models: ... Gopher", §A1.1 MassiveText filters, thresholds
    // adapted to the fixture's synthetic scale) — the rule-COMBINATION
    // histogram pipe_filter_ablation doesn't give: each doc gets a
    // 4-bit mask (r1 word count in [20,1000] · r2 mean word length in
    // [3,10] · r3 stopword fraction ≥ 0.02 · r4 alphabetic-token
    // fraction ≥ 0.8), and the census over the 16 masks shows which
    // rule CO-OCCURRENCE actually rejects documents — the readout that
    // decides which filters are redundant. All four signals are exact
    // integer/ratio arithmetic on the token array; the mask census is
    // one ≤16-row rollup.
    Q("pipe_gopher_rules",
      """WITH t AS (SELECT doc_id, text,
        |    string_split(text, ' ') AS toks FROM documents),
        |f AS (SELECT doc_id,
        |    CASE WHEN len(toks) BETWEEN 20 AND 1000 THEN 1 ELSE 0 END
        |      AS r1,
        |    CASE WHEN CAST(length(text) - len(toks) + 1 AS DOUBLE)
        |        / len(toks) BETWEEN 3 AND 10 THEN 1 ELSE 0 END AS r2,
        |    CASE WHEN CAST(len(list_filter(toks,
        |        x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
        |        / len(toks) >= 0.02 THEN 1 ELSE 0 END AS r3,
        |    CASE WHEN CAST(len(list_filter(toks,
        |        x -> regexp_full_match(x, '[a-z]+'))) AS DOUBLE)
        |        / len(toks) >= 0.8 THEN 1 ELSE 0 END AS r4
        |  FROM t),
        |c AS (SELECT r1 + 2 * r2 + 4 * r3 + 8 * r4 AS mask,
        |    count(*) AS n, min(doc_id) AS example_doc FROM f
        |  GROUP BY 1),
        |tot AS (SELECT count(*) AS nt FROM f)
        |SELECT CAST(mask AS INT) AS rule_mask,
        |  CAST(n AS BIGINT) AS n_docs,
        |  CAST(example_doc AS BIGINT) AS example_doc,
        |  round(n / CAST(tot.nt AS DOUBLE), 4) AS frac,
        |  CASE WHEN mask = 15 THEN 1 ELSE 0 END AS passes_all
        |FROM c CROSS JOIN tot ORDER BY rule_mask""") { (s, d) =>
      val f = Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          when(size(col("toks")).between(20, 1000), 1).otherwise(0)
            .as("r1"),
          when(((length(col("text")) - size(col("toks")) + 1)
              .cast("double") / size(col("toks"))).between(3, 10), 1)
            .otherwise(0).as("r2"),
          when(expr("""CAST(size(filter(toks,
              |x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)"""
              .stripMargin) / size(col("toks")) >= 0.02, 1)
            .otherwise(0).as("r3"),
          when(expr("CAST(size(filter(toks, x -> x rlike '^[a-z]+$')) AS DOUBLE)")
              / size(col("toks")) >= 0.8, 1)
            .otherwise(0).as("r4"))
      val c = f
        .groupBy((col("r1") + col("r2") * 2 + col("r3") * 4
          + col("r4") * 8).as("mask"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("example_doc"))
      val tot = f.agg(count(lit(1)).as("nt"))
      c.crossJoin(broadcast(tot))
        .select(col("mask").cast("int").as("rule_mask"),
          col("n").cast("long").as("n_docs"),
          col("example_doc").cast("long").as("example_doc"),
          round(col("n") / col("nt").cast("double"), 4).as("frac"),
          when(col("mask") === 15, 1).otherwise(0).as("passes_all"))
        .orderBy(col("rule_mask"))
    },

    // BINOMIAL-MECHANISM noised release of the (lang, source) corpus
    // histogram — the differential-privacy exemplar next to
    // pipe_privacy_kanon/ldiversity: additive noise = centered
    // Binomial(16, 1/2) (Dwork et al. 2006's binomial mechanism;
    // DP for counting queries at the released granularity), clamped at
    // zero, with a release threshold (true n ≥ 5) so singleton cells
    // never publish. The 16 coins come from the first 16 md5 bits of
    // the group key + a round salt — a SEEDED exemplar: both engines
    // derive the identical noise (that is what makes it oracle-
    // checkable; production would draw the coins from a CSPRNG, the
    // query shape is unchanged). True counts are never emitted. One
    // hash aggregate + per-row integer popcount — scan-shaped at any
    // corpus size.
    Q("pipe_privacy_dp_binomial",
      """WITH g AS (SELECT lang, source, count(*) AS n
        |  FROM documents GROUP BY 1, 2),
        |z AS (SELECT lang, source, n,
        |    bit_count(('0x' || substr(md5(lang || '|' || source
        |      || '|dp1'), 1, 4))::BIGINT) - 8 AS noise
        |  FROM g WHERE n >= 5)
        |SELECT lang, source,
        |  CAST(greatest(n + noise, 0) AS BIGINT) AS noisy_n
        |FROM z ORDER BY lang, source""") { (s, d) =>
      Tables.documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 5)
        .withColumn("noise",
          expr("""bit_count(CAST(conv(substr(md5(concat(lang, '|', source,
                 |  '|dp1')), 1, 4), 16, 10) AS BIGINT)) - 8""".stripMargin))
        .select(col("lang"), col("source"),
          greatest(col("n") + col("noise"), lit(0)).cast("long")
            .as("noisy_n"))
        .orderBy(col("lang"), col("source"))
    },

    // EXACT-SIZE uniform sample (the distributed reservoir): exactly
    // k = 1000 rows at ANY corpus size, reproducibly — rank every row
    // by a salted md5 coin and keep the k smallest. The rate-based
    // samplers (sample_stratified/weighted) can only promise k IN
    // EXPECTATION; training-data budgets are exact-row contracts, and
    // this is the operator that meets them. Execution is the
    // distributed top-k shape (TakeOrderedAndProject: per-partition
    // k-heaps, one k-bounded merge — NO global sort, no single big
    // partition), so the cost is a scan + O(k) state per partition.
    // The hash column rides along as the output's unique order key,
    // making re-draws with a different salt trivially auditable.
    Q("sample_reservoir_k",
      """SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || '|rsv1') AS u
        |FROM documents
        |ORDER BY u, doc_id LIMIT 1000""") { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(concat(col("doc_id").cast("string"), lit("|rsv1"))).as("u"))
        .orderBy(col("u"), col("doc_id"))
        .limit(1000)
    },

    // DECLARATIVE CONSTRAINT SUITE (the Deequ/Great-Expectations
    // shape): a battery of data-quality expectations over one table,
    // each reduced to a [0,1] metric with a pass verdict — uniqueness,
    // completeness, range membership, domain membership, freshness,
    // volume — ALL computed in a single scan: every metric is an
    // aggregate expression in one hash-aggregate pass (plus one
    // distinct-count), stacked to constraint rows afterwards. This is
    // the admission gate a 100 TB ingest runs before publishing a
    // partition; one pass, no per-constraint rescans. Metrics are
    // exact integer ratios — bit-stable everywhere.
    Q("dq_constraint_suite",
      """WITH m AS (SELECT
        |    CAST(count(*) AS DOUBLE) AS n,
        |    CAST(count(DISTINCT o_orderkey) AS DOUBLE) AS nk,
        |    CAST(sum(CASE WHEN o_custkey IS NOT NULL THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS nc,
        |    CAST(sum(CASE WHEN o_totalprice >= 0
        |      AND o_totalprice < 1000000 THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS nr,
        |    CAST(sum(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
        |      THEN 1 ELSE 0 END) AS DOUBLE) AS nd,
        |    CAST(CASE WHEN max(o_orderdate) >= DATE '1995-01-01'
        |      THEN 1 ELSE 0 END AS DOUBLE) AS fresh
        |  FROM orders),
        |c AS (
        |  SELECT 'complete_custkey' AS check_name, nc / n AS metric,
        |    nc = n AS pass FROM m
        |  UNION ALL SELECT 'domain_status', nd / n, nd = n FROM m
        |  UNION ALL SELECT 'fresh_orderdate', fresh, fresh = 1 FROM m
        |  UNION ALL SELECT 'range_totalprice', nr / n, nr = n FROM m
        |  UNION ALL SELECT 'row_count_min', least(n / 100, 1),
        |    n >= 100 FROM m
        |  UNION ALL SELECT 'unique_orderkey', nk / n, nk = n FROM m)
        |SELECT check_name, round(metric, 4) AS metric, pass
        |FROM c ORDER BY check_name""") { (s, d) =>
      val m = Tables.orders(s, d).agg(
        count(lit(1)).cast("double").as("n"),
        countDistinct(col("o_orderkey")).cast("double").as("nk"),
        sum(when(col("o_custkey").isNotNull, 1).otherwise(0))
          .cast("double").as("nc"),
        sum(when(col("o_totalprice") >= 0 && col("o_totalprice") < 1000000,
          1).otherwise(0)).cast("double").as("nr"),
        sum(when(col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0))
          .cast("double").as("nd"),
        when(max(col("o_orderdate")) >= lit("1995-01-01").cast("date"),
          1d).otherwise(0d).as("fresh"))
      m.selectExpr(
          """stack(6,
            |  'complete_custkey', nc / n, nc = n,
            |  'domain_status', nd / n, nd = n,
            |  'fresh_orderdate', fresh, fresh = 1D,
            |  'range_totalprice', nr / n, nr = n,
            |  'row_count_min', least(n / 100, 1D), n >= 100,
            |  'unique_orderkey', nk / n, nk = n
            |) AS (check_name, metric, pass)""".stripMargin)
        .select(col("check_name"), round(col("metric"), 4).as("metric"),
          col("pass"))
        .orderBy(col("check_name"))
    },

    // SCHEMA / DISTRIBUTION DRIFT between two snapshots — the ingest
    // regression monitor that catches "the upstream changed its
    // encoding" before a training run does: for each profiled column,
    // compare the month's first half (ref) against the second (cur)
    // on row count, exact distinct cardinality, and categorical PSI
    // over the column's bucket grid (event_type = its own domain,
    // user_id = 16 hash buckets, value = the clamped /25 bins —
    // literal bucketing, same in both dialects). The PSI machinery is
    // eval_psi's: add-one smoothing over the union grid, per-term
    // DECIMAL(28,12) quantization before the order-free sum, runtime
    // ln only inside a quantized term. One stacked scan builds all
    // three profiles; everything downstream is keyed hash aggregates
    // and a |cols|x|buckets| grid join — no raw-row windows, scales
    // as a pure shuffle.
    Q("dq_schema_drift",
      """WITH s AS (SELECT
        |    CASE WHEN extract(day FROM ts) <= 15 THEN 'ref'
        |      ELSE 'cur' END AS win,
        |    event_type,
        |    CAST(least(greatest(CAST(floor("value" / 25) AS INT), -4),
        |      7) AS VARCHAR) AS vb,
        |    CAST(user_id % 16 AS VARCHAR) AS ub,
        |    CAST(user_id AS VARCHAR) AS uraw,
        |    CAST("value" AS VARCHAR) AS vraw
        |  FROM events),
        |u AS (
        |  SELECT win, 'event_type' AS cname, event_type AS cat,
        |    event_type AS dv FROM s
        |  UNION ALL
        |  SELECT win, 'user_id' AS cname, ub AS cat, uraw AS dv FROM s
        |  UNION ALL
        |  SELECT win, 'value' AS cname, vb AS cat, vraw AS dv FROM s),
        |c AS (SELECT cname, win, cat, count(*) AS c
        |  FROM u GROUP BY 1, 2, 3),
        |nd AS (SELECT cname, win, count(DISTINCT dv) AS ndv,
        |    count(*) AS n
        |  FROM u GROUP BY 1, 2),
        |g AS (SELECT cname, cat,
        |    CAST(count(*) OVER (PARTITION BY cname) AS BIGINT) AS nb
        |  FROM (SELECT DISTINCT cname, cat FROM c)),
        |x AS (SELECT g.cname, g.cat,
        |    (coalesce(cr.c, 0) + 1) / CAST(nr.n + g.nb AS DOUBLE) AS p,
        |    (coalesce(cc.c, 0) + 1) / CAST(nc.n + g.nb AS DOUBLE) AS q
        |  FROM g
        |  JOIN nd nr ON nr.cname = g.cname AND nr.win = 'ref'
        |  JOIN nd nc ON nc.cname = g.cname AND nc.win = 'cur'
        |  LEFT JOIN c cr ON cr.cname = g.cname AND cr.cat = g.cat
        |    AND cr.win = 'ref'
        |  LEFT JOIN c cc ON cc.cname = g.cname AND cc.cat = g.cat
        |    AND cc.win = 'cur'),
        |p AS (SELECT cname,
        |    floor(CAST(sum(CAST((p - q) * ln(p / q) AS DECIMAL(28,12)))
        |      AS DOUBLE) * 10000 + 0.5) / 10000.0 AS psi
        |  FROM x GROUP BY 1)
        |SELECT p.cname AS column_name,
        |  CAST(nr.n AS BIGINT) AS n_ref, CAST(nc.n AS BIGINT) AS n_cur,
        |  CAST(nr.ndv AS BIGINT) AS distinct_ref,
        |  CAST(nc.ndv AS BIGINT) AS distinct_cur,
        |  psi, CAST(psi > 0.25 AS BOOLEAN) AS drift_flag
        |FROM p
        |JOIN nd nr ON nr.cname = p.cname AND nr.win = 'ref'
        |JOIN nd nc ON nc.cname = p.cname AND nc.win = 'cur'
        |ORDER BY p.cname""") { (s, d) =>
      val base = Tables.events(s, d).select(
        when(dayofmonth(col("ts")) <= 15, "ref").otherwise("cur")
          .as("win"),
        col("event_type"),
        least(greatest(floor(col("value") / 25).cast("int"), lit(-4)),
          lit(7)).cast("string").as("vb"),
        (col("user_id") % 16).cast("string").as("ub"),
        col("user_id").cast("string").as("uraw"),
        col("value").cast("string").as("vraw"))
      val u = base.selectExpr("win",
        """stack(3,
          |  'event_type', event_type, event_type,
          |  'user_id', ub, uraw,
          |  'value', vb, vraw) AS (cname, cat, dv)""".stripMargin)
      val c = u.groupBy(col("cname"), col("win"), col("cat"))
        .agg(count(lit(1)).as("c")).cache()
      val nd = u.groupBy(col("cname"), col("win"))
        .agg(countDistinct(col("dv")).as("ndv"), count(lit(1)).as("n"))
        .cache()
      val g = c.select(col("cname"), col("cat")).distinct()
        .withColumn("nb",
          count(lit(1)).over(Window.partitionBy(col("cname"))))
      val x = g
        .join(nd.filter(col("win") === "ref")
          .select(col("cname"), col("n").as("n_ref")), Seq("cname"))
        .join(nd.filter(col("win") === "cur")
          .select(col("cname"), col("n").as("n_cur")), Seq("cname"))
        .join(c.filter(col("win") === "ref")
          .select(col("cname"), col("cat"), col("c").as("c_ref")),
          Seq("cname", "cat"), "left")
        .join(c.filter(col("win") === "cur")
          .select(col("cname"), col("cat"), col("c").as("c_cur")),
          Seq("cname", "cat"), "left")
        .select(col("cname"),
          ((coalesce(col("c_ref"), lit(0L)) + 1) /
            (col("n_ref") + col("nb")).cast("double")).as("p"),
          ((coalesce(col("c_cur"), lit(0L)) + 1) /
            (col("n_cur") + col("nb")).cast("double")).as("q"))
      val p = x.groupBy(col("cname"))
        .agg(expr("""CAST(floor(CAST(sum(CAST((p - q) * ln(p / q)
               |  AS DECIMAL(28,12))) AS DOUBLE) * 10000 + 0.5)
               |  / 10000.0 AS DOUBLE)""".stripMargin).as("psi"))
      p.join(nd.filter(col("win") === "ref")
          .select(col("cname"), col("n").as("nr"), col("ndv").as("dr")),
          Seq("cname"))
        .join(nd.filter(col("win") === "cur")
          .select(col("cname"), col("n").as("nc"), col("ndv").as("dc")),
          Seq("cname"))
        .select(col("cname").as("column_name"),
          col("nr").cast("long").as("n_ref"),
          col("nc").cast("long").as("n_cur"),
          col("dr").cast("long").as("distinct_ref"),
          col("dc").cast("long").as("distinct_cur"),
          col("psi"), (col("psi") > 0.25).as("drift_flag"))
        .orderBy(col("column_name"))
    },

    // DAILY VOLUME CONTROL CHART — the Shewhart x̄ guardrail on ingest
    // VOLUME (where stream_cusum watches value drift): each
    // (type, day) count is judged against the trailing 7 days' mean
    // ± 3σ, with mean and sample variance computed from EXACT integer
    // window sums (Σn, Σn²) so the only doubles are one division and
    // one IEEE sqrt — cross-engine exact. Days with fewer than 7
    // trailing observations stay unflagged (the chart needs its
    // baseline). All windows run over the |types|×|days| aggregated
    // relation partitioned per type — never raw rows.
    Q("dq_volume_anomaly",
      """WITH dd AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day, n,
        |    count(*) OVER tw AS k,
        |    sum(n) OVER tw AS s1,
        |    sum(n * n) OVER tw AS s2
        |  FROM dd WINDOW tw AS (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |z AS (SELECT event_type, day, n, k,
        |    s1 / CAST(k AS DOUBLE) AS m,
        |    sqrt(greatest((s2 - s1 * s1 / CAST(k AS DOUBLE))
        |      / (k - 1), 0)) AS sd
        |  FROM w WHERE k = 7)
        |SELECT event_type, CAST(day AS VARCHAR) AS day,
        |  CAST(n AS BIGINT) AS n,
        |  round(m, 4) AS expected_mean, round(sd, 4) AS sd,
        |  CAST(abs(n - m) > 3 * sd AS BOOLEAN) AS anomaly
        |FROM z ORDER BY event_type, day""") { (s, d) =>
      val dd = Tables.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      val tw = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-7, -1)
      val w = dd.select(col("event_type"), col("day"), col("n"),
        count(lit(1)).over(tw).as("k"),
        sum(col("n")).over(tw).as("s1"),
        sum(col("n") * col("n")).over(tw).as("s2"))
      val m = col("s1") / col("k").cast("double")
      val sd = sqrt(greatest(
        (col("s2") - col("s1") * col("s1") / col("k").cast("double")) /
          (col("k") - 1), lit(0d)))
      w.filter(col("k") === 7)
        .select(col("event_type"), col("day").cast("string").as("day"),
          col("n").cast("long").as("n"),
          round(m, 4).as("expected_mean"), round(sd, 4).as("sd"),
          (abs(col("n") - m) > lit(3) * sd).as("anomaly"))
        .orderBy(col("event_type"), col("day"))
    },

    // CANDIDATE-KEY DISCOVERY — the schema-inference census a pipeline
    // runs before it can dedup, upsert, or join a new feed: for each
    // declared candidate column set, uniqueness = |distinct|/|rows|
    // and the is_key verdict. The probe list pins the two canonical
    // TPC-H traps: o_orderkey IS a key; (l_orderkey, l_linenumber)
    // famously is NOT in this fixture (the generator repeats line
    // numbers — the same trap FIXTURES.md documents for row-level
    // lineitem ordering), while the full physical row is. Each probe
    // is one column-pruned scan + DISTINCT rollup plus a count(*)
    // aggregate, both IN-PLAN (1-row × 1-row broadcast cross join —
    // the SQL's scalar subqueries): building/EXPLAINing the plan
    // costs nothing, mirroring every other lazy builder here. Exact
    // at test scale; at 100 TB the same census stacks
    // approx_count_distinct (agg_approx_distinct's machinery, one
    // shared scan) and promotes only near-1.0 candidates to an exact
    // confirm pass. Counts stay BIGINT; the ratio is one divide.
    Q("dq_key_discovery",
      """WITH probes AS (
        |  SELECT 'orders' AS tbl, 'o_orderkey' AS key_cols,
        |    (SELECT count(*) FROM orders) AS n_rows,
        |    (SELECT count(*) FROM (SELECT DISTINCT o_orderkey FROM orders))
        |      AS n_distinct
        |  UNION ALL
        |  SELECT 'orders', 'o_custkey',
        |    (SELECT count(*) FROM orders),
        |    (SELECT count(*) FROM (SELECT DISTINCT o_custkey FROM orders))
        |  UNION ALL
        |  SELECT 'orders', 'o_custkey,o_orderdate',
        |    (SELECT count(*) FROM orders),
        |    (SELECT count(*) FROM (SELECT DISTINCT o_custkey, o_orderdate
        |      FROM orders))
        |  UNION ALL
        |  SELECT 'lineitem', 'l_orderkey,l_linenumber',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber
        |      FROM lineitem))
        |  UNION ALL
        |  SELECT 'lineitem', 'l_orderkey,l_partkey,l_suppkey,l_linenumber',
        |    (SELECT count(*) FROM lineitem),
        |    (SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_partkey,
        |      l_suppkey, l_linenumber FROM lineitem)))
        |SELECT tbl, key_cols, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_distinct AS BIGINT) AS n_distinct,
        |  round(n_distinct / CAST(n_rows AS DOUBLE), 4) AS uniqueness,
        |  CAST(n_distinct = n_rows AS BOOLEAN) AS is_key
        |FROM probes ORDER BY tbl, key_cols""") { (s, d) =>
      def probe(df: DataFrame, tbl: String, cols: Seq[String]): DataFrame =
        df.select(cols.map(col): _*).distinct()
          .agg(count(lit(1)).as("n_distinct"))
          .crossJoin(broadcast(df.agg(count(lit(1)).as("n_rows"))))
          .select(lit(tbl).as("tbl"),
            lit(cols.mkString(",")).as("key_cols"),
            col("n_rows"), col("n_distinct"))
      val o = Tables.orders(s, d)
      val li = Tables.lineitem(s, d)
      Seq(
        probe(o, "orders", Seq("o_orderkey")),
        probe(o, "orders", Seq("o_custkey")),
        probe(o, "orders", Seq("o_custkey", "o_orderdate")),
        probe(li, "lineitem", Seq("l_orderkey", "l_linenumber")),
        probe(li, "lineitem",
          Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber")))
        .reduce(_ unionByName _)
        .select(col("tbl"), col("key_cols"),
          col("n_rows").cast("long").as("n_rows"),
          col("n_distinct").cast("long").as("n_distinct"),
          round(col("n_distinct") / col("n_rows").cast("double"), 4)
            .as("uniqueness"),
          (col("n_distinct") === col("n_rows")).as("is_key"))
        .orderBy(col("tbl"), col("key_cols"))
    },

    // BOX-COX λ SELECTION (Box & Cox 1964) over positive event values —
    // the variance-stabilizing transform picker that belongs next to
    // norm_quantile/norm_robust: for each λ in the grid
    // {-1, 0, 1/2, 1}, the profile log-likelihood
    // ℓ(λ) = −(n/2)·ln σ̂²_λ + (λ−1)·Σ ln x, maximized over the grid.
    // The grid avoids pow() entirely — each transform is spelled with
    // 1/x, sqrt, ln, x (all correctly-rounded or single-libm-call
    // forms) — and ALL TEN sums land in ONE stacked hash aggregate
    // over one scan (no per-λ pass, no explode): per-row transform
    // terms quantize to DECIMAL so the sums are order-free. The argmax
    // is a rank over the 5-row grid relation.
    Q("norm_boxcox",
      """WITH x AS (SELECT CAST(value AS DOUBLE) AS v FROM events
        |  WHERE value > 0),
        |s AS (SELECT count(*) AS n,
        |    CAST(sum(CAST(round(ln(v), 12) AS DECIMAL(28,12))) AS DOUBLE)
        |      AS slx,
        |    CAST(sum(CAST(round(1 - 1 / v, 10) AS DECIMAL(28,10)))
        |      AS DOUBLE) AS y1n, CAST(sum(CAST(round((1 - 1 / v)
        |      * (1 - 1 / v), 10) AS DECIMAL(28,10))) AS DOUBLE)
        |      AS y2n,
        |    CAST(sum(CAST(round((sqrt(v) - 1) / 0.5, 10)
        |      AS DECIMAL(28,10))) AS DOUBLE) AS y1h,
        |    CAST(sum(CAST(round(((sqrt(v) - 1) / 0.5)
        |      * ((sqrt(v) - 1) / 0.5), 10) AS DECIMAL(28,10)))
        |      AS DOUBLE) AS y2h,
        |    CAST(sum(CAST(round(ln(v) * ln(v), 10) AS DECIMAL(28,10)))
        |      AS DOUBLE) AS y2l,
        |    CAST(sum(CAST(round(v - 1, 10) AS DECIMAL(28,10))) AS DOUBLE)
        |      AS y1i, CAST(sum(CAST(round((v - 1) * (v - 1), 10)
        |      AS DECIMAL(28,10))) AS DOUBLE) AS y2i
        |  FROM x),
        |g AS (
        |  SELECT CAST(-1.0 AS DOUBLE) AS lambda, n, slx,
        |    y2n / n - (y1n / n) * (y1n / n) AS var FROM s
        |  UNION ALL SELECT CAST(0.5 AS DOUBLE), n, slx,
        |    y2h / n - (y1h / n) * (y1h / n) FROM s
        |  UNION ALL SELECT CAST(0.0 AS DOUBLE), n, slx,
        |    y2l / n - (slx / n) * (slx / n) FROM s
        |  UNION ALL SELECT CAST(1.0 AS DOUBLE), n, slx,
        |    y2i / n - (y1i / n) * (y1i / n) FROM s),
        |ll AS (SELECT lambda, n,
        |    -(n / 2.0) * ln(var) + (lambda - 1) * slx AS loglik
        |  FROM g),
        |r AS (SELECT lambda, n, loglik,
        |    row_number() OVER (ORDER BY loglik DESC, lambda) AS rk
        |  FROM ll)
        |SELECT lambda, CAST(n AS BIGINT) AS n,
        |  round(loglik, 4) AS loglik,
        |  CAST(rk = 1 AS BOOLEAN) AS is_best
        |FROM r ORDER BY lambda""") { (s, d) =>
      val x = Tables.events(s, d).filter(col("value") > 0)
        .select(col("value").cast("double").as("v"))
      def qsum(c: org.apache.spark.sql.Column, scale: Int) =
        sum(round(c, scale).cast(s"decimal(28,$scale)")).cast("double")
      val yn = lit(1) - lit(1) / col("v")        // λ=-1: (x^-1 - 1)/-1
      val yh = (sqrt(col("v")) - 1) / 0.5        // λ=1/2
      val yl = log(col("v"))                     // λ=0
      val yi = col("v") - 1                      // λ=1
      val st = x.agg(count(lit(1)).as("n"),
        qsum(log(col("v")), 12).as("slx"),
        qsum(yn, 10).as("y1n"), qsum(yn * yn, 10).as("y2n"),
        qsum(yh, 10).as("y1h"), qsum(yh * yh, 10).as("y2h"),
        qsum(yl * yl, 10).as("y2l"),
        qsum(yi, 10).as("y1i"), qsum(yi * yi, 10).as("y2i"))
      def row(lam: Double, y1: org.apache.spark.sql.Column,
          y2: org.apache.spark.sql.Column) =
        st.select(lit(lam).as("lambda"), col("n"), col("slx"),
          (y2 / col("n") - (y1 / col("n")) * (y1 / col("n"))).as("var"))
      val g = row(-1.0, col("y1n"), col("y2n"))
        .unionByName(row(0.5, col("y1h"), col("y2h")))
        .unionByName(row(0.0, col("slx"), col("y2l")))
        .unionByName(row(1.0, col("y1i"), col("y2i")))
      val ll = g.select(col("lambda"), col("n"),
        (-(col("n") / 2.0) * log(col("var")) +
          (col("lambda") - 1) * col("slx")).as("loglik"))
      val w = Window.orderBy(col("loglik").desc, col("lambda"))
      ll.withColumn("rk", row_number().over(w))
        .select(col("lambda"), col("n").cast("long").as("n"),
          round(col("loglik"), 4).as("loglik"),
          (col("rk") === 1).as("is_best"))
        .orderBy(col("lambda"))
    },

    // YEO-JOHNSON λ SELECTION (Yeo & Johnson 2000) — norm_boxcox's
    // sibling for SIGNED data (here value − 100, so both branches are
    // genuinely exercised): positives transform like Box-Cox on x+1,
    // negatives mirror with exponent 2−λ, and the profile
    // log-likelihood adds the Jacobian term (λ−1)·Σ sgn(x)·ln(1+|x|).
    // The λ grid {0, 1/2, 1, 2} keeps every power a sqrt/product chain
    // (no libm pow — determinism rule 22); one stacked power-sum scan,
    // every term DECIMAL-quantized.
    Q("norm_yeo_johnson",
      """WITH x AS (SELECT CAST(value AS DOUBLE) - 100 AS v FROM events),
        |s AS (SELECT count(*) AS n,
        |    CAST(sum(CAST(round(CASE WHEN v >= 0 THEN ln(1 + v)
        |      ELSE -ln(1 - v) END, 12) AS DECIMAL(28,12))) AS DOUBLE)
        |      AS slx,
        |    CAST(sum(CAST(round(CASE WHEN v >= 0 THEN ln(v + 1)
        |      ELSE -(((1 - v) * (1 - v)) - 1) / 2 END, 10)
        |      AS DECIMAL(28,10))) AS DOUBLE) AS y10,
        |    CAST(sum(CAST(round((CASE WHEN v >= 0 THEN ln(v + 1)
        |      ELSE -(((1 - v) * (1 - v)) - 1) / 2 END)
        |      * (CASE WHEN v >= 0 THEN ln(v + 1)
        |      ELSE -(((1 - v) * (1 - v)) - 1) / 2 END), 10)
        |      AS DECIMAL(28,10))) AS DOUBLE) AS y20,
        |    CAST(sum(CAST(round(CASE WHEN v >= 0 THEN 2 * (sqrt(v + 1) - 1)
        |      ELSE -(((1 - v) * sqrt(1 - v)) - 1) / 1.5 END, 10)
        |      AS DECIMAL(28,10))) AS DOUBLE) AS y1h,
        |    CAST(sum(CAST(round((CASE WHEN v >= 0 THEN 2 * (sqrt(v + 1) - 1)
        |      ELSE -(((1 - v) * sqrt(1 - v)) - 1) / 1.5 END)
        |      * (CASE WHEN v >= 0 THEN 2 * (sqrt(v + 1) - 1)
        |      ELSE -(((1 - v) * sqrt(1 - v)) - 1) / 1.5 END), 10)
        |      AS DECIMAL(28,10))) AS DOUBLE) AS y2h,
        |    CAST(sum(CAST(round(v, 10) AS DECIMAL(28,10))) AS DOUBLE)
        |      AS y1i,
        |    CAST(sum(CAST(round(v * v, 10) AS DECIMAL(28,10))) AS DOUBLE)
        |      AS y2i,
        |    CAST(sum(CAST(round(CASE WHEN v >= 0
        |      THEN ((v + 1) * (v + 1) - 1) / 2
        |      ELSE -ln(1 - v) END, 10) AS DECIMAL(28,10))) AS DOUBLE)
        |      AS y1t,
        |    CAST(sum(CAST(round((CASE WHEN v >= 0
        |      THEN ((v + 1) * (v + 1) - 1) / 2
        |      ELSE -ln(1 - v) END) * (CASE WHEN v >= 0
        |      THEN ((v + 1) * (v + 1) - 1) / 2
        |      ELSE -ln(1 - v) END), 10) AS DECIMAL(28,10))) AS DOUBLE)
        |      AS y2t
        |  FROM x),
        |g AS (
        |  SELECT CAST(0.0 AS DOUBLE) AS lambda, n, slx,
        |    y20 / n - (y10 / n) * (y10 / n) AS var FROM s
        |  UNION ALL SELECT CAST(0.5 AS DOUBLE), n, slx,
        |    y2h / n - (y1h / n) * (y1h / n) FROM s
        |  UNION ALL SELECT CAST(1.0 AS DOUBLE), n, slx,
        |    y2i / n - (y1i / n) * (y1i / n) FROM s
        |  UNION ALL SELECT CAST(2.0 AS DOUBLE), n, slx,
        |    y2t / n - (y1t / n) * (y1t / n) FROM s),
        |ll AS (SELECT lambda, n,
        |    -(n / 2.0) * ln(var) + (lambda - 1) * slx AS loglik
        |  FROM g),
        |r AS (SELECT lambda, n, loglik,
        |    row_number() OVER (ORDER BY loglik DESC, lambda) AS rk
        |  FROM ll)
        |SELECT lambda, CAST(n AS BIGINT) AS n,
        |  round(loglik, 4) AS loglik,
        |  CAST(rk = 1 AS BOOLEAN) AS is_best
        |FROM r ORDER BY lambda""") { (s, d) =>
      val x = Tables.events(s, d)
        .select((col("value").cast("double") - 100).as("v"))
      def qsum(c: org.apache.spark.sql.Column, scale: Int) =
        sum(round(c, scale).cast(s"decimal(28,$scale)")).cast("double")
      val sgnLn = expr(
        "CASE WHEN v >= 0 THEN ln(1 + v) ELSE -ln(1 - v) END")
      val y0 = expr("""CASE WHEN v >= 0 THEN ln(v + 1)
        |  ELSE -(((1 - v) * (1 - v)) - 1) / 2 END""".stripMargin)
      val yh = expr("""CASE WHEN v >= 0 THEN 2 * (sqrt(v + 1) - 1)
        |  ELSE -(((1 - v) * sqrt(1 - v)) - 1) / 1.5 END""".stripMargin)
      val yi = col("v")
      val yt = expr("""CASE WHEN v >= 0 THEN ((v + 1) * (v + 1) - 1) / 2
        |  ELSE -ln(1 - v) END""".stripMargin)
      val st = x.agg(count(lit(1)).as("n"),
        qsum(sgnLn, 12).as("slx"),
        qsum(y0, 10).as("y10"), qsum(y0 * y0, 10).as("y20"),
        qsum(yh, 10).as("y1h"), qsum(yh * yh, 10).as("y2h"),
        qsum(yi, 10).as("y1i"), qsum(yi * yi, 10).as("y2i"),
        qsum(yt, 10).as("y1t"), qsum(yt * yt, 10).as("y2t"))
      def row(lam: Double, y1: org.apache.spark.sql.Column,
          y2: org.apache.spark.sql.Column) =
        st.select(lit(lam).as("lambda"), col("n"), col("slx"),
          (y2 / col("n") - (y1 / col("n")) * (y1 / col("n"))).as("var"))
      val g = row(0.0, col("y10"), col("y20"))
        .unionByName(row(0.5, col("y1h"), col("y2h")))
        .unionByName(row(1.0, col("y1i"), col("y2i")))
        .unionByName(row(2.0, col("y1t"), col("y2t")))
      val ll = g.select(col("lambda"), col("n"),
        (-(col("n") / 2.0) * log(col("var")) +
          (col("lambda") - 1) * col("slx")).as("loglik"))
      val w = Window.orderBy(col("loglik").desc, col("lambda"))
      ll.withColumn("rk", row_number().over(w))
        .select(col("lambda"), col("n").cast("long").as("n"),
          round(col("loglik"), 4).as("loglik"),
          (col("rk") === 1).as("is_best"))
        .orderBy(col("lambda"))
    },

    // IN-ENGINE LOGISTIC REGRESSION via IRLS (ridge-regularized
    // Newton, 3 unrolled rounds) — the quality-classifier TRAINING
    // step a data pipeline otherwise ships out to a Python job: fit
    // p(source-group | ln-length, type-token-ratio) entirely as hash
    // aggregates. Each round is ONE corpus scan producing the 9
    // weighted sufficient statistics (X'WX upper triangle + gradient
    // X'(y−p), every term DECIMAL-quantized → order-free), then the
    // TRUE ridge-Newton system (X'WX + λD)δ = X'(y−p) − λDβ with
    // D = diag(0,1,1), λ = 1 — slopes penalized, intercept NOT, and
    // the −λβ gradient term means separable data converges to the
    // bounded ridge optimum instead of drifting toward the MLE —
    // solves in CLOSED FORM by cofactors on the 1-row relation, and
    // the new β broadcasts into the next round — the exact shape
    // distributed L-BFGS/Newton solvers use (aggregate sufficient
    // stats, driver-side tiny solve), with the "driver" here being a
    // 1-row cross join. β quantizes to 10 dp between rounds so both
    // engines walk identical IEEE trajectories through exp(). Round 1
    // starts at β = 0 where the sigmoid is exactly 1/2. Output: the
    // fitted coefficients and the final-model logloss.
    Q("pipe_quality_logit", {
      val fCte =
        """f AS (SELECT
          |    CASE WHEN source IN ('src0','src1','src2','src3','src4')
          |      THEN 1 ELSE 0 END AS y,
          |    ln(1 + length(text)) AS f1,
          |    len(list_distinct(string_split(text, ' ')))
          |      / CAST(len(string_split(text, ' ')) AS DOUBLE) AS f2
          |  FROM documents)""".stripMargin
      def p(b: String) =
        s"1 / (1 + exp(-($b.b0 + $b.b1 * f.f1 + $b.b2 * f.f2)))"
      def sumsCte(i: Int, b: String) = {
        val pe = p(b)
        s"""s$i AS (SELECT count(*) AS n,
           |    CAST(sum(CAST(round(($pe) * (1 - ($pe)), 10)
           |      AS DECIMAL(28,10))) AS DOUBLE) AS sa,
           |    CAST(sum(CAST(round(($pe) * (1 - ($pe)) * f.f1, 10)
           |      AS DECIMAL(28,10))) AS DOUBLE) AS sb,
           |    CAST(sum(CAST(round(($pe) * (1 - ($pe)) * f.f2, 10)
           |      AS DECIMAL(28,10))) AS DOUBLE) AS sc,
           |    CAST(sum(CAST(round(($pe) * (1 - ($pe)) * f.f1 * f.f1, 10)
           |      AS DECIMAL(28,10))) AS DOUBLE) AS sd,
           |    CAST(sum(CAST(round(($pe) * (1 - ($pe)) * f.f1 * f.f2, 10)
           |      AS DECIMAL(28,10))) AS DOUBLE) AS se,
           |    CAST(sum(CAST(round(($pe) * (1 - ($pe)) * f.f2 * f.f2, 10)
           |      AS DECIMAL(28,10))) AS DOUBLE) AS sf,
           |    CAST(sum(CAST(round(f.y - ($pe), 10)
           |      AS DECIMAL(28,10))) AS DOUBLE) AS g0,
           |    CAST(sum(CAST(round((f.y - ($pe)) * f.f1, 10)
           |      AS DECIMAL(28,10))) AS DOUBLE) AS g1,
           |    CAST(sum(CAST(round((f.y - ($pe)) * f.f2, 10)
           |      AS DECIMAL(28,10))) AS DOUBLE) AS g2
           |  FROM f CROSS JOIN $b)""".stripMargin
      }
      def betaCte(i: Int, b: String) =
        s"""b$i AS (SELECT
           |    round($b.b0 + (
           |      ((sd + 1) * (sf + 1) - se * se) * g0
           |      + (sc * se - sb * (sf + 1)) * (g1 - $b.b1)
           |      + (sb * se - sc * (sd + 1)) * (g2 - $b.b2))
           |      / (sa * ((sd + 1) * (sf + 1) - se * se)
           |        - sb * (sb * (sf + 1) - se * sc)
           |        + sc * (sb * se - (sd + 1) * sc)), 10) AS b0,
           |    round($b.b1 + (
           |      (sc * se - sb * (sf + 1)) * g0
           |      + (sa * (sf + 1) - sc * sc) * (g1 - $b.b1)
           |      + (sc * sb - sa * se) * (g2 - $b.b2))
           |      / (sa * ((sd + 1) * (sf + 1) - se * se)
           |        - sb * (sb * (sf + 1) - se * sc)
           |        + sc * (sb * se - (sd + 1) * sc)), 10) AS b1,
           |    round($b.b2 + (
           |      (sb * se - sc * (sd + 1)) * g0
           |      + (sc * sb - sa * se) * (g1 - $b.b1)
           |      + (sa * (sd + 1) - sb * sb) * (g2 - $b.b2))
           |      / (sa * ((sd + 1) * (sf + 1) - se * se)
           |        - sb * (sb * (sf + 1) - se * sc)
           |        + sc * (sb * se - (sd + 1) * sc)), 10) AS b2
           |  FROM s$i CROSS JOIN $b)""".stripMargin
      val pe3 = p("b3")
      s"""WITH $fCte,
         |b0r AS (SELECT CAST(0 AS DOUBLE) AS b0, CAST(0 AS DOUBLE) AS b1,
         |  CAST(0 AS DOUBLE) AS b2),
         |${sumsCte(1, "b0r")},
         |${betaCte(1, "b0r")},
         |${sumsCte(2, "b1")},
         |${betaCte(2, "b1")},
         |${sumsCte(3, "b2")},
         |${betaCte(3, "b2")},
         |ll AS (SELECT count(*) AS n,
         |    CAST(sum(CAST(round(-(f.y * ln($pe3)
         |      + (1 - f.y) * ln(1 - ($pe3))), 10)
         |      AS DECIMAL(28,10))) AS DOUBLE) AS nll
         |  FROM f CROSS JOIN b3 GROUP BY ALL)
         |SELECT CAST(ll.n AS BIGINT) AS n,
         |  round(b3.b0, 4) AS beta0, round(b3.b1, 4) AS beta1,
         |  round(b3.b2, 4) AS beta2,
         |  round(ll.nll / ll.n, 4) AS logloss
         |FROM ll CROSS JOIN b3""".stripMargin
    }) { (s, d) =>
      val f = Tables.documents(s, d).select(
        when(col("source").isin("src0", "src1", "src2", "src3", "src4"), 1)
          .otherwise(0).as("y"),
        log(lit(1) + length(col("text"))).as("f1"),
        (size(array_distinct(split(col("text"), " "))) /
          size(split(col("text"), " ")).cast("double")).as("f2"))
      def q10(c: org.apache.spark.sql.Column) =
        sum(round(c, 10).cast("decimal(28,10)")).cast("double")
      // One IRLS round: sufficient statistics under the incoming β,
      // then the closed-form ridge-Newton step on the 1-row relation.
      def irlsRound(beta: org.apache.spark.sql.DataFrame)
          : org.apache.spark.sql.DataFrame = {
        val pe = lit(1) / (lit(1) + exp(-(col("b0") + col("b1") * col("f1")
          + col("b2") * col("f2"))))
        val wgt = pe * (lit(1) - pe)
        val st = f.crossJoin(broadcast(beta))
          .agg(count(lit(1)).as("n"),
            q10(wgt).as("sa"), q10(wgt * col("f1")).as("sb"),
            q10(wgt * col("f2")).as("sc"),
            q10(wgt * col("f1") * col("f1")).as("sd"),
            q10(wgt * col("f1") * col("f2")).as("se"),
            q10(wgt * col("f2") * col("f2")).as("sf"),
            q10(col("y") - pe).as("g0"),
            q10((col("y") - pe) * col("f1")).as("g1"),
            q10((col("y") - pe) * col("f2")).as("g2"))
        val (a11, a12, a13) = (col("sa"), col("sb"), col("sc"))
        val (a22, a23, a33) = (col("sd") + 1, col("se"), col("sf") + 1)
        // True ridge Newton step: H = X'WX + λ·diag(0,1,1) and the
        // gradient carries −λβ on the SLOPES only (intercept
        // unpenalized) — g − λDβ, so on separable data the slopes
        // stay bounded by the penalty instead of drifting to the MLE.
        val h1 = col("g1") - col("p1")
        val h2 = col("g2") - col("p2")
        val det = a11 * (a22 * a33 - a23 * a23) -
          a12 * (a12 * a33 - a23 * a13) + a13 * (a12 * a23 - a22 * a13)
        val d0 = ((a22 * a33 - a23 * a23) * col("g0")
          + (a13 * a23 - a12 * a33) * h1
          + (a12 * a23 - a13 * a22) * h2) / det
        val d1 = ((a13 * a23 - a12 * a33) * col("g0")
          + (a11 * a33 - a13 * a13) * h1
          + (a13 * a12 - a11 * a23) * h2) / det
        val d2 = ((a12 * a23 - a13 * a22) * col("g0")
          + (a13 * a12 - a11 * a23) * h1
          + (a11 * a22 - a12 * a12) * h2) / det
        st.crossJoin(broadcast(beta.select(col("b0").as("p0"),
            col("b1").as("p1"), col("b2").as("p2"))))
          .select(round(col("p0") + d0, 10).as("b0"),
            round(col("p1") + d1, 10).as("b1"),
            round(col("p2") + d2, 10).as("b2"))
      }
      import s.implicits._
      val beta0 = Seq((0.0, 0.0, 0.0)).toDF("b0", "b1", "b2")
      val b3 = irlsRound(irlsRound(irlsRound(beta0)))
      val pe3 = lit(1) / (lit(1) + exp(-(col("b0") + col("b1") * col("f1")
        + col("b2") * col("f2"))))
      val ll = f.crossJoin(broadcast(b3))
        .agg(count(lit(1)).as("n"),
          q10(-(col("y") * log(pe3) + (lit(1) - col("y")) *
            log(lit(1) - pe3))).as("nll"),
          max(col("b0")).as("b0"), max(col("b1")).as("b1"),
          max(col("b2")).as("b2"))
      ll.select(col("n").cast("long").as("n"),
        round(col("b0"), 4).as("beta0"), round(col("b1"), 4).as("beta1"),
        round(col("b2"), 4).as("beta2"),
        round(col("nll") / col("n"), 4).as("logloss"))
    },

    // FUNCTIONAL-DEPENDENCY CENSUS — the sibling of dq_key_discovery a
    // schema-inference pass runs next: for each declared A → B probe,
    // does every A value map to exactly one B? Violations = LHS groups
    // with >1 distinct RHS; max_rhs is the worst fan-out (the repair
    // cost estimate). Each probe is ONE column-pruned groupBy with a
    // distinct-count — no joins, no driver work; at 100 TB the same
    // census runs approx_count_distinct first and exact-confirms only
    // the near-1 probes (dq_key_discovery's documented pattern).
    Q("dq_functional_deps",
      """WITH probes AS (
        |  SELECT 'customer' AS tbl, 'c_custkey->c_nationkey' AS fd,
        |    count(*) AS n_lhs,
        |    sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS n_violating,
        |    max(nd) AS max_rhs
        |  FROM (SELECT c_custkey, count(DISTINCT c_nationkey) AS nd
        |    FROM customer GROUP BY 1)
        |  UNION ALL
        |  SELECT 'customer', 'c_nationkey->c_mktsegment', count(*),
        |    sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END), max(nd)
        |  FROM (SELECT c_nationkey, count(DISTINCT c_mktsegment) AS nd
        |    FROM customer GROUP BY 1)
        |  UNION ALL
        |  SELECT 'nation', 'n_nationkey->n_regionkey', count(*),
        |    sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END), max(nd)
        |  FROM (SELECT n_nationkey, count(DISTINCT n_regionkey) AS nd
        |    FROM nation GROUP BY 1)
        |  UNION ALL
        |  SELECT 'orders', 'o_custkey->o_orderpriority', count(*),
        |    sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END), max(nd)
        |  FROM (SELECT o_custkey, count(DISTINCT o_orderpriority) AS nd
        |    FROM orders GROUP BY 1)
        |  UNION ALL
        |  SELECT 'lineitem', 'l_orderkey->l_returnflag', count(*),
        |    sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END), max(nd)
        |  FROM (SELECT l_orderkey, count(DISTINCT l_returnflag) AS nd
        |    FROM lineitem GROUP BY 1))
        |SELECT tbl, fd, CAST(n_lhs AS BIGINT) AS n_lhs,
        |  CAST(n_violating AS BIGINT) AS n_violating,
        |  CAST(max_rhs AS BIGINT) AS max_rhs,
        |  CAST(n_violating = 0 AS BOOLEAN) AS holds
        |FROM probes ORDER BY tbl, fd""") { (s, d) =>
      def probe(df: DataFrame, tbl: String, lhs: String, rhs: String)
          : DataFrame =
        df.groupBy(col(lhs))
          .agg(countDistinct(col(rhs)).as("nd"))
          .agg(count(lit(1)).as("n_lhs"),
            sum(when(col("nd") > 1, 1).otherwise(0)).as("n_violating"),
            max(col("nd")).as("max_rhs"))
          .select(lit(tbl).as("tbl"), lit(s"$lhs->$rhs").as("fd"),
            col("n_lhs"), col("n_violating"), col("max_rhs"))
      Seq(
        probe(Tables.customer(s, d), "customer", "c_custkey", "c_nationkey"),
        probe(Tables.customer(s, d), "customer", "c_nationkey",
          "c_mktsegment"),
        probe(Tables.nation(s, d), "nation", "n_nationkey", "n_regionkey"),
        probe(Tables.orders(s, d), "orders", "o_custkey",
          "o_orderpriority"),
        probe(Tables.lineitem(s, d), "lineitem", "l_orderkey",
          "l_returnflag"))
        .reduce(_ unionByName _)
        .select(col("tbl"), col("fd"), col("n_lhs").cast("long").as("n_lhs"),
          col("n_violating").cast("long").as("n_violating"),
          col("max_rhs").cast("long").as("max_rhs"),
          (col("n_violating") === 0).as("holds"))
        .orderBy(col("tbl"), col("fd"))
    },

    // FORMAT-CLASS CENSUS over string columns — the regex-type
    // inference a pipeline runs on a NEW feed before writing parsers:
    // each value classifies into the FIRST matching class of a fixed
    // ladder (id_hash 'Word#digits', alpha_space, code_upper
    // 'd-UPPER', numeric, other), and the census reports per-class
    // counts and the column's dominant-class conformance share. One
    // stacked scan per column; regex classes are anchored literals —
    // identical RE2/Java semantics. A conformance share < 1.0 on a
    // column the schema declares uniform IS the data-quality alert.
    Q("dq_format_census", {
      val ladder =
        """CASE
          |      WHEN regexp_matches(v, '^[A-Za-z]+#[0-9]+$') THEN 'id_hash'
          |      WHEN regexp_matches(v, '^[a-z ]+$') THEN 'alpha_space'
          |      WHEN regexp_matches(v, '^[0-9]-[A-Z ]+$') THEN 'code_upper'
          |      WHEN regexp_matches(v, '^[0-9]+$') THEN 'numeric'
          |      ELSE 'other' END""".stripMargin
      s"""WITH u AS (
         |  SELECT 'c_name' AS col, c_name AS v FROM customer
         |  UNION ALL SELECT 'p_name', p_name FROM part
         |  UNION ALL SELECT 'p_brand', p_brand FROM part
         |  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders),
         |c AS (SELECT col, $ladder AS cls, count(*) AS n
         |  FROM u GROUP BY 1, 2),
         |t AS (SELECT col, cls, n, sum(n) OVER (PARTITION BY col) AS tot,
         |    max(n) OVER (PARTITION BY col) AS top
         |  FROM c)
         |SELECT col, cls, CAST(n AS BIGINT) AS n,
         |  round(n / CAST(tot AS DOUBLE), 4) AS share,
         |  CAST(n = top AS BOOLEAN) AS dominant
         |FROM t ORDER BY col, cls""".stripMargin
    }) { (s, d) =>
      val ladder =
        """CASE
          |  WHEN v RLIKE '^[A-Za-z]+#[0-9]+$' THEN 'id_hash'
          |  WHEN v RLIKE '^[a-z ]+$' THEN 'alpha_space'
          |  WHEN v RLIKE '^[0-9]-[A-Z ]+$' THEN 'code_upper'
          |  WHEN v RLIKE '^[0-9]+$' THEN 'numeric'
          |  ELSE 'other' END""".stripMargin
      val u = Tables.customer(s, d)
        .select(lit("c_name").as("col"), col("c_name").as("v"))
        .unionByName(Tables.part(s, d)
          .select(lit("p_name").as("col"), col("p_name").as("v")))
        .unionByName(Tables.part(s, d)
          .select(lit("p_brand").as("col"), col("p_brand").as("v")))
        .unionByName(Tables.orders(s, d)
          .select(lit("o_orderpriority").as("col"),
            col("o_orderpriority").as("v")))
      val c = u.select(col("col"), expr(ladder).as("cls"))
        .groupBy(col("col"), col("cls")).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("col"))
      c.withColumn("tot", sum(col("n")).over(w))
        .withColumn("top", max(col("n")).over(w))
        .select(col("col"), col("cls"), col("n").cast("long").as("n"),
          round(col("n") / col("tot").cast("double"), 4).as("share"),
          (col("n") === col("top")).as("dominant"))
        .orderBy(col("col"), col("cls"))
    },

    // MIXTURE DIVERSITY READOUT — entropy / effective-source-count /
    // max-share of the corpus source mixture, raw AND after the τ=0.5
    // temperature reweight (pipe_domain_temperature's sqrt idiom, so
    // no libm pow at a threshold): the one-row-per-mix summary a
    // data-mixing review reads before committing sampling weights.
    // Effective sources e^H is the "how many sources does this mix
    // really have" number; temperature must raise it (flatten) —
    // the spec law. Terms DECIMAL-quantized; sources are a bounded
    // vocabulary, so everything after the first rollup is tiny.
    Q("pipe_mix_effective_sources",
      """WITH n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1),
        |t AS (SELECT sum(n_docs) AS total FROM n),
        |w AS (SELECT source, n_docs,
        |    n_docs / CAST(t.total AS DOUBLE) AS p,
        |    CAST(round(sqrt(n_docs / CAST(t.total AS DOUBLE)), 12)
        |      AS DECIMAL(18,12)) AS wq
        |  FROM n CROSS JOIN t),
        |z AS (SELECT sum(wq) AS zq FROM w),
        |q AS (SELECT source, p,
        |    CAST(wq AS DOUBLE) / CAST(z.zq AS DOUBLE) AS pt
        |  FROM w CROSS JOIN z),
        |m AS (
        |  SELECT 'raw' AS mix, count(*) AS n_sources,
        |    CAST(sum(CAST(round(-(p * ln(p)), 12) AS DECIMAL(28,12)))
        |      AS DOUBLE) AS h,
        |    max(p) AS max_share
        |  FROM q
        |  UNION ALL
        |  SELECT 'tempered', count(*),
        |    CAST(sum(CAST(round(-(pt * ln(pt)), 12) AS DECIMAL(28,12)))
        |      AS DOUBLE),
        |    max(pt)
        |  FROM q)
        |SELECT mix, CAST(n_sources AS BIGINT) AS n_sources,
        |  round(h, 4) AS entropy,
        |  round(exp(h), 4) AS effective_sources,
        |  round(max_share, 4) AS max_share
        |FROM m ORDER BY mix""") { (s, d) =>
      val n = Tables.documents(s, d).groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"))
      val t = n.agg(sum(col("n_docs")).as("total"))
      val w = n.crossJoin(broadcast(t))
        .select(col("source"), col("n_docs"),
          (col("n_docs") / col("total").cast("double")).as("p"),
          round(sqrt(col("n_docs") / col("total").cast("double")), 12)
            .cast("decimal(18,12)").as("wq"))
      val z = w.agg(sum(col("wq")).as("zq"))
      val q = w.crossJoin(broadcast(z))
        .select(col("source"), col("p"),
          (col("wq").cast("double") / col("zq").cast("double")).as("pt"))
        .cache()
      def mixRow(name: String, pc: org.apache.spark.sql.Column) =
        q.agg(count(lit(1)).as("n_sources"),
          sum(round(-(pc * log(pc)), 12).cast("decimal(28,12)"))
            .cast("double").as("h"),
          max(pc).as("max_share"))
          .select(lit(name).as("mix"),
            col("n_sources").cast("long").as("n_sources"), col("h"),
            col("max_share"))
      mixRow("raw", col("p")).unionByName(mixRow("tempered", col("pt")))
        .select(col("mix"), col("n_sources"),
          round(col("h"), 4).as("entropy"),
          round(exp(col("h")), 4).as("effective_sources"),
          round(col("max_share"), 4).as("max_share"))
        .orderBy(col("mix"))
    },

    // VALUE-SET DRIFT census — the SET-membership twin of eval_psi's
    // distribution drift: per event type, which value BUCKETS exist in
    // the 'ref' window vs the 'cur' one, how many are NEW (the
    // schema-drift smell: a code nobody mapped), how many VANISHED
    // (the dead-feed smell), and the Jaccard overlap. NOTE the split
    // is DAY-OF-MONTH (day ≤ 15), fixture-scoped: on a corpus spanning
    // several months the two windows INTERLEAVE across months rather
    // than forming a before/after time split — a production run would
    // swap the CASE for a real cutoff (min(ts) + INTERVAL); the census
    // machinery downstream is unchanged by the window predicate. One
    // (type, bucket) rollup with per-window presence flags — exact
    // integers end to end; buckets bound the relation, not rows.
    Q("dq_value_drift",
      """WITH e AS (SELECT event_type,
        |    CASE WHEN CAST(date_part('day', ts) AS INT) <= 15
        |      THEN 'ref' ELSE 'cur' END AS win,
        |    CAST(floor(value / 10) AS BIGINT) AS b
        |  FROM events),
        |p AS (SELECT event_type, b,
        |    max(CASE WHEN win = 'ref' THEN 1 ELSE 0 END) AS in_ref,
        |    max(CASE WHEN win = 'cur' THEN 1 ELSE 0 END) AS in_cur
        |  FROM e GROUP BY 1, 2),
        |a AS (SELECT event_type,
        |    CAST(sum(in_ref) AS BIGINT) AS n_ref,
        |    CAST(sum(in_cur) AS BIGINT) AS n_cur,
        |    CAST(sum(in_ref * in_cur) AS BIGINT) AS n_shared,
        |    CAST(count(*) AS BIGINT) AS n_union
        |  FROM p GROUP BY 1)
        |SELECT event_type, n_ref, n_cur, n_shared,
        |  n_cur - n_shared AS n_new, n_ref - n_shared AS n_gone,
        |  round(n_shared / CAST(n_union AS DOUBLE), 4) AS jaccard
        |FROM a ORDER BY event_type""") { (s, d) =>
      val e = Tables.events(s, d).select(col("event_type"),
        when(dayofmonth(col("ts")) <= 15, "ref").otherwise("cur").as("win"),
        floor(col("value") / 10).cast("long").as("b"))
      e.groupBy(col("event_type"), col("b"))
        .agg(max(when(col("win") === "ref", 1).otherwise(0)).as("in_ref"),
          max(when(col("win") === "cur", 1).otherwise(0)).as("in_cur"))
        .groupBy(col("event_type"))
        .agg(sum(col("in_ref")).cast("long").as("n_ref"),
          sum(col("in_cur")).cast("long").as("n_cur"),
          sum(col("in_ref") * col("in_cur")).cast("long").as("n_shared"),
          count(lit(1)).cast("long").as("n_union"))
        .select(col("event_type"), col("n_ref"), col("n_cur"),
          col("n_shared"),
          (col("n_cur") - col("n_shared")).as("n_new"),
          (col("n_ref") - col("n_shared")).as("n_gone"),
          round(col("n_shared") / col("n_union").cast("double"), 4)
            .as("jaccard"))
        .orderBy(col("event_type"))
    })
}
