package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Second-wave scalar/analytic coverage (SURVEY.md §2.2): bitwise ops,
  * trig/log families, RANGE window frames, FILTER-clause aggregates,
  * correlated scalar subqueries, string/date/array function breadth.
  */
object ScalarQueries2 {

  def all: Seq[Q] = Seq(

    // Third string wave: edit distance (the fuzzy-matching primitive a
    // dedup pipeline reaches for at record-linkage granularity),
    // padding, printf formatting, codepoint round-trips.
    Q("str_funcs3",
      """SELECT p_partkey,
        |  CAST(levenshtein(p_brand, p_type) AS INT) AS brand_type_dist,
        |  CAST(levenshtein(p_name, reverse(p_name)) AS INT) AS palindrome_dist,
        |  rpad(p_brand, 12, '.') AS rpadded,
        |  printf('%s#%d', p_brand, p_size) AS tagged,
        |  CAST(ascii(p_name) AS INT) AS first_cp,
        |  chr(CAST(65 + p_partkey % 26 AS INT)) AS cycle_chr
        |FROM part
        |ORDER BY p_partkey""") { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          levenshtein(col("p_brand"), col("p_type")).as("brand_type_dist"),
          levenshtein(col("p_name"), reverse(col("p_name"))).as("palindrome_dist"),
          rpad(col("p_brand"), 12, ".").as("rpadded"),
          format_string("%s#%d", col("p_brand"), col("p_size")).as("tagged"),
          ascii(col("p_name")).as("first_cp"),
          expr("char(65 + p_partkey % 26)").as("cycle_chr"))
        .orderBy(col("p_partkey"))
    },

    // Array quantifiers + extrema (exists / forall / overlap): the
    // higher-order predicates the first array waves didn't cover.
    Q("arr_funcs3",
      """WITH t AS (SELECT p_partkey, string_split(p_name, ' ') AS toks FROM part)
        |SELECT p_partkey,
        |  list_has_any(toks, ['spring', 'small']) AS has_common,
        |  len(list_filter(toks, x -> length(x) > 12)) = 0 AS all_short,
        |  len(list_filter(toks, x -> x = 'green')) > 0 AS any_green,
        |  list_min(toks) AS amin,
        |  list_max(toks) AS amax,
        |  list_sort(toks, 'DESC')[1] AS desc_first
        |FROM t
        |ORDER BY p_partkey""") { (s, d) =>
      Tables.part(s, d)
        .withColumn("toks", split(col("p_name"), " "))
        .select(col("p_partkey"),
          arrays_overlap(col("toks"),
            array(lit("spring"), lit("small"))).as("has_common"),
          expr("forall(toks, x -> length(x) <= 12)").as("all_short"),
          expr("exists(toks, x -> x = 'green')").as("any_green"),
          array_min(col("toks")).as("amin"),
          array_max(col("toks")).as("amax"),
          expr("sort_array(toks, false)[0]").as("desc_first"))
        .orderBy(col("p_partkey"))
    },

    // Map higher-order functions: transform_values and map_filter (the
    // map-typed HOFs the first map wave didn't cover). Outputs reduce
    // to scalars/sorted strings — raw map values hash differently
    // across engines (entry order is unspecified in both).
    Q("map_funcs2",
      """WITH t AS (SELECT p_partkey,
        |    map(['brand', 'type'], [p_brand, p_type]) AS m
        |  FROM part)
        |SELECT p_partkey,
        |  CAST(len(list_filter(map_entries(m), e -> length(e.value) > 10)) AS INT) AS n_long,
        |  array_to_string(list_sort(list_transform(map_values(m), v -> upper(v))), '|') AS vals_upper,
        |  array_to_string(list_sort(map_keys(m)), ',') AS keys_cat
        |FROM t
        |ORDER BY p_partkey""") { (s, d) =>
      Tables.part(s, d)
        .withColumn("m", expr("map('brand', p_brand, 'type', p_type)"))
        .select(col("p_partkey"),
          expr("CAST(size(map_filter(m, (k, v) -> length(v) > 10)) AS INT)").as("n_long"),
          expr("array_join(array_sort(map_values(transform_values(m, (k, v) -> upper(v)))), '|')")
            .as("vals_upper"),
          expr("array_join(array_sort(map_keys(m)), ',')").as("keys_cat"))
        .orderBy(col("p_partkey"))
    },

    // Boolean/conditional aggregates: count_if, bool_and, bool_or.
    Q("agg_bool",
      """SELECT o_orderpriority,
        |  CAST(count(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT) AS n_big,
        |  bool_and(o_totalprice > 0) AS all_pos,
        |  bool_or(o_totalprice > 400000) AS any_huge
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""") { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(
          count_if(col("o_totalprice") > 200000).as("n_big"),
          bool_and(col("o_totalprice") > 0).as("all_pos"),
          bool_or(col("o_totalprice") > 400000).as("any_huge"))
        .orderBy(col("o_orderpriority"))
    },

    Q("str_funcs2",
      """SELECT p_partkey,
        |  reverse(p_name) AS rev,
        |  repeat(p_brand, 2) AS rep,
        |  translate(p_name, 'aeiou', 'AEIOU') AS caps_vowels,
        |  left(p_name, 3) AS l3,
        |  right(p_name, 3) AS r3,
        |  contains(p_name, 'ring') AS has_ring,
        |  starts_with(p_name, 'small') AS sm,
        |  ends_with(p_type, 'Y') AS endy
        |FROM part
        |ORDER BY p_partkey""") { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          reverse(col("p_name")).as("rev"),
          expr("repeat(p_brand, 2)").as("rep"),
          translate(col("p_name"), "aeiou", "AEIOU").as("caps_vowels"),
          expr("left(p_name, 3)").as("l3"),
          expr("right(p_name, 3)").as("r3"),
          col("p_name").contains("ring").as("has_ring"),
          col("p_name").startsWith("small").as("sm"),
          col("p_type").endsWith("Y").as("endy"))
        .orderBy(col("p_partkey"))
    },

    Q("math_funcs2",
      """SELECT o_orderkey,
        |  round(log10(o_totalprice), 4) AS l10,
        |  round(log2(o_totalprice), 4) AS l2,
        |  round(sin(CAST(o_orderkey % 7 AS DOUBLE)), 4) AS sn,
        |  round(cos(CAST(o_orderkey % 7 AS DOUBLE)), 4) AS cs,
        |  round(atan2(CAST(o_orderkey % 5 AS DOUBLE), 2.0), 4) AS at2,
        |  round(radians(CAST(o_orderkey % 360 AS DOUBLE)), 4) AS rad,
        |  round(degrees(1.0), 4) AS deg,
        |  CAST(o_orderkey & 255 AS BIGINT) AS band,
        |  CAST(o_orderkey | 4096 AS BIGINT) AS bor,
        |  CAST(xor(o_orderkey, 129) AS BIGINT) AS bxor,
        |  CAST((o_orderkey % 16) << 2 AS BIGINT) AS shl,
        |  CAST(o_orderkey >> 3 AS BIGINT) AS shr
        |FROM orders
        |ORDER BY o_orderkey""") { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          round(log10(col("o_totalprice")), 4).as("l10"),
          round(log2(col("o_totalprice")), 4).as("l2"),
          round(sin((col("o_orderkey") % 7).cast("double")), 4).as("sn"),
          round(cos((col("o_orderkey") % 7).cast("double")), 4).as("cs"),
          round(atan2((col("o_orderkey") % 5).cast("double"), lit(2.0)), 4).as("at2"),
          round(radians((col("o_orderkey") % 360).cast("double")), 4).as("rad"),
          round(degrees(lit(1.0)), 4).as("deg"),
          expr("CAST(o_orderkey & 255 AS BIGINT)").as("band"),
          expr("CAST(o_orderkey | 4096 AS BIGINT)").as("bor"),
          expr("CAST(o_orderkey ^ 129 AS BIGINT)").as("bxor"),
          expr("CAST(shiftleft(o_orderkey % 16, 2) AS BIGINT)").as("shl"),
          expr("CAST(shiftright(o_orderkey, 3) AS BIGINT)").as("shr"))
        .orderBy(col("o_orderkey"))
    },

    Q("dt_funcs2",
      """SELECT o_orderkey,
        |  CAST(weekofyear(o_orderdate) AS INT) AS woy,
        |  CAST(dayofyear(o_orderdate) AS INT) AS doy,
        |  strftime(strptime('2024-0' || CAST(o_orderkey % 9 + 1 AS VARCHAR) || '-15',
        |           '%Y-%m-%d'), '%Y-%m-%d') AS parsed
        |FROM orders
        |ORDER BY o_orderkey""") { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          weekofyear(col("o_orderdate")).as("woy"),
          dayofyear(col("o_orderdate")).as("doy"),
          date_format(to_date(
            concat(lit("2024-0"), (col("o_orderkey") % 9 + 1).cast("string"), lit("-15")),
            "yyyy-MM-dd"), "yyyy-MM-dd").as("parsed"))
        .orderBy(col("o_orderkey"))
    },

    Q("arr_funcs2",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(coalesce(list_position(toks, 'spark'), 0) AS BIGINT) AS spark_pos,
        |  CAST(len(flatten([list_slice(toks, 1, 2), list_slice(toks, 3, 4)])) AS INT) AS flat4,
        |  array_to_string(list_reverse(list_slice(toks, 1, 3)), ',') AS rev3
        |FROM t
        |ORDER BY doc_id""") { (s, d) =>
      // Spark array_position returns 0 when absent; DuckDB list_position
      // returns NULL — the oracle coalesces.
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          array_position(col("toks"), "spark").as("spark_pos"),
          size(flatten(array(slice(col("toks"), 1, 2), slice(col("toks"), 3, 2))))
            .as("flat4"),
          array_join(reverse(slice(col("toks"), 1, 3)), ",").as("rev3"))
        .orderBy(col("doc_id"))
    },

    // FILTER-clause aggregates: per-group conditional aggregation without
    // self-joins — one pass, partial+final like plain aggregates.
    Q("agg_filtered",
      """SELECT l_linestatus,
        |  CAST(count(*) FILTER (WHERE l_returnflag = 'A') AS BIGINT) AS n_a,
        |  CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS n_r,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS qty_disc
        |FROM lineitem
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""") { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .agg(
          expr("count(*) FILTER (WHERE l_returnflag = 'A')").as("n_a"),
          expr("count(*) FILTER (WHERE l_returnflag = 'R')").as("n_r"),
          expr("CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) FILTER (WHERE l_discount > 0.05) AS DOUBLE)").as("qty_disc"))
        .orderBy(col("l_linestatus"))
    },

    // RANGE frame: value-based window (peers included by value distance,
    // so tie order between engines cannot matter).
    // EVENT-TIME RANGE frame — the batch analog of a sliding stream
    // window: per user, the trailing-1-hour event count and spend by
    // EVENT TIME (RANGE over a timestamp ORDER BY, not ROWS — gaps and
    // bursts change the frame population, which is the point). The
    // same per-key time-frame a stream_slide window maintains as
    // state, here as one keyed window pass; sums ride exact decimals.
    Q("win_time_range",
      """SELECT event_id,
        |  CAST(count(*) OVER w AS BIGINT) AS n_1h,
        |  CAST(sum(CAST("value" AS DECIMAL(18,4))) OVER w AS DOUBLE)
        |    AS spend_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""") { (s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          expr("""CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
            |RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
            |AS BIGINT)""".stripMargin).as("n_1h"),
          expr("""CAST(sum(CAST(value AS DECIMAL(18,4)))
            |OVER (PARTITION BY user_id ORDER BY ts
            |RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
            |AS DOUBLE)""".stripMargin).as("spend_1h"))
        .orderBy(col("event_id"))
    },

    Q("win_range_frame",
      """SELECT o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |    PARTITION BY o_orderpriority ORDER BY o_totalprice
        |    RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_sum
        |FROM orders
        |WHERE o_custkey < 100
        |ORDER BY o_orderkey""") { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_custkey") < 100)
        .select(col("o_orderkey"),
          expr("""CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
            |PARTITION BY o_orderpriority ORDER BY o_totalprice
            |RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW) AS DOUBLE)""".stripMargin)
            .as("near_sum"))
        .orderBy(col("o_orderkey"))
    },

    // Correlated scalar subquery: order price vs that customer's own avg.
    // DataFrame form: the correlation is a window over the correlation
    // key — one shuffle, no join.
    Q("sub_corr_scalar",
      """SELECT o_orderkey, round(o_totalprice, 4) AS price
        |FROM orders o
        |WHERE o_totalprice > 1.9 * (SELECT avg(o2.o_totalprice)
        |                            FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""") { (s, d) =>
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("o_custkey"))
      Tables.orders(s, d)
        .withColumn("cust_avg", avg(col("o_totalprice")).over(w))
        .filter(col("o_totalprice") > col("cust_avg") * 1.9)
        .select(col("o_orderkey"), round(col("o_totalprice"), 4).as("price"))
        .orderBy(col("o_orderkey"))
    },

    // Error-safe scalar family (try_*): division by zero, bad casts, and
    // out-of-range array access all yield NULL instead of failing the
    // job — the posture a 100 TB pipeline needs (one malformed row must
    // not kill a stage). DuckDB twins: NULLIF-guarded division,
    // TRY_CAST, and its natively NULL-on-OOB list index.
    Q("scalar_try",
      """SELECT p_partkey,
        |  round(p_retailprice / NULLIF(p_size - p_size, 0), 4) AS div0,
        |  round(p_retailprice / NULLIF(p_size, 0), 4) AS divn,
        |  TRY_CAST(p_type AS INT) AS bad_int,
        |  TRY_CAST(p_size AS TINYINT) AS small_int,
        |  string_split(p_name, ' ')[10] AS tok10
        |FROM part
        |WHERE p_partkey < 400
        |ORDER BY p_partkey""") { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_partkey") < 400)
        .select(col("p_partkey"),
          round(expr("try_divide(p_retailprice, p_size - p_size)"), 4).as("div0"),
          round(expr("try_divide(p_retailprice, p_size)"), 4).as("divn"),
          expr("try_cast(p_type AS INT)").as("bad_int"),
          expr("try_cast(p_size AS TINYINT)").as("small_int"),
          expr("try_element_at(split(p_name, ' '), 10)").as("tok10"))
        .orderBy(col("p_partkey"))
    },

    // Regexp family beyond extract/replace: occurrence counting,
    // field splitting, boolean match.
    Q("str_funcs4",
      """SELECT p_partkey,
        |  CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INT) AS n_vowels,
        |  split_part(p_name, ' ', 2) AS word2,
        |  regexp_matches(p_name, '^(red|small)') AS starts_rs,
        |  CAST(len(regexp_extract_all(p_type, '[A-Z]+')) AS INT) AS n_upper_runs
        |FROM part
        |WHERE p_partkey < 500
        |ORDER BY p_partkey""") { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_partkey") < 500)
        .select(col("p_partkey"),
          expr("regexp_count(p_name, '[aeiou]')").as("n_vowels"),
          expr("split_part(p_name, ' ', 2)").as("word2"),
          expr("p_name rlike '^(red|small)'").as("starts_rs"),
          expr("regexp_count(p_type, '[A-Z]+')").as("n_upper_runs"))
        .orderBy(col("p_partkey"))
    },

    // Date construction + calendar arithmetic: make_date/make_timestamp,
    // quarter, and whole-month differences (both sides compare
    // first-of-month dates, where DuckDB's boundary count and Spark's
    // complete-month count agree by construction).
    Q("dt_funcs3",
      """SELECT o_orderkey,
        |  make_date(year(o_orderdate), month(o_orderdate), 1) AS month_start,
        |  make_timestamp(year(o_orderdate), month(o_orderdate), 1, 12, 0, 0) AS noon,
        |  CAST(date_part('quarter', o_orderdate) AS INT) AS qtr,
        |  CAST(date_diff('month', DATE '1995-01-01',
        |    date_trunc('month', o_orderdate)) AS INT) AS months_since
        |FROM orders
        |WHERE o_orderkey < 2000
        |ORDER BY o_orderkey""") { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          expr("make_date(year(o_orderdate), month(o_orderdate), 1)").as("month_start"),
          expr("make_timestamp(year(o_orderdate), month(o_orderdate), 1, 12, 0, 0)").as("noon"),
          quarter(col("o_orderdate")).cast("int").as("qtr"),
          expr("timestampdiff(MONTH, DATE'1995-01-01', trunc(o_orderdate, 'MM'))")
            .cast("int").as("months_since"))
        .orderBy(col("o_orderkey"))
    },

    // Generator family completion: INLINE explodes an array of structs
    // directly into columns (one generator row per struct — the
    // attribute-melt shape without an intermediate map). Twin: DuckDB
    // unnest over struct_pack.
    Q("gen_inline",
      """SELECT p_partkey, u.k AS attr, u.v AS val
        |FROM part, unnest([struct_pack(k := 'brand', v := p_brand),
        |                   struct_pack(k := 'type', v := p_type),
        |                   struct_pack(k := 'name', v := p_name)]) AS t(u)
        |WHERE p_partkey < 300
        |ORDER BY p_partkey, attr""") { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_partkey") < 300)
        .select(col("p_partkey"), expr(
          """inline(array(
            |  named_struct('k', 'brand', 'v', p_brand),
            |  named_struct('k', 'type',  'v', p_type),
            |  named_struct('k', 'name',  'v', p_name)))""".stripMargin))
        .toDF("p_partkey", "attr", "val")
        .orderBy(col("p_partkey"), col("attr"))
    },

    // Map explosion (the §2.2 "explode of map" row): map → one row per
    // entry. Twin: DuckDB unnests map_entries structs.
    Q("gen_map_explode",
      """SELECT p_partkey, e.key AS k, e.value AS v
        |FROM (SELECT p_partkey,
        |        unnest(map_entries(map(['brand', 'type'], [p_brand, p_type]))) AS e
        |      FROM part)
        |WHERE p_partkey < 300
        |ORDER BY p_partkey, k""") { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_partkey") < 300)
        .select(col("p_partkey"),
          explode(expr("map('brand', p_brand, 'type', p_type)")).as(Seq("k", "v")))
        .orderBy(col("p_partkey"), col("k"))
    },

    // Mergeable partial aggregation as an INCREMENTAL-UPDATE law: the
    // merge of independently-aggregated halves (here: an "old" date
    // range and a "new" one) equals the full recompute — sum/count/min/
    // max re-aggregate associatively, avg derives from (sum, count).
    // This is the materialized-view maintenance shape: at 100 TB you
    // aggregate only the new partition and MERGE, never re-scan
    // history. The oracle recomputes flat — equality IS the law.
    Q("agg_incremental",
      """SELECT o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
        |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS mean,
        |  round(min(o_totalprice), 4) AS lo,
        |  round(max(o_totalprice), 4) AS hi
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""") { (s, d) =>
      val orders = Tables.orders(s, d)
      def half(pred: org.apache.spark.sql.Column) = orders.filter(pred)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"),
          sum(expr("CAST(o_totalprice AS DECIMAL(18,4))")).as("total"),
          min(col("o_totalprice")).as("lo"),
          max(col("o_totalprice")).as("hi"))
      val cut = lit("1998-01-01").cast("date")
      half(col("o_orderdate") < cut)
        .unionByName(half(col("o_orderdate") >= cut))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("cnt")).as("cnt"),
          sum(col("total")).cast("double").as("total"),
          round(sum(col("total")).cast("double") / sum(col("cnt")), 4).as("mean"),
          round(min(col("lo")), 4).as("lo"),
          round(max(col("hi")), 4).as("hi"))
        .orderBy(col("o_orderpriority"))
    },

    // Array set algebra: union / intersect / except (outputs sorted —
    // Spark's first-seen element order is implementation detail).
    Q("arr_funcs4",
      """WITH t AS (SELECT p_partkey,
        |    string_split(p_name, ' ') AS nt, string_split(p_type, ' ') AS tt
        |  FROM part),
        |r AS (SELECT p_partkey,
        |    list_sort(list_distinct(list_cat(nt, tt))) AS uni,
        |    list_sort(coalesce(list_intersect(nt,
        |      ['red', 'small', 'blue', 'ring', 'bolt']), [])) AS inter,
        |    list_sort(list_filter(list_distinct(nt),
        |      x -> NOT list_contains(tt, x))) AS exc
        |  FROM t)
        |SELECT p_partkey,
        |  coalesce(array_to_string(uni, '|'), '') AS uni,
        |  coalesce(array_to_string(inter, '|'), '') AS inter,
        |  coalesce(array_to_string(exc, '|'), '') AS exc
        |FROM r
        |WHERE p_partkey < 400
        |ORDER BY p_partkey""") { (s, d) =>
      Tables.part(s, d)
        .filter(col("p_partkey") < 400)
        .withColumn("nt", split(col("p_name"), " "))
        .withColumn("tt", split(col("p_type"), " "))
        .select(col("p_partkey"),
          array_join(array_sort(array_union(col("nt"), col("tt"))), "|").as("uni"),
          array_join(array_sort(array_intersect(col("nt"),
            expr("array('red', 'small', 'blue', 'ring', 'bolt')"))), "|").as("inter"),
          array_join(array_sort(array_except(col("nt"), col("tt"))), "|").as("exc"))
        .orderBy(col("p_partkey"))
    },

    // JSON introspection: object keys and array lengths (built from the
    // props payload so the parse path is exercised, not a literal).
    Q("json_funcs2",
      """SELECT event_id,
        |  array_to_string(list_sort(json_keys(props)), ',') AS ks,
        |  CAST(json_array_length('[' || CAST(event_id AS VARCHAR) || ',' ||
        |    CAST(user_id AS VARCHAR) || ']') AS INT) AS alen,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS kv
        |FROM events
        |WHERE event_id < 2000
        |ORDER BY event_id""") { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 2000)
        .select(col("event_id"),
          expr("array_join(array_sort(json_object_keys(props)), ',')").as("ks"),
          expr("json_array_length(concat('[', CAST(event_id AS STRING), ',', CAST(user_id AS STRING), ']'))")
            .cast("int").as("alen"),
          get_json_object(col("props"), "$.k").cast("long").as("kv"))
        .orderBy(col("event_id"))
    },

    // VARIANT (Spark 4's semi-structured type): props parsed ONCE into
    // a variant value, fields then extracted via variant_get typed
    // paths — the open-schema ingestion path that replaces per-field
    // re-parsing of JSON strings (one parse, binary-encoded access).
    // Composite payload so the variant carries object + array nesting.
    // DuckDB twin reads the same fields through its JSON type.
    Q("json_variant",
      """SELECT event_id,
        |  CAST(json_extract(j, '$.k') AS BIGINT) AS kv,
        |  CAST(json_extract(j, '$.ids[1]') AS BIGINT) AS second_id,
        |  json_extract_string(j, '$.tag') AS tag
        |FROM (SELECT event_id,
        |    json('{"k": ' || CAST(user_id AS VARCHAR) ||
        |         ', "ids": [' || CAST(event_id AS VARCHAR) || ',' ||
        |           CAST(user_id AS VARCHAR) || ']' ||
        |         ', "tag": "' || event_type || '"}') AS j
        |  FROM events WHERE event_id < 2000)
        |ORDER BY event_id""") { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 2000)
        .select(col("event_id"),
          expr("""parse_json(concat('{"k": ', CAST(user_id AS STRING),
                 |  ', "ids": [', CAST(event_id AS STRING), ',',
                 |  CAST(user_id AS STRING), ']',
                 |  ', "tag": "', event_type, '"}'))""".stripMargin).as("v"))
        .select(col("event_id"),
          expr("variant_get(v, '$.k', 'bigint')").as("kv"),
          expr("variant_get(v, '$.ids[1]', 'bigint')").as("second_id"),
          expr("variant_get(v, '$.tag', 'string')").as("tag"))
        .orderBy(col("event_id"))
    },

    // XML ingestion (Spark 4 native from_xml): documents arrive as XML
    // snippets, parse once to a typed struct, extract fields — the
    // open-format twin of json_variant. The XML is synthesized from
    // columns (values are XML-safe identifiers/uppercase names), so the
    // oracle is the plain relational answer: parsing must be invisible.
    Q("xml_funcs",
      """SELECT n_nationkey AS k, n_name AS nm,
        |  CAST(n_regionkey AS INT) AS rk
        |FROM nation
        |ORDER BY k""") { (s, d) =>
      Tables.nation(s, d)
        .select(concat(
          lit("<r><k>"), col("n_nationkey"), lit("</k><nm>"), col("n_name"),
          lit("</nm><rk>"), col("n_regionkey"), lit("</rk></r>")).as("x"))
        .select(expr("from_xml(x, 'k INT, nm STRING, rk INT')").as("p"))
        .select(col("p.k").as("k"), col("p.nm").as("nm"), col("p.rk").as("rk"))
        .orderBy(col("k"))
    },

    // UNION BY NAME with missing columns → nulls (schema-evolution
    // union: the shape that merges heterogeneous corpus shards).
    Q("setop_union_byname",
      """SELECT k, b, t
        |FROM (SELECT p_partkey AS k, p_brand AS b FROM part WHERE p_partkey < 200
        |      UNION ALL BY NAME
        |      SELECT p_partkey AS k, p_type AS t FROM part WHERE p_partkey < 200)
        |ORDER BY k, b NULLS FIRST""") { (s, d) =>
      val a = Tables.part(s, d).filter(col("p_partkey") < 200)
        .select(col("p_partkey").as("k"), col("p_brand").as("b"))
      val b = Tables.part(s, d).filter(col("p_partkey") < 200)
        .select(col("p_partkey").as("k"), col("p_type").as("t"))
      a.unionByName(b, allowMissingColumns = true)
        .orderBy(col("k"), asc_nulls_first("b"))
    })
}
