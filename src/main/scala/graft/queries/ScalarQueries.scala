package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2.2): projection/filter expression
  * forms plus string / date-time / math / array / map / json functions.
  * All row-level outputs are keyed by a table's unique primary key
  * (orders/part/events/documents — lineitem deliberately avoided, it has
  * no compact unique key in this dataset).
  *
  * Everything here is a narrow projection over a parquet scan: Catalyst
  * prunes the scan to the referenced columns and pushes the filters —
  * verified via .explain (PushedFilters / ReadSchema) — so each of these
  * is scan-bound at any scale.
  */
object ScalarQueries {

  def all: Seq[Q] = Seq(

    // CASE WHEN / IN / BETWEEN / AND-OR-NOT in one projection+filter.
    Q("proj_filter_case",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice < 100000 THEN 'low'
        |       WHEN o_totalprice < 300000 THEN 'mid'
        |       ELSE 'high' END AS bucket,
        |  (o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%') AS urgent
        |FROM orders
        |WHERE o_orderstatus IN ('F', 'P')
        |  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1998-12-31'
        |  AND NOT (o_totalprice IS NULL)
        |ORDER BY o_orderkey""") { (s, d) =>
      Tables.orders(s, d)
        .filter(col("o_orderstatus").isin("F", "P") &&
          col("o_orderdate").between(lit("1996-01-01").cast("timestamp"),
            lit("1998-12-31").cast("timestamp")) &&
          !col("o_totalprice").isNull)
        .select(col("o_orderkey"),
          when(col("o_totalprice") < 100000, "low")
            .when(col("o_totalprice") < 300000, "mid")
            .otherwise("high").as("bucket"),
          (col("o_orderpriority").like("1%") || col("o_orderpriority").like("2%"))
            .as("urgent"))
        .orderBy(col("o_orderkey"))
    },

    // ------------------------------------------------------------ string
    Q("str_funcs",
      """SELECT p_partkey,
        |  upper(p_name) AS uname,
        |  lower(p_brand) AS lbrand,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  substring(p_name, 1, 4) AS name4,
        |  concat(p_brand, ':', p_type) AS brand_type,
        |  trim('  pad  ') AS trimmed,
        |  replace(p_type, 'a', '@') AS repl,
        |  lpad(p_brand, 12, '*') AS padded,
        |  CAST(strpos(p_name, 'e') AS INT) AS e_pos,
        |  regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
        |  (p_name LIKE '%widget%') AS is_widget,
        |  (p_name ILIKE '%RING%') AS is_ring,
        |  string_split(p_name, ' ')[1] AS first_word
        |FROM part
        |ORDER BY p_partkey""") { (s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"),
          upper(col("p_name")).as("uname"),
          lower(col("p_brand")).as("lbrand"),
          length(col("p_name")).as("name_len"),
          substring(col("p_name"), 1, 4).as("name4"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
          trim(lit("  pad  ")).as("trimmed"),
          expr("replace(p_type, 'a', '@')").as("repl"),
          lpad(col("p_brand"), 12, "*").as("padded"),
          instr(col("p_name"), "e").as("e_pos"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).as("brand_num"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devowel"),
          col("p_name").like("%widget%").as("is_widget"),
          col("p_name").ilike("%RING%").as("is_ring"),
          element_at(split(col("p_name"), " "), 1).as("first_word"))
        .orderBy(col("p_partkey"))
    },

    // --------------------------------------------------------- date/time
    Q("dt_funcs",
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS dom,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
        |  strftime(o_orderdate + INTERVAL 1 MONTH, '%Y-%m-%d') AS plus1m,
        |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS eom,
        |  CAST(datediff('day', o_orderdate, DATE '2002-01-01') AS INT) AS days_left,
        |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
        |FROM orders
        |ORDER BY o_orderkey""") { (s, d) =>
      // Spark dayofweek is 1=Sunday; DuckDB is 0=Sunday — oracle shifts.
      // Oracle quirk: DuckDB intervals compare 1 MONTH == 30 DAY equal, and
      // its expression dedup folds the two constants — plus30 is written as
      // DATE + 30 there to keep the expressions distinct.
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("q"),
          dayofweek(col("o_orderdate")).as("dow"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
          date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus30"),
          date_format(add_months(col("o_orderdate"), 1), "yyyy-MM-dd").as("plus1m"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("eom"),
          datediff(to_date(lit("2002-01-01")), col("o_orderdate")).as("days_left"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"))
        .orderBy(col("o_orderkey"))
    },

    // --------------------------------------------------------------- math
    Q("math_funcs",
      """SELECT o_orderkey,
        |  round(o_totalprice, 2) AS r2,
        |  CAST(floor(o_totalprice) AS BIGINT) AS flr,
        |  CAST(ceil(o_totalprice) AS BIGINT) AS cl,
        |  round(abs(o_totalprice - 250000.0), 4) AS dist,
        |  round(sqrt(o_totalprice), 4) AS sq,
        |  round(ln(o_totalprice), 4) AS lg,
        |  round(pow(CAST(o_orderkey % 10 AS DOUBLE), 2.0), 4) AS p2,
        |  round(exp(o_totalprice / 1000000.0), 4) AS ex,
        |  CAST(o_orderkey % 7 AS BIGINT) AS m7,
        |  CAST(o_orderkey // 7 AS BIGINT) AS d7,
        |  CAST(sign(o_totalprice - 250000.0) AS INT) AS sgn,
        |  round(greatest(o_totalprice, 100000.0), 4) AS hi,
        |  round(least(o_totalprice, 100000.0), 4) AS lo
        |FROM orders
        |ORDER BY o_orderkey""") { (s, d) =>
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          round(col("o_totalprice"), 2).as("r2"),
          floor(col("o_totalprice")).as("flr"),
          ceil(col("o_totalprice")).as("cl"),
          round(abs(col("o_totalprice") - 250000.0), 4).as("dist"),
          round(sqrt(col("o_totalprice")), 4).as("sq"),
          round(log(col("o_totalprice")), 4).as("lg"),
          round(pow((col("o_orderkey") % 10).cast("double"), 2.0), 4).as("p2"),
          round(exp(col("o_totalprice") / 1000000.0), 4).as("ex"),
          (col("o_orderkey") % 7).as("m7"),
          expr("o_orderkey div 7").as("d7"),
          signum(col("o_totalprice") - 250000.0).cast("int").as("sgn"),
          round(greatest(col("o_totalprice"), lit(100000.0)), 4).as("hi"),
          round(least(col("o_totalprice"), lit(100000.0)), 4).as("lo"))
        .orderBy(col("o_orderkey"))
    },

    // -------------------------------------------------------------- array
    Q("arr_funcs",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS INT) AS n_tokens,
        |  toks[1] AS first_tok,
        |  toks[-1] AS last_tok,
        |  list_contains(toks, 'spark') AS has_spark,
        |  array_to_string(list_slice(list_sort(toks), 1, 3), ',') AS low3,
        |  CAST(list_sum(list_transform(list_slice(toks, 1, 5), x -> length(x))) AS INT) AS len5,
        |  CAST(len(list_filter(toks, x -> length(x) > 4)) AS INT) AS n_long
        |FROM t
        |ORDER BY doc_id""") { (s, d) =>
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          element_at(col("toks"), 1).as("first_tok"),
          element_at(col("toks"), -1).as("last_tok"),
          array_contains(col("toks"), "spark").as("has_spark"),
          array_join(slice(sort_array(col("toks")), 1, 3), ",").as("low3"),
          expr("CAST(aggregate(transform(slice(toks, 1, 5), x -> length(x)), 0, (a, x) -> a + x) AS INT)").as("len5"),
          size(filter(col("toks"), x => length(x) > 4)).as("n_long"))
        .orderBy(col("doc_id"))
    },

    // explode / flatten: token frequency across the corpus (Generator +
    // re-aggregation — the distributed shape of "unnest then count").
    Q("arr_explode",
      """SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |GROUP BY tok
        |ORDER BY tok""") { (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("tok"))
    },

    // posexplode (ordinal-aware generator).
    Q("arr_posexplode",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id < 5)
        |SELECT doc_id,
        |  CAST(generate_subscripts(toks, 1) - 1 AS INT) AS pos,
        |  unnest(toks) AS tok
        |FROM t
        |ORDER BY doc_id, pos""") { (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 5)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .orderBy(col("doc_id"), col("pos"))
    },

    // ---------------------------------------------------------------- map
    // Build a name→key map per region from collected entries (sorted first
    // — collect_list order is partition-dependent), then read it back with
    // map_keys/element_at. Oracle computes the same values relationally.
    Q("map_funcs",
      """SELECT n_regionkey,
        |  CAST(count(*) AS INT) AS n_nations,
        |  min(n_name) AS first_name,
        |  CAST(arg_min(n_nationkey, n_name) AS INT) AS first_key
        |FROM nation
        |GROUP BY n_regionkey
        |ORDER BY n_regionkey""") { (s, d) =>
      Tables.nation(s, d)
        .groupBy(col("n_regionkey"))
        .agg(map_from_entries(array_sort(collect_list(
          struct(col("n_name"), col("n_nationkey"))))).as("m"))
        .select(col("n_regionkey"),
          size(col("m")).as("n_nations"),
          array_min(map_keys(col("m"))).as("first_name"),
          element_at(col("m"), array_min(map_keys(col("m")))).as("first_key"))
        .orderBy(col("n_regionkey"))
    },

    // ---------------------------------------------------------------- json
    Q("json_funcs",
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
        |  to_json(struct_pack(id := event_id))::VARCHAR AS as_json
        |FROM events
        |WHERE event_id < 1000
        |ORDER BY event_id""") { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 1000)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k_num"),
          to_json(struct(col("event_id").as("id"))).as("as_json"))
        .orderBy(col("event_id"))
    },

    // json_tuple: the multi-field JSON extractor (a Generator under the
    // hood — one parse per row for N fields, vs N parses with repeated
    // get_json_object). Round-trips a constructed document so several
    // fields and types are exercised.
    Q("json_tuple_funcs",
      """WITH j AS (SELECT event_id,
        |    to_json(struct_pack(a := event_id, b := user_id, c := event_type))::VARCHAR AS doc
        |  FROM events WHERE event_id < 1000)
        |SELECT event_id,
        |  json_extract_string(doc, '$.a') AS a,
        |  json_extract_string(doc, '$.b') AS b,
        |  json_extract_string(doc, '$.c') AS c
        |FROM j
        |ORDER BY event_id""") { (s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 1000)
        .withColumn("doc", to_json(struct(
          col("event_id").as("a"), col("user_id").as("b"), col("event_type").as("c"))))
        .select(col("event_id"),
          json_tuple(col("doc"), "a", "b", "c"))
        .toDF("event_id", "a", "b", "c")
        .orderBy(col("event_id"))
    },

    // from_json with an explicit schema, then aggregate over the parsed
    // field — the L9Event `pod` column pattern (SURVEY.md §1.2 / P3).
    Q("json_agg",
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""") { (s, d) =>
      Tables.events(s, d)
        .withColumn("parsed", from_json(col("props"), lit("k BIGINT")))
        .groupBy(col("event_type"))
        .agg(sum(col("parsed.k")).as("k_sum"),
          count(lit(1)).as("cnt"))
        .orderBy(col("event_type"))
    })
}
