package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Branches the sf fixtures can never reach (every customer has orders,
  * every user does every event type at all SFs), exercised on a planted
  * dir — the data-masked-divergence class: a branch the oracle
  * hash-check can't distinguish on the shipped data.
  *  - cogroup_orders: customer with NO orders (empty right iterator →
  *    n_orders 0, NULL total) and an orphan order with no customer row
  *    (empty left iterator → emits nothing).
  *  - funnel_steps: a user with clicks but no view (fails step 1), and
  *    a user whose only clicks PRECEDE the first view (has both types
  *    yet fails step 2 — the strict ordering, not mere presence).
  *  - cohort_retention: a purchase-less user appears in no cohort. */
class PlantedEdgeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("planted").toString
    Seq((1L, "alice", 0, 0.0, "BUILDING"), (2L, "bob", 0, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    // bob has no orders; order 30 has no customer (custkey 9).
    Seq((10L, 1L, "O", 100.5, "1996-01-01 00:00:00", "1-URGENT"),
        (11L, 1L, "F", 200.25, "1996-02-01 00:00:00", "1-URGENT"),
        (30L, 9L, "O", 5.0, "1996-03-01 00:00:00", "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .withColumn("o_orderdate",
        org.apache.spark.sql.functions.col("o_orderdate").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    // user 1: click-only. user 2: click @09, view @10, click never again
    //   -> reaches step 1, fails step 2 despite having clicks.
    // user 3: full funnel, purchase-less user 1 joins no cohort.
    Seq((1L, "2024-01-01 09:00:00", 1L, "click", 1.0, "{}"),
        (2L, "2024-01-01 09:00:00", 2L, "click", 1.0, "{}"),
        (3L, "2024-01-01 10:00:00", 2L, "view", 1.0, "{}"),
        (4L, "2024-01-01 10:00:00", 3L, "view", 1.0, "{}"),
        (5L, "2024-01-01 11:00:00", 3L, "click", 1.0, "{}"),
        (6L, "2024-01-01 12:00:00", 3L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts",
        org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("cogroup_orders: orderless customer gets (0, NULL); orphan order vanishes") {
    val rows = SparkEntry.queries("cogroup_orders")(spark, dir).collect()
    assert(rows.length == 2) // orphan order 30 emits nothing
    val byKey = rows.map(r => r.getLong(0) ->
      (r.getLong(2), Option(r.get(3)))).toMap
    assert(byKey(1L)._1 == 2L && byKey(1L)._2.contains(300.75))
    assert(byKey(2L) == ((0L, None)), s"orderless branch: ${byKey(2L)}")
  }

  test("funnel_steps: presence without ordering does not convert") {
    val q = SparkEntry.queries("funnel_steps")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(q("step1_view") == 2L)     // users 2 and 3 (user 1 never views)
    assert(q("step2_click") == 1L)    // user 2's clicks all precede the view
    assert(q("step3_purchase") == 1L) // user 3 only
  }

  test("cohort_retention: purchase-less users join no cohort") {
    val users = SparkEntry.queries("cohort_retention")(spark, dir)
      .agg(org.apache.spark.sql.functions.sum("users")).collect()(0).getLong(0)
    assert(users == 1L) // only user 3 purchases
  }
}
