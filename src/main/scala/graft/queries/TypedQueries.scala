package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Typed Dataset API exemplar: KeyValueGroupedDataset.cogroup — the
  * Spark surface for per-key logic that consumes BOTH sides' groups as
  * streams (the shape `mapGroups` can't express and a join would force
  * into two passes). The reference's service↔pod reconciliation
  * (event_service.go:55-76: walk services and pods together, emit one
  * merged record per service) is this operator's native shape.
  *
  * Scale posture: cogroup shuffles each side once on the key, then
  * streams both iterators per key — the orders side is folded with a
  * running (count, exact-decimal sum), never materialized. Decimal
  * quantization happens in DataFrame land (CAST to DECIMAL(18,4), the
  * same cast the oracle applies) BEFORE entering typed code, so the
  * per-key fold is an exact, order-independent BigDecimal sum — the
  * iterator order a shuffle delivers is nondeterministic, a double sum
  * there would not be hash-stable.
  */
object TypedQueries {

  def all: Seq[Q] = Seq(

    // Per-customer order rollup via typed cogroup: customers with no
    // orders survive with n_orders = 0 and NULL total (the left-join
    // semantics, expressed by the empty right iterator).
    Q("cogroup_orders",
      """SELECT c_custkey, c_name,
        |  CAST(count(o_custkey) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY 1, 2
        |ORDER BY c_custkey""") { (s, d) =>
      import s.implicits._
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"))
        .as[(Long, String)]
      val ords = Tables.orders(s, d)
        .select(col("o_custkey"),
          col("o_totalprice").cast("decimal(18,4)").as("p"))
        .as[(Long, java.math.BigDecimal)]
      cust.groupByKey(_._1).cogroup(ords.groupByKey(_._1)) { (k, cs, os) =>
        val names = cs.map(_._2).toList
        if (names.isEmpty) Iterator.empty // order with no customer row
        else {
          var n = 0L
          var sum: java.math.BigDecimal = null
          os.foreach { case (_, p) =>
            n += 1
            sum = if (sum == null) p else sum.add(p)
          }
          val total = if (sum == null) None else Some(sum.doubleValue)
          names.iterator.map(name => (k, name, n, total))
        }
      }.toDF("c_custkey", "c_name", "n_orders", "total")
        .orderBy("c_custkey")
    }
  )
}
