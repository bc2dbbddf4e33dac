package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0), ("a", 4L, 30.0),
    ("b", 5L, 5.0), ("b", 6L, 1.0),
    ("c", 7L, 9.0)
  ).toDF("g", "id", "v").repartition(4)

  private def windowForm(k: Int) = {
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
    df.withColumn("rn", row_number().over(w)).filter($"rn" <= k).drop("rn")
  }

  /** Run `body` with AQE off so executedPlan is the plain physical tree
    * (AQE wraps it in AdaptiveSparkPlanExec whose stages are leaves —
    * fine in production, opaque to plan-shape assertions). */
  private def withPlainPlans[A](body: => A): A = {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("perGroup matches the row_number window form (ties broken by total order)") {
    for (k <- Seq(1, 2, 3, 10)) {
      val got = TopK.perGroup(df, Seq($"g"), Seq($"v".desc, $"id"), k)
        .orderBy($"g", $"id").collect().toSeq
      val want = windowForm(k).orderBy($"g", $"id").collect().toSeq
      assert(got == want, s"k=$k")
    }
  }

  test("plans as partial + final exec with one exchange between") { withPlainPlans {
    val plan = TopK.perGroup(df, Seq($"g"), Seq($"v".desc, $"id"), 2)
      .queryExecution.executedPlan
    val execs = plan.collect { case e: TopKPerGroupExec => e }
    assert(execs.map(_.partial).sorted == Seq(false, true),
      s"expected partial+final TopKPerGroupExec, got:\n$plan")
    // The exchange sits between final and partial: final's child chain
    // is Exchange(partial).
    val fin = execs.find(!_.partial).get
    assert(fin.child.isInstanceOf[ShuffleExchangeExec], s"no exchange under final:\n$plan")
    assert(fin.child.children.head.isInstanceOf[TopKPerGroupExec])
  } }

  test("group-key filters are pushed below the top-k; value filters are not") {
    val q = TopK.perGroup(df, Seq($"g"), Seq($"v".desc, $"id"), 2)
      .filter($"g" =!= "b" && $"v" > 5.0)
    val optimized = q.queryExecution.optimizedPlan
    val topk = optimized.collect { case t: TopKPerGroup => t }
    assert(topk.size == 1)
    // The g-conjunct must be GONE from above the node (pushed below,
    // where ConvertToLocalRelation then folds it into the test's local
    // data — on a file source it lands on the scan); the v-conjunct
    // must remain above, since pushing it would change which rows win
    // the per-group top-k.
    val above = optimized.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter
        if f.collect { case t: TopKPerGroup => t }.nonEmpty => f }
    assert(above.size == 1, s"expected one filter above top-k:\n$optimized")
    assert(above.head.condition.references.map(_.name).toSet == Set("v"),
      s"group-key filter not pushed:\n$optimized")
    // Semantics: same answer as filtering the window form the same way.
    val got = q.orderBy($"g", $"id").collect().toSeq
    val want = windowForm(2).filter($"g" =!= "b" && $"v" > 5.0)
      .orderBy($"g", $"id").collect().toSeq
    assert(got == want)
  }

  test("partial phase bounds what the shuffle carries") { withPlainPlans {
    // 1000 rows, 2 groups, k=3 over 4 input partitions: the exchange
    // must move at most 4 partitions × 2 groups × 3 rows = 24 rows,
    // not 1000. Read the shuffle's records-written metric.
    val big = (1 to 1000).map(i => (if (i % 2 == 0) "x" else "y", i.toLong, i.toDouble))
      .toDF("g", "id", "v").repartition(4)
    val q = TopK.perGroup(big, Seq($"g"), Seq($"v".desc, $"id"), 3)
    // collect() drives q's OWN queryExecution (count() would plan a
    // separate aggregate query, leaving these metrics untouched).
    assert(q.collect().length == 6)
    val shuffles = q.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec
        if e.child.isInstanceOf[TopKPerGroupExec] => e }
    assert(shuffles.size == 1)
    val written = shuffles.head.metrics.get("shuffleRecordsWritten").map(_.value)
    assert(written.exists(w => w > 0 && w <= 24),
      s"shuffle carried $written rows; partial reduction not effective")
  } }

  test("partial-phase group-cap overflow degrades to pass-through, stays correct") {
    val saved = TopKPerGroupExec.partialMaxGroups
    TopKPerGroupExec.partialMaxGroups = 2 // force overflow: >2 groups/partition
    try {
      val big = (1 to 400).map(i => (s"g${i % 20}", i.toLong, (i * 7 % 100).toDouble))
        .toDF("g", "id", "v").repartition(3)
      val got = TopK.perGroup(big, Seq($"g"), Seq($"v".desc, $"id"), 2)
        .orderBy($"g", $"id").collect().toSeq
      val w = Window.partitionBy($"g").orderBy($"v".desc, $"id")
      val want = big.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
        .drop("rn").orderBy($"g", $"id").collect().toSeq
      assert(got == want)
    } finally TopKPerGroupExec.partialMaxGroups = saved
  }
}
