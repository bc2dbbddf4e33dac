package graft.functions

import graft.SparkSpec
import graft.k8s.{EventPipeline, KubePod, KubeService}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("MapContainsAll matches the explode-join E3 semantics") {
    GraftFunctions.register(spark)
    val services = Seq(
      KubeService("s1", "1", "a", "d", Map(), Map(), Map("app" -> "web")),
      KubeService("s2", "1", "b", "d", Map(), Map(), Map("app" -> "db", "env" -> "prod")),
      KubeService("s3", "1", "c", "d", Map(), Map(), Map()))
    val pods = Seq(
      KubePod("p1", "x", "d", Map("app" -> "web", "z" -> "1"), null, "", ""),
      KubePod("p2", "y", "d", Map("app" -> "db", "env" -> "stage"), null, "", ""),
      KubePod("p3", "z", "d", Map("app" -> "db", "env" -> "prod"), null, "", ""),
      // same labels, other namespace: must not match (k8sclient.go:76-81
      // scopes the pod list to the service's namespace)
      KubePod("p4", "x2", "other", Map("app" -> "web", "z" -> "1"), null, "", ""))
    // predicate-form join via the custom expression (+ namespace scope)
    val viaExpr = services.toDF()
      .select(col("uid").as("suid"), col("namespace").as("sns"), col("selector"))
      .join(pods.toDF().select(col("uid").as("puid"),
          col("namespace").as("pns"), col("labels")),
        col("sns") === col("pns"), "inner")
      .filter(GraftFunctions.map_contains_all(col("labels"), col("selector")))
      .select(col("suid"), col("puid"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // reference plan: explode + equi-join + count
    val viaJoin = EventPipeline.servicePods(services.toDF(), pods.toDF())
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaExpr == viaJoin)
    assert(viaExpr == Set("s1" -> "p1", "s2" -> "p3"))
    // SQL registration works too
    services.toDF().createOrReplaceTempView("svc_t")
    pods.toDF().createOrReplaceTempView("pod_t")
    val viaSql = spark.sql(
      """SELECT s.uid, p.uid FROM svc_t s JOIN pod_t p
        |ON s.namespace = p.namespace
        |AND map_contains_all(p.labels, s.selector)""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaSql == viaExpr)
  }

  test("DotProductFloat equals the higher-order-function dot product") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (2L, Array(0.5f, -1.5f), Array(2.0f, 2.0f))).toDF("id", "a", "b")
    val got = df.select(col("id"), GraftFunctions.dot_f(col("a"), col("b")).as("d"),
        expr("aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)").as("hof"))
      .collect()
    got.foreach { r => assert(math.abs(r.getDouble(1) - r.getDouble(2)) < 1e-12) }
    assert(got.find(_.getLong(0) == 1L).get.getDouble(1) == 32.0)
  }

  test("ArgMaxAggregator picks max value, smaller key on ties") {
    val argmax = udaf(ArgMaxAggregator)
    val df = Seq((1L, 5.0, "g"), (2L, 9.0, "g"), (3L, 9.0, "g"), (4L, 1.0, "h"))
      .toDF("k", "v", "g")
    val got = df.groupBy(col("g")).agg(argmax(col("k"), col("v")).as("am"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("g" -> 2L, "h" -> 4L))
  }

  test("ShingleGenerator matches split-based shingles; short inputs empty") {
    GraftFunctions.register(spark)
    val df = Seq((1L, "a b c d"), (2L, "x y"), (3L, "solo"), (4L, null: String))
      .toDF("id", "txt")
    val got = df.select(col("id"), GraftFunctions.shingle_gen(col("txt"), lit(3)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(got.toSeq == Seq(1L -> "a b c", 1L -> "b c d"))  // 2,3: too short; 4: null
    // SQL form via LATERAL VIEW with the registered generator
    df.createOrReplaceTempView("sg_t")
    val viaSql = spark.sql(
      "SELECT id, s.sh FROM sg_t LATERAL VIEW shingle_gen(txt, 3) s AS sh")
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(viaSql.toSeq == got.toSeq)
  }

  test("multimodal decode stub: deterministic features, partition-shaped") {
    val media = Seq(
      Multimodal.MediaRecord(1L, "abcd".getBytes("UTF-8"), "fake/raw", 64, 64),
      Multimodal.MediaRecord(2L, Array.fill[Byte](130)(65), "fake/raw", 64, 64))
      .toDS().repartition(2)
    val f = Multimodal.decodeStub(media).collect().map(x => x.media_id -> x).toMap
    assert(f(1L).n_bytes == 4 && f(1L).byte_sum == 'a' + 'b' + 'c' + 'd')
    assert(f(2L).byte_sum == 130L * 65 && f(2L).frames == 2)
    assert(math.abs(f(2L).mean_byte - 65.0) < 1e-9)
  }
}
