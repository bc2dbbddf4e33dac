package graft

import graft.k8s._
import graft.sinks.NdjsonSink
import java.sql.Timestamp
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests (SURVEY.md §5.2 item 3), scalacheck generators driven
  * with fixed seeds (deterministic; each case runs real Spark jobs so the
  * case count is small but the laws are general): dedup idempotence, the
  * batch partitioning invariant, projection totality, filter purity. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val params = Gen.Parameters.default

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(params, Seed(seed)).get

  private val genEvent: Gen[KubeEvent] = for {
    uid <- Gen.oneOf((1 to 8).map(i => s"u$i"))
    ns <- Gen.oneOf("default", "prod", "kube-system")
    reason <- Gen.oneOf("Scheduled", "Pulled", "Killing")
    secs <- Gen.choose(0L, 86400L)
  } yield KubeEvent(uid, new Timestamp(1704067200000L + secs * 1000), s"n-$uid",
    ns, reason, s"m-$uid", "Normal", Some(1),
    ObjectRef("v1", "Pod", "o", ns, "1", s"obj-$uid"), EventSource("c", "h"))

  test("D1 dedup is idempotent and yields exactly one row per uid") {
    for (seed <- 1L to 5L) {
      val evs = sample(Gen.listOfN(25, genEvent), seed)
      val df = evs.toDF()
      val once = EventPipeline.dedupEvents(df)
      val twice = EventPipeline.dedupEvents(once)
      assert(once.count() == evs.map(_.uid).toSet.size, s"seed=$seed")
      assert(twice.collect().toSet == once.collect().toSet, s"seed=$seed")
    }
  }

  test("D1 dedup total order: same-uid duplicates differing ONLY in " +
    "involvedObject scalars pick the same winner under any partitioning") {
    // Every field in the explicit sort key ties except the four
    // involvedObject scalars — without them in the orderBy the winner
    // would be partitioning-dependent.
    val base = KubeEvent("dup", new Timestamp(1704067200000L), "n", "default",
      "Scheduled", "m", "Normal", Some(1),
      ObjectRef("v1", "Pod", "o", "default", "1", "obj"), EventSource("c", "h"))
    val variants = Seq(
      base,
      base.copy(involvedObject = base.involvedObject.copy(apiVersion = "apps/v1")),
      base.copy(involvedObject = base.involvedObject.copy(kind = "Deployment")),
      base.copy(involvedObject = base.involvedObject.copy(name = "a-first")),
      base.copy(involvedObject = base.involvedObject.copy(namespace = "aaa")))
    val winners = for (parts <- Seq(1, 2, 3, 7); seed <- 1L to 3L) yield {
      val shuffled = new scala.util.Random(seed).shuffle(variants)
      val df = shuffled.toDF().repartition(parts)
      val got = EventPipeline.dedupEvents(df).as[KubeEvent].collect()
      assert(got.length == 1, s"parts=$parts seed=$seed")
      got.head
    }
    assert(winners.toSet.size == 1,
      s"winner must be partition-invariant, got ${winners.toSet}")
  }

  test("batch partitioning invariant: n records → ceil(n/bs) files, each ≤ bs, total n") {
    for (seed <- 1L to 5L) {
      val n = sample(Gen.choose(1, 40), seed)
      val bs = sample(Gen.choose(1, 10), seed + 100)
      val tmp = java.nio.file.Files.createTempDirectory("prop").toString
      val df = (1 to n).map(i => (i.toLong, s"r$i")).toDF("id", "v")
      val files = NdjsonSink.write(df, tmp, "p", 0L, batchSize = bs)
      assert(files == math.ceil(n.toDouble / bs).toInt, s"n=$n bs=$bs")
      assert(spark.read.text(s"$tmp/p_0").count() == n, s"n=$n bs=$bs")
      import scala.jdk.CollectionConverters._
      val sizes = java.nio.file.Files.list(java.nio.file.Paths.get(s"$tmp/p_0"))
        .iterator().asScala.filter(_.getFileName.toString.startsWith("part-"))
        .map(p => java.nio.file.Files.readAllLines(p).size()).toSeq
      assert(sizes.forall(_ <= bs), s"n=$n bs=$bs sizes=$sizes")
    }
  }

  test("projection totality: projectL9 never drops or throws on arbitrary events") {
    for (seed <- 1L to 3L) {
      val evs = sample(Gen.listOfN(15, genEvent), seed)
      val out = EventPipeline.projectL9(
        EventPipeline.enrich(evs.toDF(),
          Seq.empty[KubeObject].toDF(), Seq.empty[KubeNode].toDF())).collect()
      assert(out.length == evs.length, s"seed=$seed")
      assert(out.forall(_.version == L9Event.Version))
      assert(out.forall(_.labels.isEmpty)) // no dims → empty enrichment
    }
  }

  test("eligibility is a pure filter: output ⊆ input, blacklist removed") {
    for (seed <- 1L to 5L) {
      val evs = sample(Gen.listOfN(20, genEvent), seed)
      val out = EventPipeline.eligible(evs.toDF(), GraftConfig(uid = "t"))
        .as[KubeEvent].collect()
      val inSet = evs.toSet
      assert(out.forall(inSet.contains), s"seed=$seed")
      assert(out.forall(e => !EventPipeline.SkipNamespaces.contains(e.namespace)))
      assert(out.length == evs.count(e => !EventPipeline.SkipNamespaces.contains(e.namespace)))
    }
  }

  test("TopKPerGroup law: equals the row_number window form for arbitrary data, k, and partitioning") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val genRow = for {
      g <- Gen.oneOf("a", "b", "c", "d")
      v <- Gen.choose(0, 9) // small domain → plenty of ties; id breaks them
    } yield (g, v)
    for (seed <- 1L to 5L) {
      val n = sample(Gen.choose(0, 60), seed)
      val k = sample(Gen.choose(1, 5), seed + 100)
      val parts = sample(Gen.choose(1, 6), seed + 200)
      val rows = sample(Gen.listOfN(n, genRow), seed + 300)
        .zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v) }
      val df = rows.toDF("g", "id", "v").repartition(parts)
      val got = graft.plans.TopK
        .perGroup(df, Seq(col("g")), Seq(col("v").desc, col("id")), k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
      val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .drop("rn")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == want, s"seed=$seed n=$n k=$k parts=$parts")
    }
  }
}
