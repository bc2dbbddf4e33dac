package graft.tools

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-datapoint fixture builder: writes an N× derived copy of the
  * documents/embeddings tables so the dedup/CC/ANN family can be timed
  * at 10× the largest driver-generated SF (COVERAGE.md round-8 scale
  * appendix).
  *
  *   runMain graft.tools.ScaleUp <srcSfDir> <outDir> <factor>
  *
  * Replication is structure-preserving, not duplicate-inflating: every
  * replica r remaps doc ids into its own range and prefixes every
  * token after the first with `p{r}_`, which makes replica shingle
  * sets pairwise DISJOINT — so near-duplicate density per unit of data
  * stays that of the source corpus instead of every row gaining N−1
  * artificial twins (which would measure the replication trick, not
  * the engine: banded-LSH candidates would grow quadratically in N by
  * construction). Embedding replicas get a small per-replica offset
  * with re-normalization left to the queries that need it.
  *
  * lineitem/part (the co-purchase graph family: graph_triangles,
  * graph_bfs_khop, behavior_basket_lift) follow the same discipline:
  * order AND part keys remap per replica, so each replica is its own
  * disjoint co-purchase graph — N× vertices and N× edges at source
  * edge density. Keeping partkeys shared would instead multiply every
  * edge's support by N over the SAME graph (the support threshold then
  * measures the inflation trick, not edge growth). p_partkey % 100
  * seed selection survives the remap (the offset is a multiple of
  * 100), and p_brand is deliberately NOT remapped — basket_lift's
  * brand vocabulary is a fixed 25-value domain at any corpus size,
  * exactly like production. */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0); val out = args(1); val factor = args(2).toInt
    // --hotpart: PLANT a viral part across all replicas. The disjoint-
    // replica remap is structurally incapable of growing a hot key (every
    // replica's keys are disjoint, so max degree stays the source's), but
    // the wedge-cap guards exist precisely for hot keys — this mode
    // rewrites the first line of every 3rd order to the UN-REMAPPED
    // part key 1, so one part accumulates ~|customers|/3 distinct buyers
    // across the whole N× corpus (C(d,2) ≈ 1.2e9 wedge pairs at 10×
    // sf0.1 — the load the degree cap must suppress). Used by the
    // COVERAGE.md hot-key datapoints for graph_bipartite_project /
    // graph_jaccard / graph_adamic_adar.
    val hotPart = args.length > 3 && args(3) == "--hotpart"
    val spark = GraftSession.configure(SparkSession.builder())
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = spark.range(0, factor).select(col("id").as("r"))

    val docs = spark.read.parquet(s"$src/documents.parquet")
    docs.crossJoin(broadcast(reps))
      .select(
        (col("doc_id") + col("r") * 10000000L).as("doc_id"),
        when(col("r") === 0, col("text")).otherwise(
          regexp_replace(col("text"), lit(" "),
            concat(lit(" p"), col("r"), lit("_")))).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    emb.crossJoin(broadcast(reps))
      .select(
        (col("vec_id") + col("r") * 10000000L).as("vec_id"),
        expr("transform(embedding, (x, i) -> " +
          "CAST(x + r * 0.0017f * CAST(1 + i % 7 AS FLOAT) AS FLOAT))")
          .as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val li = spark.read.parquet(s"$src/lineitem.parquet")
    li.crossJoin(broadcast(reps))
      .withColumn("l_orderkey", col("l_orderkey") + col("r") * 10000000L)
      .withColumn("l_partkey",
        if (hotPart)
          when(col("l_orderkey") % 3 === 0 && col("l_linenumber") === 1,
            lit(1L))
            .otherwise(col("l_partkey") + col("r") * 10000000L)
        else col("l_partkey") + col("r") * 10000000L)
      .drop("r")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    val part = spark.read.parquet(s"$src/part.parquet")
    part.crossJoin(broadcast(reps))
      .withColumn("p_partkey", col("p_partkey") + col("r") * 10000000L)
      .drop("r")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/part.parquet")

    // orders for the customer↔part bipartite family (graph_hits):
    // o_orderkey remaps by the SAME offset as lineitem's l_orderkey so
    // the join lines up within a replica; o_custkey remaps too, so each
    // replica is its own disjoint customer-part graph — N× vertices and
    // edges at source density, same discipline as lineitem/part.
    val ord = spark.read.parquet(s"$src/orders.parquet")
    ord.crossJoin(broadcast(reps))
      .withColumn("o_orderkey", col("o_orderkey") + col("r") * 10000000L)
      .withColumn("o_custkey", col("o_custkey") + col("r") * 10000000L)
      .drop("r")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    // events for the behavioral/temporal family (funnel, sessionize,
    // attribution, transitions, SCD2 joins): user AND event ids remap
    // per replica, timestamps stay — each replica is a disjoint user
    // population over the same calendar, so N× users at source
    // per-user event density (the production growth axis). Remapping
    // ts instead would stretch the calendar and leave every per-user
    // window the same size — that measures nothing.
    val ev = graft.Tables.events(spark, src) // normalized ts (any encoding)
    ev.crossJoin(broadcast(reps))
      .withColumn("event_id", col("event_id") + col("r") * 100000000L)
      .withColumn("user_id", col("user_id") + col("r") * 10000000L)
      .drop("r")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    // customer for the linkage/merge/concordance family (rel_merge
    // _upsert, eval_kendall_tau): custkey remaps per replica (disjoint
    // key spaces, same discipline as orders' o_custkey); nationkey
    // stays — nation is a fixed dimension, so 10× data means 10× the
    // customers per nation (the density growth axis), not 10× nations.
    val cust = spark.read.parquet(s"$src/customer.parquet")
    cust.crossJoin(broadcast(reps))
      .withColumn("c_custkey", col("c_custkey") + col("r") * 10000000L)
      .drop("r")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/customer.parquet")

    println(s"scaled x$factor -> $out: docs=" +
      spark.read.parquet(s"$out/documents.parquet").count() +
      " embeddings=" + spark.read.parquet(s"$out/embeddings.parquet").count() +
      " lineitem=" + spark.read.parquet(s"$out/lineitem.parquet").count() +
      " part=" + spark.read.parquet(s"$out/part.parquet").count() +
      " events=" + spark.read.parquet(s"$out/events.parquet").count())
    spark.stop()
  }
}
