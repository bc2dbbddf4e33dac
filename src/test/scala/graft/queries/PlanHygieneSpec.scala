package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Whole-surface plan-hygiene law: no batch query may plan an
  * unbounded cartesian or nested-loop join — the plan shape that is
  * quadratic at 100 TB no matter how fast it looks at test scale.
  * Queries whose SEMANTICS are a cross product of deliberately tiny
  * (single-aggregate-row or broadcast-scalar) sides are whitelisted
  * explicitly, with the reason pinned here. */
class PlanHygieneSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // Each entry: the query's cross/NLJ side is provably bounded —
  // a global 1-row aggregate, an explicit literal relation, or a
  // fixed-k broadcast query set. The nested loop multiplies by a
  // CONSTANT, never by a data-sized relation.
  private val allowed: Set[String] = Set(
    "join_cross",          // declared cartesian exemplar over 5x5 dims
    "join_salted",         // dim x broadcast(range(0, 8)) literal salts
    "sim_knn_brute",       // corpus x broadcast 8-query set (by design)
    "sim_mips_brute",      // same broadcast query set, raw-dot score
    "sim_knn_expr",        // same broadcast query set, codegen dot
    "sim_rp_project",      // row x broadcast 1-row literal sign matrix
    "sketch_theta_overlap",// 1-row sketch x 1-row sketch
    "skew_profile",        // counts x broadcast 1-row grand total
    "sub_scalar",          // uncorrelated scalar subquery = 1-row side
    "text_tfidf",          // tf x broadcast 1-row corpus-size scalar
    "text_unigram_nll",    // dt x broadcast 1-row corpus-total scalar
    "text_pmi_bigrams",    // counts x broadcast 1-row (T1,T2) totals
    "sim_pq_adc",          // corpus x broadcast 1-row codebook + 8-query dtab
    "text_bm25",           // postings x broadcast 1-row (N, sumdl) stats
    "behavior_basket_lift", // pairs x broadcast 1-row basket count
    "pipe_negative_sample", // orders x broadcast 1-row max-partkey bound
    "sim_knn_sq8",         // corpus x broadcast 1-row stats + 8-query codes
    "vec_pca_power",       // corpus x broadcast 1-row iteration vector
    "sim_rerank",          // SQ8 stage: 1-row stats + 8-query code set
    "text_bigram_ppl",     // counts x broadcast 1-row |V| scalar
    "sim_recall_at_k",     // both retrievers' broadcast query/stats sides
    "eval_pr_thresholds",  // events x broadcast 10-row literal thresholds
    "eval_kappa",          // 1-row agreement agg x 1-row chance agg
    "graph_modularity",    // rollup x broadcast 1-row edge count m
    "vec_label_centroids", // |labels|-row centroid broadcast self-join
    "cluster_kmeans",      // corpus x broadcast 1-row k-centroid array
    "text_bpe_apply",      // vocab x broadcast 1-row ranked merge table
    "eval_lift",           // runs x broadcast 1-row total + 10-row deciles
    "text_jsd",            // sources x broadcast vocab + 1-row corpus total
    "behavior_ab_assign",  // arms x broadcast 1-row user grand total
    "norm_quantile",       // pooled CDF x broadcast 1-row corpus total
    "text_boilerplate",    // segments x broadcast 1-row df threshold
    "eval_bootstrap_ci",   // events x broadcast 64-row literal replica ids
    "dq_benford",          // digit counts x broadcast 1-row grand total
    "pipe_kfold",          // fold rows x broadcast 1-row corpus count
    "pipe_shard_balance",  // 32 shard counts x broadcast 1-row total
    "eval_mutual_info",    // 35-row joint counts x 1-row entropy scalars
    "dq_freshness",        // per-type extrema x broadcast 1-row watermark
    "json_key_profile",    // exploded keys x broadcast 1-row row total
    "text_kn_bigram",      // counts x broadcast 1-row distinct-bigram total
    "graph_hits",          // top-20 cut x broadcast 1-row auth-mass total
    "behavior_survival_km",// per-user obs x broadcast 1-row horizon max-ts
    "eval_rbo",            // 20-row rank pairs x 20-row literal depth grid
    "pipe_privacy_kanon",  // class sizes x 3-row literal k grid + 1-row total
    "behavior_window_funnel", // 3 level counts x broadcast 1-row entrant total
    "split_leakage_safe",  // 1-row doc stats x broadcast 1-row cluster stats
    "eval_fleiss_kappa",   // items x 3-row literal raters + 1-row P̄/Pe aggs
    "pipe_curriculum_order", // docs x broadcast 1-row quartile bounds
    "pipe_domain_temperature", // sources x broadcast 1-row total/Z scalars
    "vec_matryoshka_eval", // corpus x broadcast 8-query set (both retrievers)
    "eval_ece",            // 10 bin rows x broadcast 1-row grand total
    "vec_ivf_recall_curve", // corpus x broadcast 10-query truth side
    "sim_index_balance",   // cell rows x broadcast 1-row (N, k) scalars
    "eval_cuped",          // 2 arm rows x broadcast 1-row (theta, xbar)
    "eval_mannwhitney",    // 1-row rank stats x broadcast 1-row (na, nb)
    "eval_kendall_tau",    // |nations|² theta self-join on the AGGREGATED
                           // relation (25 rows) — collapse-then-quadratic
    "graph_ppr",           // vertices x broadcast 1-row seed-count scalar
    "ts_trend_mk",         // |days|² sign pairs on the AGGREGATED day
                           // relation + 1-row S/n/tie scalars
    "ts_slope_theil_sen",  // |days|² slope pairs on the aggregated days
                           // + 1-row OLS scalar
    "pipe_pack_curve",     // docs x broadcast 3-row literal length grid
    "behavior_repeat_curve", // buyers x broadcast 5-row literal k grid
                           // + 1-row buyer total
    "pipe_dsir_weights",   // vocab x broadcast 1-row corpus totals
    "behavior_rfm",        // quintiled customers x broadcast 1-row
                           // total-revenue scalar
    "pipe_gopher_rules",   // <=16 mask rows x broadcast 1-row doc total
    "ts_ses",              // |days|² dyadic-weight pairs on the AGGREGATED
                           // day relation (ts_trend_mk shape)
    "eval_brier_decomp",   // 10 bin rows x broadcast 1-row corpus scalars
    "behavior_l28",        // user day-counts x broadcast 1-row max-day
    "dq_sequence_gaps",    // id anti-join x broadcast 1-row extrema
    "eval_delong_compare", // score components x broadcast 1-row (P, N)
    "vec_norm_census",     // norm buckets x broadcast 1-row total
    "eval_roc_points",     // events x broadcast 10-row literal thresholds
    "pipe_dedup_threshold_curve", // verified pairs x 4-row literal t grid
                           // + 1-row corpus total
    "pipe_oversample_minority", // |langs| rows x broadcast 1-row max/total
    "eval_cliffs_delta",   // 1-row rank stats x broadcast 1-row (na, nb)
    "eval_ips_offpolicy",  // events x broadcast 1-row log total (nn)
    "eval_dr_offpolicy",   // events x broadcast 1-row log total (nn)
    "sketch_bloom",        // 1-row probe stats x broadcast 1-row bits_set
    "mm_clip_score_filter", // <=10 bucket rows x broadcast 1-row total
    "eval_friedman",       // 1-row rank sums x broadcast 1-row tie term
    "eval_krippendorff",   // 1-row Do x broadcast 1-row n x 1-row De
    "vec_mmd_poly",        // d^2 moment grid x broadcast 1-row counts
    "eval_group_sequential", // users x broadcast 4-row literal look grid
    "eval_levene_bf",      // 5 group rows x broadcast 1-row grand scalars
    "eval_permutation",    // users x broadcast 200-row literal replicate
                           // grid + 200 T_r rows x broadcast 1-row T_obs
    "ts_periodogram",      // day-level rollup x 5-row literal period grid
    "text_heaps_law",      // docs x broadcast 1-row max-id + 20-row grid
                           // x broadcast 1-row fit sums
    "graph_butterflies",   // 1-row wedge total x 1-row butterfly total
    "graph_rich_club",     // 5-row literal k grid x degree histograms
                           // (bounded by max degree, not corpus)
    "sample_neyman",       // 5 stratum rows x broadcast 1-row Σ(N·S)
    "pipe_quality_logit",  // docs x broadcast 1-row β per IRLS round
                           // (the aggregate-stats/tiny-solve shape)
    "eval_cem_att",        // 1-row ATT rollup x broadcast 1-row naive
    "dq_key_discovery",    // 1-row DISTINCT rollup x broadcast 1-row
                           // count(*) per probe (in-plan scalar subquery)
    "vec_cosine_lsh_banded", // vectors x broadcast 1-row n + 1-row
                           // 64-dim mean array (width ladder + centering)
    "sim_knn_mutual_banded", // same banded-parts broadcasts
    "eval_gwet_ac1",       // q-row marginal grid x broadcast 1-row n,
                           // then 1-row Po x 1-row Pe
    "pipe_mix_effective_sources", // source rollup x broadcast 1-row
                           // total + 1-row temperature normalizer
    "graph_ktruss",        // 1-row per-round edge counts cross-joined
                           // into the 2-row census
    "ts_hurst",            // day-level rollup x 3-row literal block-
                           // size grid (ts_periodogram's shape)
    "sim_ivfpq_adc",       // corpus x broadcast 1-row residual codebook
                           // + 8-query dtab (sim_pq_adc's shape)
    "eval_auc_by_fold",    // 5 fold rows x broadcast 1-row dispersion
    "agg_inequality",      // events x broadcast 1-row mean (two-scan)
    "eval_cost_threshold"  // events x broadcast 9-row literal grid
  )

  private def offenders(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, dir)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    Seq("CartesianProduct", "BroadcastNestedLoopJoin")
      .filter(plan.contains)
  }

  private val batchQueries = SparkEntry.queries.keys.toSeq.sorted
    .filterNot(_.startsWith("stream_"))

  // Builders that legitimately throw OUTSIDE the planner in this spec's
  // minimal environment (e.g. they require staged side artifacts a bench
  // warmup creates). Everything else that fails to BUILD is a failed
  // test, not a silent pass — a swallowed build error would exempt a
  // regressed query from the hygiene law exactly when it matters.
  private val buildExempt: Set[String] = Set.empty

  // ---- streaming half of the law ----------------------------------
  // Streaming plans can regress to BNLJ too (typically on a static
  // side), and a streaming DataFrame can't be explain()'d from here —
  // the builders encapsulate start()/processAllAvailable(). So the
  // sweep captures the PHYSICAL PLAN OF EVERY MICRO-BATCH as Spark
  // reports it: SparkListenerSQLExecutionStart events carry the full
  // physicalPlanDescription for each execution on the shared context,
  // including streaming micro-batches. Each stream_* builder runs at
  // sf0.001 with the listener attached; every captured plan is held to
  // the same CartesianProduct/BNLJ law.
  private val streamAllowed: Set[String] = Set(
    // 1-row broadcast scalars on the STATIC side of the final-state
    // computation (same bounded shapes as the batch whitelist):
    "stream_sprt",     // per-batch LLR x broadcast 1-row ln-constant row
    "stream_psi",      // bucket counts x broadcast 1-row baseline total
    "stream_ab_monitor", // arm aggregates x broadcast 1-row pooled stats
    "stream_freshness" // per-type extrema x broadcast 1-row watermark row
  )

  test("no streaming micro-batch plans CartesianProduct/BNLJ (outside the whitelist)") {
    val streamQueries = SparkEntry.queries.keys.toSeq.sorted
      .filter(_.startsWith("stream_"))
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(
          event: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        event match {
          case e: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            plans.add(e.physicalPlanDescription)
          case _ => ()
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val bad = scala.collection.mutable.ListBuffer.empty[(String, String)]
    val broken = scala.collection.mutable.ListBuffer.empty[(String, String)]
    var totalPlans = 0 // guard against a vacuous pass (listener saw nothing)
    try {
      for (q <- streamQueries) {
        plans.clear()
        try {
          SparkEntry.queries(q)(spark, dir)
          // drain the async listener bus before attributing plans
          org.apache.spark.graft.ListenerBusFlush.drain(
            spark.sparkContext, 30000L)
          totalPlans += plans.size()
          val offending = plans.iterator()
          while (offending.hasNext) {
            val p = offending.next()
            for (shape <- Seq("CartesianProduct", "BroadcastNestedLoopJoin")
                 if p.contains(shape) && !streamAllowed(q))
              bad += ((q, shape))
          }
        } catch {
          case e: Throwable =>
            broken += ((q, e.toString.linesIterator.next()))
        }
        spark.catalog.clearCache()
        spark.catalog.listTables().collect()
          .filter(t => t.isTemporary && t.name.startsWith("st_"))
          .foreach(t => spark.catalog.dropTempView(t.name))
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(broken.isEmpty,
      s"stream queries failed to BUILD (hygiene law couldn't run):\n${broken.mkString("\n")}")
    assert(totalPlans > 0,
      "listener captured zero execution plans — the sweep checked nothing")
    assert(bad.distinct.isEmpty,
      s"quadratic join shapes in streaming micro-batches:\n${bad.distinct.mkString("\n")}")
  }

  // ---- unpartitioned-window half of the law -----------------------
  // A WindowExec with an EMPTY partition spec moves its whole input to
  // ONE task ("No Partition Defined for Window operation") — the shape
  // that single-cores a 100 TB relation no matter how fast it looks at
  // test scale (the round-12 weak class: raw-row/entity-level global
  // ntile). The law: every empty-partition-spec WindowExec /
  // WindowGroupLimitExec must sit over an AGGREGATE-REDUCED child (a
  // rollup someone already collapsed — day grids, deciles, bucket
  // offsets: bounded by the group-key domain, not the corpus), or be
  // whitelisted here with the boundedness reason pinned. Raw-row and
  // joined-raw inputs fail. Ranks.* is the sanctioned alternative.
  private val windowAllowed: Set[String] = Set(
    // Add entries ONLY with a reason why the window input cannot grow
    // with the corpus:
    "win_rank_ntile" // the declared SQL rank/dense_rank/ntile function
                     // exemplar, over a CONSTANT key slice (o_custkey
                     // < 20 → ≤20 customers' orders). Unbounded global
                     // rank/ntile forms ride Ranks.* instead
                     // (agg_histogram_eqdepth, behavior_rfm, ...).
  )

  private def unwrap(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] =
    p +: (p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        unwrap(a.inputPlan)
      case a: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        unwrap(a.plan)
      case other => other.children.flatMap(unwrap)
    })

  private def hasAggBelow(p: org.apache.spark.sql.execution.SparkPlan)
      : Boolean =
    unwrap(p).exists {
      case _: org.apache.spark.sql.execution.aggregate.HashAggregateExec => true
      case _: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec => true
      case _: org.apache.spark.sql.execution.aggregate.SortAggregateExec => true
      case _ => false
    }

  private def unpartitionedWindows(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, dir)
    unwrap(df.queryExecution.executedPlan).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty && !hasAggBelow(w.child) =>
        "WindowExec(no partition, non-aggregated child)"
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
          if w.partitionSpec.isEmpty && !hasAggBelow(w.child) =>
        "WindowGroupLimitExec(no partition, non-aggregated child)"
    }
  }

  test("no batch query plans an unpartitioned window over non-aggregated input (outside the whitelist)") {
    val bad = scala.collection.mutable.ListBuffer.empty[(String, Seq[String])]
    val broken = scala.collection.mutable.ListBuffer.empty[(String, String)]
    for (q <- batchQueries if !windowAllowed(q)) {
      try {
        val off = unpartitionedWindows(q)
        if (off.nonEmpty) bad += ((q, off.distinct))
      } catch {
        case e: Throwable if !buildExempt(q) =>
          broken += ((q, e.toString.linesIterator.next()))
      }
      spark.catalog.clearCache()
    }
    assert(broken.isEmpty,
      s"queries failed to BUILD (window law couldn't run):\n${broken.mkString("\n")}")
    assert(bad.isEmpty,
      s"single-partition window over non-aggregated input:\n${bad.mkString("\n")}")
  }

  test("no batch query plans CartesianProduct/BNLJ (outside the whitelist)") {
    val bad = scala.collection.mutable.ListBuffer.empty[(String, Seq[String])]
    val broken = scala.collection.mutable.ListBuffer.empty[(String, String)]
    for (q <- batchQueries if !allowed(q)) {
      try {
        val off = offenders(q)
        if (off.nonEmpty) bad += ((q, off))
      } catch {
        case e: Throwable if !buildExempt(q) =>
          broken += ((q, e.toString.linesIterator.next()))
      }
      spark.catalog.clearCache()
    }
    assert(broken.isEmpty,
      s"queries failed to BUILD (hygiene law couldn't run):\n${broken.mkString("\n")}")
    assert(bad.isEmpty, s"quadratic join shapes found:\n${bad.mkString("\n")}")
  }
}
