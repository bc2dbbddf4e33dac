package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Partition-count invariance for the round-4 operators: the same rows
  * must come back at any `spark.sql.shuffle.partitions` — the law that
  * makes a result valid on a laptop and a 1000-executor cluster alike.
  * The fixture plants an EXACT duplicate doc so dedup_span_keepfirst
  * exercises the all-spans-dropped path (clean_hash of the empty
  * reassembly — md5('') in both engines, not NULL), and a 3-token doc so
  * the degenerate-window guards stay covered. */
class DeterminismSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("detdocs").toString
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    Seq(
      (1L, base, "en", "t", 0L),
      (2L, base, "en", "t", 0L), // exact dup: every span a later occurrence
      (3L, (1 to 40).map(i => s"other$i").mkString(" "), "de", "t", 0L),
      (4L, "a b c", "en", "t", 5L),
      (5L, ((1 to 20).map(i => s"tok$i") ++ (1 to 20).map(i => s"mix$i")).mkString(" "), "fr", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def rowsAt(q: String, parts: Int): Seq[String] = {
    val k = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(k)
    spark.conf.set(k, parts.toString)
    try SparkEntry.queries(q)(spark, dir).collect().map(_.toString).toSeq
    finally {
      spark.conf.set(k, saved)
      // Builders cache intermediates (e.g. simhashDf); the CacheManager
      // matches the second invocation's identical plan and would serve
      // the FIRST partition count's result, making the comparison
      // vacuous for everything above the cache point.
      spark.catalog.clearCache()
    }
  }

  for (q <- Seq("dedup_span_keepfirst", "sample_balanced", "dedup_simhash_pairs"))
    test(s"$q: identical rows at 3 and 29 shuffle partitions") {
      assert(rowsAt(q, 3) == rowsAt(q, 29))
    }

  // Round-5 additions run against the real sf0.001 tables (they read
  // events/orders/customer, which the planted-docs fixture lacks).
  private def rowsAtSf(q: String, parts: Int): Seq[String] = {
    val k = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(k)
    spark.conf.set(k, parts.toString)
    try SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).toSeq
    finally { spark.conf.set(k, saved); spark.catalog.clearCache() }
  }

  for (q <- Seq("funnel_steps", "cohort_retention", "text_ttr",
      "join_multiway", "join_nullsafe", "agg_approx_topk", "agg_topk_merge",
      "cogroup_orders", "shuffle_epoch", "split_train_val", "rfm_segments",
      "stickiness_ratio",
      // round-6 additions — the decimal-sum/floor-quantize/md5-order
      // disciplines are exactly what this law checks
      "graph_pagerank", "dim_scd2_intervals", "sample_cap_per_source",
      "text_winsorize", "dedup_minhash_banded", "link_fuzzy_names",
      "sess_ids", "join_asof_fwd", "text_entropy", "ts_resample",
      "dedup_cc_keep", "conv_latency", "agg_approx_distinct",
      "agg_approx_percentiles",
      // round-8 additions: the kmeans argmin + decimal-distance claim,
      // the prefix-filter candidate set, the EWMA decimal-term sum, and
      // the wedge-join triangle count are all partition-sensitive if
      // their determinism disciplines slip
      "cluster_kmeans", "dedup_prefix_jaccard", "ts_ewma",
      "graph_triangles", "join_bloom_prefilter", "dedup_containment",
      "text_unigram_nll", "text_vocab_encode",
      // round-8 batch-2 additions: decimal rank-1 sums (PCA), decimal
      // credit rollup (attribution), exact sufficient statistics
      // (regression), fixed-pivot double sum (BM25), min-dist rollup
      // (BFS) — each breaks here first if its discipline slips
      "vec_pca_power", "behavior_attribution", "agg_regression",
      "text_bm25", "graph_bfs_khop", "behavior_basket_lift",
      "text_bigram_ppl", "agg_gini_entropy", "sim_rerank",
      "text_bpe_merges", "vec_label_centroids", "graph_modularity",
      "sim_recall_at_k", "pipe_feature_hash",
      // round-9: the encode join + broadcast merge table must yield the
      // same subtoken counts on any partitioning
      "text_bpe_apply",
      // round-9 batch 2: DECIMAL-quantized metric terms (logloss, JSD,
      // CUSUM, autocorrelation, quantile-norm shift), the pro-rata
      // decile apportionment, the wedge-join jaccard counts, and the
      // islands run keys are each partition-sensitive if their
      // determinism disciplines slip
      "eval_logloss", "eval_lift", "eval_mrr", "eval_chi2",
      "text_jsd", "text_boilerplate", "graph_jaccard", "win_streaks",
      "agg_weighted_median", "ts_cusum", "agg_mode", "ts_autocorr",
      "behavior_ab_assign", "norm_quantile", "graph_degree_dist",
      "text_readability",
      // round-13 fourth batch: the DECIMAL power sums (JB), the
      // quantized between/within terms (Brown-Forsythe), the erfc
      // p-value + 35-row BH windows, the conjugate-posterior algebra,
      // and the exact per-user DECIMAL spends under 200 md5 replays
      // are each partition-sensitive if their disciplines slip
      "eval_jarque_bera", "eval_levene_bf", "eval_fdr_bh",
      "eval_bayes_ab", "eval_permutation",
      // round-13 fifth batch: the HW fold rides collect_list order,
      // peaks ride integer windows, the periodogram rides quantized
      // trig terms — each partition-sensitive if the discipline slips
      "ts_holt_winters", "ts_peaks", "ts_periodogram",
      // the min-bucket first-occurrence aggregate and the exact
      // char-class integer sums
      "text_heaps_law", "text_unicode_census",
      // exact DISTINCT rollups per key probe
      "dq_key_discovery",
      // round-13 sixth batch: integer keep-thresholds (Neyman), the
      // stacked DECIMAL transform sums (Box-Cox), and the LSH-bounded
      // mutual top-k (kNN graph)
      "sample_neyman", "norm_boxcox", "sim_knn_mutual",
      // landmark-hash inventories and median-seasonal ESD rounds
      "mm_audio_fingerprint", "ts_shesd",
      // ordered journey listagg and quantized ADF sums
      "behavior_pattern_regex", "ts_adf",
      // the IRLS sufficient-statistic sums
      "pipe_quality_logit",
      // stratum terms and bandwidth-windowed OLS sums
      "eval_cem_att", "eval_rdd_effect",
      // local-min fingerprint selection and split-quantile intervals
      "text_winnowing", "eval_conformal", "ts_forecast_accuracy",
      // round-14: the decimal-quantized per-dim means behind the
      // centered band keys, and the banded mutual graph over them,
      // are partition-sensitive if the mean discipline slips
      "vec_cosine_lsh_banded", "sim_knn_mutual_banded",
      // round-14 stats batch: quantized chi2/pi/HL/ANOVA/moment terms
      // and the exact concordance census
      "eval_cramers_v", "eval_gwet_ac1", "eval_somers_gamma",
      "eval_hosmer_lemeshow", "eval_icc", "eval_lin_ccc",
      // round-14 temporal batch: quantized lag products, block
      // cumulative-deviation windows, and the 3-point log-log OLS
      "ts_ar2_yw", "ts_ljung_box", "ts_lttb", "ts_hurst",
      // round-14 dq/pipe/graph/text batch: distinct rollups, regex
      // ladders, quantized entropy terms, peel-round edge census,
      // integer frequency-spectrum sums
      "dq_functional_deps", "dq_format_census",
      "pipe_mix_effective_sources", "graph_ktruss", "text_yule_k",
      // round-14 fourth batch: decimal-quantized residual-PQ argmins,
      // signed-branch YJ power sums, fold-AUC moments, dt-weighted sums
      "sim_ivfpq_adc", "norm_yeo_johnson", "eval_auc_by_fold",
      "ts_time_weighted_avg",
      // round-14 fifth batch: two-scan quantized inequality terms,
      // count-likelihood deviances, per-brand ln-ln OLS moments
      "agg_inequality", "ts_forecast_deviance",
      "behavior_price_elasticity",
      // round-14 sixth batch: exact confusion counts on a literal
      // grid, presence-flag rollups, quantized JM-mixture NLL terms
      "eval_cost_threshold", "dq_value_drift", "text_lm_interp_ppl",
      // round-14 seventh batch: exact confusion cells, staged
      // Durbin-Levinson scalars over quantized lag sums
      "eval_mcc", "ts_pacf"))
    test(s"$q: identical rows at 3 and 29 shuffle partitions (sf0.001)") {
      assert(rowsAtSf(q, 3) == rowsAtSf(q, 29))
    }

  test("dedup_span_keepfirst: exact-dup doc keeps zero spans, empty reassembly hash") {
    val out = SparkEntry.queries("dedup_span_keepfirst")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getInt(2), r.getString(3))).toMap
    assert(out(2L)._1 == 0)
    // md5 of the empty string — what DuckDB's coalesce('') twin hashes too
    assert(out(2L)._2 == "d41d8cd98f00b204e9800998ecf8427e")
    assert(out(1L)._1 > 0)
  }
}
