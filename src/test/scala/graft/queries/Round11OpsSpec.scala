package graft.queries

import graft.{SparkEntry, SparkSpec}
import java.sql.Timestamp

/** Mathematical laws for the round-11 operator additions on planted
  * fixtures: a clean level shift is found exactly by binary
  * segmentation, deterministic LPA collapses a triangle to its min
  * vertex, temperature mixing with a 9:1 corpus yields the exact 3:1
  * sqrt weights, curriculum order is a bucket-respecting permutation,
  * l-diversity separates one-status classes from mixed ones,
  * matryoshka recall is 1 when the tail dims are zero, and ROUGE-2 of
  * an identical pair is exactly 1. */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = Timestamp.valueOf("2024-01-01 12:00:00")
  private def plusDays(t: Timestamp, days: Int): Timestamp =
    new Timestamp(t.getTime + days * 24L * 3600L * 1000L)

  private def tempDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("ts_changepoint_binseg: a clean level shift splits at the boundary with exact means and gain") {
    // one type, 6 days: counts 2,2,2,8,8,8 -> split after day 3,
    // means 2 and 8, gain = SSE_total = 204 - 900/6 = 54 (segments are
    // constant so within-segment SSE is 0).
    val d = tempDir("r11cp")
    val rows = for {
      day <- 0 until 6
      k <- 0 until (if (day < 3) 2 else 8)
    } yield ((day * 100 + k).toLong, plusDays(t0, day), 1L, "view", 0.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = SparkEntry.queries("ts_changepoint_binseg")(spark, d).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[java.sql.Date]("split_day").toString == "2024-01-03")
    assert(r.getAs[Long]("n_left") == 3L)
    assert(r.getAs[Long]("n_right") == 3L)
    assert(r.getAs[Double]("mean_left") == 2.0)
    assert(r.getAs[Double]("mean_right") == 8.0)
    assert(r.getAs[Double]("gain") == 54.0)
  }

  test("graph_label_propagation: two disjoint triangles collapse to their min vertices") {
    val d = tempDir("r11lpa")
    // each triangle's edges appear in TWO orders -> support >= 2.
    val li = for {
      (ok, parts) <- Seq((1L, Seq(1L, 2L, 3L)), (2L, Seq(1L, 2L, 3L)),
        (3L, Seq(10L, 11L, 12L)), (4L, Seq(10L, 11L, 12L)))
      p <- parts
    } yield (ok, p)
    li.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val out = SparkEntry.queries("graph_label_propagation")(spark, d).collect()
    val m = out.map(r => r.getAs[Long]("community") ->
      (r.getAs[Long]("n_members"), r.getAs[Long]("min_member"))).toMap
    assert(m.keySet == Set(1L, 10L))
    assert(m(1L) == ((3L, 1L)))
    assert(m(10L) == ((3L, 10L)))
  }

  test("graph_bipartite_project: shared-part support and exact jaccard") {
    val d = tempDir("r11bip")
    // customers 1 and 2 share parts {100,101,102}; customer 3 shares
    // only part 100 with each -> below the support-3 cut.
    Seq((1L, 1L), (2L, 2L), (3L, 3L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val li = Seq(
      (1L, 100L), (1L, 101L), (1L, 102L), (1L, 103L),
      (2L, 100L), (2L, 101L), (2L, 102L),
      (3L, 100L))
    li.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val out = SparkEntry.queries("graph_bipartite_project")(spark, d).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("c1") == 1L && r.getAs[Long]("c2") == 2L)
    assert(r.getAs[Long]("shared") == 3L)
    // |A|=4, |B|=3, shared 3 -> jaccard 3/4
    assert(r.getAs[Double]("jaccard") == 0.75)
  }

  test("eval_fleiss_kappa: statistic is well-formed on a mixed-category fixture") {
    val d = tempDir("r11fk")
    val rows = for (i <- 0 until 140) yield
      ((i * 7).toLong, plusDays(t0, i % 20), (i % 9).toLong,
        Seq("click", "view", "purchase", "signup", "error")(i % 5), 0.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = SparkEntry.queries("eval_fleiss_kappa")(spark, d).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_items") == 140L)
    val pBar = r.getAs[Double]("p_bar")
    val pE = r.getAs[Double]("p_e")
    val kappa = r.getAs[Double]("kappa")
    assert(pBar >= 0.0 && pBar <= 1.0)
    assert(pE > 0.0 && pE < 1.0)
    assert(kappa <= 1.0)
    // the 75% keep-base protocol must agree far above chance
    assert(kappa > 0.2)
  }

  test("pipe_domain_temperature: a 9:1 corpus gets exact 3:1 sqrt weights and capped realization") {
    val d = tempDir("r11dt")
    val docs = (0 until 90).map(i =>
      (i.toLong, s"doc $i text", "en", "src_a", 10L)) ++
      (0 until 10).map(i =>
        ((1000 + i).toLong, s"doc b$i text", "en", "src_b", 10L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("pipe_domain_temperature")(spark, d).collect()
    val m = out.map(r => r.getAs[String]("source") -> r).toMap
    // sqrt(0.9) = 3*sqrt(0.1) -> weights exactly 0.75 / 0.25
    assert(m("src_a").getAs[Double]("weight") == 0.75)
    assert(m("src_b").getAs[Double]("weight") == 0.25)
    assert(m("src_a").getAs[Long]("target") == 150L)
    assert(m("src_b").getAs[Long]("target") == 50L)
    // realized = min(target, available)
    assert(m("src_a").getAs[Long]("realized") == 90L)
    assert(m("src_b").getAs[Long]("realized") == 10L)
  }

  test("pipe_curriculum_order: bucket-respecting permutation over length quartiles") {
    val d = tempDir("r11cu")
    val docs = (1 to 8).map(i => (i.toLong, s"doc $i", "en", "s", i.toLong))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("pipe_curriculum_order")(spark, d).collect()
    assert(out.length == 8)
    // ord is a permutation of 1..8
    assert(out.map(_.getAs[Long]("ord")).sorted.toSeq == (1L to 8L))
    // quartiles of 1..8: docs {1,2} -> bucket 1 -> ord {1,2}, etc.
    val byDoc = out.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Int]("bucket"), r.getAs[Long]("ord"))).toMap
    for (doc <- 1L to 8L) {
      val expectBucket = ((doc - 1) / 2 + 1).toInt
      assert(byDoc(doc)._1 == expectBucket)
      assert(byDoc(doc)._2 > (expectBucket - 1) * 2 &&
        byDoc(doc)._2 <= expectBucket * 2)
    }
  }

  test("pipe_privacy_ldiversity: one-status classes separate from mixed, with exact entropies") {
    val d = tempDir("r11ld")
    Seq((1L, 0L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    val day = java.sql.Date.valueOf("2024-01-03")
    val orders = Seq(
      (1L, 1L, "F", day, "1-URGENT"),
      (2L, 1L, "F", day, "1-URGENT"),
      (3L, 1L, "F", day, "1-URGENT"),
      (4L, 1L, "F", day, "2-HIGH"),
      (5L, 1L, "O", day, "2-HIGH"))
    orders
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate",
        "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val out = SparkEntry.queries("pipe_privacy_ldiversity")(spark, d).collect()
    val m = out.map(r => r.getAs[Int]("l") -> r).toMap
    assert(m(1).getAs[Long]("n_classes") == 1L)
    assert(m(1).getAs[Long]("n_rows") == 3L)
    assert(m(1).getAs[Double]("min_entropy") == 0.0)
    assert(m(2).getAs[Long]("n_classes") == 1L)
    assert(m(2).getAs[Long]("n_rows") == 2L)
    // 50/50 split -> ln 2
    assert(math.abs(m(2).getAs[Double]("min_entropy") - 0.6931) < 1e-9)
  }

  test("vec_matryoshka_eval: zero tail dimensions give recall 1 for every query") {
    val d = tempDir("r11mx")
    // 12 vectors, nonzero ONLY in the first 16 dims -> the truncated
    // cosine IS the full cosine, so top-5 sets coincide exactly.
    val vecs = (0 until 12).map { i =>
      val e = Array.tabulate(64)(j =>
        if (j < 16) ((i * 7 + j * 3) % 11 + 1).toFloat else 0.0f)
      (i.toLong, e.toSeq, i % 3)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = SparkEntry.queries("vec_matryoshka_eval")(spark, d).collect()
    assert(out.length == 8)
    assert(out.forall(_.getAs[Double]("recall") == 1.0))
  }

  test("text_rouge_pairs: an identical pair scores exactly 1 on all three metrics") {
    val d = tempDir("r11rg")
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, shared, "en", "s", shared.length.toLong),
      (2L, shared, "en", "s", shared.length.toLong),
      (3L, (1 to 12).map(i => s"other$i").mkString(" "), "en", "s", 10L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("text_rouge_pairs")(spark, d).collect()
    val pair = out.find(r =>
      r.getAs[Long]("d1") == 1L && r.getAs[Long]("d2") == 2L)
    assert(pair.isDefined)
    assert(pair.get.getAs[Double]("rouge2_r") == 1.0)
    assert(pair.get.getAs[Double]("rouge2_p") == 1.0)
    assert(pair.get.getAs[Double]("rouge2_f") == 1.0)
  }

  test("eval_auprc: a perfect ranking scores AP 1; a worst-ranked positive scores its precision") {
    val d = tempDir("r11ap")
    // single weekday group; positives (purchase) outrank all negatives.
    val rows = Seq(
      (1L, t0, 1L, "purchase", 100.0, "{}"),
      (2L, t0, 2L, "purchase", 90.0, "{}"),
      (3L, t0, 3L, "view", 10.0, "{}"),
      (4L, t0, 4L, "view", 5.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = SparkEntry.queries("eval_auprc")(spark, d).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("p_cnt") == 2L)
    assert(out.head.getAs[Double]("auprc") == 1.0)
    // one positive ranked LAST of three -> AP = 1/3
    val d2 = tempDir("r11ap2")
    Seq((1L, t0, 1L, "view", 100.0, "{}"),
        (2L, t0, 2L, "view", 90.0, "{}"),
        (3L, t0, 3L, "purchase", 10.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d2/events.parquet")
    val out2 = SparkEntry.queries("eval_auprc")(spark, d2).collect()
    assert(out2.head.getAs[Double]("auprc") == 0.3333)
  }

  test("eval_ece: saturated correct predictions give near-zero calibration error") {
    val d = tempDir("r11ec")
    // value 500 -> sigmoid((500-100)/40) = sigmoid(10) ~ 0.99995, all
    // converting -> bin 9 gap ~ 0.
    val rows = (1 to 20).map(i =>
      (i.toLong, t0, i.toLong, "purchase", 500.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = SparkEntry.queries("eval_ece")(spark, d).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n") == 20L)
    assert(out.head.getAs[Double]("ece") < 0.001)
    assert(out.head.getAs[Double]("mce") >= out.head.getAs[Double]("ece"))
  }

  test("ts_anomaly_mad: a spike day flags against a jittered baseline; a constant baseline yields MAD 0 and no flags") {
    val d = tempDir("r11md")
    // counts 4,5,6,4,5,6,50 -> med 5, MAD 1, spike z = 30.4 > 3.5.
    val baseline = Seq(4, 5, 6, 4, 5, 6, 50)
    val rows = for {
      (c, day) <- baseline.zipWithIndex
      k <- 0 until c
    } yield ((day * 1000 + k).toLong, plusDays(t0, day), 1L, "view", 0.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = SparkEntry.queries("ts_anomaly_mad")(spark, d).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_days") == 7L)
    assert(r.getAs[Double]("med") == 5.0)
    assert(r.getAs[Double]("mad") == 1.0)
    assert(r.getAs[Long]("n_anomalies") == 1L)
    assert(r.getAs[java.sql.Date]("first_anomaly").toString == "2024-01-07")
    // constant series: MAD 0 -> guarded NULL z -> zero anomalies
    val d2 = tempDir("r11md2")
    val rows2 = for { day <- 0 until 5; k <- 0 until 3 }
      yield ((day * 100 + k).toLong, plusDays(t0, day), 1L, "view", 0.0, "{}")
    rows2.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d2/events.parquet")
    val out2 = SparkEntry.queries("ts_anomaly_mad")(spark, d2).collect()
    assert(out2.head.getAs[Long]("n_anomalies") == 0L)
  }

  test("pipe_dedup_budget: an identical pair drops the higher id and its exact token mass") {
    val d = tempDir("r11db")
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    Seq(
      (1L, shared, "en", "s", 10L),
      (2L, shared, "en", "s", 10L),
      (3L, (1 to 12).map(i => s"other$i").mkString(" "), "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("pipe_dedup_budget")(spark, d).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("docs") == 3L)
    assert(r.getAs[Long]("docs_dropped") == 1L)
    assert(r.getAs[Long]("tok_total") == 36L)
    assert(r.getAs[Long]("tok_dropped") == 12L)
    assert(r.getAs[Double]("savings") == 0.3333)
  }

  test("vec_ivf_recall_curve: clean label clusters give recall 1 at both nprobe tiers") {
    val d = tempDir("r11rc")
    // 12 vectors in 3 orthogonal label clusters (cluster = IVF cell):
    // every query's true top-3 are its same-label peers, all in the
    // probed cell, so both tiers recall 1.
    val vecs = (0 until 12).map { i =>
      val lab = i % 3
      val e = Array.tabulate(64)(j =>
        if (j >= lab * 21 && j < lab * 21 + 21)
          (1.0 + 0.01 * ((i * 7 + j) % 5)).toFloat
        else 0.0f)
      (i.toLong, e.toSeq, lab)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = SparkEntry.queries("vec_ivf_recall_curve")(spark, d).collect()
    assert(out.length == 20) // 10 queries x 2 tiers
    assert(out.forall(_.getAs[Double]("recall") == 1.0))
  }

  test("stream_anomaly: the streaming replay equals the batch MAD census exactly") {
    val d = tempDir("r11sa")
    val baseline = Seq(4, 5, 6, 4, 5, 6, 50)
    val rows = for {
      (c, day) <- baseline.zipWithIndex
      k <- 0 until c
    } yield ((day * 1000 + k).toLong, plusDays(t0, day), 1L, "view", 0.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val stream = SparkEntry.queries("stream_anomaly")(spark, d)
      .collect().map(_.toString).sorted.toSeq
    val batch = SparkEntry.queries("ts_anomaly_mad")(spark, d)
      .collect().map(_.toString).sorted.toSeq
    assert(stream == batch)
    assert(stream.nonEmpty)
  }

  test("agg_mean_ci: per-arm means match a hand-computed md5 partition; interval brackets the mean") {
    val d = tempDir("r11ci")
    // one purchase per user; arms derive from md5(user_id) exactly as
    // the query does, recomputed here independently.
    val users = (1L to 6L).toSeq
    val rows = users.map(u => (u, t0, u, "purchase", 10.0 * u, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    def arm(u: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      if (Integer.parseInt(f"${md(0) & 0xff}%02x".substring(0, 1), 16) < 8)
        "A" else "B"
    }
    val expected = users.groupBy(arm).map { case (a, us) =>
      val xs = us.map(10.0 * _)
      a -> (us.size.toLong, xs.sum / xs.size)
    }
    val out = SparkEntry.queries("agg_mean_ci")(spark, d).collect()
    assert(out.map(_.getAs[String]("arm")).toSet == expected.keySet)
    for (r <- out) {
      val (n, mean) = expected(r.getAs[String]("arm"))
      assert(r.getAs[Long]("n") == n)
      assert(math.abs(r.getAs[Double]("mean_rev") - mean) < 1e-6)
      if (n > 1) {
        assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("mean_rev"))
        assert(r.getAs[Double]("ci_hi") >= r.getAs[Double]("mean_rev"))
      }
    }
  }

  test("sim_index_balance: cell shares and skew factors from a planted 6/3/3 layout") {
    val d = tempDir("r11ib")
    val vecs = (0 until 12).map { i =>
      val lab = if (i < 6) 0 else if (i < 9) 1 else 2
      (i.toLong, Seq.fill(64)(1.0f), lab)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = SparkEntry.queries("sim_index_balance")(spark, d).collect()
    val m = out.map(r => r.getAs[Int]("cell") ->
      (r.getAs[Long]("n"), r.getAs[Double]("share"),
        r.getAs[Double]("skew_vs_ideal"))).toMap
    assert(m(0) == ((6L, 0.5, 1.5)))
    assert(m(1) == ((3L, 0.25, 0.75)))
    assert(m(2) == ((3L, 0.25, 0.75)))
  }

  test("mm_metadata_audit: orientation buckets and byte budgets from planted metadata") {
    val d = tempDir("r11mm")
    // doc_id 0: 64x64 square; doc_id 40: 104x72 landscape (40%64=40,
    // 40%32=8). payload = text bytes.
    val docs = Seq(
      (0L, "abcd", "en", "s", 4L),
      (40L, "abcdefgh", "en", "s", 8L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("mm_metadata_audit")(spark, d).collect()
    val m = out.map(r => r.getAs[String]("orientation") -> r).toMap
    assert(m.keySet == Set("square", "landscape"))
    assert(m("square").getAs[Long]("total_bytes") == 4L)
    assert(m("square").getAs[Double]("avg_aspect") == 1.0)
    assert(m("landscape").getAs[Long]("total_bytes") == 8L)
    assert(m("landscape").getAs[Int]("min_w") == 104)
    assert(m("landscape").getAs[Int]("min_h") == 72)
    // 104/72 = 1.4444...
    assert(m("landscape").getAs[Double]("avg_aspect") == 1.4444)
  }
}
