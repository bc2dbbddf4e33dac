package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.expressions.Window
/** LLM-training-data text operators over `documents` (BASELINE.json north
  * star): exact + near-duplicate detection, text analysis, fingerprinting.
  *
  * Hash parity strategy: every hash in these pipelines is md5 (identical
  * hex output in Spark and DuckDB), and min-hash minima are taken over the
  * md5 *strings* (lexicographic order is total and engine-independent).
  * This keeps the whole MinHash/SimHash pipeline oracle-checkable
  * hash-for-hash — no implementation-specific hash function anywhere.
  *
  * Scale posture: everything is explode → hash → groupBy/join — embarrass-
  * ingly parallel, shuffles keyed on doc_id or (seed, hash) buckets. The
  * LSH candidate join is the 100 TB path: candidates come from equi-joins
  * on band buckets, never from all-pairs comparison; the exact-Jaccard
  * verification only touches candidate pairs.
  */
object TextQueries {

  /** Word 3-shingles of `text`, distinct, as a (doc_id, shingle) relation.
    * Shared by the minhash pipeline and its oracle twin (SQL form below).
    * Docs with <3 tokens yield an EMPTY set: Spark's sequence(1, 0)
    * descends to [1, 0] (step defaults to -1 when start > stop), so the
    * degenerate case must be guarded explicitly to match DuckDB's empty
    * range(1, 1) — and to avoid toks[-1] under ANSI mode. */
  private[queries] def shingles(s: SparkSession, d: String): DataFrame =
    Derived.memo(s, d, "documents", "shingles")(
      shinglesOf(Tables.documents(s, d)))

  /** Derive-once memo of the PPJoin global-order relation (doc_id,
    * shs, n): each doc's shingle list sorted by ascending document
    * frequency (rarest first), tie on the shingle. Shared by
    * dedup_prefix_jaccard and dedup_containment, which previously
    * rebuilt dfreq + the per-doc sort per run (round-12 verdict #4).
    * The candidate-pair relations are memoized separately (per
    * threshold) — the warm path then pays only the candidate-bounded
    * exact verify, one array_intersect per pair over this doc-level
    * relation (docs ≪ shingle rows; AQE broadcasts it at bench scale
    * and degrades to a doc-keyed shuffle join at corpus scale). */
  private[queries] def orderedShingles(s: SparkSession, d: String): DataFrame =
    Derived.memo(s, d, "documents", "ppjoin-ordered") {
      val toks = shingles(s, d)
      val dfreq = toks.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      toks.join(dfreq, Seq("sh"))
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("st"))
        .select(col("doc_id"),
          expr("transform(st, x -> x.sh)").as("shs"),
          size(col("st")).as("n"))
    }

  /** Derive-once memo of the 8-seed signature relation over the corpus
    * table — the [[minhashSigsArrayOf]] map stage materialized via
    * [[Derived]] so the ~10 MinHash-derived batch queries scan one small
    * artifact instead of re-hashing every shingle per query. */
  private[graft] def minhashSigs(s: SparkSession, d: String): DataFrame =
    Derived.memo(s, d, "documents", "mhsigs")(
      minhashSigsArrayOf(Tables.documents(s, d)))

  /** Shingle ARRAY construction (pre-explode), the single source of
    * truth for both the batch relation below and the streaming signature
    * pipeline (which needs the array form — per-row minima, no
    * aggregation). A definition change here reaches every MinHash
    * consumer and its oracle twin at once. */
  private[queries] val shingleArraySql =
    """array_distinct(transform(
      |  if(size(toks) >= 3, sequence(1, size(toks) - 2), array()),
      |  i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1])))""".stripMargin

  /** Same shingle relation over an arbitrary (doc_id, text, ...) frame —
    * streaming-safe (pure projection + generator, no aggregation), so the
    * continuous-dedup query can reuse it on a document stream. */
  private[queries] def shinglesOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), explode(expr(shingleArraySql)).as("sh"))

  /** One-pass 8-seed MinHash signature relation (doc_id, seed, mh) over
    * an already-built shingle frame: all 8 permutation minima are 8
    * aggregate expressions in a SINGLE groupBy(doc_id) over the shingle
    * relation, stacked back to rows with posexplode. Identical rows to
    * the crossJoin(seeds) + groupBy(doc, seed) formulation (same minima,
    * same types) at 1/8th of the rows through the hash aggregate — the
    * signature build is the dominant stage of every MinHash-derived
    * operator, so the 8× row cut is the family's scale lever. */
  private[queries] def minhashSigsOf(sv: DataFrame): DataFrame = {
    val mins = (0 until 8).map(k =>
      min(expr(mhMixSql("v", k.toString))).as(s"m$k"))
    sv.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        posexplode(array((0 until 8).map(k => col(s"m$k")): _*)))
      .select(col("doc_id"), col("pos").cast("int").as("seed"),
        col("col").as("mh"))
  }

  /** Zero-shuffle signature relation (doc_id, seed, mh) computed per-row
    * over the shingle ARRAY: one md5 pass per shingle, then the 8 affine
    * minima via array_min(transform(...)) — no explode of the shingle
    * relation, no hash aggregate, no exchange. Row-identical to
    * minhashSigsOf over the exploded relation (same minima, same types;
    * shingle-less docs drop out there via the empty group, here via the
    * mh IS NULL filter). Batch signature query and the streaming LSH
    * source share this one definition; at 100 TB this is the shape that
    * matters — the signature build becomes a pure map stage that fuses
    * with the scan, with nothing shuffled until the band join. */
  private[graft] def minhashSigsArrayOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), expr(shingleArraySql).as("shs"))
      // The digest expression is the family's shared constant; its
      // lambda variable is already named `sh`.
      .select(col("doc_id"), expr(
        s"transform(shs, sh -> $shingleIntSpark)").as("vs"))
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, 7), seed -> struct(
           |  CAST(seed AS INT) AS seed,
           |  array_min(transform(vs, v -> ${mhMixSql("v", "seed")})) AS mh))""".stripMargin)).as("e"))
      .select(col("doc_id"), col("e.seed").as("seed"), col("e.mh").as("mh"))
      .filter(col("mh").isNotNull) // shingle-less short docs sign nothing

  // DuckDB twin of the shingle relation (toks is 1-indexed there; range(a,b)
  // is exclusive of b, giving positions 1..len-2).
  private[queries] val shinglesSql =
    """SELECT doc_id, unnest(list_distinct(sh)) AS sh FROM (
      |  SELECT doc_id, list_transform(range(1, greatest(len(toks) - 1, 1)),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS sh
      |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents))""".stripMargin

  /** MinHash permutation family (Broder, "On the resemblance and
    * containment of documents", 1997; min-wise independent permutations)
    * shared by the signature/LSH/CC queries:
    * ONE md5 per shingle → 48-bit integer digest v (first 12 hex chars),
    * then each of the 8 "permutations" is the affine map
    * (a_s·v + b_s) mod P over the prime field Z_P, P = 2^48 − 59 —
    * a genuine universal-hash permutation family, at 1 hash + 8
    * multiplies per shingle instead of 8 seed-prefixed md5s (the md5 was
    * ~the whole cost of every MinHash-derived operator). Multipliers stay
    * < 2^15, so a·v + b < 2^63: no int64 overflow in either engine
    * (Spark ANSI would throw; DuckDB would silently widen to HUGEINT and
    * diverge), while products far exceed P so the mod genuinely permutes
    * the ordering. Both engines evaluate the IDENTICAL expression text —
    * the digest extraction is the only dialect split (conv vs ::BIGINT
    * hex cast, twin-checked). */
  private[queries] val mhPrime = "281474976710597" // 2^48 - 59, prime
  private[queries] def mhMixSql(v: String, seed: String): String =
    s"((10007 + 2 * $seed * 1301) * $v + $seed * 7919) % $mhPrime"
  private[queries] val shingleIntSpark =
    "CAST(conv(substr(md5(sh), 1, 12), 16, 10) AS BIGINT)"
  private[queries] val shingleIntDuck =
    "('0x' || substr(md5(sh), 1, 12))::BIGINT"

  /** 16-bit SimHash relation (Charikar, "Similarity estimation
    * techniques from rounding algorithms", STOC 2002) — per-token md5 bits,
    * frequency-weighted majority vote per bit; pure integer arithmetic on
    * md5 hex, engine-independent. Shared by dedup_simhash and the
    * hamming-ball pair search. */
  private[queries] val simhashSql =
    """SELECT doc_id,
      |  CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, bit) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
      |FROM (SELECT doc_id, b.bit AS bit,
      |    sum(CASE WHEN (v // CAST(pow(2, b.bit) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END) AS s
      |  FROM (SELECT doc_id,
      |      (strpos('0123456789abcdef', substring(md5(tok), 1, 1)) - 1) * 4096 +
      |      (strpos('0123456789abcdef', substring(md5(tok), 2, 1)) - 1) * 256 +
      |      (strpos('0123456789abcdef', substring(md5(tok), 3, 1)) - 1) * 16 +
      |      (strpos('0123456789abcdef', substring(md5(tok), 4, 1)) - 1) AS v
      |    FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)),
      |    range(0, 16) b(bit)
      |  GROUP BY doc_id, b.bit)
      |GROUP BY doc_id""".stripMargin

  private[queries] def simhashDf(s: SparkSession, d: String): DataFrame =
    Derived.memo(s, d, "documents", "simhash")(simhashBuild(s, d))

  private def simhashBuild(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val hv = tok.withColumn("v", expr(
      """(instr('0123456789abcdef', substring(md5(tok), 1, 1)) - 1) * 4096 +
        |(instr('0123456789abcdef', substring(md5(tok), 2, 1)) - 1) * 256 +
        |(instr('0123456789abcdef', substring(md5(tok), 3, 1)) - 1) * 16 +
        |(instr('0123456789abcdef', substring(md5(tok), 4, 1)) - 1)""".stripMargin))
    // All 16 per-bit majority votes are 16 aggregate expressions in ONE
    // groupBy(doc_id) over the token relation — same rows as the
    // crossJoin(bits) + double groupBy formulation at 1/16th of the rows
    // through the hash aggregate and one shuffle instead of two (the
    // same one-pass shape minhashSigsOf uses for the 8 permutations).
    val votes = (0 until 16).map(i =>
      sum(when(expr(s"(v div ${1L << i}) % 2 = 1"), 1).otherwise(-1)).as(s"s$i"))
    hv.groupBy(col("doc_id"))
      .agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until 16).map(i => when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).cast("bigint").as("simhash"))
  }

  def all: Seq[Q] = Seq(

    // ------------------------------------------------------- text analysis
    Q("text_tokens",
      """SELECT doc_id,
        |  CAST(len(toks) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(toks)) AS INT) AS n_unique,
        |  round(CAST(length(text) - len(toks) + 1 AS DOUBLE) / len(toks), 4) AS avg_tok_len
        |FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents) t
        |ORDER BY doc_id""") { (s, d) =>
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          size(array_distinct(col("toks"))).as("n_unique"),
          round((length(col("text")) - size(col("toks")) + 1).cast("double") /
            size(col("toks")), 4).as("avg_tok_len"))
        .orderBy(col("doc_id"))
    },

    // Quality scoring: length/stopword-ratio heuristics (the shape of a
    // training-data quality filter).
    Q("text_quality",
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(length(text) AS INT) AS n_chars,
        |  CAST(len(toks) AS INT) AS n_tokens,
        |  CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS INT) AS n_stop,
        |  round(CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
        |        / len(toks), 4) AS stop_ratio,
        |  round(least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) *
        |        (1.0 - CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
        |               / len(toks)), 4) AS quality
        |FROM t
        |ORDER BY doc_id""") { (s, d) =>
      val stop = "x IN ('the', 'a', 'of', 'and', 'to')"
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_stop", expr(s"size(filter(toks, x -> $stop))"))
        .select(col("doc_id"),
          length(col("text")).as("n_chars"),
          size(col("toks")).as("n_tokens"),
          col("n_stop"),
          round(col("n_stop").cast("double") / size(col("toks")), 4).as("stop_ratio"),
          round(least(size(col("toks")).cast("double") / 100.0, lit(1.0)) *
            (lit(1.0) - col("n_stop").cast("double") / size(col("toks"))), 4)
            .as("quality"))
        .orderBy(col("doc_id"))
    },

    // Composite quality GATE (the Gopher/C4-style rule stack): every
    // rule is a per-row predicate over signals the scan already
    // computes — language, token-count bounds, stopword floor,
    // max-single-token repetition ceiling — and the verdict carries
    // WHICH rules failed (the reasons string downstream audits group
    // by). Pure per-row higher-order functions: zero shuffle before
    // the output sort; at 100 TB this fuses into the scan and the
    // filter rate is a free by-product of the pass. The repetition
    // signal's per-row distinct scan is O(tokens²) on ≤100-token docs —
    // bounded by the doc, not the corpus.
    Q("pipeline_quality_gate",
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, lang, len(toks) AS n_tokens,
        |  CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)
        |    / len(toks) AS stop_ratio,
        |  CAST(list_max(list_transform(list_distinct(toks),
        |    x -> len(list_filter(toks, y -> y = x)))) AS DOUBLE)
        |    / len(toks) AS max_tok_frac
        |FROM t)
        |SELECT doc_id,
        |  CAST(n_tokens AS INT) AS n_tokens,
        |  round(stop_ratio, 4) AS stop_ratio,
        |  round(max_tok_frac, 4) AS max_tok_frac,
        |  (lang = 'en' AND n_tokens >= 20 AND stop_ratio >= 0.02
        |    AND max_tok_frac <= 0.15) AS keep,
        |  concat_ws(',',
        |    CASE WHEN lang <> 'en' THEN 'lang' END,
        |    CASE WHEN n_tokens < 20 THEN 'too_short' END,
        |    CASE WHEN stop_ratio < 0.02 THEN 'low_stopword' END,
        |    CASE WHEN max_tok_frac > 0.15 THEN 'repetitive' END) AS reasons
        |FROM s
        |ORDER BY doc_id""") { (s, d) =>
      val sig = Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tokens", size(col("toks")))
        .withColumn("stop_ratio",
          expr("CAST(size(filter(toks, x -> x IN ('the', 'a', 'of', 'and', 'to'))) AS DOUBLE)")
            / col("n_tokens"))
        .withColumn("max_tok_frac",
          expr("""CAST(array_max(transform(array_distinct(toks),
            |x -> size(filter(toks, y -> y = x)))) AS DOUBLE)""".stripMargin)
            / col("n_tokens"))
      sig.select(col("doc_id"), col("n_tokens"),
          round(col("stop_ratio"), 4).as("stop_ratio"),
          round(col("max_tok_frac"), 4).as("max_tok_frac"),
          (col("lang") === "en" && col("n_tokens") >= 20 &&
            col("stop_ratio") >= 0.02 && col("max_tok_frac") <= 0.15)
            .as("keep"),
          concat_ws(",",
            when(col("lang") =!= "en", "lang"),
            when(col("n_tokens") < 20, "too_short"),
            when(col("stop_ratio") < 0.02, "low_stopword"),
            when(col("max_tok_frac") > 0.15, "repetitive")).as("reasons"))
        .orderBy(col("doc_id"))
    },

    // Bigram collocations by pointwise mutual information (Church &
    // Hanks 1990) — the corpus-statistics pass behind stop-phrase
    // lists, tokenizer merges and boilerplate detection. ONE tokenize
    // feeds both count relations: bigrams via a positional transform
    // (no self-join), unigrams via explode. PMI = log2((c_ab/B) /
    // ((c_a/T)(c_b/T))) with STRUCTURALLY IDENTICAL double expressions
    // in both engines (each factor divides exact integer counts; the
    // single log2 call rounds to 4dp, absorbing libm ulp skew). The
    // bigram relation shuffles once on the pair key; unigram counts
    // join on w1/w2 (vocab-sized, AQE-broadcastable); the totals are a
    // broadcast 1-row scalar — no all-pairs anything at 100 TB.
    Q("text_pmi_bigrams",
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
        |bg AS (SELECT toks[i] AS w1, toks[i + 1] AS w2
        |  FROM t, unnest(range(1, len(toks))) u(i)),
        |bc AS (SELECT w1, w2, count(*) AS cab FROM bg GROUP BY 1, 2),
        |uc AS (SELECT w, count(*) AS c
        |  FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1),
        |tot AS (SELECT (SELECT sum(c) FROM uc) AS t1,
        |               (SELECT sum(cab) FROM bc) AS t2)
        |SELECT w1, w2, CAST(cab AS BIGINT) AS cab,
        |  round(log2((CAST(cab AS DOUBLE) / t2) /
        |    ((CAST(ca.c AS DOUBLE) / t1) * (CAST(cb.c AS DOUBLE) / t1))),
        |    4) + 0.0 AS pmi
        |FROM bc JOIN uc ca ON ca.w = w1 JOIN uc cb ON cb.w = w2, tot
        |WHERE cab >= 5
        |ORDER BY w1, w2""") { (s, d) =>
      val t = Tables.documents(s, d)
        .select(split(col("text"), " ").as("toks"))
      // size>=2 guard (same as text_bigram_ppl): a 1-token doc would make
      // sequence(1, 0) yield DESCENDING [1, 0] and element_at(toks, 0)
      // throw — DuckDB's range(1, len) is empty for the same doc.
      val bg = t.select(explode(expr(
          """if(size(toks) >= 2,
            |  transform(sequence(1, size(toks) - 1),
            |    i -> named_struct('w1', element_at(toks, i),
            |                      'w2', element_at(toks, i + 1))),
            |  array())"""
            .stripMargin)).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      val bc = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cab"))
      val uc = t.select(explode(col("toks")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
      val tot = uc.agg(sum(col("c")).as("t1"))
        .crossJoin(bc.agg(sum(col("cab")).as("t2")))
      bc.filter(col("cab") >= 5)
        .join(uc.select(col("w").as("w1"), col("c").as("ca")), Seq("w1"))
        .join(uc.select(col("w").as("w2"), col("c").as("cb")), Seq("w2"))
        .crossJoin(broadcast(tot))
        .select(col("w1"), col("w2"), col("cab"),
          (round(log2((col("cab").cast("double") / col("t2")) /
            ((col("ca").cast("double") / col("t1")) *
              (col("cb").cast("double") / col("t1")))), 4) + 0.0).as("pmi"))
        .orderBy(col("w1"), col("w2"))
    },

    // Language-ID: n-gram/marker-token heuristic. Deterministic scoring —
    // marker hit counts per language, argmax with fixed tie order.
    Q("text_langid",
      """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, lang,
        |  len(list_filter(toks, x -> x IN ('the', 'a', 'key', 'row'))) AS s_en,
        |  len(list_filter(toks, x -> x IN ('der', 'und', 'wert', 'tabelle'))) AS s_de,
        |  len(list_filter(toks, x -> x IN ('le', 'et', 'valeur'))) AS s_fr
        |FROM t)
        |SELECT doc_id, lang,
        |  CASE WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
        |       WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS pred_lang,
        |  CAST(s_en AS INT) AS s_en, CAST(s_de AS INT) AS s_de, CAST(s_fr AS INT) AS s_fr
        |FROM s
        |ORDER BY doc_id""") { (s, d) =>
      val t = Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("s_en", expr("size(filter(toks, x -> x IN ('the', 'a', 'key', 'row')))"))
        .withColumn("s_de", expr("size(filter(toks, x -> x IN ('der', 'und', 'wert', 'tabelle')))"))
        .withColumn("s_fr", expr("size(filter(toks, x -> x IN ('le', 'et', 'valeur')))"))
      t.select(col("doc_id"), col("lang"),
        when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr"), "en")
          .when(col("s_de") >= col("s_fr"), "de")
          .otherwise("fr").as("pred_lang"),
        col("s_en"), col("s_de"), col("s_fr"))
        .orderBy(col("doc_id"))
    },

    // BPE-ish regex tokenization (subword-style pre-tokenizer classes:
    // space-prefixed word / number / symbol runs) — the token-counting
    // shape an LLM-data pipeline budgets with.
    Q("text_bpe_tokens",
      """WITH t AS (SELECT doc_id, text,
        |    regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(toks) AS INT) AS n_bpe_tokens,
        |  CAST(len(list_distinct(toks)) AS INT) AS n_unique,
        |  round(CAST(length(text) AS DOUBLE) / len(toks), 4) AS chars_per_token
        |FROM t
        |ORDER BY doc_id""") { (s, d) =>
      Tables.documents(s, d)
        .withColumn("toks",
          expr("regexp_extract_all(text, ' ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+', 0)"))
        .select(col("doc_id"),
          size(col("toks")).as("n_bpe_tokens"),
          size(array_distinct(col("toks"))).as("n_unique"),
          round(length(col("text")).cast("double") / size(col("toks")), 4)
            .as("chars_per_token"))
        .orderBy(col("doc_id"))
    },

    // Document fingerprinting: content hashes of the normalized text.
    Q("text_fingerprint",
      """SELECT doc_id,
        |  md5(lower(trim(text))) AS fp_md5,
        |  sha256(lower(trim(text))) AS fp_sha
        |FROM documents
        |ORDER BY doc_id""") { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          md5(lower(trim(col("text")))).as("fp_md5"),
          sha2(lower(trim(col("text"))).cast("binary"), 256).as("fp_sha"))
        .orderBy(col("doc_id"))
    },

    // Word-bigram profile per document.
    Q("text_ngrams",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  CAST(greatest(len(toks) - 1, 0) AS INT) AS n_bigrams,
        |  CAST(len(list_distinct(list_transform(range(1, greatest(len(toks), 1)),
        |    i -> toks[i] || ' ' || toks[i+1]))) AS INT) AS n_unique_bigrams
        |FROM t
        |ORDER BY doc_id""") { (s, d) =>
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          greatest(size(col("toks")) - 1, lit(0)).as("n_bigrams"),
          expr("""CAST(size(array_distinct(transform(
            |  if(size(toks) >= 2, sequence(1, size(toks) - 1), array()),
            |  i -> concat_ws(' ', toks[i-1], toks[i])))) AS INT)""".stripMargin)
            .as("n_unique_bigrams"))
        .orderBy(col("doc_id"))
    },

    // Sequence packing / document chunking: fixed 32-token windows with
    // 8-token overlap (stride 24) — the chunking step that feeds a
    // training tokenizer. Pure generator shape (sequence of starts +
    // explode + slice): rows out = O(n_tokens/stride) per doc, no
    // shuffle until the final sort, everything inside codegen.
    Q("text_chunk",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |c AS (SELECT doc_id,
        |    unnest(range(0, len(toks), 24)) AS start,
        |    toks
        |  FROM t)
        |SELECT doc_id,
        |  CAST(start // 24 AS INT) AS chunk_idx,
        |  CAST(len(list_slice(toks, start + 1, start + 32)) AS INT) AS n_chunk_tokens,
        |  md5(array_to_string(list_slice(toks, start + 1, start + 32), ' ')) AS chunk_hash
        |FROM c
        |ORDER BY doc_id, chunk_idx""") { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), col("toks"),
          explode(expr("sequence(0, size(toks) - 1, 24)")).as("start"))
        .select(col("doc_id"),
          expr("CAST(start div 24 AS INT)").as("chunk_idx"),
          expr("size(slice(toks, start + 1, 32))").as("n_chunk_tokens"),
          md5(expr("concat_ws(' ', slice(toks, start + 1, 32))")).as("chunk_hash"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },

    // ------------------------------------------------------------- dedup
    // Exact dedup: hash of normalized text → keeper per hash group. The
    // 100 TB form: one shuffle on the 32-byte hash, min-combiner map-side.
    Q("dedup_exact",
      """SELECT md5(lower(trim(text))) AS h,
        |  CAST(min(doc_id) AS BIGINT) AS keeper,
        |  CAST(count(*) AS BIGINT) AS n_copies
        |FROM documents
        |GROUP BY 1
        |ORDER BY keeper""") { (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(lower(trim(col("text")))).as("h"))
        .agg(min(col("doc_id")).as("keeper"),
          count(lit(1)).as("n_copies"))
        .orderBy(col("keeper"))
    },

    // MinHash signatures: 8 permutations from the shared affine family
    // (mhMixSql scaladoc); the signature component for (doc, seed) is
    // the minimum permuted digest.
    Q("dedup_minhash_sig",
      s"""WITH sh AS ($shinglesSql),
         |sv AS (SELECT doc_id, $shingleIntDuck AS v FROM sh),
         |h AS (SELECT doc_id, CAST(r.seed AS INT) AS seed,
         |        min(${mhMixSql("v", "r.seed")}) AS mh
         |      FROM sv, range(0, 8) r(seed)
         |      GROUP BY doc_id, r.seed)
         |SELECT doc_id, seed, mh FROM h
         |ORDER BY doc_id, seed""") { (s, d) =>
      minhashSigs(s, d)
        .orderBy(col("doc_id"), col("seed"))
    },

    // Word-distribution Shannon entropy per document — the
    // repetitiveness/diversity quality signal (low entropy = template or
    // spam, high = natural prose). Per-term contributions quantize to
    // DECIMAL before the sum (order-free — a double sum would vary with
    // partition order), and the final bits go through the floor
    // discipline; ln itself is IEEE-identical across both engines (the
    // TF-IDF oracle already rides it).
    Q("text_entropy",
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |c AS (SELECT doc_id, term, count(*) AS cnt FROM t GROUP BY 1, 2),
        |n AS (SELECT doc_id, sum(cnt) AS total FROM c GROUP BY 1)
        |SELECT c.doc_id,
        |  CAST(n.total AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS n_distinct,
        |  CAST(floor(CAST(-sum(CAST(
        |      (cnt / CAST(total AS DOUBLE)) * ln(cnt / CAST(total AS DOUBLE))
        |    AS DECIMAL(28,12))) AS DOUBLE) * 10000 + 0.5) / 10000.0
        |    AS DOUBLE) AS entropy
        |FROM c JOIN n ON n.doc_id = c.doc_id
        |GROUP BY c.doc_id, n.total
        |ORDER BY c.doc_id""") { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val c = t.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("cnt"))
      val n = c.groupBy(col("doc_id")).agg(sum(col("cnt")).as("total"))
      c.join(n, Seq("doc_id"))
        .groupBy(col("doc_id"), col("total"))
        .agg(count(lit(1)).as("n_distinct"),
          expr("""CAST(floor(CAST(-sum(CAST(
            |    (cnt / CAST(total AS DOUBLE)) * ln(cnt / CAST(total AS DOUBLE))
            |  AS DECIMAL(28,12))) AS DOUBLE) * 10000 + 0.5) / 10000.0
            |  AS DOUBLE)""".stripMargin).as("entropy"))
        .select(col("doc_id"), col("total").as("n_tokens"),
          col("n_distinct"), col("entropy"))
        .orderBy(col("doc_id"))
    },

    // Canonical text normalization — the pass every dedup/quality stage
    // assumes upstream: lowercase, non-alphanumerics to spaces, space
    // runs squeezed, trimmed. Emitted as (hash, length) so the oracle
    // compares the NORMALIZED CONTENT, not a rendering of it. Dialect
    // note: DuckDB regexp_replace replaces the first match unless the
    // 'g' flag is passed; Spark's always replaces globally — the twin
    // texts differ, the relation doesn't.
    Q("text_normalize",
      """SELECT doc_id,
        |  CAST(length(norm) AS INT) AS n_chars_norm,
        |  md5(norm) AS norm_hash
        |FROM (SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), '  +', ' ', 'g')) AS norm
        |  FROM documents)
        |ORDER BY doc_id""") { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          trim(regexp_replace(regexp_replace(lower(col("text")),
            "[^a-z0-9 ]", " "), "  +", " ")).as("norm"))
        .select(col("doc_id"),
          length(col("norm")).cast("int").as("n_chars_norm"),
          md5(col("norm")).as("norm_hash"))
        .orderBy(col("doc_id"))
    },

    // BANDED MinHash LSH (b=4 bands × r=2 rows) — the precision/recall
    // dial single-row banding lacks: a pair is a candidate only when BOTH
    // rows of some band agree, so the per-band collision probability
    // drops from s to s^r (Broder '97 / the standard LSH S-curve) and
    // boilerplate-heavy corpora generate far fewer junk candidates. The
    // band key is the (m0, m1) VALUE PAIR — still a plain equi-join on
    // (band, m0, m1), never all-pairs; at 100 TB the same shuffle shape
    // as the single-row form with an 8x smaller candidate set.
    Q("dedup_minhash_banded",
      s"""WITH sh AS ($shinglesSql),
         |sv AS (SELECT doc_id, $shingleIntDuck AS v FROM sh),
         |h AS (SELECT doc_id, CAST(r.seed AS INT) AS seed,
         |        min(${mhMixSql("v", "r.seed")}) AS mh
         |      FROM sv, range(0, 8) r(seed)
         |      GROUP BY doc_id, r.seed),
         |bnd AS (SELECT doc_id, CAST(seed // 2 AS INT) AS band,
         |          min(CASE WHEN seed % 2 = 0 THEN mh END) AS m0,
         |          min(CASE WHEN seed % 2 = 1 THEN mh END) AS m1
         |        FROM h GROUP BY doc_id, seed // 2)
         |SELECT a.doc_id AS d1, b.doc_id AS d2,
         |  CAST(count(*) AS INT) AS n_bands
         |FROM bnd a JOIN bnd b ON a.band = b.band
         |  AND a.m0 = b.m0 AND a.m1 = b.m1 AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id
         |ORDER BY d1, d2""") { (s, d) =>
      val bnd = minhashSigs(s, d)
        .groupBy(col("doc_id"), expr("CAST(seed div 2 AS INT)").as("band"))
        .agg(min(when(col("seed") % 2 === 0, col("mh"))).as("m0"),
          min(when(col("seed") % 2 === 1, col("mh"))).as("m1"))
      bnd.as("a").join(bnd.as("b"),
          col("a.band") === col("b.band") && col("a.m0") === col("b.m0") &&
            col("a.m1") === col("b.m1") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).cast("int").as("n_bands"))
        .orderBy(col("d1"), col("d2"))
    },

    // INCREMENTAL DEDUP AGAINST A FROZEN INDEX — the ingest-time shape
    // of the MinHash family: a new shard (20% of docs by id residue)
    // is checked against the already-ingested corpus (the other 80%)
    // WITHOUT ever comparing old-vs-old or new-vs-new. This is the
    // operator a continuously-growing corpus runs on every arriving
    // shard: the frozen side's band index is built once (here it rides
    // the shared signature memo; in production it is the persisted
    // LSH index), and the join cost is |new| × bucket density, not
    // corpus². A new doc is flagged dup when it collides with an old
    // doc on ≥ 2 of the 4 bands (the same geometry the S-curve eval
    // tuned); the best match is the most-colliding old doc.
    Q("pipe_dedup_against_index",
      s"""WITH sh AS ($shinglesSql),
         |sv AS (SELECT doc_id, $shingleIntDuck AS v FROM sh),
         |h AS (SELECT doc_id, CAST(r.seed AS INT) AS seed,
         |        min(${mhMixSql("v", "r.seed")}) AS mh
         |      FROM sv, range(0, 8) r(seed)
         |      GROUP BY doc_id, r.seed),
         |bnd AS (SELECT doc_id, CAST(seed // 2 AS INT) AS band,
         |          min(CASE WHEN seed % 2 = 0 THEN mh END) AS m0,
         |          min(CASE WHEN seed % 2 = 1 THEN mh END) AS m1
         |        FROM h GROUP BY doc_id, seed // 2),
         |oldx AS (SELECT * FROM bnd WHERE doc_id % 10 < 8),
         |newx AS (SELECT * FROM bnd WHERE doc_id % 10 >= 8),
         |cand AS (SELECT n.doc_id AS new_id, o.doc_id AS old_id,
         |    CAST(count(*) AS INT) AS n_bands
         |  FROM newx n JOIN oldx o ON n.band = o.band
         |    AND n.m0 = o.m0 AND n.m1 = o.m1
         |  GROUP BY 1, 2),
         |best AS (SELECT new_id, old_id, n_bands,
         |    row_number() OVER (PARTITION BY new_id
         |      ORDER BY n_bands DESC, old_id) AS rk
         |  FROM cand)
         |SELECT new_id AS doc_id, old_id AS best_match, n_bands,
         |  CAST(n_bands >= 2 AS BOOLEAN) AS is_dup
         |FROM best WHERE rk = 1
         |ORDER BY doc_id""") { (s, d) =>
      val bnd = minhashSigs(s, d)
        .groupBy(col("doc_id"), expr("CAST(seed div 2 AS INT)").as("band"))
        .agg(min(when(col("seed") % 2 === 0, col("mh"))).as("m0"),
          min(when(col("seed") % 2 === 1, col("mh"))).as("m1"))
      val oldx = bnd.filter(col("doc_id") % 10 < 8)
      val newx = bnd.filter(col("doc_id") % 10 >= 8)
      val cand = newx.as("n").join(oldx.as("o"),
          col("n.band") === col("o.band") && col("n.m0") === col("o.m0") &&
            col("n.m1") === col("o.m1"))
        .groupBy(col("n.doc_id").as("new_id"), col("o.doc_id").as("old_id"))
        .agg(count(lit(1)).cast("int").as("n_bands"))
      val w = Window.partitionBy(col("new_id"))
        .orderBy(col("n_bands").desc, col("old_id"))
      cand.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("new_id").as("doc_id"), col("old_id").as("best_match"),
          col("n_bands"), (col("n_bands") >= 2).as("is_dup"))
        .orderBy(col("doc_id"))
    },

    // NEAR-DUP DETECTOR EVALUATION — the tuning loop for the MinHash
    // family closed into one operator: exact shingle-Jaccard ≥ 0.5
    // pairs are the ground truth (inverted-index intersection join —
    // only pairs sharing a shingle, never all-pairs), the 4-band×2-row
    // LSH candidates are the prediction, and the output is the
    // confusion (TP/FP/FN) with precision/recall. This is how the
    // band/row geometry gets chosen before a 100 TB dedup run: measure
    // the S-curve's operating point on a sample, then freeze the
    // banding. Both relations reuse the family's shared signature/
    // shingle SQL; the compare is one full-outer join on the pair key.
    //
    // SAMPLING CONTRACT: the exhaustive ground truth (the co-shingle
    // intersection join) is quadratic in co-shingle doc pairs, so the
    // eval universe is capped at TRUTH_DOC_BUDGET documents chosen by
    // deterministic md5 order — Spark plans the orderBy+limit as a
    // distributed TakeOrdered (per-partition top-N merge, no full
    // sort). Both the truth AND candidate sides run on the same capped
    // universe, so precision/recall stay a valid paired comparison on
    // the sample. The budget (100k docs) exceeds every test fixture —
    // fixture outputs are the uncapped answer — and bites exactly when
    // pointing this harness at a real corpus, which is the point: the
    // S-curve is measured on a bounded sample, never corpus-wide.
    Q("text_near_dup_eval",
      s"""WITH elig AS (SELECT doc_id FROM documents
         |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 100000),
         |sh0 AS ($shinglesSql),
         |sh AS (SELECT sh0.* FROM sh0 JOIN elig USING (doc_id)),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id d1, b.doc_id d2, count(*) ni
         |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |truth AS (SELECT d1, d2 FROM inter
         |  JOIN sizes s1 ON s1.doc_id = d1
         |  JOIN sizes s2 ON s2.doc_id = d2
         |  WHERE CAST(ni AS DOUBLE) / (s1.n + s2.n - ni) >= 0.5),
         |sv AS (SELECT doc_id, $shingleIntDuck AS v FROM sh),
         |h AS (SELECT doc_id, CAST(r.seed AS INT) AS seed,
         |        min(${mhMixSql("v", "r.seed")}) AS mh
         |      FROM sv, range(0, 8) r(seed)
         |      GROUP BY doc_id, r.seed),
         |bnd AS (SELECT doc_id, CAST(seed // 2 AS INT) AS band,
         |          min(CASE WHEN seed % 2 = 0 THEN mh END) AS m0,
         |          min(CASE WHEN seed % 2 = 1 THEN mh END) AS m1
         |        FROM h GROUP BY doc_id, seed // 2),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM bnd a JOIN bnd b ON a.band = b.band
         |    AND a.m0 = b.m0 AND a.m1 = b.m1 AND a.doc_id < b.doc_id),
         |cls AS (SELECT
         |    CASE WHEN t.d1 IS NOT NULL AND c.d1 IS NOT NULL THEN 'tp'
         |         WHEN c.d1 IS NOT NULL THEN 'fp' ELSE 'fn' END AS st
         |  FROM truth t FULL JOIN cand c ON t.d1 = c.d1 AND t.d2 = c.d2)
         |SELECT
         |  CAST(sum(CASE WHEN st IN ('tp','fn') THEN 1 ELSE 0 END) AS BIGINT) AS n_truth,
         |  CAST(sum(CASE WHEN st IN ('tp','fp') THEN 1 ELSE 0 END) AS BIGINT) AS n_cand,
         |  CAST(sum(CASE WHEN st = 'tp' THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         |  CAST(sum(CASE WHEN st = 'fp' THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         |  CAST(sum(CASE WHEN st = 'fn' THEN 1 ELSE 0 END) AS BIGINT) AS fn,
         |  round(sum(CASE WHEN st = 'tp' THEN 1 ELSE 0 END) /
         |    CAST(nullif(sum(CASE WHEN st IN ('tp','fp') THEN 1 ELSE 0 END), 0)
         |      AS DOUBLE), 4) AS precision,
         |  round(sum(CASE WHEN st = 'tp' THEN 1 ELSE 0 END) /
         |    CAST(nullif(sum(CASE WHEN st IN ('tp','fn') THEN 1 ELSE 0 END), 0)
         |      AS DOUBLE), 4) AS recall
         |FROM cls""") { (s, d) =>
      val docsAll = Tables.documents(s, d)
      // The md5-ordered doc budget (see contract note above): TakeOrdered
      // top-100k of the universe, then one semi-join restricts the scan.
      val elig = docsAll.select(col("doc_id"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        .limit(100000)
      val docs = docsAll.join(elig, Seq("doc_id"), "left_semi")
      val sh = shinglesOf(docs)
        .distinct() // shinglesSql twin is per-doc distinct
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = sh.as("a").join(sh.as("b"),
          col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("ni"))
      val truth = inter
        .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), Seq("d1"))
        .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), Seq("d2"))
        .filter(col("ni").cast("double") /
          (col("n1") + col("n2") - col("ni")) >= 0.5)
        .select(col("d1"), col("d2"))
      val bnd = minhashSigsArrayOf(docs) // same capped universe as truth
        .groupBy(col("doc_id"), expr("CAST(seed div 2 AS INT)").as("band"))
        .agg(min(when(col("seed") % 2 === 0, col("mh"))).as("m0"),
          min(when(col("seed") % 2 === 1, col("mh"))).as("m1"))
      val cand = bnd.as("a").join(bnd.as("b"),
          col("a.band") === col("b.band") && col("a.m0") === col("b.m0") &&
            col("a.m1") === col("b.m1") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
      val cls = truth.as("t").join(cand.as("c"),
          col("t.d1") === col("c.d1") && col("t.d2") === col("c.d2"),
          "full_outer")
        .select(when(col("t.d1").isNotNull && col("c.d1").isNotNull, "tp")
          .when(col("c.d1").isNotNull, "fp").otherwise("fn").as("st"))
      cls.agg(
        sum(when(col("st").isin("tp", "fn"), 1).otherwise(0)).as("n_truth"),
        sum(when(col("st").isin("tp", "fp"), 1).otherwise(0)).as("n_cand"),
        sum(when(col("st") === "tp", 1).otherwise(0)).as("tp"),
        sum(when(col("st") === "fp", 1).otherwise(0)).as("fp"),
        sum(when(col("st") === "fn", 1).otherwise(0)).as("fn"),
        round(sum(when(col("st") === "tp", 1).otherwise(0)) /
          nullif(sum(when(col("st").isin("tp", "fp"), 1).otherwise(0)), lit(0))
            .cast("double"), 4).as("precision"),
        round(sum(when(col("st") === "tp", 1).otherwise(0)) /
          nullif(sum(when(col("st").isin("tp", "fn"), 1).otherwise(0)), lit(0))
            .cast("double"), 4).as("recall"))
    },

    // LEAKAGE-SAFE TRAIN/VAL SPLIT — the splitting rule that keeps
    // near-duplicate documents on the SAME side: hashing doc_id (the
    // naive split) puts ~20% of each near-dup cluster in val, silently
    // leaking train content into evaluation; hashing the CLUSTER
    // representative (banded-LSH candidates → connected components)
    // cannot straddle by construction. The operator quantifies exactly
    // that: clusters straddling under each rule, plus the safe split's
    // realized train fraction. Cluster resolution reuses the family's
    // candidate join + star contraction; the oracle reaches identical
    // clusters by recursive closure.
    Q("split_leakage_safe",
      s"""WITH RECURSIVE sh AS ($shinglesSql),
         |sv AS (SELECT doc_id, $shingleIntDuck AS v FROM sh),
         |hh AS (SELECT doc_id, CAST(r.seed AS INT) AS seed,
         |        min(${mhMixSql("v", "r.seed")}) AS mh
         |      FROM sv, range(0, 8) r(seed)
         |      GROUP BY doc_id, r.seed),
         |bnd AS (SELECT doc_id, CAST(seed // 2 AS INT) AS band,
         |          min(CASE WHEN seed % 2 = 0 THEN mh END) AS m0,
         |          min(CASE WHEN seed % 2 = 1 THEN mh END) AS m1
         |        FROM hh GROUP BY doc_id, seed // 2),
         |ed AS (SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
         |  FROM bnd a JOIN bnd b ON a.band = b.band
         |    AND a.m0 = b.m0 AND a.m1 = b.m1 AND a.doc_id < b.doc_id),
         |sym AS (SELECT u, v FROM ed UNION SELECT v AS u, u AS v FROM ed),
         |reach(u, v) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u),
         |lab AS (SELECT u AS doc_id, min(v) AS rep FROM reach GROUP BY 1),
         |sp AS (SELECT doc_id, rep,
         |    CASE WHEN doc_id % 10 < 8 THEN 'train' ELSE 'val' END AS naive,
         |    CASE WHEN ('0x' || substr(md5(CAST(rep AS VARCHAR)), 1, 2))::BIGINT
         |      < 205 THEN 'train' ELSE 'val' END AS safe
         |  FROM lab),
         |cl AS (SELECT rep, count(*) AS n,
         |    count(DISTINCT naive) AS dn, count(DISTINCT safe) AS ds
         |  FROM sp GROUP BY 1)
         |SELECT CAST((SELECT count(*) FROM sp) AS BIGINT) AS n_docs,
         |  CAST((SELECT count(*) FROM cl) AS BIGINT) AS n_clusters,
         |  CAST((SELECT count(*) FROM cl WHERE n > 1) AS BIGINT)
         |    AS n_multi_clusters,
         |  CAST((SELECT count(*) FROM cl WHERE dn > 1) AS BIGINT)
         |    AS naive_straddling,
         |  CAST((SELECT count(*) FROM cl WHERE ds > 1) AS BIGINT)
         |    AS safe_straddling,
         |  (SELECT round(sum(CASE WHEN safe = 'train' THEN 1 ELSE 0 END)
         |    / CAST(count(*) AS DOUBLE), 4) FROM sp) AS safe_train_frac""") { (s0, d) =>
      val s = graft.Sessions.withShufflePartitions(s0, 8)
      val bnd = minhashSigs(s, d)
        .groupBy(col("doc_id"), expr("CAST(seed div 2 AS INT)").as("band"))
        .agg(min(when(col("seed") % 2 === 0, col("mh"))).as("m0"),
          min(when(col("seed") % 2 === 1, col("mh"))).as("m1"))
      val edges = bnd.as("a").join(bnd.as("b"),
          col("a.band") === col("b.band") && col("a.m0") === col("b.m0") &&
            col("a.m1") === col("b.m1") && col("a.doc_id") < col("b.doc_id"))
        .select(col("b.doc_id").as("u"), col("a.doc_id").as("v"))
        .distinct() // starLabels wants (u, v) with v < u
        .localCheckpoint(true)
      val labels = graft.queries.ClusterQueries.starLabels(edges)
      val sp = Tables.documents(s, d).select(col("doc_id"))
        .join(labels, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), coalesce(col("rep"), col("doc_id")).as("rep"))
        .select(col("doc_id"), col("rep"),
          when(col("doc_id") % 10 < 8, "train").otherwise("val").as("naive"),
          when(expr(
            "CAST(conv(substr(md5(CAST(rep AS STRING)), 1, 2), 16, 10) AS BIGINT)")
            < 205, "train").otherwise("val").as("safe"))
      val cl = sp.groupBy(col("rep"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("naive")).as("dn"),
          countDistinct(col("safe")).as("ds"))
      val docStats = sp.agg(count(lit(1)).as("n_docs"),
        round(sum(when(col("safe") === "train", 1).otherwise(0)) /
          count(lit(1)).cast("double"), 4).as("safe_train_frac"))
      val clStats = cl.agg(count(lit(1)).as("n_clusters"),
        sum(when(col("n") > 1, 1).otherwise(0)).as("n_multi_clusters"),
        sum(when(col("dn") > 1, 1).otherwise(0)).as("naive_straddling"),
        sum(when(col("ds") > 1, 1).otherwise(0)).as("safe_straddling"))
      docStats.crossJoin(broadcast(clStats))
        .select(col("n_docs"), col("n_clusters"), col("n_multi_clusters"),
          col("naive_straddling"), col("safe_straddling"),
          col("safe_train_frac"))
    },

    // MINHASH ESTIMATOR CALIBRATION: for every signature-agreeing pair,
    // the Jaccard ESTIMATE (fraction of the 8 permutation minima that
    // agree — the unbiased MinHash estimator, Broder 1997) against the
    // EXACT shingle Jaccard, with the absolute error. This is the
    // estimator-variance check that justifies a signature width before
    // scaling dedup to a full corpus (8 seeds ⇒ σ ≈ √(J(1−J)/8)).
    // Candidates come from the seed-agreement self-join (bucketed, never
    // all-pairs); the exact side intersects shingles for the CANDIDATE
    // pairs only — the shingle relation is joined through the agree
    // pair keys (the dedup_minhash_pairs shape), never the unbounded
    // co-shingle self-join, so the exact-verify cost is proportional to
    // the candidate set rather than to every pair sharing any shingle.
    Q("dedup_minhash_jaccard_est",
      s"""WITH sh AS ($shinglesSql),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |sv AS (SELECT doc_id, $shingleIntDuck AS v FROM sh),
         |h AS (SELECT doc_id, CAST(r.seed AS INT) AS seed,
         |        min(${mhMixSql("v", "r.seed")}) AS mh
         |      FROM sv, range(0, 8) r(seed)
         |      GROUP BY doc_id, r.seed),
         |agree AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS na
         |  FROM h a JOIN h b ON a.seed = b.seed AND a.mh = b.mh
         |    AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |inter AS (SELECT g.d1, g.d2, count(*) AS ni
         |  FROM agree g
         |  JOIN sh a ON a.doc_id = g.d1
         |  JOIN sh b ON b.doc_id = g.d2 AND b.sh = a.sh
         |  GROUP BY 1, 2)
         |SELECT g.d1, g.d2, round(g.na / 8.0, 4) AS est_jaccard,
         |  round(coalesce(i.ni, 0)
         |    / CAST(s1.n + s2.n - coalesce(i.ni, 0) AS DOUBLE), 4)
         |    AS exact_jaccard,
         |  round(abs(round(g.na / 8.0, 4) - round(coalesce(i.ni, 0)
         |    / CAST(s1.n + s2.n - coalesce(i.ni, 0) AS DOUBLE), 4)), 4)
         |    AS abs_err
         |FROM agree g
         |LEFT JOIN inter i ON i.d1 = g.d1 AND i.d2 = g.d2
         |JOIN sizes s1 ON s1.doc_id = g.d1
         |JOIN sizes s2 ON s2.doc_id = g.d2
         |ORDER BY g.d1, g.d2""") { (s, d) =>
      val sh = shinglesOf(Tables.documents(s, d)).distinct()
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val h = minhashSigs(s, d)
      val agree = h.as("a").join(h.as("b"),
          col("a.seed") === col("b.seed") && col("a.mh") === col("b.mh") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("na"))
      // Exact intersections for the candidate pairs ONLY: route the
      // shingle relation through the agree pair keys instead of the
      // unbounded sh⋈sh co-shingle self-join.
      val inter = agree.select(col("d1"), col("d2"))
        .join(sh.select(col("doc_id").as("d1"), col("sh")), Seq("d1"))
        .join(sh.select(col("doc_id").as("d2"), col("sh")), Seq("d2", "sh"))
        .groupBy(col("d1"), col("d2"))
        .agg(count(lit(1)).as("ni"))
      val est = round(col("na") / 8.0, 4)
      val exact = round(coalesce(col("ni"), lit(0)) /
        (col("n1") + col("n2") - coalesce(col("ni"), lit(0))).cast("double"), 4)
      agree
        .join(inter.withColumnRenamed("d1", "i1").withColumnRenamed("d2", "i2"),
          col("i1") === col("d1") && col("i2") === col("d2"), "left_outer")
        .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), Seq("d1"))
        .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), Seq("d2"))
        .select(col("d1"), col("d2"), est.as("est_jaccard"),
          exact.as("exact_jaccard"),
          round(abs(est - exact), 4).as("abs_err"))
        .orderBy(col("d1"), col("d2"))
    },

    // Blocked fuzzy record linkage, the scalable shape: distances are
    // computed on the DISTINCT-name relation (64 names here), blocked by
    // first token, and only then expanded back to pair counts via group
    // sizes — the edit-distance work is O(distinct² within block), not
    // O(rows²), which is the whole trick at 100 TB (entity resolution on
    // value vocabularies, not fact tables). Verification (levenshtein)
    // touches only blocked candidate pairs.
    Q("link_fuzzy_names",
      """WITH n AS (SELECT p_name, CAST(count(*) AS BIGINT) AS cnt
        |           FROM part GROUP BY 1)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
        |  CAST(a.cnt * b.cnt AS BIGINT) AS n_pairs
        |FROM n a JOIN n b
        |  ON split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)
        |  AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 4
        |ORDER BY name_a, name_b""") { (s, d) =>
      val n = Tables.part(s, d).groupBy(col("p_name"))
        .agg(count(lit(1)).as("cnt"))
      n.as("a").join(n.as("b"),
          expr("split_part(a.p_name, ' ', 1) = split_part(b.p_name, ' ', 1)") &&
            col("a.p_name") < col("b.p_name"))
        .filter(expr("levenshtein(a.p_name, b.p_name) <= 4"))
        .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"),
          expr("CAST(levenshtein(a.p_name, b.p_name) AS INT)").as("dist"),
          (col("a.cnt") * col("b.cnt")).as("n_pairs"))
        .orderBy(col("name_a"), col("name_b"))
    },

    // MinHash LSH near-dup candidates + exact-Jaccard verification.
    // Candidates: pairs agreeing on ≥1 of 8 single-row bands (equi-join on
    // (seed, digest) — never all-pairs). Verification: exact shingle
    // Jaccard computed relationally on the candidate pairs only.
    Q("dedup_minhash_pairs",
      s"""WITH sh AS ($shinglesSql),
         |sv AS (SELECT doc_id, $shingleIntDuck AS v FROM sh),
         |h AS (SELECT doc_id, r.seed AS seed,
         |        min(${mhMixSql("v", "r.seed")}) AS mh
         |      FROM sv, range(0, 8) r(seed)
         |      GROUP BY doc_id, r.seed),
         |cand AS (SELECT a.doc_id AS d1, b.doc_id AS d2,
         |           CAST(count(*) AS INT) AS n_bands
         |         FROM h a JOIN h b ON a.seed = b.seed AND a.mh = b.mh
         |           AND a.doc_id < b.doc_id
         |         GROUP BY a.doc_id, b.doc_id),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT c.d1, c.d2, count(*) AS ni
         |          FROM cand c
         |          JOIN sh a ON a.doc_id = c.d1
         |          JOIN sh b ON b.doc_id = c.d2 AND b.sh = a.sh
         |          GROUP BY c.d1, c.d2)
         |SELECT c.d1, c.d2, c.n_bands,
         |  round(c.n_bands / 8.0, 4) AS est_j,
         |  round(CAST(coalesce(i.ni, 0) AS DOUBLE) /
         |        (s1.n + s2.n - coalesce(i.ni, 0)), 4) AS exact_j
         |FROM cand c
         |JOIN sizes s1 ON s1.doc_id = c.d1
         |JOIN sizes s2 ON s2.doc_id = c.d2
         |LEFT JOIN inter i ON i.d1 = c.d1 AND i.d2 = c.d2
         |ORDER BY c.d1, c.d2""") { (s, d) =>
      val sh = shingles(s, d).cache()
      val h = minhashSigsOf(sh.select(col("doc_id"), expr(shingleIntSpark).as("v")))
        .cache() // self-joined for cand — uncached, both sides re-hash
      // cand is consumed twice (output + the candidate-restricted exact-
      // Jaccard join) — cache it so the signature pipeline runs once.
      val cand = h.as("a").join(h.as("b"),
          col("a.seed") === col("b.seed") && col("a.mh") === col("b.mh") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).cast("int").as("n_bands"))
        .cache()
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      // Exact Jaccard only for LSH candidates (never the all-pairs shingle
      // self-join — at scale the candidate cut is what keeps this linear).
      val inter = cand.select(col("d1"), col("d2"))
        .join(sh.select(col("doc_id").as("d1"), col("sh")), Seq("d1"))
        .join(sh.select(col("doc_id").as("d2"), col("sh")), Seq("d2", "sh"))
        .groupBy(col("d1"), col("d2"))
        .agg(count(lit(1)).as("ni"))
      cand
        .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), Seq("d1"))
        .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), Seq("d2"))
        .join(inter, Seq("d1", "d2"), "left_outer")
        .select(col("d1"), col("d2"), col("n_bands"),
          round(col("n_bands") / 8.0, 4).as("est_j"),
          round(coalesce(col("ni"), lit(0L)).cast("double") /
            (col("n1") + col("n2") - coalesce(col("ni"), lit(0L))), 4).as("exact_j"))
        .orderBy(col("d1"), col("d2"))
    },

    // SimHash: 16-bit signature from per-token md5 bits, majority vote per
    // bit. Pure integer arithmetic on md5 hex — engine-independent.
    Q("dedup_simhash",
      s"""SELECT doc_id, simhash FROM ($simhashSql)
         |ORDER BY doc_id""") { (s, d) =>
      simhashDf(s, d).orderBy(col("doc_id"))
    },

    // SimHash hamming-ball near-dup pairs: candidates from 2 byte-bands
    // (hi/lo 8 bits — pairs within hamming ≤ 1 of a band boundary
    // necessarily agree on ≥1 band; wider radii trade recall, the
    // standard banded-simhash dial), verified by exact popcount on the
    // XOR. Candidates come from two equi-joins — never all-pairs — and
    // signatures travel as one BIGINT per doc. The bands are
    // BUCKET-CAPPED (the mm_phash / wedge-cap discipline): an 8-bit
    // band value shared by > 256 docs is chance-level dense on a
    // 16-bit signature and emits C(d,2) candidates of pure collision
    // noise, so those buckets are excised before the self-join in both
    // dialects (never binds on the shipped fixtures — max bucket ~40
    // at sf0.1; at 30× uniform-stub scale it is what keeps the plan
    // sub-quadratic). The corpus-scale fix is a WIDER signature
    // (64-bit SimHash with 4 16-bit bands); the cap keeps the
    // 16-bit exemplar's plan safe meanwhile.
    Q("dedup_simhash_pairs",
      s"""WITH sh AS ($simhashSql),
         |hik AS (SELECT simhash // 256 AS k FROM sh GROUP BY 1
         |  HAVING count(*) <= 256),
         |lok AS (SELECT simhash % 256 AS k FROM sh GROUP BY 1
         |  HAVING count(*) <= 256),
         |cand AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2,
         |         a.simhash AS h1, b.simhash AS h2
         |  FROM sh a JOIN sh b
         |    ON a.simhash // 256 = b.simhash // 256 AND a.doc_id < b.doc_id
         |  JOIN hik ON hik.k = a.simhash // 256
         |  UNION
         |  SELECT a.doc_id, b.doc_id, a.simhash, b.simhash
         |  FROM sh a JOIN sh b
         |    ON a.simhash % 256 = b.simhash % 256 AND a.doc_id < b.doc_id
         |  JOIN lok ON lok.k = a.simhash % 256)
         |SELECT d1, d2, CAST(bit_count(xor(h1, h2)) AS INT) AS hamming
         |FROM cand
         |WHERE bit_count(xor(h1, h2)) <= 3
         |ORDER BY d1, d2""") { (s, d) =>
      val sh = simhashDf(s, d).cache()
      val hik = sh.groupBy(expr("simhash div 256").as("k"))
        .agg(count(lit(1)).as("bn")).filter(col("bn") <= 256)
        .select(col("k"))
      val lok = sh.groupBy((col("simhash") % 256).as("k"))
        .agg(count(lit(1)).as("bn")).filter(col("bn") <= 256)
        .select(col("k"))
      val a = sh.select(col("doc_id").as("d1"), col("simhash").as("h1"))
        .join(hik, expr("h1 div 256") === col("k"), "left_semi")
      val b = sh.select(col("doc_id").as("d2"), col("simhash").as("h2"))
      val aLo = sh.select(col("doc_id").as("d1"), col("simhash").as("h1"))
        .join(lok, (col("h1") % 256) === col("k"), "left_semi")
      // Verify INSIDE each band branch: the popcount filter runs on join
      // output rows before they ever reach the union's distinct, so the
      // dedup shuffle carries only verified pairs (~1% of candidates at
      // sf0.1), not the full candidate set.
      def verified(j: DataFrame): DataFrame = j
        .withColumn("hamming", expr("CAST(bit_count(h1 ^ h2) AS INT)"))
        .filter(col("hamming") <= 3)
        .select(col("d1"), col("d2"), col("hamming"))
      val hi = verified(a.join(b,
        expr("h1 div 256") === expr("h2 div 256") && col("d1") < col("d2")))
      val lo = verified(aLo.join(b,
        col("h1") % 256 === col("h2") % 256 && col("d1") < col("d2")))
      hi.unionByName(lo).distinct()
        .orderBy(col("d1"), col("d2"))
    },

    // WIDE (60-bit) SimHash near-dup pairs — the corpus-scale form the
    // 16-bit exemplar's scaladoc points at: with 60 signature bits and
    // 4 × 15-bit bands the band value space is 32,768, so buckets stay
    // sparse at ANY corpus size without leaning on the bucket cap
    // (P[two random docs within hamming 7 of 60] ≈ 3e-10 — chance
    // pairs vanish, and what survives the exact popcount verify is
    // genuine near-duplication). 60 bits (15 md5 hex chars), not 64,
    // keeps the integer signed-BIGINT-safe in both engines with no
    // unsigned-hex edge case. Same one-pass shape as the 16-bit
    // version: all 60 majority votes are aggregate expressions in ONE
    // groupBy over the token relation; candidates come from 4 banded
    // equi-joins (bucket-capped for belt-and-braces, though the cap is
    // not expected to bind at any scale); verify is one popcount.
    Q("dedup_simhash64_pairs",
      """WITH tv AS (SELECT doc_id,
        |    ('0x' || substring(md5(tok), 1, 15))::BIGINT AS v
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)),
        |bits AS (SELECT doc_id, b.bit AS bit,
        |    sum(CASE WHEN (v >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM tv, range(0, 60) b(bit) GROUP BY doc_id, b.bit),
        |sh AS (SELECT doc_id,
        |    CAST(sum(CASE WHEN s > 0
        |      THEN CAST(1 AS BIGINT) << bit ELSE 0 END) AS BIGINT)
        |      AS sh60
        |  FROM bits GROUP BY doc_id),
        |e0 AS (SELECT doc_id, r.k AS band,
        |    (sh60 >> (15 * r.k)) & 32767 AS bv
        |  FROM sh, range(0, 4) r(k)),
        |keepb AS (SELECT band, bv FROM e0 GROUP BY 1, 2
        |  HAVING count(*) <= 256),
        |e AS (SELECT e0.* FROM e0 JOIN keepb USING (band, bv)),
        |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        |  FROM e a JOIN e b ON a.band = b.band AND a.bv = b.bv
        |    AND a.doc_id < b.doc_id)
        |SELECT c.d1, c.d2,
        |  CAST(bit_count(xor(x.sh60, y.sh60)) AS INT) AS hamming
        |FROM cand c
        |JOIN sh x ON x.doc_id = c.d1
        |JOIN sh y ON y.doc_id = c.d2
        |WHERE bit_count(xor(x.sh60, y.sh60)) <= 7
        |ORDER BY c.d1, c.d2""") { (s, d) =>
      val sh = Derived.memo(s, d, "documents", "simhash60") {
        val tv = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .select(col("doc_id"),
            expr("CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)")
              .as("v"))
        val votes = (0 until 60).map(i =>
          sum(when(expr(s"(v >> $i) & 1 = 1"), 1).otherwise(-1)).as(s"s$i"))
        tv.groupBy(col("doc_id"))
          .agg(votes.head, votes.tail: _*)
          .select(col("doc_id"),
            (0 until 60).map(i =>
              when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
              .reduce(_ + _).cast("bigint").as("sh60"))
      }.cache()
      val e0 = sh.select(col("doc_id"), explode(expr(
          """transform(sequence(0, 3), k -> struct(
            |  CAST(k AS INT) AS band,
            |  shiftright(sh60, 15 * k) & 32767 AS bv))""".stripMargin))
          .as("x"))
        .select(col("doc_id"), col("x.band").as("band"), col("x.bv").as("bv"))
      val keepb = e0.groupBy(col("band"), col("bv"))
        .agg(count(lit(1)).as("bn")).filter(col("bn") <= 256)
        .select(col("band"), col("bv"))
      val e = e0.join(keepb, Seq("band", "bv"), "left_semi")
      val cand = e.as("a").join(e.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
      cand
        .join(sh.select(col("doc_id").as("d1"), col("sh60").as("h1")),
          Seq("d1"))
        .join(sh.select(col("doc_id").as("d2"), col("sh60").as("h2")),
          Seq("d2"))
        .withColumn("hamming", expr("CAST(bit_count(h1 ^ h2) AS INT)"))
        .filter(col("hamming") <= 7)
        .select(col("d1"), col("d2"), col("hamming"))
        .orderBy(col("d1"), col("d2"))
    },

    // MULTI-INDEX HAMMING top-k (Norouzi, Punjani & Fleet, "Fast
    // search in Hamming space with multi-index hashing", CVPR 2012):
    // per-document k-nearest neighbors in SimHash space. The pigeonhole
    // property of the 4 × 15-bit band index guarantees every neighbor
    // within Hamming radius 3 shares at least one exact band (radius <
    // band count), so top-k at small radii is EXACT over the banded
    // candidates; the radius-7 tail is best-effort (same candidates the
    // pair query uses). Rides the SAME Derived simhash60 memo and
    // band/bucket-cap discipline as dedup_simhash64_pairs — the ranking
    // window partitions per query doc over candidate rows only, so no
    // global sort, no all-pairs, at any corpus size.
    Q("sim_mih_topk",
      """WITH tv AS (SELECT doc_id,
        |    ('0x' || substring(md5(tok), 1, 15))::BIGINT AS v
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)),
        |bits AS (SELECT doc_id, b.bit AS bit,
        |    sum(CASE WHEN (v >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
        |  FROM tv, range(0, 60) b(bit) GROUP BY doc_id, b.bit),
        |sh AS (SELECT doc_id,
        |    CAST(sum(CASE WHEN s > 0
        |      THEN CAST(1 AS BIGINT) << bit ELSE 0 END) AS BIGINT)
        |      AS sh60
        |  FROM bits GROUP BY doc_id),
        |e0 AS (SELECT doc_id, r.k AS band,
        |    (sh60 >> (15 * r.k)) & 32767 AS bv
        |  FROM sh, range(0, 4) r(k)),
        |keepb AS (SELECT band, bv FROM e0 GROUP BY 1, 2
        |  HAVING count(*) <= 256),
        |e AS (SELECT e0.* FROM e0 JOIN keepb USING (band, bv)),
        |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        |  FROM e a JOIN e b ON a.band = b.band AND a.bv = b.bv
        |    AND a.doc_id <> b.doc_id),
        |h AS (SELECT c.d1, c.d2,
        |    CAST(bit_count(xor(x.sh60, y.sh60)) AS INT) AS hamming
        |  FROM cand c
        |  JOIN sh x ON x.doc_id = c.d1
        |  JOIN sh y ON y.doc_id = c.d2
        |  WHERE bit_count(xor(x.sh60, y.sh60)) <= 7),
        |r AS (SELECT d1, d2, hamming,
        |    row_number() OVER (PARTITION BY d1
        |      ORDER BY hamming, d2) AS rk
        |  FROM h)
        |SELECT d1 AS doc_id, CAST(rk AS INT) AS rk, d2 AS nbr, hamming
        |FROM r WHERE rk <= 3
        |ORDER BY doc_id, rk""") { (s, d) =>
      val sh = Derived.memo(s, d, "documents", "simhash60") {
        val tv = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .select(col("doc_id"),
            expr("CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)")
              .as("v"))
        val votes = (0 until 60).map(i =>
          sum(when(expr(s"(v >> $i) & 1 = 1"), 1).otherwise(-1)).as(s"s$i"))
        tv.groupBy(col("doc_id"))
          .agg(votes.head, votes.tail: _*)
          .select(col("doc_id"),
            (0 until 60).map(i =>
              when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L)))
              .reduce(_ + _).cast("bigint").as("sh60"))
      }.cache()
      val e0 = sh.select(col("doc_id"), explode(expr(
          """transform(sequence(0, 3), k -> struct(
            |  CAST(k AS INT) AS band,
            |  shiftright(sh60, 15 * k) & 32767 AS bv))""".stripMargin))
          .as("x"))
        .select(col("doc_id"), col("x.band").as("band"), col("x.bv").as("bv"))
      val keepb = e0.groupBy(col("band"), col("bv"))
        .agg(count(lit(1)).as("bn")).filter(col("bn") <= 256)
        .select(col("band"), col("bv"))
      val e = e0.join(keepb, Seq("band", "bv"), "left_semi")
      val cand = e.as("a").join(e.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.doc_id") =!= col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
      val h = cand
        .join(sh.select(col("doc_id").as("d1"), col("sh60").as("h1")),
          Seq("d1"))
        .join(sh.select(col("doc_id").as("d2"), col("sh60").as("h2")),
          Seq("d2"))
        .withColumn("hamming", expr("CAST(bit_count(h1 ^ h2) AS INT)"))
        .filter(col("hamming") <= 7)
      val w = Window.partitionBy(col("d1"))
        .orderBy(col("hamming"), col("d2"))
      h.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("d1").as("doc_id"), col("rk").cast("int").as("rk"),
          col("d2").as("nbr"), col("hamming"))
        .orderBy(col("doc_id"), col("rk"))
    },

    // CONTENT-DEFINED CHUNKING dedup ratio (the storage/corpus dedup
    // primitive behind FastCDC / restic / LLM-corpus chunk stores):
    // chunk boundaries are set by the CONTENT (positions whose 8-char
    // window hash ≡ 0 mod 64), so an insertion early in a document
    // shifts byte offsets without invalidating downstream chunk
    // identities — the property fixed-size blocks lack. Window hashes
    // are an 8-char polynomial fingerprint (base-33 Rabin-Karp form,
    // pure integer arithmetic over the first 512 chars; a production
    // engine rolls the same polynomial incrementally and enforces
    // min/max chunk sizes — the dataflow here (per-doc boundary scan,
    // per-chunk hash, global distinct) is identical). Per-doc
    // work is bounded (≤ 512 windows) and fuses with the scan; the
    // only shuffle is the chunk-hash distinct. Output: corpus-level
    // chunking profile + dedup ratio (1 − distinct/total).
    Q("dedup_cdc_chunks",
      """WITH t AS (SELECT doc_id, substring(text, 1, 512) AS tx
        |  FROM documents),
        |c AS (SELECT doc_id, tx,
        |    list_transform(string_split(tx, ''), ch ->
        |      CAST(ord(ch) AS BIGINT)) AS cs
        |  FROM t),
        |cuts AS (SELECT doc_id, i AS p
        |  FROM c, unnest(range(2, greatest(length(tx) - 6, 2))) r(i)
        |  WHERE (cs[CAST(i AS INT)]
        |      + cs[CAST(i + 1 AS INT)] * 3
        |      + cs[CAST(i + 2 AS INT)] * 9
        |      + cs[CAST(i + 3 AS INT)] * 27
        |      + cs[CAST(i + 4 AS INT)] * 81
        |      + cs[CAST(i + 5 AS INT)] * 243
        |      + cs[CAST(i + 6 AS INT)] * 729
        |      + cs[CAST(i + 7 AS INT)] * 2187) % 64 = 0
        |  UNION ALL SELECT doc_id, 1 FROM t),
        |seg AS (SELECT doc_id, p,
        |    lead(p) OVER (PARTITION BY doc_id ORDER BY p) AS np
        |  FROM cuts),
        |ch AS (SELECT c.doc_id,
        |    md5(substring(t.tx, CAST(c.p AS INT),
        |      CAST(coalesce(c.np, length(t.tx) + 1) - c.p AS INT)))
        |      AS chunk_hash,
        |    coalesce(c.np, length(t.tx) + 1) - c.p AS clen
        |  FROM seg c JOIN t ON t.doc_id = c.doc_id
        |  WHERE coalesce(c.np, length(t.tx) + 1) - c.p > 0)
        |SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(count(DISTINCT chunk_hash) AS BIGINT) AS n_distinct_chunks,
        |  round(1 - count(DISTINCT chunk_hash)
        |    / CAST(count(*) AS DOUBLE), 4) AS dedup_ratio,
        |  round(avg(CAST(clen AS DOUBLE)), 2) AS mean_chunk_len
        |FROM ch""") { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"), expr("substring(text, 1, 512)").as("tx"))
      // DuckDB's range(2, n-6) is EXCLUSIVE of the upper bound (max
      // i = n-7, full 8-char windows only) — mirror that exactly.
      // Boundary scan as a NATIVE lead-window over posexploded chars
      // (WindowExec + codegen arithmetic — the interpreted
      // filter-over-sequence HOF form was 4x slower): position p is a
      // cut iff the base-3 polynomial over chars p..p+7 ≡ 0 mod 64
      // (3 has multiplicative order 16 mod 64, so all 8 window weights
      // are distinct residues — base 33 would collapse to 2).
      val ex = t.select(col("doc_id"),
          posexplode(split(col("tx"), "")).as(Seq("i0", "ch")))
        .select(col("doc_id"), (col("i0") + 1).cast("long").as("p"),
          ascii(col("ch")).cast("long").as("c"))
      val wl = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      val hash = col("c") +
        lead(col("c"), 1).over(wl) * 3L +
        lead(col("c"), 2).over(wl) * 9L +
        lead(col("c"), 3).over(wl) * 27L +
        lead(col("c"), 4).over(wl) * 81L +
        lead(col("c"), 5).over(wl) * 243L +
        lead(col("c"), 6).over(wl) * 729L +
        lead(col("c"), 7).over(wl) * 2187L
      val cuts = ex
        .withColumn("h", hash)
        .filter(col("p") >= 2 && col("h").isNotNull && col("h") % 64 === 0)
        .select(col("doc_id"), col("p"))
        .unionByName(t.select(col("doc_id"), lit(1L).as("p")))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
      val seg = cuts.withColumn("np", lead(col("p"), 1).over(w))
      val ch = seg.join(t, Seq("doc_id"))
        .withColumn("np2",
          coalesce(col("np"), length(col("tx")) + 1))
        .filter(col("np2") - col("p") > 0)
        .select(col("doc_id"),
          expr("md5(substring(tx, CAST(p AS INT), CAST(np2 - p AS INT)))")
            .as("chunk_hash"),
          (col("np2") - col("p")).as("clen"))
      ch.agg(countDistinct(col("doc_id")).as("n_docs"),
          count(lit(1)).as("n_chunks"),
          countDistinct(col("chunk_hash")).as("n_distinct_chunks"),
          round(lit(1) - countDistinct(col("chunk_hash")) /
            count(lit(1)).cast("double"), 4).as("dedup_ratio"),
          round(avg(col("clen").cast("double")), 2).as("mean_chunk_len"))
        .select(col("n_docs").cast("long").as("n_docs"),
          col("n_chunks").cast("long").as("n_chunks"),
          col("n_distinct_chunks").cast("long").as("n_distinct_chunks"),
          col("dedup_ratio"), col("mean_chunk_len"))
    },

    // Character 4-gram Jaccard similarity over a bounded doc subset —
    // the n-gram flavor of near-dup scoring.
    Q("dedup_ngram_jaccard",
      """WITH g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, greatest(length(text) - 2, 1)),
        |    i -> substring(text, CAST(i AS INT), 4)))) AS gram
        |  FROM documents WHERE doc_id < 60),
        |sizes AS (SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id),
        |inter AS (SELECT a.doc_id d1, b.doc_id d2, count(*) ni
        |          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id
        |          GROUP BY 1, 2)
        |SELECT d1, d2,
        |  round(CAST(ni AS DOUBLE) / (s1.n + s2.n - ni), 4) AS jaccard
        |FROM inter
        |JOIN sizes s1 ON s1.doc_id = d1
        |JOIN sizes s2 ON s2.doc_id = d2
        |WHERE CAST(ni AS DOUBLE) / (s1.n + s2.n - ni) >= 0.15
        |ORDER BY d1, d2""") { (s, d) =>
      val g = Tables.documents(s, d)
        .filter(col("doc_id") < 60)
        .select(col("doc_id"), explode(expr(
          """array_distinct(transform(
            |  if(length(text) >= 4, sequence(1, length(text) - 3), array()),
            |  i -> substring(text, i, 4)))""".stripMargin)).as("gram"))
      val sizes = g.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val inter = g.as("a").join(g.as("b"),
          col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("ni"))
      inter
        .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), Seq("d1"))
        .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), Seq("d2"))
        .withColumn("jaccard",
          round(col("ni").cast("double") / (col("n1") + col("n2") - col("ni")), 4))
        .filter(col("ni").cast("double") / (col("n1") + col("n2") - col("ni")) >= 0.15)
        .select(col("d1"), col("d2"), col("jaccard"))
        .orderBy(col("d1"), col("d2"))
    },

    // Prefix-filtered set-similarity join (PPJoin's prefix filter —
    // Xiao et al., "Efficient similarity joins for near duplicate
    // detection", WWW 2008): the THIRD candidate-generation family next
    // to MinHash bands and SimHash bytes, and the only EXACT one (no
    // probability of a missed pair). Sets are the word 3-shingles the
    // MinHash family signs. Under a global shingle order (ascending
    // document frequency, tie on the shingle), two sets with Jaccard
    // ≥ t must share an element within their first |s| − ⌈t·|s|⌉ + 1
    // elements — so candidates come from an equi-join on PREFIX
    // shingles only. Rarest-first ordering makes the prefix the
    // df-smallest shingles: boilerplate shingles shared corpus-wide
    // sort to the suffix and never generate a pair, which is what
    // keeps the candidate set near-dup-sized instead of
    // shared-anything-sized. Verification is exact set intersection on
    // candidates only. The oracle is the INDEPENDENT naive form (full
    // inverted-index join, no prefix logic), so parity proves the
    // filter loses nothing.
    Q("dedup_prefix_jaccard",
      s"""WITH sh AS ($shinglesSql),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS ni
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2, CAST(ni AS BIGINT) AS n_shared,
        |  round(CAST(ni AS DOUBLE) / (s1.n + s2.n - ni), 4) AS jaccard
        |FROM inter
        |JOIN sizes s1 ON s1.doc_id = d1
        |JOIN sizes s2 ON s2.doc_id = d2
        |WHERE CAST(ni AS DOUBLE) / (s1.n + s2.n - ni) >= 0.6
        |ORDER BY d1, d2""") { (s, d) =>
      // Per-doc shingle list in global (df, sh) order (memoized —
      // orderedShingles); prefix = first p = n − ⌈t·n⌉ + 1 elements
      // for t = 0.6.
      val ordered = orderedShingles(s, d)
      // Candidate pairs are a derive-once artifact too (the same memo
      // discipline as the MinHash/SimHash candidate-edge relations):
      // deterministic per (corpus, threshold), tiny on disk, and the
      // warm path then pays only the candidate-bounded verify. The
      // join carries PPJoin's LENGTH filter — j ≥ t forces
      // min(n1,n2) ≥ t·max(n1,n2), checked in exact integer form
      // (10·min ≥ 6·max) — and its POSITIONAL filter: at a common
      // prefix token at positions (i, j), total overlap ≤ 1 +
      // min(n1−i, n2−j), which must reach the equivalent overlap
      // threshold α = ⌈t·(n1+n2)/(1+t)⌉ = ⌈3(n1+n2)/8⌉; in integer
      // form 8·(1 + min(n1−i, n2−j)) ≥ 3(n1+n2). A true pair always
      // passes at its first in-prefix common token (all its common
      // tokens sit at positions ≥ (i, j) there), so both filters are
      // lossless — size- or position-incompatible matches never reach
      // distinct(), let alone verification.
      val cand = Derived.memo(s, d, "documents", "ppjoin-cand06") {
        val prefix = ordered
          .withColumn("p", expr("CAST(n - ceil(0.6 * n) + 1 AS INT)"))
          .select(col("doc_id"), col("n"),
            posexplode(expr("slice(shs, 1, p)")).as(Seq("i0", "sh")))
          .select(col("doc_id"), col("n"), (col("i0") + 1).as("pos"),
            col("sh"))
        prefix.as("a")
          .join(prefix.as("b"),
            col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id")
              && least(col("a.n"), col("b.n")) * 10 >=
                 greatest(col("a.n"), col("b.n")) * 6
              && (lit(1) + least(col("a.n") - col("a.pos"),
                   col("b.n") - col("b.pos"))) * 8 >=
                 (col("a.n") + col("b.n")) * 3)
          .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
          .distinct()
      }
      // Exact verify on candidates only: one array_intersect per pair
      // against the doc-level ordered relation.
      cand
        .join(ordered.select(col("doc_id").as("d1"), col("shs").as("t1"),
          col("n").as("n1")), Seq("d1"))
        .join(ordered.select(col("doc_id").as("d2"), col("shs").as("t2"),
          col("n").as("n2")), Seq("d2"))
        .withColumn("ni", size(array_intersect(col("t1"), col("t2"))).cast("bigint"))
        .withColumn("j",
          col("ni").cast("double") / (col("n1") + col("n2") - col("ni")))
        .filter(col("j") >= 0.6)
        .select(col("d1"), col("d2"), col("ni").as("n_shared"),
          round(col("j"), 4).as("jaccard"))
        .orderBy(col("d1"), col("d2"))
    },

    // Asymmetric containment dedup: a doc whose shingle set is ≥90%
    // inside ANOTHER doc's set is subsumed (quote pages, excerpt spam,
    // partial crawls of the same article) — Jaccard misses these when
    // the container is much larger, which is exactly when you want the
    // small one dropped. Candidates use the containment prefix filter
    // (for C(A→B) ≥ t only A's prefix of |A| − ⌈t·|A|⌉ + 1 rarest
    // shingles needs indexing; B stays fully indexed), then exact
    // verification on candidates. Oracle: naive inverted-index form,
    // both directions — parity proves the one-sided prefix loses
    // nothing.
    Q("dedup_containment",
      s"""WITH sh AS ($shinglesSql),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS ni
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT da AS contained, db AS container,
        |  round(CAST(ni AS DOUBLE) / s1.n, 4) AS containment
        |FROM inter
        |JOIN sizes s1 ON s1.doc_id = da
        |WHERE CAST(ni AS DOUBLE) / s1.n >= 0.9
        |ORDER BY contained, container""") { (s, d) =>
      val ordered = orderedShingles(s, d)
      // Candidate memo with the containment LENGTH filter: C(A→B) ≥ t
      // forces n2 ≥ t·n1 (the overlap can't exceed the container), in
      // exact integer form 10·n2 ≥ 9·n1.
      val cand = Derived.memo(s, d, "documents", "ppjoin-cand90") {
        val prefix = ordered
          .withColumn("p", expr("CAST(n - ceil(0.9 * n) + 1 AS INT)"))
          .select(col("doc_id"), col("n"),
            explode(expr("slice(shs, 1, p)")).as("sh"))
        val full = ordered
          .select(col("doc_id"), col("n"), explode(col("shs")).as("sh"))
        prefix.as("a")
          .join(full.as("b"),
            col("a.sh") === col("b.sh") && col("a.doc_id") =!= col("b.doc_id")
              && col("b.n") * 10 >= col("a.n") * 9)
          .select(col("a.doc_id").as("contained"),
            col("b.doc_id").as("container"))
          .distinct()
      }
      // Exact verify: one array_intersect per candidate pair.
      cand
        .join(ordered.select(col("doc_id").as("contained"),
          col("shs").as("t1"), col("n").as("n1")), Seq("contained"))
        .join(ordered.select(col("doc_id").as("container"),
          col("shs").as("t2")), Seq("container"))
        .withColumn("c",
          size(array_intersect(col("t1"), col("t2"))).cast("double") / col("n1"))
        .filter(col("c") >= 0.9)
        .select(col("contained"), col("container"),
          round(col("c"), 4).as("containment"))
        .orderBy(col("contained"), col("container"))
    },

    // DEDUP-RATE-VS-THRESHOLD ABLATION — the curve a pipeline owner
    // reads before committing to ONE near-dup threshold: for t in
    // {0.6, 0.7, 0.8, 0.9}, the verified pair count, the docs a
    // keep-first policy would drop (any doc with a smaller-id
    // neighbor at j ≥ t), and the corpus dedup rate. Pairs come from
    // the PPJoin machinery (t = 0.6 candidates are a superset of
    // every grid point's, so one candidate set serves the whole
    // curve); the threshold compare is EXACT INTEGER arithmetic
    // (j ≥ t ⟺ 10·ni ≥ t10·(n1+n2−ni)) — no double-boundary
    // flakiness anywhere. One 4-row literal grid broadcast; the
    // oracle is the naive inverted-index form over the same grid.
    Q("pipe_dedup_threshold_curve",
      s"""WITH sh AS ($shinglesSql),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS ni
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pj AS (SELECT d1, d2, ni, s1.n AS n1, s2.n AS n2 FROM inter
        |  JOIN sizes s1 ON s1.doc_id = d1
        |  JOIN sizes s2 ON s2.doc_id = d2),
        |g AS (SELECT unnest([6, 7, 8, 9]) AS t10),
        |hits AS (SELECT g.t10, pj.d1, pj.d2 FROM pj CROSS JOIN g
        |  WHERE 10 * pj.ni >= g.t10 * (pj.n1 + pj.n2 - pj.ni)),
        |tot AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT round(g.t10 / 10.0, 1) AS threshold,
        |  CAST(coalesce(count(h.d1), 0) AS BIGINT) AS n_pairs,
        |  CAST(coalesce(count(DISTINCT h.d2), 0) AS BIGINT) AS n_dropped,
        |  round(coalesce(count(DISTINCT h.d2), 0)
        |    / CAST(tot.n_docs AS DOUBLE), 4) AS dedup_rate
        |FROM g CROSS JOIN tot LEFT JOIN hits h ON h.t10 = g.t10
        |GROUP BY g.t10, tot.n_docs
        |ORDER BY threshold""") { (s, d) =>
      val ordered = orderedShingles(s, d)
      val cand = Derived.memo(s, d, "documents", "ppjoin-cand06") {
        // identical build to dedup_prefix_jaccard's — Derived.memo
        // dedupes on the tag, so whichever query runs first pays it
        val prefix = ordered
          .withColumn("p", expr("CAST(n - ceil(0.6 * n) + 1 AS INT)"))
          .select(col("doc_id"), col("n"),
            posexplode(expr("slice(shs, 1, p)")).as(Seq("i0", "sh")))
          .select(col("doc_id"), col("n"), (col("i0") + 1).as("pos"),
            col("sh"))
        prefix.as("a")
          .join(prefix.as("b"),
            col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id")
              && least(col("a.n"), col("b.n")) * 10 >=
                 greatest(col("a.n"), col("b.n")) * 6
              && (lit(1) + least(col("a.n") - col("a.pos"),
                   col("b.n") - col("b.pos"))) * 8 >=
                 (col("a.n") + col("b.n")) * 3)
          .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
          .distinct()
      }
      val pj = cand
        .join(ordered.select(col("doc_id").as("d1"), col("shs").as("t1"),
          col("n").as("n1")), Seq("d1"))
        .join(ordered.select(col("doc_id").as("d2"), col("shs").as("t2"),
          col("n").as("n2")), Seq("d2"))
        .withColumn("ni",
          size(array_intersect(col("t1"), col("t2"))).cast("long"))
        .select(col("d1"), col("d2"), col("ni"), col("n1"), col("n2"))
      val g = s.range(0, 4).select((col("id") + 6).cast("int").as("t10"))
      val hits = pj.crossJoin(broadcast(g))
        .filter(lit(10) * col("ni") >=
          col("t10") * (col("n1") + col("n2") - col("ni")))
        .select(col("t10"), col("d1"), col("d2"))
      val tot = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
      g.crossJoin(broadcast(tot))
        .join(hits, Seq("t10"), "left_outer")
        .groupBy(col("t10"), col("n_docs"))
        .agg(coalesce(count(col("d1")), lit(0L)).as("n_pairs"),
          coalesce(countDistinct(col("d2")), lit(0L)).as("n_dropped"))
        .select(round(col("t10") / 10.0, 1).as("threshold"),
          col("n_pairs").cast("long").as("n_pairs"),
          col("n_dropped").cast("long").as("n_dropped"),
          round(col("n_dropped") / col("n_docs").cast("double"), 4)
            .as("dedup_rate"))
        .orderBy(col("threshold"))
    },

    // Unigram-LM negative log-likelihood per document — the cheapest
    // perplexity-style quality signal (a doc far from the corpus
    // distribution is boilerplate, code, or another language; the
    // standard first-stage LM filter before an expensive model scores).
    // ln is IEEE-identical in both engines (the TF-IDF/entropy oracles
    // already ride it); per-term contributions quantize to
    // DECIMAL(28,12) before the order-free sum; corpus totals ride a
    // broadcast 1-row scalar. At 100 TB: one tokenize pass, one
    // term-keyed shuffle for counts, one broadcast — no all-corpus
    // second pass.
    Q("text_unigram_nll",
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |gc AS (SELECT term, count(*) AS cnt FROM t GROUP BY term),
        |n AS (SELECT count(*) AS total FROM t),
        |dt AS (SELECT doc_id, term, count(*) AS dc FROM t GROUP BY 1, 2)
        |SELECT dt.doc_id,
        |  CAST(sum(dc) AS BIGINT) AS n_tokens,
        |  CAST(floor(CAST(sum(CAST(
        |      dc * -ln(CAST(cnt AS DOUBLE) / total)
        |    AS DECIMAL(28,12))) AS DOUBLE) / sum(dc) * 10000 + 0.5)
        |    / 10000.0 AS DOUBLE) AS avg_nll
        |FROM dt JOIN gc ON gc.term = dt.term CROSS JOIN n
        |GROUP BY dt.doc_id
        |ORDER BY dt.doc_id""") { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val gc = t.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      val n = t.agg(count(lit(1)).as("total"))
      val dt = t.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("dc"))
      dt.join(gc, Seq("term")).crossJoin(broadcast(n))
        .withColumn("term_nll", expr(
          "CAST(dc * -ln(CAST(cnt AS DOUBLE) / total) AS DECIMAL(28,12))"))
        .groupBy(col("doc_id"))
        .agg(sum(col("dc")).as("n_tokens"),
          expr("""CAST(floor(CAST(sum(term_nll) AS DOUBLE) / sum(dc)
            |* 10000 + 0.5) / 10000.0 AS DOUBLE)""".stripMargin).as("avg_nll"))
        .orderBy(col("doc_id"))
    },

    // Dense vocabulary encoding — the tokenizer-table prep step of a
    // training pipeline: ids assigned by descending corpus frequency
    // (tie on the term), each doc's first 20 tokens re-expressed as the
    // id sequence. The id assignment is a row_number over the DISTINCT
    // vocab (bounded by the language, NOT the corpus — the one global
    // window here is over ~1e5 rows at any corpus size); the corpus
    // encode itself is an equi-join + per-doc positional reassembly.
    Q("text_vocab_encode",
      """WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |v AS (SELECT term,
        |    CAST(row_number() OVER (ORDER BY count(*) DESC, term) AS BIGINT) AS id
        |  FROM t GROUP BY term),
        |e AS (SELECT doc_id, i AS pos, toks[i] AS term
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |    unnest(range(1, 21)) AS r(i)
        |  WHERE i <= len(toks))
        |SELECT e.doc_id,
        |  string_agg(CAST(v.id AS VARCHAR), '-' ORDER BY e.pos) AS encoded
        |FROM e JOIN v ON v.term = e.term
        |GROUP BY e.doc_id
        |ORDER BY e.doc_id""") { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      val v = t.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
        .withColumn("id", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("cnt").desc, col("term"))).cast("bigint"))
        .select(col("term"), col("id"))
      val e = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(expr("slice(split(text, ' '), 1, 20)"))
            .as(Seq("pos", "term")))
      e.join(v, Seq("term"))
        .groupBy(col("doc_id"))
        .agg(expr(
          """concat_ws('-', transform(array_sort(collect_list(
            |  struct(pos, id))), x -> CAST(x.id AS STRING)))""".stripMargin)
          .as("encoded"))
        .orderBy(col("doc_id"))
    },

    // Intra-document repetition scoring (the C4/Gopher-style repetition
    // cut): fraction of duplicate word 2-grams and 3-grams per doc, plus
    // the filter verdict. Pure per-row higher-order functions — zero
    // shuffles until the output sort; at 100 TB this runs entirely
    // inside the scan stage.
    Q("text_repetition",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id,
        |    CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)),
        |      i -> toks[i] || ' ' || toks[i+1]) ELSE [] END AS g2,
        |    CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) ELSE [] END AS g3
        |  FROM t)
        |SELECT doc_id,
        |  round(CASE WHEN len(g2) > 0
        |    THEN 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2) ELSE 0 END, 4) AS dup2,
        |  round(CASE WHEN len(g3) > 0
        |    THEN 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3) ELSE 0 END, 4) AS dup3,
        |  (CASE WHEN len(g2) > 0
        |    THEN 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2) ELSE 0 END) > 0.5 AS repetitive
        |FROM g
        |ORDER BY doc_id""") { (s, d) =>
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("g2", expr(
          """transform(if(size(toks) >= 2, sequence(1, size(toks) - 1), array()),
            |  i -> concat_ws(' ', toks[i-1], toks[i]))""".stripMargin))
        .withColumn("g3", expr(
          """transform(if(size(toks) >= 3, sequence(1, size(toks) - 2), array()),
            |  i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))""".stripMargin))
        .withColumn("dup2raw", expr(
          "CASE WHEN size(g2) > 0 THEN 1.0D - CAST(size(array_distinct(g2)) AS DOUBLE) / size(g2) ELSE 0D END"))
        .withColumn("dup3raw", expr(
          "CASE WHEN size(g3) > 0 THEN 1.0D - CAST(size(array_distinct(g3)) AS DOUBLE) / size(g3) ELSE 0D END"))
        .select(col("doc_id"),
          round(col("dup2raw"), 4).as("dup2"),
          round(col("dup3raw"), 4).as("dup3"),
          (col("dup2raw") > 0.5).as("repetitive"))
        .orderBy(col("doc_id"))
    },

    // Benchmark decontamination: which corpus docs share word 4-grams
    // with a held-out "benchmark" slice (doc_id % 97 = 0 here)? The
    // benchmark's distinct gram set is tiny → broadcast; the corpus
    // side stays a scan + generator, so the plan is scan ⋈ broadcast
    // with NO all-pairs stage, and grams travel as md5 digests (fixed
    // 32 bytes) rather than raw text — the shape that survives 100 TB.
    // (Real decontamination uses 8-13-grams; this corpus' vocabulary is
    // so small that 4 is where overlap actually exists — the operator is
    // gram-size-parametric either way.)
    Q("text_contamination",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(toks) >= 4 THEN list_transform(range(1, len(toks) - 2),
        |      i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))
        |    ELSE [] END)) AS gh
        |  FROM t),
        |bench AS (SELECT DISTINCT gh FROM g WHERE doc_id % 97 = 0),
        |hits AS (SELECT g.doc_id, count(*) AS n_shared
        |  FROM g JOIN bench ON g.gh = bench.gh
        |  WHERE g.doc_id % 97 <> 0
        |  GROUP BY g.doc_id)
        |SELECT doc_id, CAST(n_shared AS BIGINT) AS n_shared
        |FROM hits
        |ORDER BY doc_id""") { (s, d) =>
      val grams = Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"), explode(expr(
          """array_distinct(transform(
            |  if(size(toks) >= 4, sequence(1, size(toks) - 3), array()),
            |  i -> md5(concat_ws(' ', toks[i-1], toks[i], toks[i+1], toks[i+2]))))""".stripMargin))
          .as("gh"))
      val bench = grams.filter(col("doc_id") % 97 === 0)
        .select(col("gh")).distinct()
      grams.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), Seq("gh"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared"))
        .orderBy(col("doc_id"))
    },

    // Keep-best-per-key dedup (one survivor per source, highest token
    // count, doc_id tiebreak) — the canonical "pick the best duplicate"
    // reduction, run through the custom TopKPerGroup operator with k=1:
    // the partial phase reduces each input partition to one candidate
    // per source BEFORE the shuffle, which is exactly the argmax
    // shuffle-asymmetry a 100 TB keep-best pass needs.
    Q("dedup_keep_best",
      """SELECT source, doc_id, CAST(n AS INT) AS n_tokens
        |FROM (SELECT source, doc_id, len(string_split(text, ' ')) AS n,
        |        row_number() OVER (PARTITION BY source
        |          ORDER BY len(string_split(text, ' ')) DESC, doc_id) AS rn
        |      FROM documents)
        |WHERE rn = 1
        |ORDER BY source""") { (s, d) =>
      graft.plans.TopK.perGroup(
          Tables.documents(s, d)
            .select(col("source"), col("doc_id"),
              size(split(col("text"), " ")).as("n_tokens")),
          Seq(col("source")),
          Seq(col("n_tokens").desc, col("doc_id")), 1)
        .orderBy(col("source"))
    },

    // Dataset profiling — the pre-flight data-quality scan every corpus
    // ingest runs: per-language row count, null/empty checks, length
    // distribution, distinct sources. One aggregate pass over the scan
    // (all measures partial-aggregable).
    Q("stat_profile",
      """SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(count(*) FILTER (WHERE text IS NULL OR text = '') AS BIGINT) AS n_empty,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |  CAST(min(n_chars) AS BIGINT) AS min_chars,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars,
        |  round(avg(n_chars), 4) AS avg_chars,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents
        |GROUP BY lang
        |ORDER BY lang""") { (s, d) =>
      Tables.documents(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("text").isNull || col("text") === "", 1)).as("n_empty"),
          countDistinct(col("source")).as("n_sources"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          round(avg(col("n_chars")), 4).as("avg_chars"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy(col("lang"))
    },

    // PII scrubbing — the redaction pass a corpus runs before training.
    // The fixture text is synthetic-clean, so the query plants
    // deterministic PII (an email, an IPv4, a phone) per doc, then
    // scrubs it back out: the planted half makes the redaction counts
    // provably nonzero and the patterns' hit behavior engine-checkable.
    // Patterns stay in the Java∩RE2 common subset (no backrefs, no
    // lookaround) so Spark and DuckDB agree; DuckDB needs the explicit
    // 'g' flag where Spark's regexp_replace is global by default.
    Q("text_pii_scrub",
      """WITH p AS (SELECT doc_id,
        |    text || ' reach user' || CAST(doc_id AS VARCHAR) || '@mail.example.com via 10.' ||
        |    CAST(doc_id % 200 AS VARCHAR) || '.0.' || CAST(doc_id % 250 AS VARCHAR) ||
        |    ' or +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        |  FROM documents),
        |s AS (SELECT doc_id, t,
        |    regexp_replace(regexp_replace(regexp_replace(t,
        |      '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |      '\+1-555-[0-9]{4}', '<PHONE>', 'g'),
        |      '[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}', '<IP>', 'g') AS scrubbed
        |  FROM p)
        |SELECT doc_id,
        |  md5(scrubbed) AS scrub_hash,
        |  CAST(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_email,
        |  CAST(len(regexp_extract_all(t, '\+1-555-[0-9]{4}')) AS INT) AS n_phone,
        |  CAST(length(t) - length(scrubbed) AS INT) AS n_chars_redacted
        |FROM s
        |ORDER BY doc_id""") { (s, d) =>
      val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phoneRe = "\\+1-555-[0-9]{4}"
      val ipRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat(col("text"), lit(" reach user"), col("doc_id").cast("string"),
            lit("@mail.example.com via 10."), (col("doc_id") % 200).cast("string"),
            lit(".0."), (col("doc_id") % 250).cast("string"),
            lit(" or +1-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("t"))
        .withColumn("scrubbed",
          regexp_replace(regexp_replace(regexp_replace(col("t"),
            emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>"),
            ipRe, "<IP>"))
        .select(col("doc_id"),
          md5(col("scrubbed")).as("scrub_hash"),
          regexp_count(col("t"), lit(emailRe)).cast("int").as("n_email"),
          regexp_count(col("t"), lit(phoneRe)).cast("int").as("n_phone"),
          (length(col("t")) - length(col("scrubbed"))).cast("int").as("n_chars_redacted"))
        .orderBy(col("doc_id"))
    },

    // Cross-corpus repeated-span removal, keep-first (the C4/RefinedWeb
    // fine-grained dedup that exact-doc and near-doc dedup both miss):
    // non-overlapping 8-token spans; every span occurrence after the
    // corpus-wide first (by doc_id, then position) is dropped; documents
    // are reassembled from their surviving spans in order. One shuffle
    // keyed by span hash for the keep-first window, one keyed by doc for
    // reassembly — grams travel as md5 digests, not text. The ordered
    // reassembly (sort_array over (idx, span) structs) is what makes the
    // result deterministic under any partitioning.
    Q("dedup_span_keepfirst",
      """WITH c AS (SELECT doc_id, CAST(i AS INT) AS idx,
        |    array_to_string(toks[i * 8 + 1 : i * 8 + 8], ' ') AS span
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |    unnest(range(0, (len(toks) + 7) // 8)) t(i)),
        |k AS (SELECT doc_id, idx, span,
        |    row_number() OVER (PARTITION BY md5(span) ORDER BY doc_id, idx) AS occ
        |  FROM c)
        |SELECT doc_id,
        |  CAST(count(*) AS INT) AS n_spans,
        |  CAST(count(*) FILTER (WHERE occ = 1) AS INT) AS n_kept,
        |  md5(coalesce(string_agg(span, ' ' ORDER BY idx) FILTER (WHERE occ = 1), '')) AS clean_hash
        |FROM k
        |GROUP BY doc_id
        |ORDER BY doc_id""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val spans = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"),
          posexplode(expr(
            """transform(sequence(0, CAST((size(toks) + 7) / 8 AS INT) - 1),
              |  i -> concat_ws(' ', slice(toks, i * 8 + 1, 8)))""".stripMargin))
            .as(Seq("idx", "span")))
      val w = Window.partitionBy(md5(col("span"))).orderBy(col("doc_id"), col("idx"))
      spans
        .withColumn("occ", row_number().over(w))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("int").as("n_spans"),
          count(when(col("occ") === 1, 1)).cast("int").as("n_kept"),
          md5(array_join(transform(
            array_sort(collect_list(when(col("occ") === 1,
              struct(col("idx"), col("span"))))),
            x => x.getField("span")), " ")).as("clean_hash"))
        .orderBy(col("doc_id"))
    },

    // BM25 retrieval scoring (Robertson/Sparck Jones; the Lucene
    // idf = ln(1 + (N−df+0.5)/(df+0.5)) variant, k1=1.2 b=0.75) for a
    // fixed 3-term query — the ranking half of a corpus search /
    // relevance-filter stage. ONE tokenize feeds tf (term-filtered
    // BEFORE the groupBy — the scan reduces to query-term postings
    // immediately), df (vocab-sized broadcast), and dl; N/Σdl ride a
    // 1-row broadcast. Per-term scores stay unrounded doubles but sum
    // in a FIXED pivot order (hash+merge+spark, not an aggregate whose
    // order could vary), so both engines add the same 3 doubles in the
    // same sequence; the single ln per term is the only libm call and
    // the final 4dp round absorbs its ulp skew. Scale: postings
    // equi-joins + broadcast scalars — no all-pairs, 100 TB-safe.
    Q("text_bm25",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |stats AS (SELECT count(*) AS n, sum(len(toks)) AS sumdl FROM t),
        |wd AS (SELECT doc_id, unnest(toks) AS w FROM t),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM wd
        |  WHERE w IN ('hash','merge','spark') GROUP BY 1, 2),
        |df AS (SELECT w, count(DISTINCT doc_id) AS df FROM wd
        |  WHERE w IN ('hash','merge','spark') GROUP BY 1),
        |sc AS (SELECT doc_id, w,
        |    ln(1 + (n - df + 0.5)/(df + 0.5)) *
        |      (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl /
        |        (CAST(sumdl AS DOUBLE)/n))) AS s
        |  FROM tf JOIN df USING (w)
        |  JOIN (SELECT doc_id, len(toks) AS dl FROM t) dl USING (doc_id), stats),
        |pv AS (SELECT doc_id,
        |    max(CASE WHEN w='hash' THEN s END) AS s1,
        |    max(CASE WHEN w='merge' THEN s END) AS s2,
        |    max(CASE WHEN w='spark' THEN s END) AS s3
        |  FROM sc GROUP BY 1)
        |SELECT doc_id,
        |  round(coalesce(s1, 0) + coalesce(s2, 0) + coalesce(s3, 0), 4) AS bm25
        |FROM pv ORDER BY doc_id""") { (s, d) =>
      val terms = Seq("hash", "merge", "spark")
      val t = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val stats = t.agg(count(lit(1)).as("n"), sum(size(col("toks"))).as("sumdl"))
      val words = t.select(col("doc_id"), explode(col("toks")).as("w"))
        .filter(col("w").isin(terms: _*))
      val tf = words.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
      val df = words.select(col("doc_id"), col("w")).distinct()
        .groupBy(col("w")).agg(count(lit(1)).as("df"))
      val dl = t.select(col("doc_id"), size(col("toks")).as("dl"))
      tf.join(broadcast(df), Seq("w")).join(dl, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .withColumn("s",
          log(lit(1) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
            (col("tf") * 2.2) / (col("tf") + lit(1.2) * (lit(1) - 0.75 +
              lit(0.75) * col("dl") / (col("sumdl").cast("double") / col("n")))))
        .groupBy(col("doc_id"))
        .agg(max(when(col("w") === "hash", col("s"))).as("s1"),
          max(when(col("w") === "merge", col("s"))).as("s2"),
          max(when(col("w") === "spark", col("s"))).as("s3"))
        .select(col("doc_id"),
          round(coalesce(col("s1"), lit(0.0)) + coalesce(col("s2"), lit(0.0)) +
            coalesce(col("s3"), lit(0.0)), 4).as("bm25"))
        .orderBy(col("doc_id"))
    },

    // Bigram-LM perplexity with add-one smoothing — the Markov upgrade
    // of text_unigram_nll (a doc whose transitions surprise the corpus
    // LM is boilerplate/code/another language). Same determinism
    // discipline: each position's −ln P(w₂|w₁) quantizes to
    // DECIMAL(28,12) before the order-free per-doc sum; the only libm
    // call is one ln per distinct (doc, bigram), and ppl derives from
    // the ALREADY-ROUNDED avg_nll so the exp sits on identical inputs
    // in both engines. Shape: one tokenize → positional bigram
    // transform (no self-join), counts join on the (w1,w2)/w1 keys,
    // |V| rides a 1-row broadcast — 100 TB-safe.
    Q("text_bigram_ppl",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        |  FROM t, unnest(range(1, len(toks))) u(i)),
        |cb AS (SELECT w1, w2, count(*) AS cab FROM bg GROUP BY 1, 2),
        |cu AS (SELECT w, count(*) AS ca FROM (SELECT unnest(toks) AS w FROM t) GROUP BY 1),
        |vv AS (SELECT count(*) AS v FROM cu),
        |db AS (SELECT doc_id, w1, w2, count(*) AS dc FROM bg GROUP BY 1, 2, 3),
        |sc AS (SELECT db.doc_id, db.dc,
        |    CAST(db.dc * -ln((cab + 1) / CAST(ca + v AS DOUBLE)) AS DECIMAL(28,12)) AS nll
        |  FROM db JOIN cb ON cb.w1 = db.w1 AND cb.w2 = db.w2
        |  JOIN cu ON cu.w = db.w1 CROSS JOIN vv),
        |agg AS (SELECT doc_id, CAST(sum(dc) AS BIGINT) AS n_bigrams,
        |    CAST(floor(CAST(sum(nll) AS DOUBLE) / sum(dc) * 10000 + 0.5) / 10000.0 AS DOUBLE) AS avg_nll
        |  FROM sc GROUP BY 1)
        |SELECT doc_id, n_bigrams, avg_nll,
        |  CAST(floor(exp(avg_nll) * 10000 + 0.5) / 10000.0 AS DOUBLE) AS ppl
        |FROM agg ORDER BY doc_id""") { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val bg = t.select(col("doc_id"), explode(expr(
          """transform(if(size(toks) >= 2, sequence(1, size(toks) - 1), array()),
            |  i -> named_struct('w1', element_at(toks, i),
            |                    'w2', element_at(toks, i + 1)))""".stripMargin)).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cab"))
      val cu = t.select(explode(col("toks")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("ca"))
      val vv = cu.agg(count(lit(1)).as("v"))
      val db = bg.groupBy(col("doc_id"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("dc"))
      db.join(cb, Seq("w1", "w2"))
        .join(cu.select(col("w").as("w1"), col("ca")), Seq("w1"))
        .crossJoin(broadcast(vv))
        .withColumn("nll", expr(
          "CAST(dc * -ln((cab + 1) / CAST(ca + v AS DOUBLE)) AS DECIMAL(28,12))"))
        .groupBy(col("doc_id"))
        .agg(sum(col("dc")).as("n_bigrams"),
          expr("""CAST(floor(CAST(sum(nll) AS DOUBLE) / sum(dc)
            |* 10000 + 0.5) / 10000.0 AS DOUBLE)""".stripMargin).as("avg_nll"))
        .select(col("doc_id"), col("n_bigrams"), col("avg_nll"),
          expr("CAST(floor(exp(avg_nll) * 10000 + 0.5) / 10000.0 AS DOUBLE)").as("ppl"))
        .orderBy(col("doc_id"))
    },

    // Interpolated Kneser-Ney bigram LM (Kneser & Ney 1995; Chen &
    // Goodman 1999 §2.7) — the smoothing that actually ships in n-gram
    // quality filters, replacing add-one's brutal mass flattening with
    // absolute discounting (D = 0.75) plus a CONTINUATION-count backoff:
    //   P(w2|w1) = (c(w1w2) − D)/cl(w1)
    //            + D·N1+(w1,·)/cl(w1) · N1+(·,w2)/B
    // where cl(w1) = Σ_x c(w1 x) (bigram-left mass), N1+(w1,·) =
    // distinct continuations of w1, N1+(·,w2) = distinct histories of
    // w2, B = distinct bigrams. All four statistics are rollups of the
    // ONE bigram-count relation, so the corpus pays a single
    // bigram-keyed shuffle and three vocab-sized aggregates of it —
    // same economics as text_bigram_ppl, strictly better LM. The same
    // determinism discipline: one ln per distinct (doc, bigram),
    // quantized DECIMAL(28,12) before the order-free per-doc sum; ppl
    // derives from the already-rounded avg_nll.
    Q("text_kn_bigram",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |bg AS (SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        |  FROM t, unnest(range(1, len(toks))) u(i)),
        |cb AS (SELECT w1, w2, count(*) AS cab FROM bg GROUP BY 1, 2),
        |cl AS (SELECT w1, CAST(sum(cab) AS BIGINT) AS cleft,
        |    count(*) AS n1f FROM cb GROUP BY 1),
        |cr AS (SELECT w2, count(*) AS n1r FROM cb GROUP BY 1),
        |bb AS (SELECT count(*) AS b FROM cb),
        |db AS (SELECT doc_id, w1, w2, count(*) AS dc FROM bg GROUP BY 1, 2, 3),
        |sc AS (SELECT db.doc_id, db.dc,
        |    CAST(db.dc * -ln((cab - 0.75 + 0.75 * n1f * (n1r / CAST(b AS DOUBLE)))
        |      / CAST(cleft AS DOUBLE)) AS DECIMAL(28,12)) AS nll
        |  FROM db JOIN cb ON cb.w1 = db.w1 AND cb.w2 = db.w2
        |  JOIN cl ON cl.w1 = db.w1
        |  JOIN cr ON cr.w2 = db.w2 CROSS JOIN bb),
        |agg AS (SELECT doc_id, CAST(sum(dc) AS BIGINT) AS n_bigrams,
        |    CAST(floor(CAST(sum(nll) AS DOUBLE) / sum(dc) * 10000 + 0.5) / 10000.0 AS DOUBLE) AS avg_nll
        |  FROM sc GROUP BY 1)
        |SELECT doc_id, n_bigrams, avg_nll,
        |  CAST(floor(exp(avg_nll) * 10000 + 0.5) / 10000.0 AS DOUBLE) AS ppl
        |FROM agg ORDER BY doc_id""") { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val bg = t.select(col("doc_id"), explode(expr(
          """transform(if(size(toks) >= 2, sequence(1, size(toks) - 1), array()),
            |  i -> named_struct('w1', element_at(toks, i),
            |                    'w2', element_at(toks, i + 1)))""".stripMargin)).as("p"))
        .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cab"))
        // cb feeds three rollups and the per-doc score join — pin it so
        // the corpus-scale bigram shuffle runs exactly once.
        .localCheckpoint(true)
      val cl = cb.groupBy(col("w1"))
        .agg(sum(col("cab")).as("cleft"), count(lit(1)).as("n1f"))
      val cr = cb.groupBy(col("w2")).agg(count(lit(1)).as("n1r"))
      val bb = cb.agg(count(lit(1)).as("b"))
      val db = bg.groupBy(col("doc_id"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("dc"))
      val res = db.join(cb, Seq("w1", "w2"))
        .join(cl, Seq("w1"))
        .join(cr, Seq("w2"))
        .crossJoin(broadcast(bb))
        .withColumn("nll", expr(
          """CAST(dc * -ln((cab - 0.75 + 0.75 * n1f * (n1r / CAST(b AS DOUBLE)))
            |  / CAST(cleft AS DOUBLE)) AS DECIMAL(28,12))""".stripMargin))
        .groupBy(col("doc_id"))
        .agg(sum(col("dc")).as("n_bigrams"),
          expr("""CAST(floor(CAST(sum(nll) AS DOUBLE) / sum(dc)
            |* 10000 + 0.5) / 10000.0 AS DOUBLE)""".stripMargin).as("avg_nll"))
        .select(col("doc_id"), col("n_bigrams"), col("avg_nll"),
          expr("CAST(floor(exp(avg_nll) * 10000 + 0.5) / 10000.0 AS DOUBLE)").as("ppl"))
        .orderBy(col("doc_id"))
      res
    },

    // BPE merge-candidate counting (tokenizer training, step 1): the
    // weighted adjacent-character-pair histogram whose argmax is the
    // first merge rule. The count runs over the VOCABULARY (distinct
    // word × corpus frequency), not the corpus — the classic BPE trick
    // that makes each merge round vocab-sized no matter the corpus
    // size; the only corpus-scale work is the word-frequency rollup
    // (one term-keyed, map-side-combinable shuffle). All-integer
    // weighted counts; the final top-10 window is over a charset²-
    // bounded relation. 100 TB-safe by construction.
    Q("text_bpe_merges",
      """WITH vf AS (SELECT w, count(*) AS freq FROM
        |    (SELECT unnest(string_split(text, ' ')) AS w FROM documents) GROUP BY 1),
        |pr AS (SELECT substr(w, CAST(i AS INT), 2) AS pair, freq
        |  FROM vf, unnest(range(1, length(w))) u(i)),
        |pc AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt FROM pr GROUP BY 1),
        |r AS (SELECT pair, cnt, row_number() OVER (ORDER BY cnt DESC, pair) AS rk FROM pc)
        |SELECT CAST(rk AS INT) AS rk, pair, cnt FROM r WHERE rk <= 10
        |ORDER BY rk""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val vf = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      vf.select(col("freq"), explode(expr(
          """transform(if(length(w) >= 2, sequence(1, length(w) - 1), array()),
            |  i -> substring(w, i, 2))""".stripMargin)).as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("cnt").desc, col("pair"))))
        .filter(col("rk") <= 10)
        .select(col("rk").cast("int").as("rk"), col("pair"), col("cnt"))
        .orderBy(col("rk"))
    },

    // BPE ENCODE (tokenizer training, step 2 — the apply half of
    // text_bpe_merges): the top-8 ranked merge rules applied to the
    // corpus in rank order, each rule collapsing its adjacent token
    // pair leftmost-greedy. The encode runs over the DISTINCT word
    // relation (vocab-sized), with the ranked merge table as a 1-row
    // broadcast array — corpus-scale work stays the word-frequency
    // rollup plus one word-keyed encode join, the same economics that
    // make BPE training corpus-size-free. Mechanics shared by both
    // engines exactly: a word becomes the ||-delimited token string
    // ("||a||b||c||"), and applying rule (x,y)→xy is ONE
    // replace(str, '|x||y|', '|xy|') — leftmost non-overlapping
    // replace-all IS the greedy merge pass, boundary-safe because a
    // multi-char token never exposes '|x' adjacency, and the doubled
    // delimiter keeps consecutive occurrences mergeable ("||a||a||a||a||"
    // → "||aa||aa||"). The 8-rule sequence is one HOF fold
    // (aggregate / list_reduce) over the merge array; subtoken count
    // falls out of the final pipe count. Words containing '|' are
    // excluded identically in both dialects (the delimiter guard).
    Q("text_bpe_apply",
      """WITH tw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |vf AS (SELECT w, count(*) AS freq FROM tw GROUP BY 1),
        |pr AS (SELECT substr(w, CAST(i AS INT), 2) AS pair, freq
        |  FROM vf, unnest(range(1, length(w))) u(i)),
        |pc AS (SELECT pair, sum(freq) AS cnt FROM pr GROUP BY 1),
        |mg AS (SELECT pair, row_number() OVER (ORDER BY cnt DESC, pair) AS rk FROM pc),
        |ml AS (SELECT list(pair ORDER BY rk) AS merges FROM mg WHERE rk <= 8),
        |enc AS (SELECT w,
        |    list_reduce(list_prepend('||' || regexp_replace(w, '(.)', '\1||', 'g'), merges),
        |      (acc, p) -> replace(acc,
        |        '|' || substr(p, 1, 1) || '||' || substr(p, 2, 1) || '|',
        |        '|' || p || '|')) AS f
        |  FROM (SELECT DISTINCT w FROM tw WHERE NOT contains(w, '|')), ml),
        |ns AS (SELECT w,
        |    (length(f) - length(replace(f, '|', ''))) // 2 - 1 AS n_sub
        |  FROM enc)
        |SELECT t.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_words,
        |  CAST(sum(n.n_sub) AS BIGINT) AS n_bpe_tokens,
        |  CAST(sum(length(t.w)) AS BIGINT) AS n_chars
        |FROM tw t JOIN ns n ON n.w = t.w
        |GROUP BY t.doc_id
        |ORDER BY t.doc_id""") { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val tw = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      val vf = tw.groupBy(col("w")).agg(count(lit(1)).as("freq"))
      val ml = vf
        .select(col("freq"), explode(expr(
          """transform(if(length(w) >= 2, sequence(1, length(w) - 1), array()),
            |  i -> substring(w, i, 2))""".stripMargin)).as("pair"))
        .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("cnt").desc, col("pair"))))
        .filter(col("rk") <= 8)
        .agg(expr(
          "transform(array_sort(collect_list(struct(rk, pair))), x -> x.pair)")
          .as("merges"))
      val enc = vf.select(col("w")).filter(!col("w").contains("|"))
        .crossJoin(broadcast(ml))
        .withColumn("f", expr(
          """aggregate(merges,
            |  concat('||', regexp_replace(w, '(.)', '$1||')),
            |  (acc, p) -> replace(acc,
            |    concat('|', substring(p, 1, 1), '||', substring(p, 2, 1), '|'),
            |    concat('|', p, '|')))""".stripMargin))
        .select(col("w"), expr(
          "(length(f) - length(replace(f, '|', ''))) div 2 - 1").as("n_sub"))
      tw.join(enc, Seq("w"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_words"),
          sum(col("n_sub")).as("n_bpe_tokens"),
          sum(length(col("w")).cast("long")).as("n_chars"))
        .orderBy(col("doc_id"))
    },

    // Cross-document boilerplate removal (the CCNet/web-curation pass:
    // nav bars, cookie banners, footers repeat VERBATIM across a site's
    // pages and must be stripped before dedup/training). The fixture
    // plants it deterministically: every document is prefixed with the
    // same 10-token header, so both engines see an identical corpus with
    // real boilerplate density. Mechanics: docs split into aligned
    // 10-token segments, each segment travels as an md5 digest (never
    // the text — the dedup_span law), document frequency per digest is
    // ONE hash aggregate, and segments present in ≥ max(2, ⌈20% of the
    // corpus⌉) documents are dropped — a RELATIVE cut (CCNet's shape),
    // so the operator behaves identically at any corpus scale; the
    // threshold rides a broadcast 1-row doc-count aggregate. Per-doc
    // output: segments seen/kept, the cleaned text's digest, and the
    // fraction of tokens removed. The df relation is vocab-of-segments-
    // sized and the join back is an equi-join on the digest — no
    // all-pairs anywhere, bucketable on seg_hash at 100 TB.
    Q("text_boilerplate",
      """WITH t AS (SELECT doc_id,
        |    string_split('nav home about contact login search menu footer copyright terms '
        |                 || text, ' ') AS toks FROM documents),
        |thr AS (SELECT CAST(greatest(2, ceil(0.2 * count(*))) AS BIGINT) AS thr
        |  FROM t),
        |seg AS (SELECT doc_id,
        |    CAST(start // 10 AS INT) AS seg_idx,
        |    CAST(len(list_slice(toks, start + 1, start + 10)) AS BIGINT) AS seg_len,
        |    md5(array_to_string(list_slice(toks, start + 1, start + 10), ' ')) AS seg_hash
        |  FROM (SELECT doc_id, unnest(range(0, len(toks), 10)) AS start, toks FROM t)),
        |df AS (SELECT seg_hash, count(DISTINCT doc_id) AS df FROM seg GROUP BY 1),
        |j AS (SELECT seg.*, df.df, thr.thr FROM seg
        |  JOIN df USING (seg_hash) CROSS JOIN thr)
        |SELECT doc_id,
        |  CAST(count(*) AS BIGINT) AS n_seg,
        |  CAST(sum(CASE WHEN df < thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  md5(array_to_string(list(seg_hash ORDER BY seg_idx)
        |        FILTER (WHERE df < thr), ' ')) AS clean_hash,
        |  round(sum(CASE WHEN df >= thr THEN seg_len ELSE 0 END)
        |        / CAST(sum(seg_len) AS DOUBLE), 4) AS pct_removed
        |FROM j GROUP BY doc_id ORDER BY doc_id""") { (s, d) =>
      val t = Tables.documents(s, d).select(col("doc_id"),
        split(concat(
          lit("nav home about contact login search menu footer copyright terms "),
          col("text")), " ").as("toks"))
      val thr = t.agg(expr("CAST(greatest(2, ceil(0.2 * count(1))) AS BIGINT)")
        .as("thr"))
      val seg = t
        .select(col("doc_id"), col("toks"),
          explode(expr("sequence(0, size(toks) - 1, 10)")).as("start"))
        .select(col("doc_id"),
          expr("CAST(start div 10 AS INT)").as("seg_idx"),
          expr("CAST(size(slice(toks, start + 1, 10)) AS BIGINT)").as("seg_len"),
          md5(expr("concat_ws(' ', slice(toks, start + 1, 10))")).as("seg_hash"))
      val df = seg.groupBy(col("seg_hash"))
        .agg(countDistinct(col("doc_id")).as("df"))
      seg.join(df, Seq("seg_hash")).crossJoin(broadcast(thr))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_seg"),
          sum(expr("CASE WHEN df < thr THEN 1 ELSE 0 END")).as("n_kept"),
          md5(expr(
            """concat_ws(' ', transform(
              |  array_sort(collect_list(CASE WHEN df < thr
              |    THEN struct(seg_idx, seg_hash) END)),
              |  x -> x.seg_hash))""".stripMargin)).as("clean_hash"),
          round(sum(expr("CASE WHEN df >= thr THEN seg_len ELSE 0 END"))
            / sum(col("seg_len")).cast("double"), 4).as("pct_removed"))
        .orderBy(col("doc_id"))
    },

    // Per-source distribution drift: Jensen–Shannon divergence between
    // each source's token distribution and the whole corpus's — the
    // screen a corpus-mixing pipeline runs to spot a source whose
    // language shifted (crawler drift, spam influx) before it poisons
    // the mix. Counts collapse to (source, token) and (token) relations
    // in one tokenize pass; the per-(source, token) JSD terms
    //   ½·p·ln(2p/(p+q)) + ½·q·ln(2q/(p+q))
    // are DECIMAL-quantized before the order-free sum. The pair frame is
    // |sources| × |vocab| via a broadcast vocab relation — bounded by
    // the vocabulary, never by corpus rows, exactly how it must behave
    // at 100 TB.
    Q("text_jsd",
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |st AS (SELECT source, tok, count(*) AS c FROM tok GROUP BY 1, 2),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM st GROUP BY 1),
        |vt AS (SELECT tok, CAST(sum(c) AS BIGINT) AS c_t FROM st GROUP BY 1),
        |tot AS (SELECT CAST(sum(c_t) AS BIGINT) AS n FROM vt),
        |pairs AS (SELECT ns.source, vt.tok,
        |    coalesce(st.c, 0) / CAST(ns.n_s AS DOUBLE) AS p,
        |    vt.c_t / CAST(tot.n AS DOUBLE) AS q,
        |    ns.n_s
        |  FROM ns CROSS JOIN vt CROSS JOIN tot
        |  LEFT JOIN st ON st.source = ns.source AND st.tok = vt.tok)
        |SELECT source, max(n_s) AS n_tokens,
        |  floor(CAST(sum(CAST(
        |      0.5 * (CASE WHEN p > 0 THEN p * ln(2 * p / (p + q)) ELSE 0 END)
        |      + 0.5 * q * ln(2 * q / (p + q)) AS DECIMAL(28,12))) AS DOUBLE)
        |    * 10000 + 0.5) / 10000.0 AS jsd
        |FROM pairs GROUP BY source ORDER BY source""") { (s, d) =>
      val tok = Tables.documents(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      val st = tok.groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      val ns = st.groupBy(col("source")).agg(sum(col("c")).as("n_s"))
      val vt = st.groupBy(col("tok")).agg(sum(col("c")).as("c_t"))
      val tot = vt.agg(sum(col("c_t")).as("n"))
      ns.crossJoin(broadcast(vt)).crossJoin(broadcast(tot))
        .join(st, Seq("source", "tok"), "left")
        .select(col("source"), col("n_s"),
          (coalesce(col("c"), lit(0L)) / col("n_s").cast("double")).as("p"),
          (col("c_t") / col("n").cast("double")).as("q"))
        .groupBy(col("source"))
        .agg(max(col("n_s")).as("n_tokens"),
          expr("""CAST(floor(CAST(sum(CAST(
                 |    0.5 * (CASE WHEN p > 0 THEN p * ln(2 * p / (p + q)) ELSE 0 END)
                 |    + 0.5 * q * ln(2 * q / (p + q)) AS DECIMAL(28,12))) AS DOUBLE)
                 |  * 10000 + 0.5) / 10000.0 AS DOUBLE)""".stripMargin).as("jsd"))
        .orderBy(col("source"))
    },

    // Flesch-style readability per source — the quality screen between
    // raw length stats (text_quality) and model-based scoring. The
    // syllable proxy is the VOWEL-GROUP count (split on /[aeiouy]+/
    // leaves n_groups + 1 fragments — exact and identical in both
    // engines, no dictionary), sentences proxy at one per 15 words, and
    // score = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words).
    // One tokenize pass; per-doc integer sufficient statistics (words,
    // syllables) roll up to the source with DECIMAL-quantized score
    // terms — partial+final aggregable, partition-invariant.
    Q("text_readability",
      """WITH tw AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |sy AS (SELECT doc_id, source,
        |    CAST(count(*) AS BIGINT) AS words,
        |    CAST(sum(greatest(1, len(string_split_regex(w, '[aeiouy]+')) - 1))
        |         AS BIGINT) AS syllables
        |  FROM tw GROUP BY 1, 2),
        |sc AS (SELECT source, words, syllables,
        |    CAST(206.835 - 1.015 * (words / CAST(ceil(words / 15.0) AS DOUBLE))
        |         - 84.6 * (syllables / CAST(words AS DOUBLE))
        |      AS DECIMAL(28,12)) AS flesch
        |  FROM sy)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(words) AS BIGINT) AS words,
        |  CAST(sum(syllables) AS BIGINT) AS syllables,
        |  floor(CAST(sum(flesch) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000.0
        |    AS avg_flesch
        |FROM sc GROUP BY source ORDER BY source""") { (s, d) =>
      val tw = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          explode(split(col("text"), " ")).as("w"))
      val sy = tw.groupBy(col("doc_id"), col("source"))
        .agg(count(lit(1)).as("words"),
          sum(greatest(lit(1),
            expr("size(split(w, '[aeiouy]+')) - 1"))).as("syllables"))
      sy
        .select(col("source"), col("words"), col("syllables"),
          expr("""CAST(206.835 - 1.015 * (words / CAST(ceil(words / 15.0) AS DOUBLE))
                 |     - 84.6 * (syllables / CAST(words AS DOUBLE))
                 |  AS DECIMAL(28,12))""".stripMargin).as("flesch"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("words")).as("words"),
          sum(col("syllables")).as("syllables"),
          expr("""CAST(floor(CAST(sum(flesch) AS DOUBLE) / count(*)
                 |  * 10000 + 0.5) / 10000.0 AS DOUBLE)""".stripMargin)
            .as("avg_flesch"))
        .orderBy(col("source"))
    },

    // Zipf rank-frequency fit: OLS slope of ln(freq) on ln(rank) over
    // the top-100 vocabulary ranks — the corpus-health screen that
    // catches template/boilerplate-dominated crawls (natural text sits
    // near −1). One tokenize pass collapses to the vocab relation; the
    // rank window and the 100-term regression run on vocab, never raw
    // tokens, and each ln-product is DECIMAL-quantized before summing
    // so the slope is partition-invariant.
    Q("text_zipf",
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        |tc AS (SELECT term, count(*) AS c FROM tok GROUP BY 1),
        |rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, term) AS r FROM tc),
        |t AS (SELECT CAST(ln(r) AS DECIMAL(18,8)) AS lx,
        |    CAST(ln(c) AS DECIMAL(18,8)) AS ly,
        |    CAST(ln(r) * ln(r) AS DECIMAL(18,8)) AS lxx,
        |    CAST(ln(r) * ln(c) AS DECIMAL(18,8)) AS lxy
        |  FROM rk WHERE r <= 100),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(lx) AS DOUBLE) AS sx, CAST(sum(ly) AS DOUBLE) AS sy,
        |    CAST(sum(lxx) AS DOUBLE) AS sxx, CAST(sum(lxy) AS DOUBLE) AS sxy
        |  FROM t)
        |SELECT n AS n_terms,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS zipf_slope
        |FROM s ORDER BY n_terms""") { (s, d) =>
      val tc = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("c"))
      val rk = tc
        .withColumn("r", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("c").desc, col("term"))))
        .filter(col("r") <= 100)
        .select(log(col("r")).cast("decimal(18,8)").as("lx"),
          log(col("c")).cast("decimal(18,8)").as("ly"),
          (log(col("r")) * log(col("r"))).cast("decimal(18,8)").as("lxx"),
          (log(col("r")) * log(col("c"))).cast("decimal(18,8)").as("lxy"))
      rk.agg(count(lit(1)).as("n"),
          sum(col("lx")).cast("double").as("sx"),
          sum(col("ly")).cast("double").as("sy"),
          sum(col("lxx")).cast("double").as("sxx"),
          sum(col("lxy")).cast("double").as("sxy"))
        .select(col("n").as("n_terms"),
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")), 4)
            .as("zipf_slope"))
        .orderBy(col("n_terms"))
    },

    // Skip-gram co-occurrence (window ≤ 2): the corpus statistic under
    // word-embedding training and collocation mining. Pairs generate
    // INSIDE the token array via one HOF pass (no positional self-join,
    // no second tokenize), collapse canonically (unordered pair), and
    // only the vocab²-bounded count relation ever shuffles. Top-15 by
    // count under a total order.
    Q("text_cooccur",
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents
        |  WHERE length(text) > 0),
        |s AS (SELECT unnest(flatten(list_transform(range(1, len(toks)),
        |    i -> CASE WHEN i + 2 <= len(toks)
        |         THEN [[toks[i], toks[i+1]], [toks[i], toks[i+2]]]
        |         ELSE [[toks[i], toks[i+1]]] END))) AS pr
        |  FROM t WHERE len(toks) >= 2),
        |c AS (SELECT least(pr[1], pr[2]) AS w1, greatest(pr[1], pr[2]) AS w2,
        |    count(*) AS c
        |  FROM s GROUP BY 1, 2)
        |SELECT w1, w2, CAST(c AS BIGINT) AS c FROM c
        |ORDER BY c DESC, w1, w2 LIMIT 15""") { (s, d) =>
      Tables.documents(s, d)
        .filter(length(col("text")) > 0)
        .select(split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          """flatten(transform(sequence(0, size(toks) - 2),
            |  i -> CASE WHEN i + 2 <= size(toks) - 1
            |       THEN array(array(toks[i], toks[i+1]),
            |                  array(toks[i], toks[i+2]))
            |       ELSE array(array(toks[i], toks[i+1])) END))"""
            .stripMargin)).as("pr"))
        .select(least(col("pr").getItem(0), col("pr").getItem(1)).as("w1"),
          greatest(col("pr").getItem(0), col("pr").getItem(1)).as("w2"))
        .groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w1"), col("w2"))
        .limit(15)
    },

    // Per-document n-gram novelty: the share of a doc's distinct
    // 3-token shingles whose FIRST appearance (min doc_id over the whole
    // corpus) is this doc — the duplicate-content score a crawl pipeline
    // uses to rank which near-dup to keep and to measure marginal new
    // content per source. Reuses the family's single shingle relation:
    // one groupBy(sh) finds each shingle's first doc, one join back +
    // keyed rollup scores every doc — never doc×doc pairs, and the only
    // wide key is the shingle (bucketable at 100 TB).
    Q("text_ngram_novelty",
      s"""WITH sh AS ($shinglesSql),
         |f AS (SELECT sh, min(doc_id) AS first_doc FROM sh GROUP BY 1),
         |j AS (SELECT s.doc_id,
         |    CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END AS novel
         |  FROM sh s JOIN f ON f.sh = s.sh)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(sum(novel) AS BIGINT) AS n_novel,
         |  round(sum(novel) / CAST(count(*) AS DOUBLE), 4) AS novelty
         |FROM j GROUP BY 1 ORDER BY doc_id""") { (s, d) =>
      val sh = shingles(s, d)
      val f = sh.groupBy(col("sh")).agg(min(col("doc_id")).as("first_doc"))
      sh.join(f, Seq("sh"))
        .select(col("doc_id"),
          when(col("first_doc") === col("doc_id"), 1).otherwise(0)
            .as("novel"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_shingles"),
          sum(col("novel")).cast("long").as("n_novel"),
          round(sum(col("novel")) / count(lit(1)).cast("double"), 4)
            .as("novelty"))
        .orderBy(col("doc_id"))
    },

    // Language-ID confusion matrix: text_langid's stopword-vote
    // classifier scored against the labelled lang column — (true,
    // predicted) counts and per-true-language recall, the quality
    // report a corpus pipeline publishes before trusting a heuristic
    // classifier to route documents. One classify pass (pure
    // projection) + one vocab²-bounded hash rollup + a lang-sized
    // marginal join.
    Q("text_lang_confusion",
      """WITH t AS (SELECT lang, string_split(text, ' ') AS toks
        |  FROM documents),
        |s AS (SELECT lang,
        |  len(list_filter(toks, x -> x IN ('the', 'a', 'key', 'row'))) AS s_en,
        |  len(list_filter(toks, x -> x IN ('der', 'und', 'wert', 'tabelle'))) AS s_de,
        |  len(list_filter(toks, x -> x IN ('le', 'et', 'valeur'))) AS s_fr
        |FROM t),
        |p AS (SELECT lang,
        |  CASE WHEN s_en >= s_de AND s_en >= s_fr THEN 'en'
        |       WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS pred_lang
        |FROM s),
        |c AS (SELECT lang, pred_lang, count(*) AS n FROM p GROUP BY 1, 2),
        |m AS (SELECT lang, sum(n) AS tot FROM c GROUP BY 1)
        |SELECT c.lang, c.pred_lang, CAST(c.n AS BIGINT) AS n,
        |  round(c.n / CAST(m.tot AS DOUBLE), 4) AS share_of_true
        |FROM c JOIN m ON m.lang = c.lang
        |ORDER BY c.lang, c.pred_lang""") { (s, d) =>
      val t = Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("s_en",
          expr("size(filter(toks, x -> x IN ('the', 'a', 'key', 'row')))"))
        .withColumn("s_de",
          expr("size(filter(toks, x -> x IN ('der', 'und', 'wert', 'tabelle')))"))
        .withColumn("s_fr",
          expr("size(filter(toks, x -> x IN ('le', 'et', 'valeur')))"))
        .select(col("lang"),
          when(col("s_en") >= col("s_de") && col("s_en") >= col("s_fr"), "en")
            .when(col("s_de") >= col("s_fr"), "de")
            .otherwise("fr").as("pred_lang"))
      val c = t.groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
      val m = c.groupBy(col("lang")).agg(sum(col("n")).as("tot"))
      c.join(m, Seq("lang"))
        .select(col("lang"), col("pred_lang"), col("n").cast("long").as("n"),
          round(col("n") / col("tot").cast("double"), 4).as("share_of_true"))
        .orderBy(col("lang"), col("pred_lang"))
    },

    // Near-duplication rate by provenance source — the rollup a corpus
    // curator actually reads: of each source's documents, how many have
    // at least one banded-LSH candidate partner anywhere in the corpus.
    // Reuses the family's one shingle/signature definition (banded
    // equi-join candidates, never all-pairs); flagged docs are the
    // DISTINCT union of both pair sides (a left_semi join against the
    // candidate relation), so the corpus-scale work stays the band join
    // the 10× table already characterizes.
    Q("dedup_rate_by_source",
      s"""WITH sh AS ($shinglesSql),
         |sv AS (SELECT doc_id, $shingleIntDuck AS v FROM sh),
         |h AS (SELECT doc_id, CAST(r.seed AS INT) AS seed,
         |        min(${mhMixSql("v", "r.seed")}) AS mh
         |      FROM sv, range(0, 8) r(seed)
         |      GROUP BY doc_id, r.seed),
         |bnd AS (SELECT doc_id, CAST(seed // 2 AS INT) AS band,
         |          min(CASE WHEN seed % 2 = 0 THEN mh END) AS m0,
         |          min(CASE WHEN seed % 2 = 1 THEN mh END) AS m1
         |        FROM h GROUP BY doc_id, seed // 2),
         |pr AS (SELECT a.doc_id AS d1, b.doc_id AS d2
         |  FROM bnd a JOIN bnd b ON a.band = b.band
         |    AND a.m0 = b.m0 AND a.m1 = b.m1 AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |fl AS (SELECT DISTINCT d1 AS doc_id FROM pr
         |  UNION SELECT DISTINCT d2 FROM pr)
         |SELECT d.source, CAST(count(*) AS BIGINT) AS docs,
         |  CAST(sum(CASE WHEN fl.doc_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS flagged,
         |  round(sum(CASE WHEN fl.doc_id IS NOT NULL THEN 1 ELSE 0 END)
         |    / CAST(count(*) AS DOUBLE), 4) AS dup_rate
         |FROM documents d LEFT JOIN fl ON fl.doc_id = d.doc_id
         |GROUP BY 1 ORDER BY d.source""") { (s, d) =>
      val bnd = minhashSigs(s, d)
        .groupBy(col("doc_id"), expr("CAST(seed div 2 AS INT)").as("band"))
        .agg(min(when(col("seed") % 2 === 0, col("mh"))).as("m0"),
          min(when(col("seed") % 2 === 1, col("mh"))).as("m1"))
      val pr = bnd.as("a").join(bnd.as("b"),
          col("a.band") === col("b.band") && col("a.m0") === col("b.m0") &&
            col("a.m1") === col("b.m1") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
      val fl = pr.select(col("d1").as("doc_id"))
        .unionByName(pr.select(col("d2").as("doc_id")))
        .distinct()
        .withColumn("flagged1", lit(1))
      Tables.documents(s, d).select(col("doc_id"), col("source"))
        .join(fl, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).cast("long").as("docs"),
          sum(when(col("flagged1").isNotNull, 1).otherwise(0))
            .cast("long").as("flagged"),
          round(sum(when(col("flagged1").isNotNull, 1).otherwise(0))
            / count(lit(1)).cast("double"), 4).as("dup_rate"))
        .orderBy(col("source"))
    },

    // ROUGE-2 overlap scoring on LSH candidate pairs — the summary/
    // paraphrase overlap metric (Lin 2004, distinct-bigram variant)
    // computed ONLY where the banded MinHash join proposes a pair:
    // recall = |∩|/|ref bigrams|, precision = |∩|/|cand bigrams|, and
    // the set-F1 2|∩|/(|A|+|B|). This is the "how much text do these
    // near-dups actually share" report a curator reads after dedup
    // flags pairs; at 100 TB the bigram intersection joins through the
    // candidate pair keys (the dedup_minhash_pairs discipline), never
    // doc×doc.
    Q("text_rouge_pairs",
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
         |  FROM documents),
         |bg AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i + 1] AS b
         |  FROM t, unnest(range(1, len(toks))) u(i)),
         |nb AS (SELECT doc_id, count(*) AS n FROM bg GROUP BY 1),
         |sh AS ($shinglesSql),
         |sv AS (SELECT doc_id, $shingleIntDuck AS v FROM sh),
         |h AS (SELECT doc_id, CAST(r.seed AS INT) AS seed,
         |        min(${mhMixSql("v", "r.seed")}) AS mh
         |      FROM sv, range(0, 8) r(seed)
         |      GROUP BY doc_id, r.seed),
         |bnd AS (SELECT doc_id, CAST(seed // 2 AS INT) AS band,
         |          min(CASE WHEN seed % 2 = 0 THEN mh END) AS m0,
         |          min(CASE WHEN seed % 2 = 1 THEN mh END) AS m1
         |        FROM h GROUP BY doc_id, seed // 2),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM bnd a JOIN bnd b ON a.band = b.band
         |    AND a.m0 = b.m0 AND a.m1 = b.m1 AND a.doc_id < b.doc_id),
         |inter AS (SELECT c.d1, c.d2, count(*) AS ni FROM cand c
         |  JOIN bg a ON a.doc_id = c.d1
         |  JOIN bg b ON b.doc_id = c.d2 AND b.b = a.b
         |  GROUP BY 1, 2)
         |SELECT c.d1, c.d2,
         |  round(coalesce(i.ni, 0) / CAST(n1.n AS DOUBLE), 4) AS rouge2_r,
         |  round(coalesce(i.ni, 0) / CAST(n2.n AS DOUBLE), 4) AS rouge2_p,
         |  round(2.0 * coalesce(i.ni, 0) / (n1.n + n2.n), 4) AS rouge2_f
         |FROM cand c
         |LEFT JOIN inter i ON i.d1 = c.d1 AND i.d2 = c.d2
         |JOIN nb n1 ON n1.doc_id = c.d1
         |JOIN nb n2 ON n2.doc_id = c.d2
         |ORDER BY c.d1, c.d2""") { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val bg = t.select(col("doc_id"), explode(expr(
          """if(size(toks) >= 2,
            |  transform(sequence(1, size(toks) - 1),
            |    i -> concat(element_at(toks, i), ' ',
            |                element_at(toks, i + 1))),
            |  array())""".stripMargin)).as("b"))
        .distinct()
      val nb = bg.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val bnd = minhashSigs(s, d)
        .groupBy(col("doc_id"), expr("CAST(seed div 2 AS INT)").as("band"))
        .agg(min(when(col("seed") % 2 === 0, col("mh"))).as("m0"),
          min(when(col("seed") % 2 === 1, col("mh"))).as("m1"))
      val cand = bnd.as("a").join(bnd.as("b"),
          col("a.band") === col("b.band") && col("a.m0") === col("b.m0") &&
            col("a.m1") === col("b.m1") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
      val inter = cand
        .join(bg.select(col("doc_id").as("d1"), col("b")), Seq("d1"))
        .join(bg.select(col("doc_id").as("d2"), col("b")), Seq("d2", "b"))
        .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("ni"))
      cand
        .join(inter, Seq("d1", "d2"), "left_outer")
        .join(nb.select(col("doc_id").as("d1"), col("n").as("n1")), Seq("d1"))
        .join(nb.select(col("doc_id").as("d2"), col("n").as("n2")), Seq("d2"))
        .select(col("d1"), col("d2"),
          round(coalesce(col("ni"), lit(0)) / col("n1").cast("double"), 4)
            .as("rouge2_r"),
          round(coalesce(col("ni"), lit(0)) / col("n2").cast("double"), 4)
            .as("rouge2_p"),
          round(lit(2.0) * coalesce(col("ni"), lit(0)) /
            (col("n1") + col("n2")), 4).as("rouge2_f"))
        .orderBy(col("d1"), col("d2"))
    },

    // DEDUP BUDGET report — the cost-savings statement a curator
    // attaches to a dedup proposal: under the keep-first policy (a
    // doc is dropped when it is the HIGHER id of any banded-LSH
    // candidate pair — dedup_rate_by_source's flag set restricted to
    // d2), how many docs and how many TOKENS does each source shed?
    // Token counts fuse into the same doc scan (size of the split
    // array — no explode); the flag set joins on doc_id. This is the
    // number that decides whether the dedup pass pays for itself at
    // 100 TB: tokens dropped ≈ training compute saved.
    Q("pipe_dedup_budget",
      s"""WITH sh AS ($shinglesSql),
         |sv AS (SELECT doc_id, $shingleIntDuck AS v FROM sh),
         |h AS (SELECT doc_id, CAST(r.seed AS INT) AS seed,
         |        min(${mhMixSql("v", "r.seed")}) AS mh
         |      FROM sv, range(0, 8) r(seed)
         |      GROUP BY doc_id, r.seed),
         |bnd AS (SELECT doc_id, CAST(seed // 2 AS INT) AS band,
         |          min(CASE WHEN seed % 2 = 0 THEN mh END) AS m0,
         |          min(CASE WHEN seed % 2 = 1 THEN mh END) AS m1
         |        FROM h GROUP BY doc_id, seed // 2),
         |drop_set AS (SELECT DISTINCT b.doc_id
         |  FROM bnd a JOIN bnd b ON a.band = b.band
         |    AND a.m0 = b.m0 AND a.m1 = b.m1 AND a.doc_id < b.doc_id),
         |tok AS (SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
         |  FROM documents)
         |SELECT tok.source, CAST(count(*) AS BIGINT) AS docs,
         |  CAST(sum(CASE WHEN ds.doc_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS docs_dropped,
         |  CAST(sum(nt) AS BIGINT) AS tok_total,
         |  CAST(sum(CASE WHEN ds.doc_id IS NOT NULL THEN nt ELSE 0 END)
         |    AS BIGINT) AS tok_dropped,
         |  round(sum(CASE WHEN ds.doc_id IS NOT NULL THEN nt ELSE 0 END)
         |    / CAST(sum(nt) AS DOUBLE), 4) AS savings
         |FROM tok LEFT JOIN drop_set ds ON ds.doc_id = tok.doc_id
         |GROUP BY 1 ORDER BY tok.source""") { (s, d) =>
      val bnd = minhashSigs(s, d)
        .groupBy(col("doc_id"), expr("CAST(seed div 2 AS INT)").as("band"))
        .agg(min(when(col("seed") % 2 === 0, col("mh"))).as("m0"),
          min(when(col("seed") % 2 === 1, col("mh"))).as("m1"))
      val dropSet = bnd.as("a").join(bnd.as("b"),
          col("a.band") === col("b.band") && col("a.m0") === col("b.m0") &&
            col("a.m1") === col("b.m1") && col("a.doc_id") < col("b.doc_id"))
        .select(col("b.doc_id").as("doc_id")).distinct()
        .withColumn("dropped", lit(1))
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("nt"))
        .join(dropSet, Seq("doc_id"), "left_outer")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("docs"),
          sum(when(col("dropped").isNotNull, 1).otherwise(0)).cast("long")
            .as("docs_dropped"),
          sum(col("nt")).as("tok_total"),
          sum(when(col("dropped").isNotNull, col("nt")).otherwise(0L))
            .as("tok_dropped"),
          round(sum(when(col("dropped").isNotNull, col("nt")).otherwise(0L)) /
            sum(col("nt")).cast("double"), 4).as("savings"))
        .orderBy(col("source"))
    },

    // RELATED-DOCUMENTS TOP-K — per document, the 3 most similar
    // neighbors by EXACT Jaccard, computed only over banded-LSH
    // candidate pairs (the dedup_minhash_pairs machinery re-used as a
    // retrieval surface: "more like this" for corpus exploration and
    // semantic-near-dup triage). Candidates symmetrize, then ONE
    // per-doc window ranks by (exact_j DESC, neighbor id) — exact_j is
    // an exact integer ratio, so the ranking is bit-stable; the window
    // runs over candidate pairs (LSH-bounded), never the corpus².
    Q("text_related_topk",
      s"""WITH sh AS ($shinglesSql),
         |sv AS (SELECT doc_id, $shingleIntDuck AS v FROM sh),
         |h AS (SELECT doc_id, r.seed AS seed,
         |        min(${mhMixSql("v", "r.seed")}) AS mh
         |      FROM sv, range(0, 8) r(seed)
         |      GROUP BY doc_id, r.seed),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |         FROM h a JOIN h b ON a.seed = b.seed AND a.mh = b.mh
         |           AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT c.d1, c.d2, count(*) AS ni
         |          FROM cand c
         |          JOIN sh a ON a.doc_id = c.d1
         |          JOIN sh b ON b.doc_id = c.d2 AND b.sh = a.sh
         |          GROUP BY c.d1, c.d2),
         |sc AS (SELECT c.d1, c.d2,
         |    CAST(coalesce(i.ni, 0) AS DOUBLE)
         |      / (s1.n + s2.n - coalesce(i.ni, 0)) AS j
         |  FROM cand c
         |  JOIN sizes s1 ON s1.doc_id = c.d1
         |  JOIN sizes s2 ON s2.doc_id = c.d2
         |  LEFT JOIN inter i ON i.d1 = c.d1 AND i.d2 = c.d2),
         |sym AS (SELECT d1 AS doc, d2 AS nbr, j FROM sc
         |  UNION ALL SELECT d2, d1, j FROM sc),
         |r AS (SELECT doc, nbr, j,
         |    row_number() OVER (PARTITION BY doc
         |      ORDER BY j DESC, nbr) AS rk
         |  FROM sym)
         |SELECT doc AS doc_id, nbr AS related_id,
         |  round(j, 4) AS jaccard, CAST(rk AS INT) AS rk
         |FROM r WHERE rk <= 3
         |ORDER BY doc_id, rk""") { (s, d) =>
      // LSH candidate pairs are a derive-once artifact (the PPJoin
      // candidate-memo discipline); the exact-Jaccard verify rides the
      // shared ppjoin-ordered doc-level relation — one array_intersect
      // per candidate pair, no triple shingle join at query time.
      val cand = Derived.memo(s, d, "documents", "relatedtopk-cand") {
        val sh = shingles(s, d)
        val h = minhashSigsOf(
          sh.select(col("doc_id"), expr(shingleIntSpark).as("v")))
        h.as("a").join(h.as("b"),
            col("a.seed") === col("b.seed") && col("a.mh") === col("b.mh") &&
              col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
          .distinct()
      }
      val ordered = orderedShingles(s, d)
      val sc = cand
        .join(ordered.select(col("doc_id").as("d1"), col("shs").as("t1"),
          col("n").as("n1")), Seq("d1"))
        .join(ordered.select(col("doc_id").as("d2"), col("shs").as("t2"),
          col("n").as("n2")), Seq("d2"))
        .withColumn("ni", size(array_intersect(col("t1"), col("t2"))))
        .select(col("d1"), col("d2"),
          (col("ni").cast("double") /
            (col("n1") + col("n2") - col("ni"))).as("j"))
      val sym = sc.select(col("d1").as("doc"), col("d2").as("nbr"), col("j"))
        .unionByName(sc.select(col("d2").as("doc"), col("d1").as("nbr"),
          col("j")))
      sym.withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("doc")).orderBy(col("j").desc, col("nbr"))))
        .filter(col("rk") <= 3)
        .select(col("doc").as("doc_id"), col("nbr").as("related_id"),
          round(col("j"), 4).as("jaccard"), col("rk").cast("int").as("rk"))
        .orderBy(col("doc_id"), col("rk"))
    },

    // BLEU-2 PAIR SCORING (Papineni et al. 2002) on banded-LSH
    // candidate pairs — the precision-oriented MT metric twin of
    // text_rouge_pairs (which is recall-oriented and uses DISTINCT
    // bigrams; BLEU needs COUNTED n-grams with per-gram CLIPPING:
    // min(count_cand, count_ref), so a candidate can't farm credit by
    // repeating one matched word). d1 = reference, d2 = candidate.
    // p_n = Σ min(c_cand, c_ref) / Σ c_cand for n = 1, 2; the
    // geometric mean is an exact sqrt; the brevity penalty
    // exp(1 − r/c) quantizes its EXPONENT to 6 decimals before the one
    // libm exp and rounds to 6 after (the agg_mean_families exp
    // discipline) — cross-engine-stable at the output's 4-decimal
    // quantum. Every join keys on (candidate pair, gram) — bounded by
    // candidates × doc length, never corpus².
    Q("text_bleu_pairs",
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
         |  FROM documents),
         |ug AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
         |  GROUP BY 1, 2),
         |bgc AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS b
         |        FROM t, unnest(range(1, len(toks))) u(i))
         |  GROUP BY 1, 2),
         |ln1 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM ug
         |  GROUP BY 1),
         |ln2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM bgc
         |  GROUP BY 1),
         |sh AS ($shinglesSql),
         |sv AS (SELECT doc_id, $shingleIntDuck AS v FROM sh),
         |h AS (SELECT doc_id, CAST(r.seed AS INT) AS seed,
         |        min(${mhMixSql("v", "r.seed")}) AS mh
         |      FROM sv, range(0, 8) r(seed)
         |      GROUP BY doc_id, r.seed),
         |bnd AS (SELECT doc_id, CAST(seed // 2 AS INT) AS band,
         |          min(CASE WHEN seed % 2 = 0 THEN mh END) AS m0,
         |          min(CASE WHEN seed % 2 = 1 THEN mh END) AS m1
         |        FROM h GROUP BY doc_id, seed // 2),
         |cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM bnd a JOIN bnd b ON a.band = b.band
         |    AND a.m0 = b.m0 AND a.m1 = b.m1 AND a.doc_id < b.doc_id),
         |m1 AS (SELECT c.d1, c.d2,
         |    CAST(sum(least(cu.c, coalesce(ru.c, 0))) AS BIGINT) AS m
         |  FROM cand c
         |  JOIN ug cu ON cu.doc_id = c.d2
         |  LEFT JOIN ug ru ON ru.doc_id = c.d1 AND ru.tok = cu.tok
         |  GROUP BY 1, 2),
         |m2 AS (SELECT c.d1, c.d2,
         |    CAST(sum(least(cb.c, coalesce(rb.c, 0))) AS BIGINT) AS m
         |  FROM cand c
         |  JOIN bgc cb ON cb.doc_id = c.d2
         |  LEFT JOIN bgc rb ON rb.doc_id = c.d1 AND rb.b = cb.b
         |  GROUP BY 1, 2)
         |SELECT c.d1, c.d2,
         |  round(m1.m / CAST(l1c.n AS DOUBLE), 4) AS p1,
         |  round(coalesce(m2.m, 0) / CAST(l2c.n AS DOUBLE), 4) AS p2,
         |  round(CASE WHEN l1c.n >= l1r.n THEN 1.0
         |        ELSE round(exp(round(1.0 - l1r.n
         |          / CAST(l1c.n AS DOUBLE), 6)), 6) END
         |    * sqrt((m1.m / CAST(l1c.n AS DOUBLE))
         |         * (coalesce(m2.m, 0) / CAST(l2c.n AS DOUBLE))), 4)
         |    AS bleu2
         |FROM cand c
         |JOIN m1 ON m1.d1 = c.d1 AND m1.d2 = c.d2
         |LEFT JOIN m2 ON m2.d1 = c.d1 AND m2.d2 = c.d2
         |JOIN ln1 l1c ON l1c.doc_id = c.d2
         |JOIN ln1 l1r ON l1r.doc_id = c.d1
         |JOIN ln2 l2c ON l2c.doc_id = c.d2
         |ORDER BY c.d1, c.d2""") { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val ug = t.select(col("doc_id"), explode(col("toks")).as("tok"))
        .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      val bgc = t.select(col("doc_id"), explode(expr(
          """if(size(toks) >= 2,
            |  transform(sequence(1, size(toks) - 1),
            |    i -> concat(element_at(toks, i), ' ',
            |                element_at(toks, i + 1))),
            |  array())""".stripMargin)).as("b"))
        .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
      val ln1 = ug.groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
      val ln2 = bgc.groupBy(col("doc_id")).agg(sum(col("c")).as("n"))
      val bnd = minhashSigs(s, d)
        .groupBy(col("doc_id"), expr("CAST(seed div 2 AS INT)").as("band"))
        .agg(min(when(col("seed") % 2 === 0, col("mh"))).as("m0"),
          min(when(col("seed") % 2 === 1, col("mh"))).as("m1"))
      val cand = bnd.as("a").join(bnd.as("b"),
          col("a.band") === col("b.band") && col("a.m0") === col("b.m0") &&
            col("a.m1") === col("b.m1") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
      def clipped(grams: DataFrame, key: String) = cand
        .join(grams.select(col("doc_id").as("d2"), col(key),
          col("c").as("cc")), Seq("d2"))
        .join(grams.select(col("doc_id").as("d1"), col(key),
          col("c").as("cr")), Seq("d1", key), "left_outer")
        .groupBy(col("d1"), col("d2"))
        .agg(sum(least(col("cc"), coalesce(col("cr"), lit(0L)))).as("m"))
      val mm1 = clipped(ug, "tok")
      val mm2 = clipped(bgc, "b")
      val bp = when(col("n1c") >= col("n1r"), lit(1.0))
        .otherwise(round(exp(round(lit(1.0) - col("n1r")
          / col("n1c").cast("double"), 6)), 6))
      cand
        .join(mm1.select(col("d1"), col("d2"), col("m").as("ma")),
          Seq("d1", "d2"))
        .join(mm2.select(col("d1"), col("d2"), col("m").as("mb")),
          Seq("d1", "d2"), "left_outer")
        .join(ln1.select(col("doc_id").as("d2"), col("n").as("n1c")),
          Seq("d2"))
        .join(ln1.select(col("doc_id").as("d1"), col("n").as("n1r")),
          Seq("d1"))
        .join(ln2.select(col("doc_id").as("d2"), col("n").as("n2c")),
          Seq("d2"))
        .select(col("d1"), col("d2"),
          round(col("ma") / col("n1c").cast("double"), 4).as("p1"),
          round(coalesce(col("mb"), lit(0L)) / col("n2c").cast("double"), 4)
            .as("p2"),
          round(bp * sqrt((col("ma") / col("n1c").cast("double"))
            * (coalesce(col("mb"), lit(0L)) / col("n2c").cast("double"))), 4)
            .as("bleu2"))
        .orderBy(col("d1"), col("d2"))
    },

    // COMPRESSION-RATIO PROXY per source — the "would gzip shrink this
    // a lot?" quality signal production filters use (highly
    // compressible text = repeated boilerplate; cf. the entropy rules
    // in CCNet/Gopher) WITHOUT shelling out to a codec: the proxy is
    // the mean of the distinct-token ratio and the distinct-4-gram
    // ratio (both exact integer ratios per doc — a doc that repeats
    // itself has few distinct n-grams per n-gram). Per-source rollup
    // with the low-diversity census; per-doc ratios quantize to
    // DECIMAL before the order-free mean. One pass over the corpus,
    // |sources| output rows.
    Q("text_compression_ratio",
      """WITH t AS (SELECT doc_id, source,
        |    string_split(text, ' ') AS toks, text FROM documents),
        |m AS (SELECT doc_id, source,
        |    CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS u1,
        |    CAST(len(list_distinct(list_transform(
        |        range(1, greatest(length(text) - 2, 1)),
        |        i -> substring(text, CAST(i AS INT), 4)))) AS DOUBLE)
        |      / greatest(length(text) - 3, 1) AS u4
        |  FROM t),
        |r AS (SELECT doc_id, source,
        |    CAST(round((u1 + u4) / 2, 12) AS DECIMAL(28,12)) AS cr
        |  FROM m)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  round(CAST(sum(cr) AS DOUBLE) / count(*), 4) AS mean_ratio,
        |  CAST(sum(CASE WHEN cr < 0.5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_low_diversity
        |FROM r GROUP BY source ORDER BY source""") { (s, d) =>
      val m = Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"), col("source"),
          (size(array_distinct(col("toks"))).cast("double")
            / size(col("toks"))).as("u1"),
          (expr("""size(array_distinct(transform(
              |  if(length(text) >= 4, sequence(1, length(text) - 3),
              |     array()),
              |  i -> substring(text, i, 4))))""".stripMargin)
              .cast("double")
            / greatest(length(col("text")) - 3, lit(1))).as("u4"))
      m.select(col("source"),
          round((col("u1") + col("u4")) / 2, 12).cast("decimal(28,12)")
            .as("cr"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          round(sum(col("cr")).cast("double") / count(lit(1)), 4)
            .as("mean_ratio"),
          sum(when(col("cr") < 0.5, 1).otherwise(0)).as("n_low_diversity"))
        .select(col("source"), col("n_docs").cast("long").as("n_docs"),
          col("mean_ratio"),
          col("n_low_diversity").cast("long").as("n_low_diversity"))
        .orderBy(col("source"))
    },

    // CROSS-SOURCE VOCABULARY OVERLAP — the pairwise Jaccard matrix of
    // per-source vocabularies, the diagnostic a corpus-mixing pipeline
    // reads before setting pipe_mix_sources weights (two sources with
    // 0.9 vocabulary overlap are near-redundant; a 0.05 outlier is the
    // domain worth upsampling). The pair relation is keyed on the
    // TOKEN (a token in s sources emits C(s,2) pairs — fan-out bounded
    // by the SOURCE count, ≤ C(20,2) = 190 pairs total), never on
    // vocabularies; sizes come from one rollup joined twice — the
    // graph_jaccard shape on the source-token bipartite graph.
    Q("text_source_overlap",
      """WITH v AS (SELECT DISTINCT source AS s,
        |    unnest(string_split(text, ' ')) AS tok FROM documents),
        |sz AS (SELECT s, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
        |iw AS (SELECT a.s AS s1, b.s AS s2, CAST(count(*) AS BIGINT)
        |    AS ni
        |  FROM v a JOIN v b ON a.tok = b.tok AND a.s < b.s
        |  GROUP BY 1, 2)
        |SELECT s1, s2, ni AS n_shared,
        |  round(ni / CAST(z1.n + z2.n - ni AS DOUBLE), 4) AS jaccard
        |FROM iw JOIN sz z1 ON z1.s = s1 JOIN sz z2 ON z2.s = s2
        |ORDER BY s1, s2""") { (s, d) =>
      val v = Tables.documents(s, d)
        .select(col("source").as("s"),
          explode(split(col("text"), " ")).as("tok"))
        .distinct()
      val sz = v.groupBy(col("s")).agg(count(lit(1)).as("n"))
      val iw = v.as("a").join(v.as("b"),
          col("a.tok") === col("b.tok") && col("a.s") < col("b.s"))
        .groupBy(col("a.s").as("s1"), col("b.s").as("s2"))
        .agg(count(lit(1)).as("ni"))
      iw.join(sz.select(col("s").as("s1"), col("n").as("n1")), Seq("s1"))
        .join(sz.select(col("s").as("s2"), col("n").as("n2")), Seq("s2"))
        .select(col("s1"), col("s2"), col("ni").cast("long").as("n_shared"),
          round(col("ni") / (col("n1") + col("n2") - col("ni"))
            .cast("double"), 4).as("jaccard"))
        .orderBy(col("s1"), col("s2"))
    },

    // TOKEN BURSTINESS (Church & Gale 1995, "Poisson mixtures") — the
    // vocabulary diagnostic TF-IDF and Zipf don't give: a token that
    // appears 100 times in 3 documents behaves differently from one
    // that appears once in 100 documents, even at equal corpus
    // frequency. For each token with document frequency ≥ 20: the mean
    // occurrences per CONTAINING doc (T/df) and the variance-to-mean
    // ratio of those per-doc counts (VMR = 1 for Poisson; ≫1 = bursty
    // topic/boilerplate words, the ones content-dedup should weigh
    // down). All moments are exact BIGINTs from one (token, doc)
    // rollup; top-20 by VMR with the token as tiebreak — the window
    // rides the df-filtered VOCABULARY relation, not the corpus.
    Q("text_burstiness",
      """WITH td AS (SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |v AS (SELECT tok, CAST(count(*) AS BIGINT) AS df,
        |    CAST(sum(c) AS BIGINT) AS t,
        |    CAST(sum(c * c) AS BIGINT) AS t2
        |  FROM td GROUP BY 1 HAVING count(*) >= 20),
        |sc AS (SELECT tok, df, t,
        |    round(t / CAST(df AS DOUBLE), 4) AS mean_per_doc,
        |    round(((t2 - t * t / CAST(df AS DOUBLE)) / (df - 1))
        |      / (t / CAST(df AS DOUBLE)), 4) AS vmr
        |  FROM v),
        |rk AS (SELECT *, row_number() OVER (ORDER BY vmr DESC, tok)
        |    AS rn FROM sc)
        |SELECT CAST(rn AS INT) AS rn, tok, df, t AS total,
        |  mean_per_doc, vmr
        |FROM rk WHERE rn <= 20 ORDER BY rn""") { (s, d) =>
      val td = Tables.documents(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy(col("tok"), col("doc_id"))
        .agg(count(lit(1)).as("c"))
      val v = td.groupBy(col("tok"))
        .agg(count(lit(1)).as("df"), sum(col("c")).as("t"),
          sum(col("c") * col("c")).as("t2"))
        .filter(col("df") >= 20)
      val sc = v.select(col("tok"), col("df"), col("t"),
        round(col("t") / col("df").cast("double"), 4).as("mean_per_doc"),
        round(((col("t2") - col("t") * col("t") / col("df").cast("double"))
            / (col("df") - 1))
          / (col("t") / col("df").cast("double")), 4).as("vmr"))
      sc.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("vmr").desc, col("tok"))))
        .filter(col("rn") <= 20)
        .select(col("rn").cast("int").as("rn"), col("tok"),
          col("df").cast("long").as("df"),
          col("t").cast("long").as("total"),
          col("mean_per_doc"), col("vmr"))
        .orderBy(col("rn"))
    },

    // EXACT-SUBSTRING duplication coverage (the ExactSubstr signal of
    // Lee et al. 2022, "Deduplicating Training Data Makes Language
    // Models Better", arXiv:2107.06499, approximated at k-gram
    // granularity): for every document, the fraction of its tokens
    // covered by some word 3-gram that also occurs in ANOTHER
    // document. Where the MinHash family asks "are these documents
    // near-identical?", this asks "how much of this document is
    // boilerplate shared with the rest of the corpus?" — the signal
    // that drives substring-level trimming rather than whole-doc
    // removal. Execution is suffix-array-free: positional k-grams →
    // md5-prefix FINGERPRINTS (the Rabin-Karp move: the shuffle key is
    // 16 hex chars, not raw text — at 100 TB the gram shuffle is the
    // dominant cost and the fingerprint caps its width; a 64-bit
    // collision would count an extra covered gram IDENTICALLY in both
    // engines), cross-doc duplicated fingerprints by one distinct-doc
    // rollup, covered token positions by a bounded 3-offset explode +
    // distinct. Everything is hash shuffles on gram/doc keys — no
    // windows, no sorts, linear in corpus size.
    Q("text_dup_kgram_coverage",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |g AS (SELECT doc_id, i AS pos,
        |    substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]),
        |      1, 16) AS fp
        |  FROM t, unnest(range(1, greatest(len(toks) - 1, 1))) r(i)),
        |dup AS (SELECT fp FROM g GROUP BY fp
        |  HAVING count(DISTINCT doc_id) >= 2),
        |dp AS (SELECT DISTINCT g.doc_id, g.pos
        |  FROM g JOIN dup ON dup.fp = g.fp),
        |cov AS (SELECT doc_id, count(*) AS covered FROM (
        |    SELECT DISTINCT doc_id, pos + o.o AS cp
        |    FROM dp, unnest([0, 1, 2]) o(o)) c
        |  GROUP BY doc_id),
        |nd AS (SELECT doc_id, count(*) AS n_dup_grams FROM dp GROUP BY 1),
        |nt AS (SELECT doc_id, len(toks) AS n_tokens FROM t)
        |SELECT nt.doc_id, CAST(nt.n_tokens AS BIGINT) AS n_tokens,
        |  CAST(coalesce(nd.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
        |  CAST(coalesce(cov.covered, 0) AS BIGINT) AS covered_tokens,
        |  round(coalesce(cov.covered, 0)
        |    / CAST(nt.n_tokens AS DOUBLE), 4) AS coverage_frac
        |FROM nt LEFT JOIN nd ON nd.doc_id = nt.doc_id
        |LEFT JOIN cov ON cov.doc_id = nt.doc_id
        |ORDER BY nt.doc_id""") { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      // sequence is clamped ascending then re-filtered: Spark's
      // sequence(1, 0) would COUNT DOWN, so the guard keeps it one
      // element long and the filter drops the out-of-range gram.
      val g = t.select(col("doc_id"), explode(expr(
          """filter(transform(sequence(1, greatest(size(toks) - 2, 1)),
            |  i -> struct(i AS pos,
            |    substr(md5(concat_ws(' ', toks[i-1], toks[i], toks[i+1])),
            |      1, 16) AS fp)),
            |  x -> x.pos <= size(toks) - 2)""".stripMargin)).as("pg"))
        .select(col("doc_id"), col("pg.pos").as("pos"), col("pg.fp").as("fp"))
      val dup = g.groupBy(col("fp"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2).select(col("fp"))
      val dp = g.join(dup, Seq("fp")).select(col("doc_id"), col("pos"))
        .distinct()
      val cov = dp.select(col("doc_id"),
          explode(expr("array(pos, pos + 1, pos + 2)")).as("cp"))
        .distinct()
        .groupBy(col("doc_id")).agg(count(lit(1)).as("covered"))
      val nd = dp.groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_grams"))
      val nt = t.select(col("doc_id"), size(col("toks")).as("n_tokens"))
      nt.join(nd, Seq("doc_id"), "left_outer")
        .join(cov, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          col("n_tokens").cast("long").as("n_tokens"),
          coalesce(col("n_dup_grams"), lit(0L)).cast("long")
            .as("n_dup_grams"),
          coalesce(col("covered"), lit(0L)).cast("long")
            .as("covered_tokens"),
          round(coalesce(col("covered"), lit(0L)) /
            col("n_tokens").cast("double"), 4).as("coverage_frac"))
        .orderBy(col("doc_id"))
    },

    // RAKE KEYWORD EXTRACTION — Rose et al. 2010's rapid automatic
    // keyword extraction, the data-card staple: candidate phrases are
    // maximal stopword-free token runs (chunked at 4 tokens so no
    // phrase is unbounded — the wedge-cap discipline applied to text
    // runs), each word scores deg/freq over the candidate set (deg =
    // summed lengths of phrases containing it), and a phrase scores
    // the sum of its members' scores. The islands come from the
    // classic gaps-and-islands rank difference PARTITIONED PER DOC
    // (no global window); word stats are two hash aggregates;
    // per-member scores are DECIMAL(18,6)-quantized before the
    // order-free phrase sum; the global top-20 is a distributed
    // TakeOrderedAndProject (sort+limit), never a one-task sort.
    // Identical occurrences of a phrase share one global-stat score,
    // so dedup-by-text with max() is exact.
    Q("text_rake_keywords",
      """WITH t0 AS (SELECT doc_id,
        |    generate_subscripts(string_split(text, ' '), 1) AS pos,
        |    unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |t AS (SELECT doc_id, pos, w,
        |    CASE WHEN w IN ('a', 'the', 'and', 'or', 'of', 'to', 'in',
        |      'is', 'on') THEN 1 ELSE 0 END AS stop
        |  FROM t0 WHERE w <> ''),
        |ns AS (SELECT doc_id, pos, w,
        |    pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
        |      AS grp
        |  FROM t WHERE stop = 0),
        |ph AS (SELECT doc_id, grp,
        |    (row_number() OVER (PARTITION BY doc_id, grp ORDER BY pos)
        |      - 1) // 4 AS chunk,
        |    pos, w
        |  FROM ns),
        |pid AS (SELECT doc_id, grp, chunk,
        |    string_agg(w, ' ' ORDER BY pos) AS phrase,
        |    count(*) AS plen
        |  FROM ph GROUP BY 1, 2, 3),
        |mem AS (SELECT ph.doc_id, ph.grp, ph.chunk, ph.w, pid.phrase,
        |    pid.plen
        |  FROM ph JOIN pid USING (doc_id, grp, chunk)),
        |ws AS (SELECT w, CAST(sum(plen) AS DOUBLE) / count(*) AS wscore
        |  FROM mem GROUP BY 1),
        |psc AS (SELECT m.doc_id, m.grp, m.chunk, m.phrase,
        |    CAST(sum(CAST(round(ws.wscore, 6) AS DECIMAL(18,6)))
        |      AS DOUBLE) AS score
        |  FROM mem m JOIN ws ON ws.w = m.w
        |  GROUP BY 1, 2, 3, 4),
        |agg AS (SELECT phrase, count(*) AS n_occurrences,
        |    max(score) AS score
        |  FROM psc GROUP BY 1)
        |SELECT phrase,
        |  CAST(len(string_split(phrase, ' ')) AS INT) AS n_words,
        |  CAST(n_occurrences AS BIGINT) AS n_occurrences,
        |  round(score, 4) AS score
        |FROM agg ORDER BY score DESC, phrase LIMIT 20""") { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        .filter(col("w") =!= "")
        .withColumn("stop",
          when(col("w").isin("a", "the", "and", "or", "of", "to", "in",
            "is", "on"), 1).otherwise(0))
      val wIsl = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val ns = t.filter(col("stop") === 0)
        .withColumn("grp", col("pos") - row_number().over(wIsl))
      val wRun = Window.partitionBy(col("doc_id"), col("grp"))
        .orderBy(col("pos"))
      val ph = ns.withColumn("chunk",
        ((row_number().over(wRun) - 1) / 4).cast("int"))
      val pid = ph.groupBy(col("doc_id"), col("grp"), col("chunk"))
        .agg(expr("array_join(transform(array_sort(" +
            "collect_list(struct(pos, w))), x -> x.w), ' ')").as("phrase"),
          count(lit(1)).as("plen"))
      // mem feeds the word-score aggregate (keyed w) and the phrase-score
      // join (keyed w then phrase) — two differently-keyed consumers that
      // would each re-run the double-window phrase segmentation.
      val mem = ph.join(pid, Seq("doc_id", "grp", "chunk"))
        .localCheckpoint(true)
      val ws = mem.groupBy(col("w"))
        .agg((sum(col("plen")).cast("double") / count(lit(1)))
          .as("wscore"))
      val psc = mem.join(ws, Seq("w"))
        .groupBy(col("doc_id"), col("grp"), col("chunk"), col("phrase"))
        .agg(sum(round(col("wscore"), 6).cast("decimal(18,6)"))
          .cast("double").as("score"))
      val agg = psc.groupBy(col("phrase"))
        .agg(count(lit(1)).as("n_occurrences"), max(col("score")).as("score"))
      agg.select(col("phrase"),
          size(split(col("phrase"), " ")).cast("int").as("n_words"),
          col("n_occurrences").cast("long").as("n_occurrences"),
          round(col("score"), 4).as("score"))
        .orderBy(col("score").desc, col("phrase"))
        .limit(20)
    },

    // HEAPS'-LAW VOCABULARY GROWTH — V(n) = K·n^β, the companion of
    // text_zipf's frequency law and the capacity-planning curve for
    // tokenizer vocab sizing: how fast does the type inventory grow as
    // the corpus grows? The corpus is cut into 20 equal doc-id ranges
    // (the ingest order proxy; floor(doc_id·20/N) — one IEEE divide,
    // identical in both engines); each token's FIRST bucket is a
    // min-aggregate, so cumulative vocabulary is a running sum of
    // new-type counts over the 20-row bucket grid — never a re-scan
    // per prefix (the naive V(n) costs 20 corpus passes; this costs
    // one). β and ln K fit by explicit least squares on the 20 ln-ln
    // points (spelled-out sums — no engine regr_* convention risk),
    // with per-term 12-dp DECIMAL quantization for order-free
    // addition. Shape at 100 TB: one token explode + two hash
    // aggregates; the windows and the fit live on the 20-row grid.
    Q("text_heaps_law",
      """WITH mx AS (SELECT max(doc_id) + 1 AS n FROM documents),
        |t AS (SELECT CAST(floor(d.doc_id * 20 / mx.n) AS INT) AS b,
        |    unnest(string_split(d.text, ' ')) AS tok
        |  FROM documents d CROSS JOIN mx),
        |bt AS (SELECT b, count(*) AS toks FROM t GROUP BY 1),
        |ft AS (SELECT tok, min(b) AS fb FROM t GROUP BY 1),
        |nt AS (SELECT fb AS b, count(*) AS newtypes FROM ft GROUP BY 1),
        |c AS (SELECT bt.b,
        |    sum(bt.toks) OVER (ORDER BY bt.b) AS cum_tokens,
        |    sum(coalesce(nt.newtypes, 0)) OVER (ORDER BY bt.b) AS cum_vocab
        |  FROM bt LEFT JOIN nt ON nt.b = bt.b),
        |s AS (SELECT count(*) AS m,
        |    CAST(sum(CAST(round(ln(CAST(cum_tokens AS DOUBLE)), 12)
        |      AS DECIMAL(28,12))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(round(ln(CAST(cum_vocab AS DOUBLE)), 12)
        |      AS DECIMAL(28,12))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(round(ln(CAST(cum_tokens AS DOUBLE))
        |        * ln(CAST(cum_tokens AS DOUBLE)), 12)
        |      AS DECIMAL(28,12))) AS DOUBLE) AS sxx,
        |    CAST(sum(CAST(round(ln(CAST(cum_tokens AS DOUBLE))
        |        * ln(CAST(cum_vocab AS DOUBLE)), 12)
        |      AS DECIMAL(28,12))) AS DOUBLE) AS sxy
        |  FROM c)
        |SELECT c.b AS bucket, CAST(cum_tokens AS BIGINT) AS cum_tokens,
        |  CAST(cum_vocab AS BIGINT) AS cum_vocab,
        |  round((s.m * s.sxy - s.sx * s.sy)
        |    / (s.m * s.sxx - s.sx * s.sx), 4) AS heaps_beta,
        |  round(exp((s.sy - ((s.m * s.sxy - s.sx * s.sy)
        |    / (s.m * s.sxx - s.sx * s.sx)) * s.sx) / s.m), 4) AS heaps_k
        |FROM c CROSS JOIN s ORDER BY bucket""") { (s, d) =>
      val docs = Tables.documents(s, d)
      val mx = docs.agg((max(col("doc_id")) + 1).as("n"))
      val t = docs.crossJoin(broadcast(mx))
        .select(floor(col("doc_id") * 20 / col("n")).cast("int").as("b"),
          explode(split(col("text"), " ")).as("tok"))
      val bt = t.groupBy(col("b")).agg(count(lit(1)).as("toks"))
      val nt = t.groupBy(col("tok")).agg(min(col("b")).as("fb"))
        .groupBy(col("fb").as("nb")).agg(count(lit(1)).as("newtypes"))
      val wc = Window.orderBy(col("b"))
      val c = bt.join(nt, col("nb") === col("b"), "left_outer")
        .withColumn("cum_tokens", sum(col("toks")).over(wc))
        .withColumn("cum_vocab",
          sum(coalesce(col("newtypes"), lit(0L))).over(wc))
        .select(col("b"), col("cum_tokens"), col("cum_vocab"))
      val lx = log(col("cum_tokens").cast("double"))
      val ly = log(col("cum_vocab").cast("double"))
      val st = c.agg(count(lit(1)).as("m"),
        sum(round(lx, 12).cast("decimal(28,12)")).cast("double").as("sx"),
        sum(round(ly, 12).cast("decimal(28,12)")).cast("double").as("sy"),
        sum(round(lx * lx, 12).cast("decimal(28,12)")).cast("double")
          .as("sxx"),
        sum(round(lx * ly, 12).cast("decimal(28,12)")).cast("double")
          .as("sxy"))
      val beta = (col("m") * col("sxy") - col("sx") * col("sy")) /
        (col("m") * col("sxx") - col("sx") * col("sx"))
      c.crossJoin(broadcast(st))
        .select(col("b").as("bucket"),
          col("cum_tokens").cast("long").as("cum_tokens"),
          col("cum_vocab").cast("long").as("cum_vocab"),
          round(beta, 4).as("heaps_beta"),
          round(exp((col("sy") - beta * col("sx")) / col("m")), 4)
            .as("heaps_k"))
        .orderBy(col("bucket"))
    },

    // WINNOWING-STYLE FINGERPRINT MATCHING (Schleimer, Wilkerson &
    // Aiken 2003 — MOSS — in the local-minimum selection variant) —
    // the third member of the near-dup triangle next to MinHash
    // (probabilistic set overlap) and PPJoin (exact verified Jaccard):
    // POSITION-ROBUST selected fingerprints, the technique plagiarism
    // and license-scan pipelines use because a selected k-gram
    // survives any edit outside its ±2 neighborhood. Per doc: token
    // trigram hashes (48-bit md5 prefix), a position is SELECTED iff
    // its hash is the strict minimum of the ±2 window (lag/lead only —
    // per-doc partitioned windows, density ~1/5 like MOSS's w = 4-5);
    // matching is the family's capped hash join (hot cap 64) gated at
    // ≥5 shared AND ≥0.8 containment of the smaller fingerprint set —
    // on this corpus true near-dups sit at containment 1.0 and chance
    // pairs never clear the gate. Fingerprint volume is n/5 per doc:
    // the match join carries ~1/5 of dedup_exact's key volume.
    Q("text_winnowing",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |g AS (SELECT doc_id, CAST(i AS INT) AS pos,
        |    ('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' '
        |      || toks[i+2]), 1, 12))::BIGINT AS h
        |  FROM t, unnest(range(1, greatest(len(toks) - 1, 1))) u(i)
        |  WHERE len(toks) >= 3),
        |w AS (SELECT doc_id, pos, h,
        |    coalesce(lag(h, 1) OVER win, 9223372036854775807) AS l1,
        |    coalesce(lag(h, 2) OVER win, 9223372036854775807) AS l2,
        |    coalesce(lead(h, 1) OVER win, 9223372036854775807) AS r1,
        |    coalesce(lead(h, 2) OVER win, 9223372036854775807) AS r2
        |  FROM g WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
        |fp AS (SELECT DISTINCT doc_id, h FROM w
        |  WHERE h < l1 AND h < l2 AND h < r1 AND h < r2),
        |cnt AS (SELECT doc_id, count(*) AS nf FROM fp GROUP BY 1),
        |hot AS (SELECT h FROM fp GROUP BY 1 HAVING count(*) <= 64),
        |fpk AS (SELECT fp.doc_id, fp.h FROM fp JOIN hot USING (h)),
        |pairs AS (SELECT a.doc_id AS u, b.doc_id AS v,
        |    CAST(count(*) AS BIGINT) AS shared
        |  FROM fpk a JOIN fpk b ON a.h = b.h AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT p.u, p.v, p.shared,
        |  round(p.shared / CAST(least(cu.nf, cv.nf) AS DOUBLE), 4)
        |    AS containment
        |FROM pairs p JOIN cnt cu ON cu.doc_id = p.u
        |JOIN cnt cv ON cv.doc_id = p.v
        |WHERE p.shared / CAST(least(cu.nf, cv.nf) AS DOUBLE) >= 0.8
        |ORDER BY p.u, p.v""") { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
      val g = t.select(col("doc_id"),
          explode(expr("sequence(1, greatest(size(toks) - 2, 1))"))
            .as("pos"), col("toks"))
        .select(col("doc_id"), col("pos").cast("int").as("pos"),
          expr("""CAST(conv(substr(md5(concat(toks[pos - 1], ' ',
            |  toks[pos], ' ', toks[pos + 1])), 1, 12), 16, 10)
            |  AS BIGINT)""".stripMargin).as("h"))
      val win = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val big = lit(Long.MaxValue)
      val fp = g
        .withColumn("l1", coalesce(lag(col("h"), 1).over(win), big))
        .withColumn("l2", coalesce(lag(col("h"), 2).over(win), big))
        .withColumn("r1", coalesce(lead(col("h"), 1).over(win), big))
        .withColumn("r2", coalesce(lead(col("h"), 2).over(win), big))
        .filter(col("h") < col("l1") && col("h") < col("l2") &&
          col("h") < col("r1") && col("h") < col("r2"))
        .select(col("doc_id"), col("h")).distinct()
        // Selected fingerprints feed THREE differently-keyed consumers
        // (per-doc counts, hot-hash cut, the pair join) — without
        // materialization the trigram-hash window pass re-runs for each
        // (guide §2.4). The winnowed set is a small fraction of the
        // trigram stream: checkpoint it once.
        .localCheckpoint(true)
      val cnt = fp.groupBy(col("doc_id")).agg(count(lit(1)).as("nf"))
      val hot = fp.groupBy(col("h")).agg(count(lit(1)).as("c"))
        .filter(col("c") <= 64).select(col("h"))
      val fpk = fp.join(hot, Seq("h"), "left_semi")
      val pairs = fpk.as("a")
        .join(fpk.select(col("h").as("hb"), col("doc_id").as("v")),
          col("hb") === col("a.h") && col("v") > col("a.doc_id"))
        .groupBy(col("a.doc_id").as("u"), col("v"))
        .agg(count(lit(1)).cast("long").as("shared"))
        .filter(col("shared") >= 5)
      val contain = col("shared") /
        least(col("nfu"), col("nfv")).cast("double")
      pairs
        .join(cnt.select(col("doc_id").as("u"), col("nf").as("nfu")),
          Seq("u"))
        .join(cnt.select(col("doc_id").as("v"), col("nf").as("nfv")),
          Seq("v"))
        .filter(contain >= 0.8)
        .select(col("u"), col("v"), col("shared"),
          round(contain, 4).as("containment"))
        .orderBy(col("u"), col("v"))
    },

    // CHARACTER-CLASS CENSUS per language — the script-mix profile a
    // multilingual corpus pipeline gates on before tokenizer training
    // (a "lang=en" shard that is 40% digits or 30% non-letter symbols
    // is a extraction bug, not English). Four disjoint ASCII classes
    // via count-by-deletion: length(text) − length(regexp_replace) is
    // exact integer arithmetic, and the classes use literal character
    // sets that mean the same thing to RE2 (DuckDB) and Java regex
    // (Spark). One scan, one rollup; ratios derive from exact BIGINT
    // sums — nothing here can diverge across engines or partitionings.
    Q("text_unicode_census",
      """WITH per AS (SELECT lang, length(text) AS n,
        |    length(text) - length(regexp_replace(text, '[a-z]', '', 'g'))
        |      AS letters,
        |    length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
        |      AS digits,
        |    length(text) - length(regexp_replace(text, ' ', '', 'g'))
        |      AS spaces
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n) AS BIGINT) AS n_chars,
        |  round(sum(n) / CAST(count(*) AS DOUBLE), 4) AS avg_chars,
        |  round(sum(letters) / CAST(sum(n) AS DOUBLE), 4) AS letter_ratio,
        |  round(sum(digits) / CAST(sum(n) AS DOUBLE), 4) AS digit_ratio,
        |  round(sum(spaces) / CAST(sum(n) AS DOUBLE), 4) AS space_ratio,
        |  round((sum(n) - sum(letters) - sum(digits) - sum(spaces))
        |    / CAST(sum(n) AS DOUBLE), 4) AS other_ratio
        |FROM per GROUP BY lang ORDER BY lang""") { (s, d) =>
      val per = Tables.documents(s, d).select(col("lang"),
        length(col("text")).as("n"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[a-z]", ""))).as("letters"),
        (length(col("text")) -
          length(regexp_replace(col("text"), "[0-9]", ""))).as("digits"),
        (length(col("text")) -
          length(regexp_replace(col("text"), " ", ""))).as("spaces"))
      per.groupBy(col("lang"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("n")).cast("long").as("n_chars"),
          round(sum(col("n")) / count(lit(1)).cast("double"), 4)
            .as("avg_chars"),
          round(sum(col("letters")) / sum(col("n")).cast("double"), 4)
            .as("letter_ratio"),
          round(sum(col("digits")) / sum(col("n")).cast("double"), 4)
            .as("digit_ratio"),
          round(sum(col("spaces")) / sum(col("n")).cast("double"), 4)
            .as("space_ratio"),
          round((sum(col("n")) - sum(col("letters")) - sum(col("digits"))
            - sum(col("spaces"))) / sum(col("n")).cast("double"), 4)
            .as("other_ratio"))
        .orderBy(col("lang"))
    },

    // LEXICAL-RICHNESS INDICES — Yule's K, Simpson's D, Herdan's C —
    // the corpus-level vocabulary-concentration scorecard next to
    // text_heaps_law/text_zipf: K = 10⁴·(Σf² − N)/N² and D =
    // Σf(f−1)/(N(N−1)) are repeat-rate measures (higher = fewer types
    // dominate; robust to corpus size, unlike raw TTR), C = lnV/lnN is
    // the Heaps-slope point estimate. Everything is integer sums over
    // the one term-frequency rollup — exact at any partitioning, one
    // token-explode shuffle bounded by vocabulary.
    Q("text_yule_k",
      """WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tc AS (SELECT term, CAST(count(*) AS BIGINT) AS f
        |  FROM tok GROUP BY 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS v,
        |    CAST(sum(f) AS BIGINT) AS n,
        |    CAST(sum(f * f) AS BIGINT) AS sf2,
        |    CAST(sum(f * (f - 1)) AS BIGINT) AS sff
        |  FROM tc)
        |SELECT n AS n_tokens, v AS vocab,
        |  round(10000.0 * (sf2 - n) / (CAST(n AS DOUBLE) * n), 4)
        |    AS yule_k,
        |  round(sff / (CAST(n AS DOUBLE) * (n - 1)), 4) AS simpson_d,
        |  round(ln(CAST(v AS DOUBLE)) / ln(CAST(n AS DOUBLE)), 4)
        |    AS herdan_c
        |FROM s""") { (s, d) =>
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("f"))
        .agg(count(lit(1)).cast("long").as("v"),
          sum(col("f")).cast("long").as("n"),
          sum(col("f") * col("f")).cast("long").as("sf2"),
          sum(col("f") * (col("f") - 1)).cast("long").as("sff"))
        .select(col("n").as("n_tokens"), col("v").as("vocab"),
          round(lit(10000.0) * (col("sf2") - col("n")) /
            (col("n").cast("double") * col("n")), 4).as("yule_k"),
          round(col("sff") / (col("n").cast("double") * (col("n") - 1)), 4)
            .as("simpson_d"),
          round(log(col("v").cast("double")) / log(col("n").cast("double")),
            4).as("herdan_c"))
    },

    // JELINEK-MERCER INTERPOLATED bigram LM perplexity per language —
    // the third smoothing family next to text_bigram_ppl's add-one and
    // text_kn_bigram's Kneser-Ney: p̂(w2|w1) = λ·c(w1w2)/c(w1) +
    // (1−λ)·c(w2)/N with λ = 0.75 (JM's fixed-weight form — the
    // production default when there's no held-out set to tune
    // discounts on). Same tokenize-once bigram rollups; the mixture
    // means an UNSEEN bigram still scores through its unigram mass,
    // so no add-one distortion of frequent events. Per-bigram NLL
    // terms DECIMAL-quantized; per-language rollup.
    Q("text_lm_interp_ppl",
      """WITH t AS (SELECT lang, string_split(text, ' ') AS toks
        |  FROM documents),
        |bg AS (SELECT lang, toks[i] AS w1, toks[i + 1] AS w2
        |  FROM t, unnest(range(1, len(toks))) u(i)),
        |cb AS (SELECT lang, w1, w2, count(*) AS cab FROM bg GROUP BY 1,2,3),
        |cu AS (SELECT lang, w, count(*) AS ca FROM
        |  (SELECT lang, unnest(toks) AS w FROM t) GROUP BY 1, 2),
        |nn AS (SELECT lang, CAST(sum(ca) AS BIGINT) AS n FROM cu GROUP BY 1),
        |sc AS (SELECT cb.lang, cb.cab,
        |    CAST(cb.cab * -ln(0.75 * (cb.cab / CAST(c1.ca AS DOUBLE))
        |      + 0.25 * (c2.ca / CAST(nn.n AS DOUBLE)))
        |      AS DECIMAL(28,12)) AS nll
        |  FROM cb
        |  JOIN cu c1 ON c1.lang = cb.lang AND c1.w = cb.w1
        |  JOIN cu c2 ON c2.lang = cb.lang AND c2.w = cb.w2
        |  JOIN nn ON nn.lang = cb.lang),
        |agg AS (SELECT lang, CAST(sum(cab) AS BIGINT) AS n_bigrams,
        |    CAST(floor(CAST(sum(nll) AS DOUBLE) / sum(cab) * 10000 + 0.5)
        |      / 10000.0 AS DOUBLE) AS avg_nll
        |  FROM sc GROUP BY 1)
        |SELECT lang, n_bigrams, avg_nll,
        |  CAST(floor(exp(avg_nll) * 10000 + 0.5) / 10000.0 AS DOUBLE)
        |    AS ppl
        |FROM agg ORDER BY lang""") { (s, d) =>
      val t = Tables.documents(s, d)
        .select(col("lang"), split(col("text"), " ").as("toks"))
      val bg = t.select(col("lang"), explode(expr(
          """transform(if(size(toks) >= 2, sequence(1, size(toks) - 1),
            |  array()), i -> named_struct('w1', element_at(toks, i),
            |  'w2', element_at(toks, i + 1)))""".stripMargin)).as("b"))
        .select(col("lang"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      val cb = bg.groupBy(col("lang"), col("w1"), col("w2"))
        .agg(count(lit(1)).as("cab"))
      val cu = t.select(col("lang"), explode(col("toks")).as("w"))
        .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("ca"))
      val nn = cu.groupBy(col("lang")).agg(sum(col("ca")).cast("long")
        .as("n"))
      cb
        .join(cu.select(col("lang"), col("w").as("w1"),
          col("ca").as("ca1")), Seq("lang", "w1"))
        .join(cu.select(col("lang"), col("w").as("w2"),
          col("ca").as("ca2")), Seq("lang", "w2"))
        .join(nn, Seq("lang"))
        .withColumn("nll", expr(
          """CAST(cab * -ln(0.75 * (cab / CAST(ca1 AS DOUBLE))
            |  + 0.25 * (ca2 / CAST(n AS DOUBLE))) AS DECIMAL(28,12))"""
            .stripMargin))
        .groupBy(col("lang"))
        .agg(sum(col("cab")).cast("long").as("n_bigrams"),
          expr("""CAST(floor(CAST(sum(nll) AS DOUBLE) / sum(cab)
            |  * 10000 + 0.5) / 10000.0 AS DOUBLE)""".stripMargin)
            .as("avg_nll"))
        .select(col("lang"), col("n_bigrams"), col("avg_nll"),
          expr("CAST(floor(exp(avg_nll) * 10000 + 0.5) / 10000.0 AS DOUBLE)")
            .as("ppl"))
        .orderBy(col("lang"))
    })
}
