package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Degenerate-input regression tests for the text operators: documents
  * with 0-2 tokens (or <4 chars) must yield EMPTY shingle / bigram /
  * 4-gram sets, not a descending sequence(1, 0) = [1, 0] that indexes
  * toks[-1] (an INVALID_ARRAY_INDEX under ANSI mode) or fabricates a
  * bogus short gram the DuckDB oracle doesn't emit. */
class TextQueriesSpec extends SparkSpec {
  import spark.implicits._

  // A documents table full of degenerate rows (every fixture doc is long,
  // which is exactly why these paths were unexercised).
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("shortdocs").toString
    Seq(
      (1L, "a", "en", "short", 1L),
      (2L, "a b", "en", "short", 3L),
      (3L, "ab", "en", "short", 2L),
      (4L, "the of and x", "en", "short", 12L),
      (5L, "abcd", "en", "short", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("shingle pipeline yields no shingles for docs with <3 tokens") {
    val sig = run("dedup_minhash_sig").collect()
    // only doc 4 has >=3 tokens → 8 signature rows for it, none for 1/2/3/5
    assert(sig.map(_.getLong(0)).distinct.toSeq == Seq(4L))
    assert(sig.length == 8)
  }

  test("bigram count is 0 for single-token docs (no toks[-1] access)") {
    val rows = run("text_ngrams").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(rows(1L) == ((0, 0)))   // one token: zero bigrams both ways
    assert(rows(2L) == ((1, 1)))
    assert(rows(4L) == ((3, 3)))
  }

  test("char 4-grams are empty for texts shorter than 4 chars") {
    // dedup_ngram_jaccard explodes 4-grams for doc_id < 60; docs 1/2/3
    // (len 1/3/2) must contribute no grams, so no pair involves them
    // except via genuinely shared 4-grams (none here).
    val pairs = run("dedup_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.forall { case (a, b) => a >= 4L && b >= 4L })
  }

  test("text_pmi_bigrams survives 1-token docs (guarded positional transform)") {
    // Doc 1 is the single token "a": the unguarded form would evaluate
    // sequence(1, 0) = [1, 0] and throw INVALID_ARRAY_INDEX on toks[0].
    // No bigram reaches cnt >= 5 in this fixture, so the result is empty —
    // the point is that it RUNS.
    assert(run("text_pmi_bigrams").collect().length == 0)
  }

  test("text_bpe_apply: hand-computed encode over a tiny ranked merge table") {
    // vf: a:2 b:1 ab:1 the:1 of:1 and:1 x:1 abcd:1 → weighted char pairs:
    // ab:2 (from "ab" + "abcd"), an/bc/cd/he/nd/of/th: 1 each. Ranked
    // (cnt desc, pair asc): ab, an, bc, cd, he, nd, of, th. Applying in
    // that order: "ab"→[ab]; "abcd"→[ab,cd]; "the"→[t,he] (he outranks
    // th, which then finds no single 'h'); "of"→[of]; "and"→[an,d].
    val rows = run("text_bpe_apply").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows(1L) == ((1L, 1L, 1L)))  // "a"
    assert(rows(2L) == ((2L, 2L, 2L)))  // "a b"
    assert(rows(3L) == ((1L, 1L, 2L)))  // "ab" → [ab]
    assert(rows(4L) == ((4L, 6L, 9L)))  // "the of and x" → [t,he][of][an,d][x]
    assert(rows(5L) == ((1L, 2L, 4L)))  // "abcd" → [ab,cd]
  }

  test("banded LSH candidates are a SUBSET of single-row-band candidates " +
    "(the S-curve precision law)") {
    // A b=4 x r=2 band matches only when BOTH of its rows match, so any
    // banded candidate pair also agrees on >=2 single-row bands — the
    // structural guarantee behind "banding cuts junk candidates, never
    // adds them". Checked on the real sf0.001 corpus.
    val d = "/root/testdata/sf0.001"
    def pairs(q: String): Set[(Long, Long)] =
      SparkEntry.queries(q)(spark, d)
        .select("d1", "d2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = pairs("dedup_minhash_banded")
    val single = pairs("dedup_minhash_pairs")
    assert(banded.subsetOf(single),
      s"banded pairs not a subset: ${(banded -- single).take(5)}")
    assert(banded.size <= single.size)
  }

  test("text_boilerplate: the planted header is always stripped, unique " +
    "segments always survive, removal fraction accounts exactly") {
    // 10 docs of 20 unique tokens each: with the injected 10-token
    // header every doc is 3 segments (header + 2 unique); threshold
    // max(2, ceil(0.2*10)) = 2 removes exactly the header everywhere.
    val d = java.nio.file.Files.createTempDirectory("boiler").toString
    (0L until 10L).map(i =>
        (i, (0 until 20).map(j => s"u${i}_$j").mkString(" "), "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = SparkEntry.queries("text_boilerplate")(spark, d).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_seg") == 3L)
      assert(r.getAs[Long]("n_kept") == 2L)
      // 10 of 30 tokens removed
      assert(r.getAs[Double]("pct_removed") == 0.3333)
    }
    // clean hashes stay distinct across docs (unique segments survive)
    assert(rows.map(_.getAs[String]("clean_hash")).distinct.length == 10)
  }
}
