package graft.queries

import graft.SparkSpec

import java.sql.Timestamp

/** Laws for the round-13 audio-fingerprint and S-H-ESD operators:
  *
  *  - mm_audio_fingerprint: an identical-payload pair must match with
  *    exactly the anchor's full landmark-hash inventory (replayed in
  *    plain JVM arithmetic), and an unrelated payload must not match
  *    either of them; the sf0.001 corpus must show the claimed
  *    chance-band separation (every emitted pair ≥ 18 shared hashes —
  *    the floor — while the planted-unrelated control sits ≤ 15).
  *  - ts_shesd: a flat series with a planted 20× spike and a planted
  *    masked 4× spike flags BOTH — the big one in round 1, the masked
  *    one in a later round — and flags nothing else. A single-pass
  *    z-test (ts_zscore's shape) would have lost the second spike in
  *    the σ the first one inflated; catching it in round ≥ 2 is the
  *    ESD re-estimation working.
  */
class Round13eOpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  test("mm_audio_fingerprint: identical payloads share the full landmark inventory; unrelated ones match nobody") {
    val d = tmp("afp")
    // 512 chars = 16 windows of 32 → 15+14+13 = 42 landmarks (pre-dedup).
    val base = (0 until 512)
      .map(i => ('a' + (i * i + 3 * i) % 26).toChar).mkString
    val other = (0 until 512)
      .map(i => ('a' + (i * i + 7 * i + 5) % 26).toChar).mkString
    Seq((1L, base, "en", "t", 0L), (2L, base, "en", "t", 0L),
      (3L, other, "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    // JVM replay of the landmark inventory of `base`.
    val wins = base.length / 32
    val fr = (0 until wins).map { w =>
      base.substring(w * 32, math.min(w * 32 + 32, base.length))
        .map(_.toInt.toLong).sum % 1021
    }
    val hashes = (for {
      i <- 0 until wins; dt <- 1 to 3 if i + dt < wins
    } yield fr(i) * 4084 + fr(i + dt) * 4 + dt).toSet
    assert(hashes.size >= 18, "fixture must clear the match floor")
    val out = graft.SparkEntry.queries("mm_audio_fingerprint")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L, hashes.size.toLong)),
      s"got ${out.toSeq}, want the (1,2) pair with ${hashes.size} hashes")
  }

  test("mm_audio_fingerprint: sf0.001 emissions all clear the floor (the chance band stays below)") {
    val rows = graft.SparkEntry.queries("mm_audio_fingerprint")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty, "the corpus' planted near-dups must match")
    assert(rows.forall(_.getLong(2) >= 18))
  }

  test("ts_shesd: the masked second spike surfaces in a later round") {
    val d = tmp("shesd")
    // 35 flat days of 10 events, day 15 spikes to 200 (the σ bomb),
    // day 24 to 40 (masked: visible only after round 1 removes day 15;
    // a different weekday than 15, so the median seasonal stays clean).
    var id = 0L
    val rows = (1 to 35).flatMap { dom =>
      val n = dom match { case 15 => 200; case 24 => 40; case _ => 10 }
      val mon = if (dom <= 31) (1, dom) else (2, dom - 31)
      (1 to n).map { _ =>
        id += 1
        (id, Timestamp.valueOf(f"2024-${mon._1}%02d-${mon._2}%02d 12:00:00"),
          id % 97, "view", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val out = graft.SparkEntry.queries("ts_shesd")(spark, d)
      .collect().map(r => (r.getString(1), r.getInt(5))).toMap
    assert(out == Map("2024-01-15" -> 1, "2024-01-24" -> 2),
      s"exactly the two planted spikes, big one first: $out")
  }
}
