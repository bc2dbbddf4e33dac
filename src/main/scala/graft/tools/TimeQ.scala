package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Repeat-timing harness for individual queries:
  *   runMain graft.tools.TimeQ <sfDir> <reps> <query> [query ...]
  * Prints per-rep wall seconds — separates genuine cost from first-run
  * JIT/IO warm-up that Bench's single pass can't distinguish.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      var rows = -1L
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        rows = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        // Same per-query block release as Bench: reps must not compound
        // the previous rep's pinned caches/checkpoints/memory-sink views.
        try spark.catalog.clearCache() catch { case _: Throwable => () }
        try spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        catch { case _: Throwable => () }
        try spark.catalog.listTables().collect()
          .filter(t => t.isTemporary && t.name.startsWith("st_"))
          .foreach(t => spark.catalog.dropTempView(t.name))
        catch { case _: Throwable => () }
        dt
      }
      println(f"$name%-24s ${times.map(t => f"$t%.2f").mkString(" ")}  rows=$rows")
    }
    spark.stop()
  }
}
