package graft.tools

import graft.GraftSession
import org.apache.spark.sql.SparkSession

/** Standalone soak timing — the two live-HTTP halves Bench embeds,
  * runnable on their own to adjudicate an eps dip in the full artifact
  * (a soak that runs LAST in a 16-minute bench inherits that run's
  * heap/GC pressure; this isolates the pipeline's own ceiling).
  *
  *   runMain graft.tools.SoakBench [events] [services]
  */
object SoakBench {
  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toInt).getOrElse(100000)
    val nServices = args.drop(1).headOption.map(_.toInt).getOrElse(50000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = LiveSoak.runEvents(spark, nEvents)
    println(s"events: landed=${ev.landed}/${ev.offered} secs=${ev.secs} " +
      s"eps=${ev.eps} sustained_eps=${ev.sustainedEps} " +
      s"ramp=[n=${ev.firstN} secs=${ev.firstSecs}]")
    if (nServices > 0) {
      val sv = LiveSoak.runServices(spark, nServices)
      println(s"services: landed=${sv.landed}/${sv.offered} secs=${sv.secs} " +
        s"eps=${sv.eps} sustained_eps=${sv.sustainedEps} " +
        s"ramp=[n=${sv.firstN} secs=${sv.firstSecs}]")
    }
    spark.stop()
  }
}
