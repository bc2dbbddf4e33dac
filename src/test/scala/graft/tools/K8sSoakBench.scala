package graft.tools

/** CLI wrapper over [[LiveSoak]] (the harness moved to library scope so
  * [[graft.Bench]] records `live_eps`/`service_eps` machine-readably
  * every round; this entry point keeps the historical invocation):
  *
  *   sbt "Test/runMain graft.tools.K8sSoakBench [totalEvents] [service]"
  *
  * Prints one JSON line: {"metric":"k8s_live_soak_eps",...} (or
  * k8s_service_soak_eps with the `service` arg). Recorded in
  * COVERAGE.md next to the file-replay throughput row.
  */
object K8sSoakBench {
  def main(args: Array[String]): Unit = {
    val total = args.headOption.map(_.toInt).getOrElse(200000)
    val serviceHalf = args.drop(1).headOption.contains("service")
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val r =
      if (serviceHalf) LiveSoak.runServices(spark, total)
      else LiveSoak.runEvents(spark, total)
    val metric =
      if (serviceHalf) "k8s_service_soak_eps" else "k8s_live_soak_eps"
    println(s"""{"metric":"$metric","value":${r.eps},""" +
      s""""unit":"events/sec","events":${r.landed},""" +
      s""""offered":${r.offered},"secs":${math.round(r.secs * 10) / 10.0},""" +
      s""""heartbeats":${r.heartbeats}}""")
    spark.stop()
  }
}
