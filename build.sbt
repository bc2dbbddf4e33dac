ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "k8streamspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked program's stdout/stderr through unchanged instead of
// routing them through sbt's logger. The logger prefixes every line with
// "[info] "/"[error] ", so the one-line JSON contract of graft.Bench /
// graft.Verify reached the driver as `[info] {"metric":...}` — a line
// that is not valid JSON on its own. Every BENCH_r*.json artifact
// (r01-r15) shows parsed:null for exactly this reason. With
// StdoutOutput the JSON line is emitted verbatim.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 8g measured optimal: a 24g ceiling let the heap balloon across the
  // 156-query sweep and the first-touch page faulting in this microVM
  // more than doubled the wall time (183 s vs 87 s back-to-back at the
  // same host load); the tight ceiling keeps the working set hot and the
  // GC short.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
