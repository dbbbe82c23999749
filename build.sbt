ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "nanovectordbspark"
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
// Forked run output goes straight to our stdout — sbt's logger would prefix
// every line with "[info] ", which breaks the driver's BENCH JSON parser.
Compile / run / outputStrategy := Some(StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // a ~30-query sweep generates hundreds of codegen classes; the default
  // 240m JIT code cache fills mid-run, compilation stops, and whatever
  // query runs next goes interpreted (measured 10-18x inflation late in
  // the bench). Room + flushing keeps the JIT alive for the whole sweep.
  // r11: 512m -> 1g headroom after one full BenchScale showed a mid-run
  // inflation transient (lsh probes=8 2.8 s -> 13.4 s in-run, 2.8 s in a
  // fresh JVM); a same-code re-run under 1g was clean end-to-end, though
  // mid-run jcmd occupancy (~134 MB) never approached either limit, so
  // the transient is recorded, not definitively attributed (COVERAGE.md
  // bench ledger).
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
  // MLlib's netlib picks its SIMD VectorBLAS implementation only when the
  // incubating Vector API module is present; without it every KMeans
  // distance computation in IVF/PQ/OPQ training falls back to scalar F2J
  // (the 1M-vector IVF build spent ~230 s of 337 s in training that way).
  "--add-modules=jdk.incubator.vector",
)
