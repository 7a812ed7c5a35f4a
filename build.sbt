ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flinkexamplesspark"
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
// The driver parses the bench's one-line JSON out of the forked run's
// stdout tail; sbt's default logger decorates every forked-stdout line
// with "[info] ", which has broken that parse in all 13 rounds
// (BENCH_r01-r13 parsed:null). Pass forked output through raw.
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
// 8g forced GC pauses into the timed regions late in a full 60+-query
// bench sweep (measured: the q01–q29 prefix ran 23s under 8g vs 13s
// fresh); 24g keeps the whole sweep out of old-gen pressure while
// staying under the 32g compressed-oops ceiling.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // a 124-query sweep compiles ~400 whole-stage-codegen classes; the
  // 240m default code cache starts evicting near the (alphabetical)
  // tail, deoptimizing late queries' hot loops (q30-q70 measured
  // 1.3-1.7x slower in a full sweep than in isolation). Round 8: at
  // 145 queries the SAME cliff reappeared past 512m (q41 0.96 s
  // isolated vs 4.63 s in-sweep; 1g restores 0.59 s and takes the
  // sweep 119 -> 94 s) — the cache must scale with the query count,
  // so keep headroom when adding query families. Round 10 (147
  // queries): the in-sweep media cluster read 1.5-2.3x vs isolated
  // (adjudicated weather, BENCHDRIFT round 10 pre-close) — the
  // known early symptom — so the headroom grows with the two new
  // queries. Round 11 MEASURED occupancy through a full 147x3
  // sweep (jcmd sampling, BENCHDRIFT round 11): peak 139 MB of the
  // 1280 MB reserve, full_count=0 — at this size the cache is no
  // longer the binding constraint and in-sweep flags are box
  // weather; keep 1280m (costs address space only) and re-measure
  // if the query count grows past ~200. NOTE: sbt forks through an
  // @argfile, so verify this flag with `jcmd <pid> VM.flags`, not
  // /proc cmdline.
  "-XX:ReservedCodeCacheSize=1280m",
) ++ sys.env.get("SPARK_EXTRA_JAVA_OPTS").toSeq.flatMap(_.split("\\s+").toSeq)
