ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "parquetexportspark"
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
// r21 (VERDICT_r20 Next #2): the driver snapshots only the last ~2 kB of
// `sbt "runMain graft.Bench"` stdout and JSON-parses it; with sbt's default
// LoggedOutput every forked line gets an "[info] " prefix and a
// "[success] Total time: ..." line trails the run, so the parse failed
// every round (BENCH_r*.json "parsed": null). StdoutOutput inherits the
// forked process's stdout/stderr directly (no prefixes, Spark's stderr
// logs stay on stderr) and showSuccess drops the trailing [success] line,
// so Bench's compact JSON really is the last stdout line.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command loop, not by another setting —
// the lintUnused warning is a false positive and its 6 [warn] lines land
// in the same stdout tail the driver parses
Global / excludeLintKeys += showSuccess
// r21 (VERDICT_r20 Next #3): the full suite outgrew the driver's
// verification window (1h40m at the r20 HEAD). Tests tagged graft.Slow —
// the scale curves and forced-×N-path nets whose value is per-release, not
// per-commit — are excluded from plain `sbt test` and run via
// SPARK_GRAFT_SLOW=1 (documented in OPTIMIZATION_r21.md; they were run
// green this round before tagging).
Test / testOptions ++= {
  if (sys.env.get("SPARK_GRAFT_SLOW").contains("1")) Seq.empty
  else Seq(Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.Slow"))
}
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
  // JVM-default zone pinned too: JDBC drivers and Timestamp.valueOf
  // interpret wall-clock values in user.timezone, so an unpinned host
  // zone would shift round-tripped timestamps (JdbcSpec, StreamingSpec)
  "-Duser.timezone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // G1 keeps pauses bounded on the large single-JVM heap; the default
  // parallel collector showed 20s+ full-GC stalls inside allocation-heavy
  // queries late in a 50-query bench session
  "-XX:+UseG1GC",
)
