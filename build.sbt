ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigdatarentaltrendsspark"
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
// Forked run output goes straight to this process's stdout/stderr instead of
// through sbt's logger — without this every program line (including the
// Bench metric JSON the driver parses) gets an "[info] " prefix.
run / outputStrategy := Some(StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Keep the committed heap STABLE under a large -Xmx (the round-8 bench
  // investigation): G1 uncommits after every explicit System.gc() the bench
  // runs between queries, and the re-expansion's first-touch page faults
  // serialize across 32 executor threads (measured: iterations with a
  // heap-growth event carried ~250k minor faults and ran 3-6x slower with
  // near-zero GC time — the BENCH_r07 "monotone iteration growth"). A 4g
  // floor plus never-shrink pins the committed heap at its steady state, so
  // timed iterations reuse already-faulted pages instead of re-paying the
  // commit churn.
  "-Xms4g", "-XX:MaxHeapFreeRatio=100",
) ++ sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq.flatMap(_.split("\\s+"))
