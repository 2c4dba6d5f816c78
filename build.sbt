ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigdata_hw_2324spark"
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
// No "[success] Total time: …" banner after tasks: the round driver parses
// the LAST stdout line of `runMain graft.Bench` as the bench contract JSON,
// and the banner was displacing it (BENCH_r06/r07 "parsed": null).
Global / showSuccess := false
// Forked run output goes STRAIGHT to stdout/stderr (no sbt logger, no
// "[info] " prefix, no async relay): the bench contract line must be the
// literal last stdout line AND parse as bare JSON.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// showSuccess is consumed by sbt's command engine, not a task — exclude it
// from the unused-key lint so every build doesn't print a false warning.
Global / excludeLintKeys += showSuccess
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
  // 16g default: the interleaved bench keeps every operator's internal
  // persist resident through the measurement phase; at 8g the storage pool
  // evicted the larger frames to disk and inflated their warm medians
  // ~20% (measured: q34 1.39 s at 8g vs 1.15 s at 16g). Override with
  // SPARK_DRIVER_MEM (the 100M opt-in tier needs 48g).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
