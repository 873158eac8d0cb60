ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "filteredadsvectorsearchspark"
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
// Pass the forked JVM's stdout through raw (no "[info] " prefix):
// Bench's one-line JSON result must be machine-parseable from the
// sbt output by the harness that invokes it.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // C1-only JIT: on this VM the C2 compiler is slow enough that each
  // fresh whole-stage-codegen class runs interpreted for tens of
  // seconds before tier-4 code arrives (measured: first execution of a
  // new query shape 32-62s, identical re-run 1-2s). C1 compiles
  // immediately; cold single-shot queries — what the bench and verify
  // harnesses run — drop 10-20x. Steady-state loss vs C2 is ~2x on hot
  // loops, irrelevant at bench scale. Override via EXTRA_JVM_OPTS.
  "-XX:TieredStopAtLevel=1",
  // C1 emits ~3-5x larger nmethods than C2 and the full query pack
  // compiles hundreds of generated classes; the 240m default code
  // cache fills mid-run, JIT stops, and late queries fall back to the
  // interpreter (measured: grid sweep 38.6s at 240m -> 4.9s at 2g).
  "-XX:ReservedCodeCacheSize=2g",
) ++ sys.env.get("EXTRA_JVM_OPTS").toSeq.flatMap(_.split("\\s+"))
