ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "awslambdastreamprocessingspark"
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
// The driver tail-parses Bench's one-line JSON out of the last ~2KB of
// stdout. sbt's default output strategy routes the forked process through
// its logger, prefixing every line with "[info] " — which is the likely
// reason all six rounds recorded `parsed: null` even when the line was
// visibly in the tail. StdoutOutput passes the forked JVM's stdout through
// verbatim, unprefixed.
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
  // 92 back-to-back queries JIT-compile thousands of generated classes;
  // the JDK 17 default 240m code cache fills mid-run, the JIT stops
  // compiling, and late queries run interpreted at 2-4x their isolated
  // time (r3: q_dedup_ngram_jaccard 11.5s in-loop vs 6.2s isolated,
  // stream throughput 6.1k vs 14.4k rows/s in a fresh JVM)
  "-XX:ReservedCodeCacheSize=512m",
)
