ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "terminusserverspark"
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
// Forked run output goes STRAIGHT to this process's stdout/stderr,
// without sbt's `[info] `/`[error] ` logger prefixes: the driver's
// bench capture failed to parse the one-line metric JSON in BOTH the
// r16 and r17 rounds because every stdout line arrived as
// `[info] {...}` (BENCH_r*.json `parsed: null`, r17 verdict #2). The
// bench additionally writes its metric JSONs to target/bench_*.json.
outputStrategy := Some(StdoutOutput)
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
  // local[32] runs 32 concurrent tasks in one JVM; 8g caused multi-second
  // GC pauses under load (BENCH_r04 showed 49s on a 2s query). Headroom
  // is cheap on the 128 GiB bench host.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // The 135-entry battery generates thousands of whole-stage-codegen
  // classes in one JVM; the JDK default 240m code cache fills mid-
  // sequence and the JIT stops compiling — late compute-bound entries
  // (graph_triangles) then ran 2-3x their standalone time with no plan
  // change and near-zero GC. 512m keeps the whole battery compiled.
  "-XX:ReservedCodeCacheSize=512m",
)
