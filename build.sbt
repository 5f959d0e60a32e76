ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "iotsystemplcdatatoinfluxdbspark"
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
// Pass forked-run output through UNPREFIXED: the round driver parses the
// graft.Bench summary JSON from raw stdout, and sbt's default logger wraps
// every forked line as "[info] {...}" — which is exactly why BENCH_r02..r06
// recorded "parsed": null despite the line being present in the tail.
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
  // local[32] runs driver+executors in one JVM; interpreted higher-order
  // expressions allocate heavily — a small heap turns into GC thrash.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // Spark codegen emits thousands of Janino classes across a long query
  // sequence; the default 240m code cache fills, the JIT shuts off, and
  // throughput collapses 10-50x. 2g is this JVM's hard maximum. With a
  // 48g heap GC almost never runs inside a bench-length process, so
  // evicted codegen classloaders are never collected and their compiled
  // code never leaves the cache — graft.Bench therefore forces periodic
  // System.gc() to unload dead generated classes (see Bench.scala), and
  // prints CodeHeap used/max at exit.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "2g")}",
  "-XX:+UseCodeCacheFlushing",
)
