ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "consumekafkaavrodataspark"
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
// The driver parses the LAST stdout line of `sbt runMain graft.Bench` as
// JSON. Two sbt behaviors broke that (BENCH_r04-r06 `parsed: null`):
// the forked program's stdout was routed through the logger (prefixing
// every line with "[info] ") and sbt appended its own
// "[success] Total time ..." banner after the program exited. Send the
// forked JVM's output straight to stdout and drop the banner so the
// bench's compact JSON line is the final, bare line of the stream.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
// big heap on the bench host (one local[32] JVM runs all queries; at 16g
// the allocation-heavy dedup/avro queries tax successors with GC), but
// derived from physical RAM so a smaller dev machine degrades to a safe
// heap instead of being OOM-killed; SPARK_DRIVER_MEM overrides
val driverHeap = sys.env.getOrElse("SPARK_DRIVER_MEM", {
  val memKb =
    try scala.io.Source.fromFile("/proc/meminfo").getLines()
      .find(_.startsWith("MemTotal")).map(_.replaceAll("[^0-9]", "").toLong)
      .getOrElse(32L * 1024 * 1024)
    catch { case _: Throwable => 32L * 1024 * 1024 }
  math.max(4L, math.min(48L, memKb / (2L * 1024 * 1024))).toString + "g"
})

javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverHeap",
  // throughput collector: the bench is a batch workload in one big-heap
  // JVM; G1's pause-time targeting costs measurable task time here
  "-XX:+UseParallelGC",
)
// Xms == Xmx for RUN forks only (Bench/Verify — the measured JVMs):
// with a growable heap (r11: -Xms4g) ParallelGC expands the heap
// through FULL collections under allocation pressure — the r12
// exec-metrics instrumentation caught exactly that class of mid-query
// stop-the-world storm (134 s of summed task GC inside one 5.8 s run,
// zero shuffle/spill/eviction change). Pinning removes resize-driven
// full GCs from the measurement. Scoped to `run` so a test fork
// running BESIDE a bench doesn't commit a second half-of-RAM heap up
// front (two pinned 48g JVMs = all physical memory).
run / javaOptions += s"-Xms$driverHeap"
Test / javaOptions += "-Xms4g"
