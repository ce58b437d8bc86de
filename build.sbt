ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "f1_data_engineeringspark"
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
// The bench driver captures the TAIL of stdout and json-parses the last
// line. sbt's default logger (a) prefixes forked-process stdout with
// "[info] " and (b) appends a "[success] Total time: ..." line — both broke
// the parse in rounds 1-3. StdoutOutput passes the forked JVM's stdout
// through raw; showSuccess kills the trailing line, so the bench's final
// short totals JSON really is the last stdout line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not a task — exclude it
// from the unused-key lint so compile output stays clean.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  // G1 sized for the bench: 16m regions keep the ~200-plan codegen/broadcast
  // churn out of humongous-allocation territory, and a 50 ms pause target
  // with early concurrent marking flattens the multi-hundred-ms collections
  // that read as per-query latency spikes mid-bench (r5: dd_clusters 436 ms
  // GC in one warm run).
  "-XX:+UseG1GC", "-XX:G1HeapRegionSize=16m", "-XX:MaxGCPauseMillis=50",
  "-XX:InitiatingHeapOccupancyPercent=40",
  // Fixed, pre-touched heap (r12): this host overcommits memory, and
  // faulting fresh heap pages in DURING execution stalled GC and task
  // threads in waves — young evacuations copying ~100 MB measured 0.9-1.4 s
  // (gc logs), and the identical agg_mad plan ranged 2.8-31.8 s run to run.
  // These waves ARE the "driver-host noise" behind every bench retry
  // adjudicated in rounds 9-11. Paying the full 12 GiB fault cost once at
  // JVM start makes steady state allocation-stall-free: agg_mad 11.5 s
  // median / 27.3 s spread -> 2.98 s / 0.60 s, same window, same plan.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}", "-XX:+AlwaysPreTouch",
)
