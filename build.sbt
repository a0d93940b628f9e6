ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "big_datatraderspark"
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
// Forked `runMain` output must reach stdout RAW: the bench/verify driver
// parses the JSON line Bench prints, and sbt's default logger wraps every
// line in "[info] " (and appends "[success] Total time ..."), which breaks
// `json.loads` on the tail of the output (BENCH_r01.json: "parsed": null).
outputStrategy := Some(StdoutOutput)
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // JDK 17 G1 GCLocker starvation (r16 root cause of the factor-300
  // one-pass deaths): parquet codec JNI critical sections hold the
  // GCLocker while 32 task threads allocate 128 MiB Tungsten pages;
  // with the default GCLockerRetryAllocationCount=2 an unlucky thread
  // throws a SPURIOUS OutOfMemoryError (the fatal r16 one was a 6-WORD
  // allocation with post-GC heap at 143 MB of 8 g). Spark absorbs the
  // ones that hit TaskMemoryManager page allocation (catch + spill);
  // an uncaught one in task code kills the whole local JVM. Raising
  // the retry count is the standard JDK-17 mitigation (JDK 21+ removed
  // the GCLocker OOM path entirely).
  "-XX:+UnlockDiagnosticVMOptions",
  "-XX:GCLockerRetryAllocationCount=100",
)
