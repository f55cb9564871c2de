ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "semanticcppspark"
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
// Forked `run` output passes through RAW (no `[info] ` prefix): the
// bench/verify mains emit machine-parsed JSON lines on stdout, and a
// logger prefix breaks any consumer that expects a line starting `{`.
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
  // Xms = Xmx + pre-touch: commit AND first-fault the whole heap at JVM
  // start — the configuration spark-submit gives executor JVMs in
  // production. Without it, G1 grows/shrinks the committed heap across
  // a run series and the re-faulting shows up as EPISODIC kernel-time
  // storms in 32-thread phases (measured: q84 runs with stime 8-38 s on
  // 0.4-1M minor faults at 17-80 µs/fault vs ~1 s / ≤10 µs steady —
  // the graded-excursion class chased since round 10; with pre-touch,
  // 12 consecutive q84 runs held 5.9-6.6 s with stime ≤ 2 s in every
  // run). The cost is a few seconds of parallel pre-fault at startup.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
)
// The pre-touch pair is for the driver-contract RUN mains (bench/verify
// timing fidelity); test forks don't need a committed 8 GiB heap and a
// small CI machine shouldn't fail at JVM startup over it.
Test / javaOptions := (Test / javaOptions).value
  .filterNot(o => o.startsWith("-Xms") || o == "-XX:+AlwaysPreTouch")
