ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dotsocrspark"
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
// Forked-run output passes through UNWRAPPED (no sbt "[info] " prefix):
// the driver parses Bench's single JSON metric line from stdout, and the
// logger prefix made it unparseable in round 1 (BENCH_r01 "parsed": null).
outputStrategy := Some(StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // GC default switched ParallelGC → G1 in round 8: with the 32 GiB heap
  // and the suite's allocation rate, ParallelGC old-gen fills during a
  // bench session and multi-second stop-the-world FULL collections land
  // mid-stage (measured: one 32-task stage charged 260 s of summed GC —
  // the mechanism behind the r6/r7 "host drift" outliers on suite rows).
  // G1 has no stop-the-world full GC in normal operation, and the round-8
  // interleaved A/B showed its batch throughput is no longer behind
  // ParallelGC on this workload (extract best-of-3: 0.448 s G1 vs 0.466 s
  // ParallelGC vs 0.461 s ParallelGC+NewRatio=1, same-window alternation).
  // Still parameterized: SPARK_GRAFT_GC=UseParallelGC restores the old
  // collector; SPARK_GRAFT_GC_EXTRA adds arbitrary flags.
  s"-XX:+${sys.env.getOrElse("SPARK_GRAFT_GC", "UseG1GC")}",
  // Catalyst codegen emits classes per plan; the default 240MB code cache
  // fills over a multi-session benchmark run and the JIT silently stops
  // compiling (5-50x slowdowns on later queries)
  "-XX:ReservedCodeCacheSize=1g",
) ++
  // extra JVM flags for GC experiments (space-separated), e.g.
  // SPARK_GRAFT_GC_EXTRA="-XX:NewRatio=1"
  sys.env.get("SPARK_GRAFT_GC_EXTRA").toSeq
    .flatMap(_.split("\\s+").toSeq).filter(_.nonEmpty)
