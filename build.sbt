ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "airline_data_pipelinespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
scalacOptions += "-deprecation"
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked-run output must pass through RAW: sbt's default logger prefixes
// every stdout line with "[info] ", and the bench harness json-parses the
// final stdout line — the prefix is the likely reason every BENCH_r*.json
// so far records `parsed: null`.
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
  // 8g measured as the stable point for the 60-query bench at local[32]:
  // 24g (with or without matching -Xms) made the window-heavy tail SLOWER
  // and high-variance (q60: 10.9/11.2s at 8g vs 21-41s at 24g+Xms,
  // 11.5/17.1s at 24g alone — G1 on a large lazily-faulted heap), while
  // gc_sec stayed <0.5s at 8g. Bench JSON now emits per-query gc_sec so
  // any environment-driven inflation is diagnosable from the artifact.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // 99 queries × several codegen'd stages each overflow the default 240 MB
  // JIT code cache mid-session; once it fills, the JIT compiler disables
  // and later queries run interpreted — the non-GC long-tail inflation
  // (q41 1.4s standalone vs 13.7s late-session, gc_sec 0).
  "-XX:ReservedCodeCacheSize=1g",
)
