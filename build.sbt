ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dataandanalyticsetlspark"
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
// Pass forked-run output straight through instead of re-logging it with an
// "[info] " prefix: the driver tail-parses Bench's final JSON line, and a
// prefixed line no longer starts with '{' (every BENCH_r*.json through r7
// came back "parsed": null).
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
  "-Duser.timezone=UTC",
  // 16g default (r14): the bench container is 128 GiB and local[32] runs
  // 32 executor threads in this ONE heap — at 8g (250 MB/thread) the 32×
  // rehearsal lanes sat ON the OOM cliff (q67 pass/fail varied run to run;
  // PLANS §Round-14 cliff note measures it for r13's shape too). 16g keeps
  // the same order of magnitude below the box while taking the whole flake
  // class out; SPARK_DRIVER_MEM still overrides both ways.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // ParallelGC (r16, guide §5): JobProbe showed 10-30% of task time in GC
  // on the hot lanes under the JDK-17 default G1 — task-lifetime object
  // churn (closure deser, codegen, shuffle buffers) is a pure young-gen
  // throughput workload, and G1's concurrent cycles + region management
  // compete with 32 executor threads for cores. Measured: interleaved
  // same-window NoopTime A/B on 16 lanes, PGC ≥ G1 on 15 of 16 in both
  // matched pairs (q55 2.32→1.79, q58 1.40→0.99, q74 2.26→1.67); full-
  // bench total_noop 172.0 (G1) → 138.8 (PGC) with better slices in the
  // same back-to-back pair. This configures the LOCAL single-JVM bench/
  // verify runtime; a cluster deployment sets executor GC via
  // spark.executor.extraJavaOptions — throughput collectors remain the
  // standard recommendation for batch executors there too.
  "-XX:+UseParallelGC",
) ++
  // Dev-only A/B hook: extra JVM flags (e.g. a GC experiment) without
  // editing the build. Unset = no flags — the default JVM configuration
  // every prior round's artifacts were measured under is unchanged.
  sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq.flatMap(_.split("\\s+").toSeq)
