ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "jvectorspark"
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
// Forked run output normally goes through sbt's logger, which prefixes
// every line with "[info] " — that prefix breaks the bench driver's
// json-parse of the final stdout line (BENCH_r01..r04 all `parsed: null`).
// StdoutOutput pipes the program's stdout through raw (and keeps stderr
// WARNs out of stdout entirely).
run / outputStrategy := Some(StdoutOutput)
// The bench driver keeps only the tail of stdout and parses the final JSON
// line; sbt's "[success] Total time ..." epilogue would eat into that budget.
ThisBuild / showSuccess := false
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
// jdk.incubator.vector is a JDK module (present in this JDK 17), not a
// library dependency: compile the Panama SIMD provider against it and make
// it readable in forked test/run JVMs. graft.simd.Kernels loads the
// provider reflectively and falls back to scalar when a JVM lacks the
// module (e.g. a bare `java -cp` without --add-modules).
javacOptions ++= Seq("--add-modules", "jdk.incubator.vector", "-encoding", "UTF-8")
// zinc's in-process javac defines incubator-module classes in the unnamed
// module and dies with IllegalAccessError; setting javaHome makes sbt fork
// a real javac process (same JDK), where --add-modules behaves normally.
javaHome := Some(file(sys.props("java.home")))
javaOptions ++= jdk17AddOpens ++ Seq(
  "--add-modules=jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default: the bench's multi-segment section builds and pins a
  // 4M x 64d clustered corpus (rows + assembled graphs ~6 GB resident)
  // which leaves no execution-memory margin at 8g; the contract box has
  // 128 GiB. Override with SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
// SPARK_GRAFT_SERVING_GC: opt-in collector for serving-latency profiling.
// PinnedTailProbe (NOTES_r11 §4) attributed the pinned-route latency tail
// to young-gen GC pauses (88% of >p90 samples GC-active vs 16% base rate);
// a low-pause collector is the deployment-level fix. Values: "zgc",
// "shenandoah", "g1"; unset = the JVM default. Profiling knob, not a
// default — adopt per-deployment only if measured p99 drops without
// throughput loss (see NOTES_r12 comparison table).
javaOptions ++= (sys.env.get("SPARK_GRAFT_SERVING_GC").map(_.toLowerCase) match {
  case Some("zgc") => Seq("-XX:+UseZGC")
  case Some("shenandoah") => Seq("-XX:+UseShenandoahGC")
  case Some("g1") => Seq("-XX:+UseG1GC")
  case _ => Seq.empty
})
