ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "mapreducemovieanalysiscloudspark"
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
// Forked run output goes straight to stdout, NOT through sbt's logger:
// the logger prefixes every line with "[info] ", which breaks any consumer
// that json-parses the benchmark's single JSON result line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Xms = Xmx: PIN the heap. Without it G1 commits only ~2g initially and
  // the bench's inter-query System.gc() lets G1 UNCOMMIT back to a few
  // hundred MB — then every fast-allocating query regrows the heap in
  // steps, and with AlwaysPreTouch each expansion pre-faults its pages
  // INSIDE GC pauses (gc.log round 6: "Heap Initial Capacity: 2016M" vs
  // "Max 24G", shrink to 640M after each System.gc(), then 60s+ reps with
  // ~90% GC time and all 23 GC workers spinning whenever the host faults
  // pages slowly). A pinned heap pre-touches ONCE at startup and can never
  // shrink or grow — this was the "roaming outlier" GC storm of rounds
  // 2-6, not query allocation behavior.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // 32m G1 regions: collect_list/broadcast arrays of a few MB stop being
  // humongous allocations (default 8m regions at this heap → >4m objects
  // go humongous, fragmenting old gen and driving the run-to-run variance
  // seen on the multi-join dedup queries)
  "-XX:G1HeapRegionSize=32m",
  // Pre-fault the heap at JVM start: first-touch page faults otherwise land
  // inside the first timed queries and show up as phantom per-query spikes
  // (part of the 47s-vs-167s bench irreproducibility in round 2).
  "-XX:+AlwaysPreTouch",
  // A 167-query run compiles thousands of generated (codegen) classes; the
  // JDK 17 default 240m code cache fills mid-run, after which HotSpot stops
  // JIT-compiling (or flushes hot methods) and whole-stage-codegen'd
  // operators run INTERPRETED — the round-8 symptom was multi-stage queries
  // measuring 2-3x their filtered-run wall with matching extra CPU, zero
  // GC, zero steal.
  "-XX:ReservedCodeCacheSize=1g",
)
// Ad-hoc JVM forensics for bench runs (e.g. -Xlog:codecache=debug:file=…
// to measure code-cache occupancy/eviction during a full-surface run) —
// space-separated flags appended to the forked JVM, empty by default.
javaOptions ++= sys.env.get("SPARK_GRAFT_EXTRA_JVM").toSeq
  .flatMap(_.split("\\s+")).filter(_.nonEmpty)
