ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flinkstartspark"
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
// Forked output goes straight to this process's stdout/stderr instead of
// through sbt's logger: the driver parses the LAST bare `{...}` line of
// stdout, and the logger's "[info] " prefix kept BENCH_r1-r4 `parsed:null`.
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
val defaultHeap: String = {
  val memTotalGiB: Long =
    try {
      val kb = scala.io.Source.fromFile("/proc/meminfo").getLines()
        .collectFirst { case l if l.startsWith("MemTotal:") =>
          l.split("\\s+")(1).toLong }
      kb.map(_ / (1024L * 1024L)).getOrElse(0L)
    } catch { case _: Throwable => 0L }
  if (memTotalGiB >= 96) "48g" else "8g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // local[32] means up to 32 concurrent tasks, their shuffle buffers,
  // broadcasts and localCheckpoint storage blocks all share this one
  // heap; 48g gives the heaviest landed-stage builds headroom on the
  // 125 GiB box (measured equal to 8g at sf0.1 — the margin matters at
  // larger SFs, not here). The big default is GATED on the host
  // actually having the RAM (≥96 GiB physical): on a smaller machine a
  // 48g heap invites OOM-kills, so the default drops to 8g there —
  // SPARK_DRIVER_MEM overrides either way. On a real cluster this maps
  // to per-executor memory, not driver memory.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
)
