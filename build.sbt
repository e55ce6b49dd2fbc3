ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dynaledgerspark"
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
// Forked run output goes straight to the console instead of through
// sbt's logger — the [info] prefix broke machine parsing of Bench's
// JSON metric line.
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
  // local[32] runs 32 concurrent tasks in ONE JVM: at 8g the sketch
  // queries' shuffles + pinned blocks ran against ~4.6g of usable
  // block-manager memory, and eviction/GC pressure made bench numbers
  // non-reproducible round to round. The bench container has 128g,
  // but hosts with less must still be able to launch the JVM, so the
  // default derives from MemTotal (a quarter, floor 4g, ceiling 32g —
  // MemTotal rather than MemAvailable so the heap does not wobble
  // with transient co-tenant load); SPARK_DRIVER_MEM overrides.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", {
    val totalGiB =
      try {
        val meminfo = IO.read(file("/proc/meminfo"))
        "MemTotal:\\s+(\\d+) kB".r.findFirstMatchIn(meminfo)
          .map(_.group(1).toLong / (1024L * 1024L)).getOrElse(128L)
      } catch { case _: Throwable => 128L }
    s"${math.max(4L, math.min(32L, totalGiB / 4))}g"
  })}",
)
