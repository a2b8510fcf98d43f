ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "witdbspark"
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
// The driver parses Bench's ONE JSON line from sbt stdout; the default
// LoggedOutput strategy prefixes every forked-process line with
// "[info] ", which breaks `json.loads`. StdoutOutput passes the child's
// stdout/stderr through undecorated.
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
  // Driver heap: SPARK_DRIVER_MEM wins; otherwise 1/4 of physical RAM
  // clamped to [2g, 24g]. The bench runs 120+ queries x 4 executions in
  // ONE JVM; below ~24g the accumulated heap state turned sketch/stream
  // queries into GC-spike lotteries (hll1 samples 8.15/5.14/1.68 s
  // in-suite vs a 1.47 s isolated median), so the 128 GiB bench machine
  // derives 24g — while a small dev/CI host derives a heap it can
  // actually start rather than failing on a hard-coded 24g.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", {
    val total =
      try java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean].getTotalMemorySize
      catch { case _: Throwable => 32L << 30 }
    s"${math.max(2L, math.min(24L, (total >> 30) / 4))}g"
  })}",
)
