ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "connectorsspark"
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
  // forked JVMs inherit the container's POSIX locale; partition paths may
  // contain non-ASCII characters, so pin the file-path codec to UTF-8
  "-Dfile.encoding=UTF-8",
  "-Dsun.jnu.encoding=UTF-8",
  // 8g forced multi-second GC pauses during the sf0.1 bench (local[32]
  // keeps 32 partitions of shuffle/broadcast state live at once) and made
  // per-query timings swing 2-3x run to run; 24g removes the stalls on
  // the 128 GiB container. SPARK_DRIVER_MEM still overrides.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
Test / envVars ++= Map("LC_ALL" -> "C.UTF-8", "LANG" -> "C.UTF-8")
run / envVars ++= Map("LC_ALL" -> "C.UTF-8", "LANG" -> "C.UTF-8")
