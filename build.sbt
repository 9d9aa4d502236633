ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "connectspark"
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
  // JDK 17's default charset follows the (POSIX = US-ASCII) locale and
  // Spark's variant<->JSON conversion goes through it: without this,
  // to_json(parse_json(...)) replaces every non-ASCII character with
  // U+FFFD. JDK 18+ (JEP 400) defaults to UTF-8 and real clusters set
  // it explicitly; pin it here so local runs match.
  "-Dfile.encoding=UTF-8",
  "-Dsun.jnu.encoding=UTF-8",
  // local[32] runs 32 concurrent tasks in ONE JVM: at sf0.1 the 8g
  // default left so little old-gen headroom that a ~90-query bench
  // suite spent more time in GC than in queries (late-suite timings
  // inflated 10-30×; same queries isolated were 1-2 s). A real cluster
  // sizes executor memory per core — 24g/32 cores here is still a lean
  // 0.75g per task slot.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
