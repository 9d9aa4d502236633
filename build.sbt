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
// The driver invokes Bench/Verify via `sbt runMain` and parses the tail
// of stdout for the ONE JSON line Bench prints. With the default
// LoggedOutput strategy the forked JVM's stdout is re-emitted through
// sbt's logger (an `[info] ` prefix on the JSON line), and sbt appends
// `[success] Total time: ...` as the final stdout line — both of which
// have made the driver's JSON parse fail every round (BENCH_r*.json
// `parsed: null`). Inherit stdout directly and drop the success banner
// so the bench's own JSON line is the literal last line of stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
  // the `ffi` processor downcalls into shared libraries via JDK 17's
  // incubating foreign-function API (JEP 412) — accessed reflectively
  // so compilation doesn't depend on the incubator module
  "--add-modules", "jdk.incubator.foreign",
  "--enable-native-access=ALL-UNNAMED",
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
