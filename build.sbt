ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "arcmaskdatapipelinepluginspark"
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
// Forked run output defaults to LoggedOutput, which prefixes every stdout
// line with "[info] " — the bench driver parses the final stdout line as
// bare JSON, so pass the child's stdout through verbatim instead.
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
  // local[N] runs driver + all N executor cores in ONE JVM: the old 8g
  // default gave 32 concurrent tasks ~256 MB each — storage-pool eviction
  // plus GC pressure measurably inflated the bench suite (streaming subset
  // A/B at sf0.1/32c: 54.1s @8g vs 46.4s @24g on a busier box). 24g is
  // ~750 MB/core, the low end of Spark's per-core sizing guidance, still
  // env-overridable for smaller boxes.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
