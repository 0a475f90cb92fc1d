ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "avocadospark"
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
// Pass the forked JVM's stdout through unprefixed: the bench/verify
// drivers parse JSON lines from stdout, and sbt's default LoggedOutput
// decorates every line with [info]/[error], breaking json.loads.
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
  // 8g across 32 local task threads (~250 MB/task) GC-cliffed the
  // genotyping pass unpredictably (g4 5.7s vs 25.6s run-to-run); 24g on
  // the 128 GiB box keeps headroom for the page cache while removing
  // the cliff.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // A 115-query suite in one JVM generates thousands of Janino/JIT
  // classes; the JDK-17 default 240 MB code cache overflows mid-suite
  // and late plan-heavy queries (most codegen units) degrade 3-6x —
  // c13 measured 9.6-11.7s in-suite vs 2.1s solo with identical plans,
  // and the inflation tracked SUITE LENGTH, not any particular
  // predecessor family. A long-lived production driver/executor would
  // tune this the same way.
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.split("\\s+"))
