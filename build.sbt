ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "conduinospark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// The platform default charset in this container is US-ASCII — pin the
// source encoding so the multilingual fixture literals (TextOps
// UnicodeFixture, Charsets slots) can never silently mojibake if the
// sbt JVM stops injecting -Dfile.encoding=UTF-8.
scalacOptions ++= Seq("-encoding", "utf8")
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
// Scratch-dir placement (java.io.tmpdir => also Spark's default
// spark.local.dir): this machine's /tmp is ext4-on-virtio with ~17 ms
// fsync latency (measured: 200 4-KiB write+fsync cycles), so streaming
// state-store commits and temp-checkpoint metadata were dominating the
// micro-batch floor — interleaved A/B over the six worst _stream
// queries measured 71.6 s (min-of-reps) on /tmp vs 30.4 s on tmpfs.
// A deployment puts scratch on local NVMe; the local-mode equivalent
// is tmpfs, so default there when it exists. SPARK_GRAFT_TMPDIR
// overrides the path; SPARK_GRAFT_TMPDIR=system keeps the JVM default.
// Scratch holds only per-run intermediates (staged fixtures, shuffle
// files, stream checkpoints), all freed by shutdown hooks — never a
// cross-run cache.
javaOptions ++= {
  val pick = sys.env.get("SPARK_GRAFT_TMPDIR") match {
    case Some("system") => None
    case Some(d)        => Some(d)
    case None =>
      val shm = file("/dev/shm")
      if (shm.isDirectory && shm.canWrite) {
        val d = shm / "graft_tmp"; IO.createDirectory(d); Some(d.getAbsolutePath)
      } else None
  }
  pick.map(d => s"-Djava.io.tmpdir=$d").toSeq
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 12g is the benched operating point (BASELINE.md methodology): small
  // enough that G1 mixed collections stay short, large enough that the
  // 32-thread shuffle working set never spills pathologically. 8g showed
  // GC-contaminated outliers; 48g stalls AND starves the GC-triggered
  // ContextCleaner. Pin G1 explicitly so a JDK default change can't
  // silently swap collectors under the recorded numbers.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "12g")}",
  "-XX:+UseG1GC",
)
