ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "crossbarv2spark"
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
  // The engine's plans compile to well over 100 distinct whole-stage
  // codegen classes (40 edge families × their stages); the default
  // codegen class cache holds 100 entries, so repeated runs in one JVM
  // recompile evicted classes every time — jstack-sampled at ~11% of
  // executor-thread time (janino in CodeGenerator.compile). Static SQL
  // conf, hence set as a system property. Scale-independent: it bounds
  // a JVM-local cache, not data-dependent behavior.
  "-Dspark.sql.codegen.cache.maxEntries=2000",
  // FAIR task scheduling across CONCURRENT jobs (guide §2.6 job
  // overlap): the pipeline runs small canon/edge-family jobs alongside
  // the wide extract/mentions stages, and under the default FIFO order
  // their tasks queue behind the wide stage's backlog — measured as the
  // canonical-ids commit finishing at ~8.5 s despite ~2 s of own work.
  // One shared fair pool, no weights; serial phases (Verify, the bench
  // query loop) are single-job and unaffected. SparkContext-start conf,
  // hence a system property.
  "-Dspark.scheduler.mode=FAIR",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // default G1: an A/B against ParallelGC showed G1 ~25% faster on the
  // string-heavy pipeline at 8 threads; SPARK_GRAFT_GC overrides for
  // per-thread-count GC experiments (Parallel/G1/Z)
) ++ sys.env.get("SPARK_GRAFT_GC").map(g => s"-XX:+Use${g}GC").toSeq ++ {
  // Shuffle/spill files on tmpfs when available (parameterized:
  // SPARK_GRAFT_LOCAL_DIR overrides, unset + no /dev/shm = Spark
  // default). Rationale (optimization guide §2.1: local disk can be
  // the tighter limit for shuffle files): every SQL exchange under the
  // bypass-merge threshold creates numPartitions files per map task,
  // and this sandbox's overlay fs charges ~1ms of kernel time per file
  // create — measured as executor threads parked in
  // FileOutputStream.open0 under BypassMergeSortShuffleWriter. On a
  // real cluster the equivalent is provisioning fast local NVMe for
  // spark.local.dir; data volumes are unchanged either way.
  val localDir = sys.env.get("SPARK_GRAFT_LOCAL_DIR").orElse {
    if (java.nio.file.Files.isDirectory(java.nio.file.Paths.get("/dev/shm")))
      Some("/dev/shm/spark_local")
    else None
  }
  localDir.map(p => s"-Dspark.local.dir=$p").toSeq
}
