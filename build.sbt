ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "multithreaded_mapreduce_libraryspark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // ~120 queries of whole-stage codegen emit enough JIT-compiled classes
  // to fill the default 240m code cache mid-run (observed: the profiled
  // segment at 75/118m and climbing halfway through a bench pass);
  // flushing/sweeping churn then starves C2 and queries drop to
  // C1/interpreted speed nondeterministically. 512m keeps every
  // generated class resident.
  "-XX:ReservedCodeCacheSize=512m",
  // Batch-throughput GC. Under G1, Tungsten's 16-64 MB on-heap pages
  // are humongous objects (8g heap => 4 MB regions); humongous
  // allocation failures degenerate into repeated full collections and
  // ONE random query per bench pass stalled 20-40x (observed
  // d_setsim_join 2.7 s -> 109 s, d_embed_clusters 2.6 s -> 32 s,
  // executor threads idle while >70% of CPU sat in GC threads).
  // ParallelGC's contiguous, compacting old gen has no humongous
  // pathology and is the standard choice for throughput-bound Spark.
  // Overridable (SPARK_GRAFT_GC=g1) because the humongous argument is
  // heap-size-dependent — at the driver's 81 GB heap G1's regions are
  // 32 MB and the pathology may vanish; see BASELINE.md for the
  // measured comparison at both heap sizes.
  sys.env.getOrElse("SPARK_GRAFT_GC", "parallel") match {
    case "g1" => "-XX:+UseG1GC"
    case _    => "-XX:+UseParallelGC"
  },
)
// RAM-backed JVM tmpdir when the host has one (opt out with
// SPARK_GRAFT_TMPDIR=system; point elsewhere with SPARK_GRAFT_TMPDIR=/x).
// Streaming queries running to a memory sink create their TEMPORARY
// CHECKPOINT under java.io.tmpdir and fsync an offset WAL + commit log
// there on EVERY micro-batch; Spark's block-manager local dirs default
// under it too. On this host /tmp is disk-backed, so the 25-query
// streaming family pays ~fixed fsync latency per micro-batch that
// measures the disk, not the plan — tmpfs removes it (measured: the 5
// heaviest st_* steady 12.9 -> 8.6 s). Shuffle/spill stay tiny (0
// spill at sf0.1), so tmpfs capacity is a non-issue at bench scale.
javaOptions ++= {
  sys.env.get("SPARK_GRAFT_TMPDIR") match {
    case Some("system") => Seq.empty[String]
    case Some(d) => Seq(s"-Djava.io.tmpdir=$d")
    case None =>
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) {
        val d = new java.io.File(shm, "graft-tmp"); d.mkdirs()
        // a SIGKILLed JVM (OOM, driver timeout) cannot run its cleanup
        // hooks and leaves block-manager/scratch trees pinned in RAM
        // until reboot — sweep anything stale at project load. Liveness
        // is the NEWEST mtime anywhere in the tree, not the top-level
        // dir's: a directory's mtime only moves when its DIRECT children
        // change, so a live run writing into nested blockmgr/checkpoint
        // subdirs for hours looked stale to the r8 sweep and a
        // concurrent sbt launch could delete its shuffle/WAL mid-run
        // (ADVICE r8). A live JVM writes shuffle/WAL files continuously,
        // so any fresh file in the tree means alive; the walk short-
        // circuits on the first fresh file it finds.
        val cutoff = System.currentTimeMillis() - 2L * 3600 * 1000
        def newestIsFresh(p: java.io.File): Boolean = {
          if (p.lastModified() >= cutoff) true
          else if (p.isDirectory && !java.nio.file.Files.isSymbolicLink(p.toPath))
            Option(p.listFiles()).getOrElse(Array.empty).exists(newestIsFresh)
          else false
        }
        Option(d.listFiles()).getOrElse(Array.empty).foreach { f =>
          val stale = !newestIsFresh(f) &&
            (f.getName.startsWith("blockmgr-") || f.getName.startsWith("spark-") ||
              f.getName.startsWith("temporary") || f.getName.startsWith("graft"))
          if (stale) {
            def rm(p: java.io.File): Unit = {
              if (p.isDirectory && !java.nio.file.Files.isSymbolicLink(p.toPath))
                Option(p.listFiles()).getOrElse(Array.empty).foreach(rm)
              p.delete(); ()
            }
            rm(f)
          }
        }
        Seq(s"-Djava.io.tmpdir=${d.getAbsolutePath}")
      } else Seq.empty[String]
  }
}
