package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 probe driver.
  *
  *  - `q71 <dir>`: the q71 AQE-boundary probe (r11 verdict item 2):
  *    runs q71CboStats against a corpus whose ANALYZEd build side sits
  *    near the 64 MB broadcast threshold and reports the build-side
  *    subtree estimate, the static plan's choice and whether the
  *    certificate held — the r11 fragility was an expectation derived
  *    from RAW table stats throwing on correct planner behavior
  *    exactly here.
  *
  *  - `st1000 <dir>`: the streaming 1000× probe (r11 verdict item 6):
  *    runs the session-window aggregate and the flatMapGroupsWithState
  *    session FSM against a 1000× events corpus through the PRODUCTION
  *    sink shape — foreachBatch → parquet (executor-side writes) —
  *    because the gate queries' driver memory sink is the measured
  *    1000× wall (the complete-mode session table blew
  *    driver.maxResultSize at 1 GiB from 4 tasks), not the state
  *    store. The adaptive RocksDB decision applies unchanged through
  *    the shared harness wrapper.
  *
  * Usage: runMain graft.Probe12 q71|st1000 <sfDir>
  */
object Probe12 {
  def main(args: Array[String]): Unit = {
    val mode = args(0); val d = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    mode match {
      case "q71" =>
        // report WHERE this corpus sits relative to the 64 MB broadcast
        // threshold (the probe's whole point is the boundary): same
        // projection + ANALYZE as the query, estimate read back the way
        // the planner reads it
        val tbl = "graft_probe12_orders"
        val outDir = java.nio.file.Files.createTempDirectory("graft_probe12_").toString
        try {
          Tables.orders(s, d).select("o_orderkey", "o_orderpriority")
            .write.mode("overwrite").option("path", s"$outDir/orders").saveAsTable(tbl)
          s.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS")
          val est = s.table(tbl).queryExecution.optimizedPlan.stats.sizeInBytes
          println(f"Q71 PROBE: ANALYZEd build-side estimate $est B " +
            f"(${est.toDouble / (64L << 20)}%.2fx of the 64 MB threshold) at $d")
        } finally {
          s.sql(s"DROP TABLE IF EXISTS $tbl")
          graft.Scratch.rmTree(outDir)
        }
        val t0 = System.nanoTime()
        try {
          val out = operators.RelationalExt5.q71CboStats(s, d)
          val rows = out.collect()
          val bc = rows.headOption.map(_.getAs[Boolean]("cbo_broadcast"))
          println(f"Q71 OK wall ${(System.nanoTime() - t0) / 1e9}%.1f s " +
            s"rows=${rows.length} cbo_broadcast=$bc — certificate held " +
            "(static plan consistent with the build-side subtree estimate)")
        } catch {
          case ex: IllegalStateException =>
            println(s"Q71 THREW: ${ex.getMessage}")
            sys.exit(1)
        }
      case "st1000" =>
        def gcMs(): Long = {
          import scala.jdk.CollectionConverters._
          java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
            .asScala.map(_.getCollectionTime).sum
        }
        Seq(
          ("st_session_window", "complete",
            () => streaming.EventStream.sessionWindowStream(s, d)),
          ("st_sessionize_stream", "append",
            () => streaming.EventStream.sessionFsmStream(s, d))
        ).foreach { case (name, mode, mk) =>
          val out = s"/tmp/probe12_$name"
          graft.Scratch.rmTree(out)
          val gc0 = gcMs(); val t0 = System.nanoTime()
          streaming.EventStream.runToFileSink(s, d, mk(), mode, out)
          val wall = (System.nanoTime() - t0) / 1e9
          val rows = s.read.parquet(out).count()
          println(f"ST1000 $name%-22s wall $wall%8.1f s  rows $rows%12d  " +
            f"gc ${(gcMs() - gc0) / 1000.0}%6.1f s  (file sink, adaptive state store)")
          graft.Scratch.rmTree(out)
        }

      case "setsim" =>
        // stage attribution for d_setsim_join's last-decade exponent:
        // which of (shingle build, prefix extraction via the two doc
        // windows, candidate self-join + distinct, verify join) grows
        // super-linearly? Stages replicate Dedup.setsimJoin's exact
        // shapes via its package-private seams.
        import org.apache.spark.sql.expressions.Window
        val t = 0.5
        def stage[T](name: String)(body: => T): T = {
          val t0 = System.nanoTime()
          val out = body
          println(f"SETSIM $name%-16s wall ${(System.nanoTime() - t0) / 1e9}%8.1f s")
          out
        }
        val sh = stage("shingles") {
          val f = operators.Dedup.withShinglesOf(Tables.parallelize(Tables.documents(s, d)))
            .select(col("doc_id"),
              sort_array(graft.functions.MinHashFns.word_hashes(col("sh"))).as("hs"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          println(s"  docs: ${f.count()}"); f
        }
        val tokens = sh.select(col("doc_id"), explode(col("hs")).as("h"))
        val freq = tokens.groupBy("h").agg(count(lit(1)).as("f"))
        val wDoc = Window.partitionBy("doc_id")
        val pe = stage("prefix") {
          val f = tokens.join(freq, "h")
            .withColumn("n", count(lit(1)).over(wDoc))
            .withColumn("rnk", row_number().over(wDoc.orderBy("f", "h")))
            .filter(col("rnk") <= col("n") - ceil(col("n") * t).cast("int") + 1)
            .select(col("doc_id"), col("n"), col("h"))
            .localCheckpoint()
          println(s"  prefix rows: ${f.count()}"); f
        }
        val cands = stage("candidates") {
          val a = pe.select(col("h"), col("doc_id").as("doc_a"), col("n").as("n_a"))
          val b = pe.select(col("h"), col("doc_id").as("doc_b"), col("n").as("n_b"))
          val c = a.join(b, "h")
            .filter(col("doc_a") < col("doc_b"))
            .filter(col("n_b") >= col("n_a") * t && col("n_b") <= col("n_a") / t)
            .select("doc_a", "doc_b")
            .distinct()
            .localCheckpoint()
          println(s"  candidates: ${c.count()}"); c
        }
        stage("verify") {
          val shA = sh.select(col("doc_id").as("doc_a"), col("hs").as("hs_a"))
          val shB = sh.select(col("doc_id").as("doc_b"), col("hs").as("hs_b"))
          val n = cands.join(shA.hint("SHUFFLE_HASH"), "doc_a")
            .join(shB.hint("SHUFFLE_HASH"), "doc_b")
            .select(col("doc_a"), col("doc_b"),
              operators.ExactRound.r(
                graft.functions.MinHashFns.sorted_jaccard(col("hs_a"), col("hs_b")), 6).as("jaccard"))
            .filter(col("jaccard") >= t)
            .count()
          println(s"  pairs: $n")
        }
        sh.unpersist(blocking = false)

      case other => sys.error(s"unknown mode $other")
    }
    s.stop()
  }
}
