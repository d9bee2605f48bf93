package graft

import org.apache.spark.sql.SparkSession

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
  * Usage: runMain graft.Probe12 q71 <sfDir>
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
      case other => sys.error(s"unknown mode $other")
    }
    s.stop()
  }
}
