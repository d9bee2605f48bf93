package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // static conf: a ~100-query engine blows the default 100-entry
      // generated-class cache and re-compiles plans every pass
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // iteration aid: SPARK_GRAFT_ONLY=q1_agg,d_exact dumps just those
    // queries (driver leaves it unset → full sweep, identical behavior)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only match {
      case Some(ks) => SparkEntry.queries.view.filterKeys(ks).toMap
      case None     => SparkEntry.queries
    }
    // RANDOMIZED execution order (r10 verdict item 8): the Shared.memo
    // recursive-update bug hid for five rounds because Verify's fixed
    // map order never exercised the colliding nesting — only Bench's
    // sorted order did. Shuffling per run makes the CORRECTNESS gate
    // itself the order-stress: every query must be order-independent,
    // so any order-sensitive state bug eventually lands on a failing
    // permutation here instead of surviving to a bench. The seed is
    // printed (and overridable via SPARK_GRAFT_ORDER_SEED) so a
    // failing permutation is replayable; SPARK_GRAFT_ORDER=sorted
    // restores a deterministic sweep for bisection.
    val ordered: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      sys.env.get("SPARK_GRAFT_ORDER") match {
        case Some("sorted") => selected.toSeq.sortBy(_._1)
        case _ =>
          val seed = sys.env.get("SPARK_GRAFT_ORDER_SEED").map(_.toLong)
            .getOrElse(System.nanoTime())
          System.err.println(s"[verify] query order: shuffled, seed=$seed " +
            "(replay with SPARK_GRAFT_ORDER_SEED, or SPARK_GRAFT_ORDER=sorted)")
          new scala.util.Random(seed).shuffle(selected.toSeq.sortBy(_._1))
      }
    ordered.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
