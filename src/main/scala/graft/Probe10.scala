package graft

import org.apache.spark.sql.SparkSession

/** One-off diagnostic for the r10 graph-family probes: prints the
  * noise-floor table, the effective-threshold picks and the
  * embedPairBlocks stage prices for a corpus, so a probe regression
  * is attributed to the stage that moved, not guessed.
  * Usage: runMain graft.Probe10 <sfDir> */
object Probe10 {
  def main(args: Array[String]): Unit = {
    val d = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    println("== noiseStats ==")
    operators.Similarity.noiseStats(s, d).collect().foreach(println)
    for (req <- Seq(0.25, 0.3, 0.4)) {
      val t0 = System.nanoTime()
      val t = operators.Similarity.effectiveThreshold(s, d, requested = req)
      println(f"effT($req) = $t (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }
    val t = operators.Similarity.effectiveThreshold(s, d, requested = 0.25)
    val t1 = System.nanoTime()
    val pairs = operators.Dedup.embedPairBlocks(Tables.embeddings(s, d), t = t)._1
    val n = pairs.count()
    println(f"pairs at $t: $n rows (${(System.nanoTime() - t1) / 1e9}%.1f s)")
    import org.apache.spark.sql.functions._
    val edges = pairs
      .select(col("vec_a").cast("long").as("a"), col("vec_b").cast("long").as("b"))
      .localCheckpoint()
    val t2 = System.nanoTime()
    val tri = edges
      .join(edges.select(col("a").as("b"), col("b").as("c")), "b")
      .join(edges.select(col("a"), col("b").as("c")), Seq("a", "c"))
      .select(col("a"), col("b"), col("c")).localCheckpoint()
    println(f"tri: ${tri.count()} rows (${(System.nanoTime() - t2) / 1e9}%.1f s)")
    val t3 = System.nanoTime()
    val k4 = tri
      .join(edges.select(col("a"), col("b").as("d")), "a")
      .join(edges.select(col("a").as("b"), col("b").as("d")), Seq("b", "d"))
      .join(edges.select(col("a").as("c"), col("b").as("d")), Seq("c", "d"))
      .select(col("a"), col("b"), col("c"), col("d")).localCheckpoint()
    println(f"k4: ${k4.count()} rows (${(System.nanoTime() - t3) / 1e9}%.1f s)")
    s.stop()
  }
}
