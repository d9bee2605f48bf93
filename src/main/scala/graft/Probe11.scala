package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 probe driver — two diagnostics the r10 verdict asked for:
  *
  *  - `cliques <dir>`: per-STAGE shuffle attribution for the
  *    g_cliques4 pipeline (verdict item 2: "is the last-decade 0.86
  *    exponent the n·L signature explode, the census, the banded
  *    verify join, or the triangle/K₄ enumeration?"). Each stage is
  *    persisted/checkpointed before the next so the listener deltas
  *    measure THAT stage's exchange, not a recomputation of its
  *    inputs. Stage shapes are [[operators.Graph.cliques4]]'s
  *    verbatim (the banded construction decomposed via the
  *    package-private [[operators.EmbedBands]] stage seams).
  *
  *  - `bands <dir> [degenerate]`: the banded path's 1000× envelope
  *    audit (verdict item 3): plane count vs [[operators.EmbedBands.MaxPlanes]],
  *    per-geometry census (occupied buckets, max population, hot-bucket
  *    drops) and the priced self-join volume vs
  *    [[GraftConf.maxBandedCandidates]] — then the full construction,
  *    timed. With `degenerate`, first derive a BAND-DEGENERATE corpus
  *    from the real vectors (each base vector replicated into a
  *    500-member jitter cluster: same angular neighborhood, near-equal
  *    signatures) and report which envelope fires — the d_cap_fires
  *    discipline one level up.
  *
  * Usage: runMain graft.Probe11 cliques|bands <sfDir> [degenerate]
  */
object Probe11 {
  private object Meter extends org.apache.spark.scheduler.SparkListener {
    import java.util.concurrent.atomic.LongAdder
    val read = new LongAdder; val write = new LongAdder; val spill = new LongAdder
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        read.add(m.shuffleReadMetrics.totalBytesRead)
        write.add(m.shuffleWriteMetrics.bytesWritten)
        spill.add(m.diskBytesSpilled + m.memoryBytesSpilled)
      }
    }
    def snap(sc: org.apache.spark.SparkContext): (Long, Long, Long) = {
      try org.apache.spark.graft.ListenerFlush.waitUntilEmpty(sc)
      catch { case _: Throwable => () }
      (read.sum, write.sum, spill.sum)
    }
  }

  private def stage[T](s: SparkSession, name: String)(body: => T): T = {
    val (r0, w0, p0) = Meter.snap(s.sparkContext)
    val t0 = System.nanoTime()
    val out = body
    val secs = (System.nanoTime() - t0) / 1e9
    val (r1, w1, p1) = Meter.snap(s.sparkContext)
    println(f"STAGE $name%-18s wall ${secs}%8.1f s  shuf_w ${(w1 - w0) / 1e6}%10.1f MB  " +
      f"shuf_r ${(r1 - r0) / 1e6}%10.1f MB  spill ${(p1 - p0) / 1e6}%10.1f MB")
    out
  }

  def main(args: Array[String]): Unit = {
    val mode = args(0); val d = args(1)
    val degenerate = args.length > 2 && args(2) == "degenerate"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.sparkContext.addSparkListener(Meter)
    import graft.functions.VectorFns.l2_norm

    def vecs(src: DataFrame): DataFrame = src
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", l2_norm(col("v")))

    mode match {
      case "cliques" =>
        val t = operators.Similarity.effectiveThreshold(s, d, requested = 0.25)
        val e = vecs(Tables.embeddings(s, d))
        val n = e.select("vec_id").count()
        val (r, l) = operators.EmbedBands.geometry(n, t)
        println(s"n=$n t=$t r=$r L=$l")
        val sigs = stage(s, "sigs") {
          val f = operators.EmbedBands.bandSigs(e, r, l)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          println(s"  sig rows: ${f.count()}"); f
        }
        val census = stage(s, "census") {
          val c = operators.EmbedBands.keptCensus(sigs)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val priced = c.agg(coalesce(sum(expr("bc * (bc - 1) div 2")), lit(0L))).head().getLong(0)
          println(s"  kept buckets: ${c.count()}, priced join rows: $priced"); c
        }
        val edges = stage(s, "verify_join") {
          val p = operators.EmbedBands.verifyJoin(sigs, census, n, l, t)
            .select(col("vec_a").cast("long").as("a"), col("vec_b").cast("long").as("b"))
            .localCheckpoint()
          println(s"  edges: ${p.count()}"); p
        }
        sigs.unpersist(blocking = false); census.unpersist(blocking = false)
        val tri = stage(s, "triangles") {
          val f = edges
            .join(edges.select(col("a").as("b"), col("b").as("c")), "b")
            .join(edges.select(col("a"), col("b").as("c")), Seq("a", "c"))
            .select(col("a"), col("b"), col("c")).localCheckpoint()
          println(s"  triangles: ${f.count()}"); f
        }
        stage(s, "k4") {
          val f = tri
            .join(edges.select(col("a"), col("b").as("d")), "a")
            .join(edges.select(col("a").as("b"), col("b").as("d")), Seq("b", "d"))
            .join(edges.select(col("a").as("c"), col("b").as("d")), Seq("c", "d"))
            .select(col("a"), col("b"), col("c"), col("d")).localCheckpoint()
          println(s"  k4: ${f.count()}")
        }

      case "bands" =>
        val base = vecs(Tables.embeddings(s, d))
        val e = if (!degenerate) base else {
          // band-degenerate derivation: 500-member jitter clusters
          // around each base vector — every member shares its base's
          // angular neighborhood, so band signatures nearly coincide
          // and buckets sit just under the hot cap where the pair
          // price is maximal. Deterministic (member index arithmetic
          // only), real vectors as bases.
          val members = s.range(0, 500).select(col("id").as("m"))
          base.limit(4000).crossJoin(members)
            .select((col("vec_id") * 500 + col("m")).as("vec_id"),
              expr("transform(v, (x, j) -> x + CASE WHEN j = CAST(m % 64 AS INT) " +
                "THEN 0.05d * (1 + m % 7) ELSE 0d END)").as("v"))
            .withColumn("norm", l2_norm(col("v")))
            // limit+crossJoin collapse to ~1 partition; spread the
            // synthetic corpus like a real scan would arrive (the
            // first degen run ground 4e9 dots on one 5.5 GiB slice)
            .repartition(64)
        }
        val n = e.count()
        val r = operators.EmbedBands.bandPlaneCount(n)
        val t = operators.EmbedBands.maxBandableRung(n)
        val l = operators.EmbedBands.lTable((t, r))
        println(s"n=$n r=$r (MaxPlanes=${operators.EmbedBands.MaxPlanes}) " +
          s"rung=$t L=$l bucketTarget=${GraftConf.bandBucketRows}")
        val sigs = stage(s, "sigs") {
          // input sized + DISK_ONLY like bandedPairs itself — fat
          // post-explode partitions killed a 12 GB heap at 1000×
          val parts = math.max(32,
            math.ceil(n.toDouble * l * (8 * operators.EmbedBands.Dim + 80) / (64L << 20)).toInt)
          val f = operators.EmbedBands.bandSigs(e.repartition(parts), r, l)
            .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
          println(s"  sig rows: ${f.count()} ($parts input parts)"); f
        }
        stage(s, "census_audit") {
          val full = sigs.groupBy("band", "sig").agg(count(lit(1)).as("bc"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          val audit = full.agg(
            count(lit(1)).as("buckets"),
            max("bc").as("max_bucket"),
            avg("bc").as("mean_bucket"),
            sum(when(col("bc") > GraftConf.maxBandBucket, 1L).otherwise(0L)).as("hot_dropped"),
            sum(when(col("bc").between(2L, GraftConf.maxBandBucket),
              expr("bc * (bc - 1) div 2")).otherwise(0L)).as("priced")).head()
          println(s"  buckets=${audit.getAs[Long]("buckets")} " +
            s"max=${audit.getAs[Long]("max_bucket")} " +
            f"mean=${audit.getAs[Double]("mean_bucket")}%.1f " +
            s"hot_dropped=${audit.getAs[Long]("hot_dropped")} " +
            s"priced=${audit.getAs[Long]("priced")} " +
            s"(cap ${GraftConf.maxBandedCandidates})")
          full.unpersist(blocking = false)
        }
        sigs.unpersist(blocking = false)
        stage(s, "bandedPairs_full") {
          try {
            val pairs = operators.EmbedBands.bandedPairs(e, n, t)
            println(s"  pairs: ${pairs.count()}")
          } catch {
            case ex: IllegalStateException =>
              println(s"  PRICED REFUSAL: ${ex.getMessage}")
          }
        }

      case other => sys.error(s"unknown mode $other")
    }
    s.stop()
  }
}
