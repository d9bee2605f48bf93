package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 probe driver — the r12 verdict's measurement items.
  *
  *  - `setsim <dir>`: stage decomposition of the PACKED d_setsim_join
  *    (r12 item 1): prep (shingles → dense-id dict → delta-varint
  *    signatures), prefix, candidate distinct, packed verify — each
  *    stage reports wall AND shuffle write/read deltas, so the claim
  *    under test ("packing cuts the candidate-linear verify byte
  *    stream ~4× with bit-identical values") is measured in bytes,
  *    not inferred from parquet sizes.
  *
  *  - `width <dir>`: d_width_sweep stage attribution (r12 item 4):
  *    replicates the query's exact shapes (one shared tokenize pass,
  *    then per width: distinct gram build, Σ c·(c−1)/2 price, the
  *    count-based verify join) and reports per-stage wall + bytes, to
  *    attribute the measured exp-1.00 row to its Σ c_g² join and
  *    confirm the four widths still share one scan at 100×.
  *
  *  - `stgate <dir>`: the stateful streaming GATE shape at scale (r12
  *    item 3): since r13 the gate queries drain through the
  *    production foreachBatch → parquet sink, so this runs the actual
  *    gate entries (sessionWindowAgg, sessionizeStream) — not a
  *    probe-only seam — against a 1000× events corpus and reports
  *    wall / rows / GC. The r12 finding this closes: the old
  *    memory-sink gate shape DNF'd on driver.maxResultSize at this
  *    scale while the identical pipeline completed through files.
  *
  * Usage: runMain graft.Probe13 setsim|width|stgate <sfDir>
  */
object Probe13 {
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
  }

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
    s.sparkContext.addSparkListener(Meter)

    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def stage[T](name: String)(body: => T): T = {
      try org.apache.spark.graft.ListenerFlush.waitUntilEmpty(s.sparkContext)
      catch { case _: Throwable => () }
      val (r0, w0, sp0) = (Meter.read.sum, Meter.write.sum, Meter.spill.sum)
      val t0 = System.nanoTime()
      val out = body
      try org.apache.spark.graft.ListenerFlush.waitUntilEmpty(s.sparkContext)
      catch { case _: Throwable => () }
      println(f"P13 $name%-14s wall ${(System.nanoTime() - t0) / 1e9}%8.1f s  " +
        f"shufW ${(Meter.write.sum - w0) / 1e6}%10.1f MB  " +
        f"shufR ${(Meter.read.sum - r0) / 1e6}%10.1f MB  " +
        f"spill ${(Meter.spill.sum - sp0) / 1e6}%8.1f MB")
      out
    }

    mode match {
      case "setsim" =>
        val t = 0.5
        val prep = stage("prep") {
          val p = operators.Dedup.allPairsPrep(s, d)
          println(s"  docs(packed): ${p.packed.count()}  token rows: ${p.tokens.count()}")
          p
        }
        val pe = stage("prefix") {
          val f = operators.Dedup.setsimPrefix(prep.toks, t)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          println(s"  prefix rows: ${f.count()}"); f
        }
        val priced = stage("price") {
          val p = operators.Dedup.setsimCandPriced(pe)
          println(s"  priced candidates: $p"); p
        }
        require(priced >= 0)
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
          val pA = prep.packed.select(col("doc_id").as("doc_a"), col("p").as("p_a"))
          val pB = prep.packed.select(col("doc_id").as("doc_b"), col("p").as("p_b"))
          val n = cands.join(pA.hint("SHUFFLE_HASH"), "doc_a")
            .join(pB.hint("SHUFFLE_HASH"), "doc_b")
            .select(col("doc_a"), col("doc_b"),
              operators.ExactRound.r(
                graft.functions.PackedSetFns.packed_jaccard(col("p_a"), col("p_b")), 6).as("jaccard"))
            .filter(col("jaccard") >= t)
            .count()
          println(s"  pairs: $n")
        }
        pe.unpersist(blocking = false); prep.unpersistAll()

      case "width" =>
        val WS = "[ \\t\\n\\r]+"
        val toks = stage("tokenize") {
          val f = Tables.parallelize(Tables.documents(s, d))
            .select(col("doc_id"), split(trim(col("text")), WS).as("toks"))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          println(s"  docs: ${f.count()}"); f
        }
        Seq((2, false), (3, true), (5, true), (8, true)).foreach { case (w, verify) =>
          val tok = stage(s"w$w-grams") {
            val f = toks.select(col("doc_id"),
                explode(graft.functions.MinHashFns.word_hashes(
                  graft.functions.MinHashFns.word_shingles(col("toks"), w))).as("g"))
              .distinct()
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            println(s"  gram rows: ${f.count()}"); f
          }
          stage(s"w$w-price") {
            val jr = tok.groupBy("g").agg(count(lit(1)).as("c"))
              .agg(sum(col("c") * (col("c") - 1) / 2).cast("long").as("jr"))
              .head().getLong(0)
            println(s"  n_join_rows: $jr")
          }
          if (verify) {
            val pr = stage(s"w$w-candjoin") {
              val f = tok.select(col("doc_id").as("doc_a"), col("g"))
                .join(tok.select(col("doc_id").as("doc_b"), col("g")), "g")
                .filter(col("doc_a") < col("doc_b"))
                .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("isz"))
                .localCheckpoint()
              println(s"  candidate pairs: ${f.count()}"); f
            }
            stage(s"w$w-verify") {
              val sz = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
              val dup = pr
                .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na"))
                  .hint("SHUFFLE_HASH"), "doc_a")
                .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb"))
                  .hint("SHUFFLE_HASH"), "doc_b")
                .filter(operators.ExactRound.r(col("isz").cast("double")
                  / (col("na") + col("nb") - col("isz")), 6) >= 0.5)
                .select("doc_a", "doc_b")
              println(s"  dup pairs: ${dup.count()}")
            }
          }
          tok.unpersist(blocking = false)
        }
        toks.unpersist(blocking = false)

      case "stgate" =>
        Seq(
          ("st_session_window GATE", () => streaming.EventStream.sessionWindowAgg(s, d)),
          ("st_sessionize_stream GATE", () => streaming.EventStream.sessionizeStreamClosed(s, d))
        ).foreach { case (name, mk) =>
          val gc0 = gcMs()
          stage(name) {
            val rows = mk().count()
            println(s"  rows: $rows  gc ${(gcMs() - gc0) / 1000.0} s")
          }
        }

      case other => sys.error(s"unknown mode $other")
    }
    s.stop()
  }
}
