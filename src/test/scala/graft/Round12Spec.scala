package graft

import org.apache.spark.sql.functions._
import graft.operators.EmbedBands

/** Round-12 regression pins: the memo self-cycle guard (ADVICE r11),
  * the fail-loud state-store pin, and the banded path's survivor-budget
  * decision (r11 verdict item 1 — the band-degenerate middle regime). */
class Round12Spec extends SparkSpec {

  test("Shared.memo: a build that memoizes its OWN key fails loud instead of deadlocking") {
    // ADVICE r11: putIfAbsent hands a self-recursive build its own
    // still-running FutureTask and task.get() would block the thread
    // forever — the ThreadLocal in-flight set turns that into an
    // IllegalStateException naming the cycle
    import spark.implicits._
    val ex = intercept[IllegalStateException] {
      operators.Shared.memo(spark, "/memo-r12-cycle", "self") {
        operators.Shared.memo(spark, "/memo-r12-cycle", "self")(Seq(1L).toDF("x"))
      }
    }
    assert(ex.getMessage.contains("cycle") && ex.getMessage.contains("self"),
      s"diagnostic must name the cycle: ${ex.getMessage}")
    // the failed build must have been evicted — a later, acyclic build succeeds
    val ok = operators.Shared.memo(spark, "/memo-r12-cycle", "self")(Seq(2L).toDF("x"))
    assert(ok.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("stream state-store pin: a mistyped value fails loud, never silently selects HDFS") {
    // ADVICE r11: any value other than exactly "rocksdb" used to fall
    // through to the HDFS backend — a typo'd deployment pin would
    // silently re-expose the 100x heap OOM the RocksDB crossover fixed
    val key = GraftConf.streamStateStoreKey
    spark.conf.set(key, "RocksDB") // wrong case = wrong value
    try {
      val ex = intercept[RuntimeException] {
        streaming.EventStream.queries("st_window_agg")(spark, sf)
      }
      assert(ex.getMessage.contains("rocksdb") && ex.getMessage.contains("RocksDB"),
        s"must reject the bad pin by name: ${ex.getMessage}")
    } finally spark.conf.unset(key)
  }

  test("budgetDecision: worst-case bound within budget short-circuits (no sample)") {
    import graft.functions.VectorFns.l2_norm
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", l2_norm(col("v")))
    val n = e.count()
    val r = EmbedBands.bandPlaneCount(n)
    val t = EmbedBands.maxBandableRung(n)
    val l = EmbedBands.lTable((t, r))
    val sigs = EmbedBands.bandSigs(e, r, l)
    val census = EmbedBands.keptCensus(sigs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val priced = census.agg(coalesce(sum(expr("bc * (bc - 1) div 2")), lit(0L)))
      .head().getLong(0)
    val dec = EmbedBands.budgetDecision(sigs, census, priced, n, l, t,
      budgetBytes = Long.MaxValue)
    census.unpersist(blocking = false)
    assert(!dec.refused && dec.sampleK == 0L && dec.sampSurvivors == -1L)
    assert(dec.boundBytes == priced * GraftConf.bandedSurvivorRowBytes)
  }

  test("budgetDecision: K=1 sample counts the FULL pre-distinct survivor stream exactly") {
    import graft.functions.VectorFns.l2_norm
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", l2_norm(col("v")))
    val n = e.count()
    val r = EmbedBands.bandPlaneCount(n)
    val t = EmbedBands.maxBandableRung(n)
    val l = EmbedBands.lTable((t, r))
    val sigs = EmbedBands.bandSigs(e, r, l)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val census = EmbedBands.keptCensus(sigs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val priced = census.agg(coalesce(sum(expr("bc * (bc - 1) div 2")), lit(0L)))
      .head().getLong(0)
    assert(priced > 0, "fixture corpus must produce candidates")
    val full = EmbedBands.verifySurvivors(sigs, census, n, l, t).count()
    // sampleTarget >= priced forces K = 1: the sample IS the corpus
    val dec = EmbedBands.budgetDecision(sigs, census, priced, n, l, t,
      budgetBytes = 0L, sampleTarget = priced + 1)
    sigs.unpersist(blocking = false); census.unpersist(blocking = false)
    assert(dec.sampleK == 1L && dec.sampSurvivors == full,
      s"K=1 sample must equal the full survivor count: ${dec.sampSurvivors} vs $full")
    assert(dec.estBytes == full * GraftConf.bandedSampleSafety * GraftConf.bandedSurvivorRowBytes)
    assert(dec.refused == (dec.estBytes > 0L))
  }

  test("sorted_jaccard / sorted_overlap equal the array_intersect/array_union formulation bit-for-bit") {
    // the r12 d_setsim_join verify fix: one merge pass over doc-sorted
    // arrays must produce the SAME two exact integers (and therefore
    // the same one IEEE division) as Spark's set-semantics
    // array_intersect/array_union, including under duplicates
    import spark.implicits._
    val rnd = new scala.util.Random(12)
    val rows = (1 to 300).map { _ =>
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(30).toLong).sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(30).toLong).sorted
      (a, b)
    } :+ ((Seq.empty[Long], Seq.empty[Long])) :+ ((Seq(1L, 1L, 2L), Seq.empty[Long]))
    val df = rows.toDF("a", "b")
    val got = df.select(
      graft.functions.MinHashFns.sorted_jaccard(col("a"), col("b")).as("j"),
      graft.functions.MinHashFns.sorted_overlap(col("a"), col("b")).as("o"),
      when(size(array_union(col("a"), col("b"))) === 0, 0.0)
        .otherwise(size(array_intersect(col("a"), col("b"))).cast("double")
          / size(array_union(col("a"), col("b")))).as("jRef"),
      size(array_intersect(col("a"), col("b"))).cast("long").as("oRef")).collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)), s"jaccard mismatch: $r")
      assert(r.getLong(1) == r.getLong(3), s"overlap mismatch: $r")
    }
  }

  test("bandedPairs: an output-quadratic corpus REFUSES on the survivor budget before the distinct") {
    // the r11 planted-corpus failure mode in miniature: every pair a
    // survivor, so the pilot-sampled estimate blows a small pinned
    // budget and bandedPairs throws BEFORE any distinct shuffle
    import graft.functions.VectorFns.l2_norm
    val members = spark.range(0, 200).select(col("id").as("m"))
    val e = Tables.embeddings(spark, sf).limit(4)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .crossJoin(members)
      .select((col("vec_id") * 200 + col("m")).as("vec_id"),
        expr("transform(v, (x, j) -> x + CASE WHEN j = CAST(m % 64 AS INT) " +
          "THEN 0.001d * (1 + m % 7) ELSE 0d END)").as("v"))
      .withColumn("norm", l2_norm(col("v")))
      .repartition(4)
    val n = e.count()
    val t = EmbedBands.maxBandableRung(n)
    val key = GraftConf.bandedShuffleBudgetKey
    spark.conf.set(key, "4096")
    try {
      val ex = intercept[IllegalStateException](EmbedBands.bandedPairs(e, n, t))
      assert(ex.getMessage.contains("survivor stream"),
        s"expected the survivor-budget refusal, got: ${ex.getMessage}")
    } finally spark.conf.unset(key)
  }
}
