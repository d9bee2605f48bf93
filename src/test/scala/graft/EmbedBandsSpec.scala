package graft

import org.apache.spark.sql.functions._
import graft.operators.EmbedBands

/** Round 10: the SimHash-banded embedding pair path — the execution
  * path past [[GraftConf.maxBrutePairs]] where r9 could only refuse.
  * The DuckDB hash gate (s_band_edges) pins the cross-engine replay;
  * these tests pin the claims the oracle can't see: the realized
  * recall against the EXACT pair set, the geometry solver's
  * invariants, and the gate wiring inside embedPairBlocks. */
class EmbedBandsSpec extends SparkSpec {

  test("lTable: solved band counts satisfy the recall target and the fallback rung is total") {
    val target = GraftConf.bandRecallTarget
    EmbedBands.lTable.foreach { case ((t, r), l) =>
      val q = 1.0 - math.acos(t) / math.Pi
      val recall = 1.0 - math.pow(1.0 - math.pow(q, r), l)
      assert(recall >= target, s"(t=$t, r=$r, L=$l) recall $recall < $target")
      assert(l >= 1 && l <= GraftConf.maxBands)
      // minimality: one band fewer must miss the target
      if (l > 1) {
        val below = 1.0 - math.pow(1.0 - math.pow(q, r), l - 1)
        assert(below < target, s"(t=$t, r=$r) L=$l not minimal")
      }
    }
    // the banded-path threshold fallback must exist at EVERY corpus
    // plane count, or effectiveThreshold's banded branch could throw
    (EmbedBands.MinPlanes to EmbedBands.MaxPlanes).foreach { r =>
      assert(EmbedBands.lTable.contains((GraftConf.cosineLadder.max, r)),
        s"top rung not bandable at r=$r")
    }
  }

  test("bandPlaneCount: smallest r with 2^r*bandBucketRows >= n, capped") {
    assert(EmbedBands.bandPlaneCount(1) == EmbedBands.MinPlanes)
    assert(EmbedBands.bandPlaneCount(16L * GraftConf.bandBucketRows) == EmbedBands.MinPlanes)
    assert(EmbedBands.bandPlaneCount(16L * GraftConf.bandBucketRows + 1) == 5)
    assert(EmbedBands.bandPlaneCount(200000) == 10)
    assert(EmbedBands.bandPlaneCount(Long.MaxValue / 4) == EmbedBands.MaxPlanes)
  }

  test("sign pool: balanced planes, no identical pair in the working range") {
    val planes = (0 until 512).map(gp => (0 until EmbedBands.Dim).map(i => EmbedBands.sign(gp, i)))
    planes.zipWithIndex.foreach { case (p, gp) =>
      assert(math.abs(p.sum) <= 32, s"plane $gp unbalanced: ${p.sum}")
    }
    // the r10 finding this formula replaced: a linear multiplicative
    // hash produced IDENTICAL planes at small offsets (recall 0.69)
    val asSets = planes.map(_.toIndexedSeq)
    val maxDot = (for {
      a <- 0 until 512; b <- (a + 1) until 512
    } yield math.abs(asSets(a).lazyZip(asSets(b)).map(_ * _).sum)).max
    assert(maxDot < EmbedBands.Dim, "two planes in the pool are (anti-)identical")
  }

  test("bandedPairs: exact-verified subset of the brute pair set with recall >= 0.85") {
    import graft.functions.VectorFns.l2_norm
    val t = 0.4
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", l2_norm(col("v")))
    val n = e.count()
    val exact = operators.Dedup.bruteVerify(e, n, t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val banded = EmbedBands.bandedPairs(e, n, t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(banded.subsetOf(exact), "banded emitted a pair the exact verify rejects")
    val recall = banded.size.toDouble / exact.size
    // design floor is 0.95 per pair under ideal hyperplanes; the
    // Rademacher realization on this corpus measures 0.92-0.98 —
    // 0.85 leaves room for testdata regeneration without ever
    // tolerating the 0.69 failure mode the hash fix removed
    assert(exact.nonEmpty && recall >= 0.85, s"recall $recall (${banded.size}/${exact.size})")
  }

  test("embedPairBlocks gate: past maxBrutePairs the banded path runs (tiny-cap shim)") {
    // the gate is one integer comparison on n — exercise the real
    // branch by REUSING bandedPairs on the corpus and checking
    // embedPairBlocks' banded output matches it when the gate is
    // simulated: equality of the two constructions at the same t is
    // the contract embedPairBlocks switches between
    import graft.functions.VectorFns.l2_norm
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", l2_norm(col("v")))
    val n = e.count()
    assert(n * (n - 1) / 2 <= GraftConf.maxBrutePairs,
      "test corpus unexpectedly past the exact envelope — gate untestable this way")
    // exact path live at this scale: probes table non-empty, pairs exact
    val (pairs, probes) = operators.Dedup.embedPairBlocks(Tables.embeddings(spark, sf), t = 0.4)
    assert(pairs.count() > 0 && probes.columns.toSeq == Seq("vec_id", "cell"))
  }

  test("embedPairBlocks banded branch: seam-forced gate returns banded pairs + empty probes") {
    // ADVICE r10: the banded RETURN PATH of embedPairBlocks (threshold
    // pass-through, empty probes frame schema) was only covered
    // indirectly via bandedPairs — drive it directly through the
    // package-private gate seam on a corpus small enough to also hold
    // the banded reference result
    import graft.functions.VectorFns.l2_norm
    val t = 0.4
    val (pairs, probes) =
      operators.Dedup.embedPairBlocks(Tables.embeddings(spark, sf), t = t, maxBrutePairs = 0L)
    // probes: the exact path's pruning diagnostic — banded path has no
    // cells, so the frame must be EMPTY with the exact path's schema
    assert(probes.columns.toSeq == Seq("vec_id", "cell") && probes.count() == 0L,
      "banded branch must return an empty probes frame with the exact path's schema")
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", l2_norm(col("v")))
    val n = e.count()
    val reference = EmbedBands.bandedPairs(e, n, t)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the seam passes t THROUGH unchanged and returns bandedPairs'
    // result verbatim — set equality, not subset
    assert(got == reference,
      s"banded branch result diverges from bandedPairs: ${got.size} vs ${reference.size}")
    assert(got.nonEmpty, "vacuous: no banded pairs at the test scale")
  }

  test("banded verify-join plan: shuffled-hash (no sort) over one reused exchange") {
    // the r10 x100 finding as a standing certificate: a sort-merge
    // join SORTS both 520-byte-vector sides (~10 GB of measured
    // spill); the plan must hash-join, and the two self-join sides
    // must ship ONE exchange (ReuseExchange), not two
    import graft.functions.VectorFns.l2_norm
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", l2_norm(col("v")))
    val n = e.count()
    val plan = EmbedBands.bandedPairsPlan(e, n, t = 0.4)
    plan.localCheckpoint() // execute so AQE's final plan exists
    val nodes = org.apache.spark.sql.graftbridge.PlanProbe.nodes(plan)
      .map(_.getClass.getSimpleName)
    assert(nodes.exists(_.contains("ShuffledHashJoin")),
      s"verify join must be shuffled-hash, saw: ${nodes.filter(_.contains("Join")).distinct}")
    assert(!nodes.exists(_.contains("SortMergeJoin")),
      "verify join fell back to sort-merge — the x100 spill shape")
    assert(nodes.exists(_.contains("ReusedExchange")),
      "self-join sides must reuse one exchange")
  }

  test("effectiveThreshold: unchanged at test scales, and requested above the ladder top falls back") {
    // ADVICE r9: requested > ladder.max used to throw on the empty
    // filtered ladder; now it falls back to the unfiltered top
    val t = operators.Similarity.effectiveThreshold(spark, sf, requested = 0.99)
    assert(t == GraftConf.cosineLadder.max)
    assert(operators.Similarity.effectiveThreshold(spark, sf, requested = 0.4) == 0.4)
  }
}
