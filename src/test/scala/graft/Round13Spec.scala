package graft

import org.apache.spark.sql.functions._
import graft.operators.EmbedBands

/** Round-13 regression pins: the budget pilot's empty-sample fallback
  * (ADVICE r12) and the resource-derived shuffle budget's dir hygiene
  * (ADVICE r12 — nonexistent dirs zeroing the budget, duplicate dirs
  * double-counting one filesystem). */
class Round13Spec extends SparkSpec {

  test("budgetDecision: an EMPTY 1/K sample refuses on the worst-case bound, never extrapolates 0") {
    // ADVICE r12: when the bucket hash selects zero candidate-bearing
    // buckets, samp = 0 and est = 0 would wave through the exact
    // output-quadratic regime the budget guards. Fixture: one bucket
    // (band 0, sig 1) of 100 members -> priced = 4950; sampleTarget = 1
    // forces K = 4950, and bucketHash(0, 1) = 892577406 ≡ 3306 (mod
    // 4950) ≠ 0, so the deterministic sample is provably empty.
    import spark.implicits._
    val census = Seq((0, 1L, 100L)).toDF("band", "sig", "bc")
    val sigs = Seq((0, 1L, 1L, Array(1.0), 1.0))
      .toDF("band", "sig", "vec_id", "v", "norm") // never evaluated on this branch
    val priced = 4950L
    val dec = EmbedBands.budgetDecision(sigs, census, priced, n = 100L, l = 1,
      t = 0.5, budgetBytes = 1L, sampleTarget = 1L)
    assert(dec.sampleK == 4950L, s"K must be ceil(priced/target): ${dec.sampleK}")
    assert(dec.sampCandidates == 0L && dec.sampSurvivors == -1L,
      "empty sample must be recorded as no-measurement, not a zero rate")
    assert(dec.refused && dec.estBytes == dec.boundBytes,
      s"empty sample must fall back to the worst-case bound and refuse: $dec")
  }

  test("budgetDecision: a NON-empty sample still measures (control for the empty-sample pin)") {
    // same fixture, K = 1 (sampleTarget >= priced): the single bucket IS
    // sampled, candidates are counted from the census, and the verify
    // join runs — survivors 0 here (orthogonal unit vectors below t),
    // so est = 0 and the decision PROCEEDS on a real measurement.
    import spark.implicits._
    val census = Seq((0, 1L, 2L)).toDF("band", "sig", "bc")
    val sigs = Seq(
      (0, 1L, 1L, Array(1.0, 0.0), 1.0),
      (0, 1L, 2L, Array(0.0, 1.0), 1.0))
      .toDF("band", "sig", "vec_id", "v", "norm")
    val dec = EmbedBands.budgetDecision(sigs, census, priced = 1L, n = 2L, l = 1,
      t = 0.5, budgetBytes = 0L, sampleTarget = 2L)
    assert(dec.sampleK == 1L && dec.sampCandidates == 1L && dec.sampSurvivors == 0L)
    assert(!dec.refused && dec.estBytes == 0L,
      s"a measured zero rate is a measurement and proceeds: $dec")
  }

  test("bandedShuffleBudgetBytes: nonexistent dirs don't zero the budget; duplicate dirs don't double it") {
    // ADVICE r12: File.getUsableSpace on a not-yet-created spark.local.dir
    // returns 0 (would refuse every sampled corpus), and two entries on
    // one filesystem summed twice would inflate the budget past real
    // capacity. The derived budget must be positive and must equal the
    // single-filesystem budget when the dir list repeats one filesystem.
    val b = GraftConf.bandedShuffleBudgetBytes(spark)
    assert(b > 0L, s"derived budget must be positive: $b")
    // duplicate-dir invariance: pin-free derivation already dedupes by
    // FileStore, so two tmpdir entries read the same as one. (The
    // spark.local.dir conf is static per JVM; the invariant is checked
    // through the same private derivation path via the pin fallback.)
    val tmp = System.getProperty("java.io.tmpdir", "/tmp")
    val one = java.nio.file.Files.getFileStore(new java.io.File(tmp).toPath)
    val cwd = java.nio.file.Files.getFileStore(new java.io.File(".").toPath)
    if (one == cwd) {
      // same filesystem -> usable space identical; budget derived from
      // {tmp} and {tmp, cwd} must agree (dedupe, not sum)
      val u1 = new java.io.File(tmp).getUsableSpace
      assert(math.abs(b - u1 / 2) <= u1 / 10,
        s"budget $b should be ~half of the (deduped) usable space $u1")
    }
  }
}
