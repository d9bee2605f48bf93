package graft

import org.apache.spark.sql.functions._

/** Round-10 regression pins outside the banded-path suite
  * ([[EmbedBandsSpec]]). */
class Round10Spec extends SparkSpec {

  test("Shared.memo is reentrant: a build may read another memo (nested)") {
    // r10 regression: computeIfAbsent-held builds threw "Recursive
    // update" when a nested memo landed in the same hash bin — an
    // order- and key-set-dependent accident that failed three Bench
    // queries (embed_dup's threshold reads the noise_stats memo,
    // dup_clusters builds over ngram_jaccard). The memo now builds
    // outside the map update.
    import spark.implicits._
    val out = operators.Shared.memo(spark, "/memo-reentrancy-test", "outer") {
      val inner = operators.Shared.memo(spark, "/memo-reentrancy-test", "inner")(
        Seq(1L).toDF("x"))
      inner.withColumn("y", col("x") + 1)
    }
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
  }

  test("d_cap_fires: bounded fixture fires the cap and loses no planted pair at test scale") {
    val r = operators.Dedup.capFires(spark, sf).collect().head
    assert(r.getAs[Long]("n_docs") == 6000L)
    assert(r.getAs[Boolean]("cap_fired"), "planted hot buckets must exceed maxBandBucket")
    assert(r.getAs[Long]("max_bucket") > GraftConf.maxBandBucket)
    assert(r.getAs[Boolean]("found_all_planted"), "a true j>=0.5 pair was lost to the cap")
    assert(r.getAs[Long]("n_planted") == 50L)
  }
}
