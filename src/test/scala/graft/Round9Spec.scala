package graft

import org.apache.spark.sql.functions._

/** Specs for round 9: the noise-floor trio's scale-safe EXECUTION
  * paths (r8 shipped priced refusals; r9 replaces them with paths
  * that complete) — block-partitioned exact brute verify, ladder
  * threshold auto-lift, adaptive BFS root sampling. Each test
  * re-derives the claim independently; the DuckDB hash gate pins the
  * cross-engine contract. */
class Round9Spec extends SparkSpec {

  test("bruteVerify: block-partitioned exact path equals the cell-blocked path pair-for-pair") {
    import graft.functions.VectorFns.l2_norm
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", l2_norm(col("v")))
    val n = e.count()
    val cell = operators.Dedup.embedPairBlocks(Tables.embeddings(spark, sf), t = 0.4)._1
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val brute = operators.Dedup.bruteVerify(e, n, t = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(brute == cell, s"brute ${brute.size} pairs vs cell ${cell.size}")
  }

  test("bruteVerify: multi-block corpus emits each qualifying pair exactly once") {
    import spark.implicits._
    import graft.functions.VectorFns.l2_norm
    // > embedBruteBlockRows vectors forces nb >= 3 so the same-block /
    // cross-block dedup logic is actually exercised (sf corpora are
    // single-block at test scale). Deterministic LCG vectors, dim 8.
    val dim = 8
    val rows = (0L until 2500L).map { i =>
      var x = i * 2654435761L % 4294967296L
      val v = Array.fill(dim) { x = (x * 1664525L + 1013904223L) % 4294967296L; x.toDouble / 4294967296.0 - 0.5 }
      (i, v.toSeq)
    }
    val e = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", l2_norm(col("v")))
    val got = operators.Dedup.bruteVerify(e, 2500L, t = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.toSet.size, "duplicate pair emitted")
    got.foreach { case (a, b) => assert(a < b, "unordered pair") }
    // exactness against an in-memory brute force
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.indices.foldLeft(0.0)((s, i) => s + a(i) * b(i))
      d / (math.sqrt(a.foldLeft(0.0)((s, x) => s + x * x)) *
        math.sqrt(b.foldLeft(0.0)((s, x) => s + x * x)))
    }
    val brute = (for {
      i <- rows.indices; j <- (i + 1) until rows.size
      if BigDecimal(cos(rows(i)._2, rows(j)._2)).setScale(6, BigDecimal.RoundingMode.HALF_UP) >= 0.5
    } yield (rows(i)._1, rows(j)._1)).toSet
    assert(got.toSet == brute, s"got ${got.length}, brute ${brute.size}")
  }

  test("effectiveThreshold: selection replays from noiseStats under the wedge budget") {
    val stats = operators.Similarity.noiseStats(spark, sf)
      .select("threshold", "est_wedges").collect()
      .map(r => (r.getDouble(0), r.getLong(1))).toMap
    assert(stats.keySet == GraftConf.cosineLadder.toSet)
    for (req <- Seq(0.25, 0.3, 0.4)) {
      val eff = operators.Similarity.effectiveThreshold(spark, sf, req)
      val ladder = GraftConf.cosineLadder.filter(_ >= req)
      val expect = ladder.find(t => stats(t) <= GraftConf.wedgeTarget).getOrElse(ladder.max)
      assert(eff == expect, s"requested $req")
      assert(eff >= req, "auto-lift never lowers a threshold")
    }
    // at test scale the corpus is sparse at every rung: nothing lifts,
    // so the oracle-pinned semantics are the historical ones
    assert(operators.Similarity.effectiveThreshold(spark, sf, 0.25) == 0.25)
    assert(operators.Similarity.effectiveThreshold(spark, sf, 0.3) == 0.3)
  }

  test("stressRootModulus: priced seeds*nodes bound picks the smallest fitting modulus") {
    import spark.implicits._
    // sf corpus: thousands of state rows at most -> m stays 2 (the
    // historical seed set; CORRECTNESS continuity)
    val pairs = operators.Dedup.embedDup(spark, sf)
      .select(col("vec_a").cast("long").as("a"), col("vec_b").cast("long").as("b"))
    assert(operators.Graph.stressRootModulus(pairs) == 2L)
    // synthetic giant component big enough that m=2 busts the target
    // (r10 retuned bfsStateTarget to 5e6): path graph over 7000 nodes
    // -> seeds(2)=3500, bound 2.45e7 > 5e6; m=16 -> 438*7000 =
    // 3.07e6 <= 5e6 (m=8 prices 6.13e6, still over)
    val big = (0L until 6999L).map(i => (i, i + 1)).toDF("a", "b")
    assert(operators.Graph.stressRootModulus(big) == 16L)
    // empty graph: any modulus is vacuously fine, smallest wins
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(operators.Graph.stressRootModulus(empty) == 2L)
  }

  test("bandCandidateReps: hot buckets are pruned; true near-dups survive via selective bands") {
    import spark.implicits._
    val cap = GraftConf.maxBandBucket.toInt
    // 128-perm signatures, 2-row bands -> band 0 = (sig(0), sig(1)).
    // Plant cap+76 docs whose band 0 is one shared hot key (the
    // common-chunk shape the 100x probe measured at 17910 members);
    // docs 0 and 1 additionally share ALL their remaining bands.
    val n = cap + 76
    def sig(i: Long): Seq[Long] = {
      val base = if (i <= 1) 0L else i // docs 0,1 share bands 1..63
      // doc 1's band 0 differs (distinct signatures -> two rep groups,
      // so the survivor is a REP pair, not an intra-group expansion)
      val band0 = if (i == 1) Seq(999L, 998L) else Seq(7L, 13L)
      band0 ++ (2 until 128).map(j => base * 1000 + j)
    }
    val sigs = (0L until n.toLong).map(i => (i, sig(i))).toDF("doc_id", "sig")
    val cands = operators.Dedup.bandCandidateReps(
      operators.Dedup.sigGroups(sigs), bandRows = GraftConf.lshBandRowsVerify)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the hot band-0 bucket (n > cap members) contributed nothing...
    assert(!cands.contains((2L, 3L)), "pair sharing ONLY the hot bucket must be pruned")
    assert(cands == Set((0L, 1L)),
      s"only the genuinely-similar pair survives, via its 63 selective bands; got ${cands.size}")
  }

  test("d_hot_buckets: census invariants hold and the cap is silent at test scale") {
    val rows = operators.Dedup.hotBuckets(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 4L, 8L))
    rows.foreach { r =>
      assert(r.getLong(1) == 128 / r.getLong(0), "n_bands")
      assert(r.getLong(4) <= r.getLong(2), "n_hot <= n_buckets")
      assert(r.getLong(6) <= r.getLong(5), "pairs_kept <= pairs_all")
      assert(r.getLong(3) >= 1, "max_bucket")
      // the cap never fires at the driver's corpora (3x headroom over
      // the measured sf0.1 maximum) - oracle behavior is unchanged
      assert(!r.getBoolean(7) && r.getLong(4) == 0, "cap fired at test scale")
      assert(r.getLong(5) == r.getLong(6), "prune changed pair volume at test scale")
    }
  }

  test("s_bucket_census: mask-ladder monotonicity and the chosen rung's arithmetic") {
    val rows = operators.Similarity.bucketCensus(spark, sf).collect().sortBy(_.getLong(0))
    val n = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(0)).toSeq == (4L to 16L))
    rows.foreach { r =>
      assert(r.getLong(1) == (1L << r.getLong(0)), "n_cells")
      assert(r.getLong(2) <= math.min(r.getLong(1), n), "occupied bound")
    }
    // refining the mask can only split buckets: occupied grows, the
    // largest bucket and the priced join volume never grow
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) >= a.getLong(2), "occupied monotone")
      assert(b.getLong(3) <= a.getLong(3), "max_bucket monotone")
      assert(b.getLong(4) <= a.getLong(4), "join_rows monotone")
    case _ => ()
    }
    val chosen = rows.filter(_.getBoolean(5)).map(_.getLong(0))
    assert(chosen.length == 1, "exactly one chosen rung")
    assert(chosen.head == operators.Similarity.adaptivePlaneCount(n).toLong)
    assert((1L << chosen.head) * GraftConf.annBucketRows >= n, "chosen rung fits the target")
  }

  test("noiseStats memo: one measurement per session serves floor audit and threshold picks") {
    val a = operators.Similarity.noiseStats(spark, sf)
    val b = operators.Similarity.noiseStats(spark, sf)
    // memoized: both frames scan the same materialized file (same plan)
    assert(a.queryExecution.analyzed.sameResult(b.queryExecution.analyzed))
  }
}
