package graft

import graft.operators.Relational

/** Locks in the scale-posture claims as assertions on executed plans:
  * pushdown reaching the scan, dimensions broadcast, top-k compiling to
  * TakeOrderedAndProject — regressions here are silent performance bugs
  * that correctness checks never see.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q2: filter and projection are pushed into the parquet scan") {
    val p = plan(Relational.q2FilterProject(spark, sf))
    assert(p.contains("PushedFilters: ["), "expected pushed filters in scan")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("LessThan(l_quantity"),
      s"expected the query predicates pushed, got:\n${p.take(800)}")
    assert(p.contains("ReadSchema") && !p.contains("l_tax"),
      "projection pruning should drop unused columns from the scan")
  }

  test("q3: dimension joins are broadcast, top-k is TakeOrderedAndProject") {
    val p = plan(Relational.q3JoinAgg(spark, sf))
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(p.contains("TakeOrderedAndProject"), "limit+sort must compile to top-k")
  }

  test("q10: star join broadcasts all dimensions") {
    val p = plan(Relational.q10StarJoin(spark, sf))
    val broadcasts = p.split("\n").count(_.contains("BroadcastHashJoin"))
    assert(broadcasts >= 3, s"expected >=3 broadcast joins in the star, saw $broadcasts")
  }

  test("q1: aggregation is two-phase (partial map-side, final after shuffle)") {
    val p = plan(Relational.q1Agg(spark, sf))
    assert(p.split("\n").count(_.contains("HashAggregate")) >= 2,
      "expected partial+final HashAggregate pair")
  }

  test("d_embed_dup: no cartesian product — candidates flow through cell equi-joins") {
    val p = plan(graft.operators.Dedup.embedDup(spark, sf))
    assert(!p.contains("CartesianProduct"),
      s"embedDup must not materialize an O(n²) cartesian product:\n${p.take(800)}")
  }

  test("q26_asof: one window per key, no cartesian product or range explosion") {
    val p = plan(graft.operators.RelationalExt.q26Asof(spark, sf))
    assert(!p.contains("CartesianProduct"), "as-of join must not cross-join")
    assert(!p.contains("BroadcastNestedLoopJoin"), "as-of join must not range-join")
    assert(p.contains("Window"), "expected the running-max window")
  }

  test("p_mix: pure map-side sampling — no aggregate or join shuffles") {
    val p = plan(graft.operators.Pipeline.mix(spark, sf))
    assert(!p.contains("HashAggregate") && !p.contains("Join"),
      s"mix must stay map-side:\n${p.take(600)}")
  }

  test("d_substring: candidates flow through a fingerprint equi-join, no cartesian") {
    val p = plan(graft.operators.Dedup.substringDup(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"substring dedup must block on fingerprints, not cross-join:\n${p.take(800)}")
  }

  test("s_ann_pq: codebook and ADC are broadcast, ranking never shuffles vector arrays") {
    val p = plan(graft.operators.Similarity.annPq(spark, sf))
    assert(!p.contains("CartesianProduct"), "PQ must not cross-join the corpus")
    assert(p.contains("BroadcastHashJoin"), "codebook/ADC joins must broadcast")
  }

  test("mr_sort: offsets broadcast back, ranking window parallelizes per bucket") {
    val p = plan(graft.operators.MapReduceQueries.sortRank(spark, sf))
    assert(p.contains("BroadcastHashJoin"), "bucket offsets must broadcast, not shuffle the data side")
    assert(p.contains("hashpartitioning(bucket"),
      s"per-bucket ranking window must partition by bucket:\n${p.take(800)}")
  }

  test("d_bloom: bitset and train fingerprints broadcast, no cartesian") {
    val p = plan(graft.operators.Dedup.bloom(spark, sf))
    assert(p.split("\n").count(_.contains("BroadcastHashJoin")) >= 2,
      "bloom positions and exact-verify joins must broadcast the small side")
    assert(!p.contains("CartesianProduct"))
  }

  test("p_pack: packing windows partition by bucket — no global single-partition pass over the data") {
    val p = plan(graft.operators.Pipeline.pack(spark, sf))
    assert(p.contains("hashpartitioning(bucket"),
      s"running-sum window must partition by bucket:\n${p.take(800)}")
    assert(!p.contains("SinglePartition"),
      s"no stage of packing may collapse the data to one partition:\n${p.take(800)}")
  }
  test("q34_gapfill: the hour grid is broadcast — densification never shuffles on grid size") {
    val p = plan(graft.operators.RelationalExt2.q34GapFill(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "hour-grid cross join must broadcast the tiny grid side")
    assert(!p.contains("CartesianProduct"), "no cartesian product in gap fill")
  }

  test("t_kwic: match predicate is evaluated before snippet surgery (filter below project)") {
    val p = plan(graft.operators.TextAnalysis.kwic(spark, sf))
    assert(p.contains("PushedFilters") || p.indexOf("Filter") > p.indexOf("Project"),
      "instr predicate should gate the row before substring work")
  }

  test("q35_histogram: bounds broadcast, histogram aggregate is two-phase") {
    val p = plan(graft.operators.RelationalExt2.q35Histogram(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "1-row bounds must broadcast")
    assert(p.split("\n").count(_.contains("HashAggregate")) >= 2,
      "bucket counts must partial-aggregate map-side")
  }

  test("d_containment_join: candidates flow through the shingle-hash equi-join, no cartesian") {
    val p = plan(graft.operators.Dedup.containmentJoin(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"containment join must block on prefix-shingle hashes:\n${p.take(800)}")
  }

  test("m_phash: pairs come from chunk-equality blocking, never all-pairs") {
    val p = plan(graft.multimodal.Multimodal.phash(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"phash must block on 16-bit chunks:\n${p.take(800)}")
  }

  test("q43_trailing_dau: WAU votes partial-aggregate; the max-day bound is broadcast") {
    val p = plan(graft.operators.RelationalExt3.q43TrailingDau(spark, sf))
    assert(!p.contains("CartesianProduct"), "trailing-DAU must not cross-join")
    assert(p.split("\n").count(_.contains("HashAggregate")) >= 2,
      "distinct-vote counting must be two-phase")
  }

  test("d_lsh_tune: band configs flow through equi-joins; only the 1-row truth count crosses") {
    val p = plan(graft.operators.Dedup.lshTune(spark, sf))
    assert(!p.contains("CartesianProduct"),
      s"band sweep must join on (band_idx, band_hash):\n${p.take(800)}")
    // the single BroadcastNestedLoopJoin is the broadcast 1-row truth
    // aggregate against the 3 config rows — constant-size by construction
    assert(p.split("\n").count(_.contains("BroadcastNestedLoopJoin")) <= 1,
      "candidate generation must never nested-loop")
  }

  test("s_radius: threshold filter applies in the scan-side projection, no sort-based top-k") {
    val p = plan(graft.operators.Similarity.radius(spark, sf))
    assert(!p.contains("CartesianProduct"), "query side must broadcast")
    assert(p.contains("Filter"), "threshold must be a filter, not a limit")
  }

  test("m_png_meta: header parse is one map-side scan — no shuffle, no join") {
    val p = plan(graft.multimodal.Multimodal.pngMeta(spark, sf))
    assert(!p.contains("HashAggregate") && !p.contains("Join"),
      s"IHDR parsing must stay map-side:\n${p.take(600)}")
  }

  test("d_minhash_lsh: candidates flow through band equi-joins after rep collapse") {
    val p = plan(graft.operators.Dedup.minhashLsh(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"band candidates must equi-join:\n${p.take(800)}")
  }

  test("s_ivf_probe_sweep: probe tables broadcast; the corpus is never nested-looped") {
    val p = plan(graft.operators.Similarity.ivfProbeSweep(spark, sf))
    assert(!p.contains("CartesianProduct"),
      s"probe sweep must not cross-join the corpus:\n${p.take(800)}")
    assert(p.contains("BroadcastHashJoin"), "probe cell lists must broadcast")
  }

  test("p_dataset_diff: two manifest aggregations and one 16-row join, nothing quadratic") {
    val p = plan(graft.operators.Pipeline.datasetDiff(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"manifest diff must stay linear:\n${p.take(600)}")
    assert(p.split("\n").count(_.contains("HashAggregate")) >= 2,
      "per-shard manifests must partial-aggregate")
  }

  test("t_bm25: df/avgdl scalars broadcast; ranking compiles to top-k") {
    val p = plan(graft.operators.TextAnalysis.bm25(spark, sf))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "corpus statistics must broadcast, not shuffle the token stream")
    assert(p.contains("TakeOrderedAndProject"), "top-10 must compile to top-k")
    assert(!p.contains("CartesianProduct"), "no cartesian in the scoring join")
  }

  test("t_bigram_lm: context cut is top-k; the rank window runs after a broadcast join") {
    val p = plan(graft.operators.TextAnalysis.bigramLm(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), "top-20 contexts must compile to top-k")
    assert(p.contains("BroadcastHashJoin"), "context slice must broadcast-semi-join")
    assert(p.split("\n").count(_.contains("HashAggregate")) >= 2,
      "bigram counts must partial-aggregate map-side")
  }

  test("q50_rfm: quintile edges broadcast; no global sort window") {
    val p = plan(graft.operators.RelationalExt3.q50Rfm(spark, sf))
    assert(!p.contains("Window"), "scoring must use broadcast edges, not an ntile window")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the 1-row edge tables must broadcast")
  }

  test("g_assortativity: moments partial-aggregate; degree joins are equi-joins") {
    val p = plan(graft.operators.Graph.assortativity(spark, sf))
    assert(!p.contains("CartesianProduct"), "only the 1-row moment/count tables may cross")
    assert(p.split("\n").count(_.contains("HashAggregate")) >= 2,
      "moment sums must partial-aggregate")
  }

  test("s_knn_acc: sampled queries broadcast against one corpus scan") {
    val p = plan(graft.operators.Similarity.knnAcc(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "the sampled query side must broadcast")
    assert(!p.contains("SortMergeJoin"), "the corpus must never shuffle for the scan join")
  }

  test("m_wav_meta: header parse is map-side after the codec step — no join, no agg") {
    val p = plan(graft.multimodal.Multimodal.wavMeta(spark, sf))
    assert(!p.contains("HashAggregate") && !p.contains("Join"),
      s"RIFF parsing must stay map-side:\n${p.take(600)}")
  }

  test("s_outliers: centroid table broadcasts back; component sums partial-aggregate") {
    val p = plan(graft.operators.Similarity.outliers(spark, sf))
    assert(p.contains("BroadcastHashJoin"), "label centroids must broadcast")
    assert(p.split("\n").count(_.contains("HashAggregate")) >= 2,
      "micros component sums must partial-aggregate")
    assert(p.contains("TakeOrderedAndProject"), "top-20 must compile to top-k")
  }

  test("g_modularity: label joins are equi-joins; only 1-row totals cross") {
    val p = plan(graft.operators.Graph.modularity(spark, sf))
    assert(!p.contains("CartesianProduct"),
      s"only broadcast scalars may cross:\n${p.take(800)}")
  }

  test("t_span_dedup: block-frequency join is a hash join, never cartesian") {
    val p = plan(graft.operators.TextAnalysis.spanDedup(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"span dedup must equi-join on the block key:\n${p.take(800)}")
    assert(p.split("\n").count(_.contains("HashAggregate")) >= 2,
      "block-frequency count must partial-aggregate map-side")
  }

  test("t_token_gini: rank window partitions by doc, never a global sort") {
    val p = plan(graft.operators.TextAnalysis.tokenGini(spark, sf))
    assert(p.contains("hashpartitioning(doc_id"),
      s"gini rank window must partition by doc_id:\n${p.take(800)}")
  }

  test("p_incremental: merge is an outer hash join over two partial aggregates") {
    val p = plan(graft.operators.Pipeline.incremental(spark, sf))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("FullOuter") || p.contains("full_outer"),
      s"expected the full-outer merge join:\n${p.take(800)}")
    assert(p.split("\n").count(_.contains("HashAggregate")) >= 4,
      "both slices must partial-aggregate before the merge")
  }

  test("p_reshard_cost: ring ownership folds into one projection — no window, no join") {
    val p = plan(graft.operators.Pipeline.reshardCost(spark, sf))
    assert(!p.contains("Window"), s"ring argmin must not window-shuffle:\n${p.take(600)}")
    assert(!p.contains("Join"), s"node table must fold into the projection:\n${p.take(600)}")
  }

  test("p_cdc_apply: last-writer-wins is a two-phase aggregate — no per-key history sort") {
    val p = plan(graft.operators.Pipeline.cdcApply(spark, sf))
    assert(!p.contains("Window"),
      s"CDC apply must be the aggregate form, not a windowed argmax:\n${p.take(800)}")
    assert(p.split("\n").count(_.contains("HashAggregate")) >= 2 ||
      p.split("\n").count(_.contains("SortAggregate")) >= 2,
      "struct-max must run partial+final (map-side combinable)")
  }

  test("t_lm_score: model joins hash, never cartesian; scoring aggregates two-phase") {
    val p = plan(graft.operators.TextAnalysis.lmScore(spark, sf))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bigram-model lookup must be an equi-join:\n${p.take(800)}")
    assert(p.split("\n").count(_.contains("HashAggregate")) >= 2,
      "per-doc scoring must partial-aggregate")
  }

  test("hot paths run inside whole-stage codegen spans") {
    // the claims in README/SURVEY about codegen'd scalar loops are
    // plan-checkable: the heavy per-row work (sketches, header parses,
    // aggregation pipelines) must sit INSIDE WholeStageCodegen stages,
    // not fall back to interpreted evaluation
    Seq(
      "q1_agg" -> graft.operators.Relational.q1Agg(spark, sf),
      "t_fingerprint" -> graft.operators.TextAnalysis.fingerprint(spark, sf),
      "m_png_meta" -> graft.multimodal.Multimodal.pngMeta(spark, sf)
    ).foreach { case (name, df) =>
      // AQE prints codegen stages only in the FINAL plan — materialize
      // THIS dataset's own plan (count() would wrap it in a new one),
      // then walk the resolved tree (the PlanProbe discipline)
      df.collect()
      val spans = org.apache.spark.sql.graftbridge.PlanProbe.nodes(df)
        .count(_.getClass.getSimpleName == "WholeStageCodegenExec")
      assert(spans >= 1, s"$name must run inside whole-stage codegen (0 spans)")
    }
  }

  test("s_ann_matryoshka: both stages compile to top-k, corpus never self-joins") {
    val p = plan(graft.operators.Similarity.annMatryoshka(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      s"coarse/final cuts must be top-k operators, not global sorts:\n${p.take(800)}")
    assert(!p.contains("CartesianProduct"), "corpus must not cross-join itself")
  }

  test("q64: endpoint collapse partial-aggregates map-side before the sweep window") {
    val p = plan(graft.operators.RelationalExt5.q64IntervalOverlap(spark, sf))
    assert(p.split("\n").count(_.contains("HashAggregate")) >= 2,
      "the (type, t) collapse must run partial+final so raw events die map-side")
    assert(p.contains("Window"), "expected the running-sum sweep window")
  }

  test("q65: bitmap overlap is a block-keyed equi-join, never a cartesian") {
    val p = plan(graft.operators.RelationalExt5.q65BitmapDistinct(spark, sf))
    assert(!p.contains("CartesianProduct"),
      s"segment overlap must join on block id, not cross-join users:\n${p.take(600)}")
  }

  test("q66: variant extraction prunes the scan to (event_type, props)") {
    val p = plan(graft.operators.RelationalExt5.q66Variant(spark, sf))
    assert(p.contains("ReadSchema") && !p.contains("user_id") && !p.contains("value"),
      "the variant pipeline must not drag unused columns through the scan")
  }

  test("q69: null-safe equality still plans as a broadcast hash join") {
    val p = plan(graft.operators.RelationalExt5.q69NullSafeJoin(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"<=> must be usable as a hash join key, not decay to nested-loop:\n${p.take(600)}")
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("t_bpe_apply: per-doc encoding joins the vocabulary, never re-tokenizes rows") {
    // the corpus-side plan must be ONE term-count aggregate + a join to
    // the (tiny) merged vocabulary — no per-round corpus scans
    val p = plan(graft.operators.TextAnalysis.bpeApply(spark, sf))
    val scans = p.split("\n").count(l => l.contains("FileScan") && l.contains("documents"))
    assert(scans <= 2, s"apply must not rescan the corpus per merge round, saw $scans scans")
  }
}
