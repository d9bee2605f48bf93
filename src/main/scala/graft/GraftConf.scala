package graft

/** The engine's scale tunables in ONE place — every constant here is a
  * knob a 100 TB deployment would retune, with its current value being
  * the measured-good default for the driver's test scales. Values are
  * deliberately plain `val`s (not SparkConf entries): each is coupled to
  * query semantics or to a paired DuckDB oracle, so changing one is a
  * code change that must be re-verified, not a runtime flag.
  */
object GraftConf {

  /** Reduce-side partition count for the MapReduce-facade queries
    * (`MR_Run`'s `num_parts`, mapreduce.c:168). At 100 TB this follows
    * shuffle volume like `spark.sql.shuffle.partitions` would; the
    * facade's djb2 partitioner is deterministic in this count, so the
    * value is part of the mr_partition_hist-style layout contract.
    * (mr_partition_hist itself pins num_parts=10 for reference
    * `result-<p>.txt` parity and does not read this.) */
  val mrNumParts: Int = 8

  /** Target edge volume per partition for the iterative RDD loops
    * (connected components, PageRank, BFS). Loop fan-out follows the
    * DATA, not the upstream scan width: a small graph contracts inside
    * one union-find partition, a 100 TB pair graph fans out to
    * thousands. ~500k (src,dst) longs ≈ 8 MB per partition — small
    * enough that a round's join output fits comfortably in executor
    * memory, large enough that per-partition scheduling overhead stays
    * negligible. */
  val edgesPerPartition: Long = 500000L

  /** Partition count for an iterative loop over `nEdges` edges, capped
    * at `cap` (callers pass the source RDD's width — fanning out past
    * the scan gains nothing locally). */
  def partitionsForEdges(nEdges: Long, cap: Int): Int =
    math.max(1, math.min(cap,
      ((nEdges + edgesPerPartition - 1) / edgesPerPartition).toInt))

  /** Per-user admission cap per tumbling UTC day for the streaming rate
    * throttle ([[graft.streaming.EventStream.throttle]]). COUPLED TO THE
    * ORACLE (the cap appears as a literal in the SQL twin); production
    * deployments retune per abuse-policy, with window width a code
    * change for the same reason. */
  val throttleCapPerDay: Long = 3L

  /** Wedge budget for the triangle-family graph operators
    * ([[graft.operators.Graph.cliques4]]/[[graft.operators.Graph.ktruss]]):
    * the ordered wedge join's row count is Σ_v d(v)·(d(v)−1)/2, priced
    * from the degree table BEFORE the join is paid (the
    * d_width_sweep cost-calibration discipline). A cosine threshold
    * sitting inside the unrelated-pair noise floor makes the edge set
    * ~n²·p dense and triangle work n³ — the round-8 scale probe
    * measured exactly that (10× corpus → ~1000× shuffle, 109 GB, DNF),
    * so a priced join beyond this budget THROWS with retuning guidance
    * instead of silently grinding. sf0.1 prices ~7·10⁷ — two orders
    * of headroom. */
  val maxWedges: Long = 2L * 1000 * 1000 * 1000

  /** Threshold-SELECTION budget for the similarity-graph family
    * ([[graft.operators.Graph.cliques4]]/[[graft.operators.Graph.ktruss]]):
    * the smallest ladder threshold whose noise-floor-priced wedge
    * volume (round(n·d̄²/2), estimated from the deterministic stride
    * sample — [[graft.operators.Similarity.noiseFloor]]) fits this
    * budget becomes the effective threshold. Deliberately ~10× below
    * [[maxWedges]]: the hard cap is "refuse rather than OOM", this is
    * "pick a threshold that runs COMFORTABLY" — the round-8 probe
    * measured the 0.3 graph at 10× pricing ~2·10⁸ wedges and still
    * DNF-ing inside a 420 s probe window (5 peeling rounds × a 5 GB
    * wedge shuffle each), so comfort is the right selection bar.
    * COUPLED TO ORACLES: the SQL twins replay the identical selection
    * arithmetic, so the effective threshold is part of each operator's
    * cross-engine contract, not a runtime heuristic. */
  val wedgeTarget: Long = 100L * 1000 * 1000

  /** The threshold ladder the similarity-graph family may auto-lift
    * through (ascending; the top rung is the fallback when even it
    * prices over [[wedgeTarget]] — at that density the corpus has no
    * meaningful similarity structure to mine). Mirrored as literals in
    * the SQL twins and in [[graft.operators.Similarity.noiseFloor]]'s
    * audit rows.
    *
    * r10 extended the ladder past 0.6: the unrelated-pair cosine
    * noise floor RISES with corpus size (max of ~n²/2 N(0, 1/dim)
    * draws — ≈ 0.86 at 200 k dim-64 vectors), so at 100× every rung
    * of the old ladder sat inside the noise tail and the family could
    * only refuse. The high rungs are also where SimHash banding
    * ([[graft.operators.EmbedBands]]) prunes hard enough to replace
    * the exact all-pairs verify past [[maxBrutePairs]]. */
  val cosineLadder: Seq[Double] = Seq(0.25, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95)

  /** Pair budget for the BLOCK-PARTITIONED exact brute verify
    * ([[graft.operators.Dedup.embedPairBlocks]]'s fallback when the
    * priced cell-candidate join says the angular prune is void —
    * isotropic corpora, thresholds inside the noise floor): n·(n−1)/2
    * dot products, computed in-stream inside whole-stage codegen with
    * shuffle bounded at O(n·√pairs/blockRows) vector bytes (each
    * vector rides ≤ B+1 block-pair partitions, never n²). 2.5·10⁹
    * pairs ≈ 1.6·10¹¹ multiply-adds at dim 64 — minutes on one node,
    * bounded memory; beyond it the exact all-pairs answer is
    * genuinely super-cluster-scale and the operator refuses with the
    * priced volume. The 10× probe corpus needs 2·10⁸ (12× headroom). */
  val maxBrutePairs: Long = 2500L * 1000 * 1000

  /** Rows per block for the brute verify's block-pair join: sized so a
    * block-pair task (~rows² dots) is a few seconds of vectorized
    * compute and a buffered join group (rows · dim doubles ≈ 0.5 MB)
    * always fits executor memory. */
  val embedBruteBlockRows: Int = 1000

  /** Candidate budget for the embedding pair-block join
    * ([[graft.operators.Dedup.embedPairBlocks]]): the cell join's row
    * count Σ probes(c)·members(c), priced from two narrow aggregates
    * before any vector rides a shuffle. sf0.1 prices 4·10⁶ (the
    * angular prune is void on the synthetic corpus — every vector
    * probes every cell, making the join n²); 25× headroom here, and
    * the 10× probe corpus (4·10⁸) correctly THROWS. */
  val maxEmbedCandidates: Long = 100L * 1000 * 1000

  /** Cumulative (root, node) state budget for multi-source BFS
    * operators ([[graft.operators.Graph.stress]]): state is
    * roots × reachable, which goes quadratic once a similarity-graph
    * threshold drops into the unrelated-pair cosine tail and the
    * components coalesce. Counted per round on the already-
    * materialized frontier (one cached-block pass), THROWS over
    * budget. sf0.1 uses ~10⁵ rows — three orders of headroom. */
  val maxBfsStateRows: Long = 100L * 1000 * 1000

  /** Root-sampling TARGET for multi-source BFS: [[graft.operators.Graph.stress]]
    * now SIZES its root set before the walk instead of discovering
    * mid-flight that the state went quadratic — the smallest modulus m
    * in [[stressRootModuli]] whose priced state bound
    * seeds(m)·n_nodes fits this target is selected (seeds(m) = exact
    * count of nodes with id % m = 0; the bound is conservative — one
    * giant component — so the walk stays under [[maxBfsStateRows]] by
    * construction and the hard throw becomes a never-fires backstop).
    * COUPLED TO ORACLES: the SQL twin replays the identical census +
    * selection, so the sampled root set is part of the contract.
    *
    * r10 retune 2·10⁷ → 5·10⁶: each BFS level's aggregation input is
    * state × avg-degree rows, and the r10 10× probe measured the
    * 2·10⁷ target driving ~9.5 GB of per-level agg/sort spill at the
    * 12 GB probe heap — the Brandes-subset estimator loses nothing
    * by sampling 4× fewer roots, the walk's working set now fits
    * executor memory with headroom, and the driver's test scales
    * still select m = 2 (the full historical seed set), so every
    * oracle comparison is unchanged. */
  val bfsStateTarget: Long = 5L * 1000 * 1000

  /** The modulus ladder for [[bfsStateTarget]]'s root sampling
    * (ascending; top rung is the fallback). Mirrored as literals in
    * the stress SQL twin. */
  val stressRootModuli: Seq[Long] = Seq(2L, 4L, 8L, 16L, 32L, 64L, 128L, 256L, 512L, 1024L)

  /** Conf key overriding streaming shuffle sizing: stateful streaming
    * allocates one state store per shuffle partition per micro-batch,
    * so deployments with known key cardinality pin this. */
  val streamShuffleKey: String = "graft.stream.shuffle"

  /** Conf key pinning the streaming whole-stage-codegen decision
    * ("true"/"false"); unset → decided by source volume against
    * [[streamCodegenBytes]]. */
  val streamCodegenKey: String = "graft.stream.codegen"

  /** Source-volume crossover for whole-stage codegen in streaming
    * queries. Each micro-batch re-plans with per-batch literals
    * (watermark, batch id), so codegen classes are janino-compiled +
    * JIT'd per batch and executed ONCE — a fixed per-batch tax that
    * only pays for itself once batches are large. Measured r9
    * (BASELINE.md §streaming-codegen, 5 heaviest st_* in fresh JVMs):
    * codegen-off wins at 2 MB (r8's −29% family number) and still by
    * ~12% at 17 MB of source; at 82 MB codegen-on wins ~21% on the
    * linear queries (e.g. st_sliding 15.5 s vs 20.9 s). The default
    * flips codegen on above the measured midpoint. */
  val streamCodegenBytes: Long = 48L * 1024 * 1024

  /** Default streaming state-store sizing: one store per this many
    * source bytes (capped at session parallelism). See
    * [[graft.streaming.EventStream.streamShufflePartitions]]. */
  val streamBytesPerStore: Long = 32L * 1024 * 1024

  /** Conf key pinning the streaming state-store BACKEND ("rocksdb" /
    * "hdfs"); unset → decided by source volume against
    * [[streamRocksDbBytes]]. */
  val streamStateStoreKey: String = "graft.stream.statestore"

  /** Source-volume crossover for the RocksDB state-store provider in
    * streaming queries (r11, found by the 100× streaming probe): the
    * default HDFS-backed store keeps every partition's state map plus
    * retained versions ON HEAP — at 100× lockstep-FK events the
    * session-window state thrashed a 12 GB heap (st_session_window
    * steady 124.7 s with 103 s of GC in isolation; the 10-query suite
    * JVM died outright with heap OOM). RocksDB keeps state off-heap
    * and is what a production 100 TB stream runs; below the crossover
    * the on-heap store's zero-serialization lookups win at
    * micro-batch sizes (the [[streamCodegenBytes]] discipline, same
    * measurement shape). 128 MB: well above every driver scale (sf0.1
    * events = 2 MB), below the 159 MB 100× corpus that exhibited the
    * thrash. transformWithState queries pin RocksDB regardless (API
    * requirement). */
  val streamRocksDbBytes: Long = 128L * 1024 * 1024

  /** MinHash LSH band geometry, in signature rows per band over the
    * 128-permutation signature ([[graft.functions.MinHashImpl.NumPerms]]).
    *  - 4 rows × 32 bands: the candidate-generation regime for j ≥ 0.5
    *    near-dup queries (d_minhash_lsh, d_contamination).
    *  - 2 rows × 64 bands: the zero-practical-miss verify regime
    *    (miss probability (1−j^2)^64 ≈ 1e-8 at j = 0.5) feeding
    *    exact-verify joins (d_ngram_jaccard, the near-dup pair graph).
    * COUPLED TO ORACLES: the paired DuckDB SQL unrolls these geometries
    * as literals (`generate_series(0, 31)`, 4-row slice equality), so a
    * retune edits both sides — which is exactly what d_lsh_tune's
    * precision/recall sweep exists to inform. */
  val lshBandRowsCandidates: Int = 4
  /** Static default for the verify regime. r11: t_cdc_minhash now
    * DERIVES its verify rows from a priced census over its corpus'
    * distinct signatures ([[graft.operators.Dedup.censusBandRows]] —
    * the EmbedBands solve-geometry-from-the-corpus discipline; the
    * selection is rung-restricted to the zero-practical-miss pair
    * {1, 2}, so it moves cost, never results). The remaining static
    * consumers (d_ngram_jaccard, d_cap_fires, the pair-graph memo)
    * keep this value: their twins unroll the 2-row slices as
    * literals, so a retune is a both-sides code change. */
  val lshBandRowsVerify: Int = 2

  /** HOT-BUCKET cap for the LSH band join ([[graft.operators.Dedup.bandCandidateReps]]):
    * band buckets larger than this are skipped before the self-join.
    * The 100× probe measured the failure this prevents: corpora with
    * SMALL element sets sharing very common elements (CDC chunks of
    * whitespace runs / boilerplate) grow minhash band buckets linearly
    * with corpus size — one 17 910-member bucket priced 1.6·10⁸ join
    * rows by itself and the candidate distinct() spilled 241 GB to a
    * host-disk DNF. Within-hot-bucket pairs are keyed on a shared
    * COMMON chunk (near-zero Jaccard — verify would discard them);
    * a true j ≥ 0.5 pair collides in an expected j^rows·bands ≈ 16 of
    * the 64 verify bands, so even if several of its bands are hot the
    * residual miss probability stays ≲ 10⁻⁷ — the same
    * zero-practical-miss class as the banding geometry itself (the
    * [[lshBandRowsVerify]] argument). At the driver's test scales the
    * largest measured bucket is 326 (sf0.1), so the cap NEVER fires
    * there on the real corpora; it is sized 3× above that and well
    * below the measured multi-thousand pathology buckets.
    *
    * r10: the cap is REPLAYED by the SQL twins (minhashLsh, lshTune —
    * cold-bucket candidate joins over the distinct-signature census)
    * and oracle-gated exactly where it fires by d_cap_fires' planted
    * pathology corpus, so the prune is a cross-engine contract, not a
    * Spark-side divergence (ADVICE r9). d_ngram_jaccard keeps its
    * brute-force twin with the probabilistic contract documented. */
  val maxBandBucket: Long = 1024L

  /** Target bytes of (planner-estimated) table data per bucket for the
    * bucketed-layout join certificate
    * ([[graft.operators.RelationalExt4.q56BucketJoin]]): the bucket
    * count is the power of two that brings the LARGER side's estimate
    * under this per bucket, floored at [[bucketMinCount]] — a fixed
    * count eventually makes each bucket corpus-sized (the r10 100×
    * probe's exp-0.67 finding), while a size-derived power of two is
    * the layout a 100 TB table would actually be written with (pow2 so
    * a future reader can coalesce 2ⁿ→2ᵐ without re-shuffling). The
    * CERTIFICATE (zero exchanges below the join) is count-independent:
    * both sides are written with the SAME derived count. */
  val bucketTargetBytes: Long = 32L * 1024 * 1024
  val bucketMinCount: Int = 8
  val bucketMaxCount: Int = 1 << 12

  /** Prefix length (whitespace tokens) for prefix-duplicate detection
    * ([[graft.operators.Dedup.prefixDup]]). Long enough that chance
    * collisions vanish on natural text, short enough to catch
    * truncation twins and shared boilerplate heads that diverge later.
    * COUPLED TO THE ORACLE (the SQL twin slices the same count). */
  val prefixDupTokens: Int = 8

  /** Target bucket population for the graph-ANN construction's
    * hyperplane hash ([[graft.operators.Similarity]] nnDescent /
    * graphSearch / hnsw): the adaptive plane count picks the smallest
    * p with 2^p · this ≥ n, bounding the bucketed kNN self-join at
    * ~n·annBucketRows rows (the r9 100× probe measured the fixed-p
    * alternative at 2.5·10⁹ rows and ~126 GB of spill). COUPLED TO
    * ORACLES — the twins replay the same ladder. */
  val annBucketRows: Long = 1000L

  /** Floor on the angular-cell count for exact embedding near-dup
    * blocking (cells scale as ⌈√n⌉ above it). Below ~32 cells the
    * per-cell populations are so large that blocking stops pruning. */
  val minEmbedCells: Int = 32

  /** Target band-bucket population for the SimHash-banded embedding
    * pair path ([[graft.operators.EmbedBands]]) — the execution path
    * past [[maxBrutePairs]] where the exact verify refuses. The
    * adaptive plane count per band is the smallest r with
    * 2^r · this ≥ n, so the bucket self-join prices ≈ L·n·this rows
    * (linear in the corpus) instead of L·n²/2^r with a fixed r.
    * Smaller than [[annBucketRows]] deliberately: the pair path pays
    * bucket² verifies per bucket, the ANN path only bucket·k.
    * COUPLED TO ORACLES — the twins replay the same ladder. */
  val bandBucketRows: Long = 256L

  /** Band-count ceiling for the SimHash-banded pair path: a ladder
    * rung is only BANDABLE at plane count r when
    * recall ≥ [[bandRecallTarget]] is reachable within this many
    * bands ([[graft.operators.EmbedBands.lTable]]); thresholds deep
    * in the noise floor (low t, high r) need hundreds of bands for
    * useful recall — at that point banding costs more than it prunes
    * and the threshold must lift instead. */
  val maxBands: Int = 32

  /** Per-qualifying-pair recall floor the banded path's geometry is
    * solved for: L = the smallest band count with
    * 1 − (1 − q(t)^r)^L ≥ this, q(t) = 1 − acos(t)/π (the
    * random-hyperplane collision rate — Rademacher ±1 planes
    * approximate it at dim 64; EmbedBandsSpec pins the realized
    * recall on planted pairs). A pair AT the threshold has exactly
    * this survival probability; anything more similar survives with
    * higher probability, so the bound is per-pair and one-sided. */
  val bandRecallTarget: Double = 0.95

  /** Priced backstop for the banded bucket self-join
    * (Σ kept-bucket b·(b−1)/2, one aggregate over the bucket census
    * before the join is paid): the adaptive geometry targets
    * ~L·n·[[bandBucketRows]] ≈ 10⁹ at 200 k vectors, so this only
    * fires on a corpus so skewed that even capped buckets blow the
    * envelope — refuse with the priced volume rather than grind. */
  val maxBandedCandidates: Long = 20L * 1000 * 1000 * 1000

  /** Bytes one SURVIVOR pair row occupies in the banded verify join's
    * post-filter shuffle (the distinct's input): two longs + one
    * double (24 B) plus UnsafeRow/compression framing. Deliberately a
    * round upper bound — it converts the census's priced candidate
    * count and the pilot-sampled survivor count into BYTES, the unit
    * the refusal budget is denominated in. */
  val bandedSurvivorRowBytes: Long = 32L

  /** Safety multiplier on the pilot-sampled survivor estimate before
    * it is compared to the shuffle budget: covers sampling variance
    * (the sample is ~[[bandedSampleCandidates]] candidates, so the
    * survivor estimate's relative error is small whenever the decision
    * is close) and bucket-level skew between the sampled and unsampled
    * buckets. */
  val bandedSampleSafety: Long = 4L

  /** Target CANDIDATE volume for the banded path's pilot sample: when
    * the worst-case survivor bound (priced ·
    * [[bandedSurvivorRowBytes]]) exceeds the shuffle budget, the
    * survivor RATE is measured on a deterministic 1/K bucket sample
    * with K = ⌈priced / this⌉ — ~2·10⁷ sampled candidates is a few
    * seconds of dot products at any corpus size, and enough survivors
    * to estimate within the safety factor. */
  val bandedSampleCandidates: Long = 20L * 1000 * 1000

  /** Session-conf pin for the banded path's survivor-stream shuffle
    * budget in bytes; unset, the budget derives from the node's
    * actual resources ([[bandedShuffleBudgetBytes]]). */
  val bandedShuffleBudgetKey = "graft.banded.shuffleBudgetBytes"

  /** Priced bytes per CANDIDATE row on the AllPairs prefix-filter
    * paths (setsimJoin / containmentJoin): the pre-distinct candidate
    * stream is (doc_a, doc_b, n_a, n_b) = 32 B of UnsafeRow payload
    * through the distinct's shuffle write (r12 verdict item 2 — the
    * planted hot-token corpus regime, where one token survives the
    * prefix filter in every document and the candidate distinct
    * explodes output-quadratically exactly like the r11
    * band-degenerate survivor stream did). */
  val allPairsCandRowBytes: Long = 32L

  /** Fixed per-candidate overhead of the AllPairs VERIFY-stream price
    * (r13, measured at the 1000× setsim probe): the verify stage
    * ships every distinct candidate through TWO shuffle-hash joins,
    * the second carrying the first side's packed signature — so its
    * bytes are ≈ candidates × (ids + row overhead + 2·avg signature).
    * The r12 candidate tier priced only the 32 B distinct rows and
    * correctly let the 1000× distinct proceed (14 GB against a 40 GB
    * budget) — and then the UNPRICED verify stream (315.6 M
    * candidates × ~208 B ≈ 65 GB + join spill) filled the node's
    * scratch and died on ENOSPC. Same lesson as the r11
    * band-degenerate survivor stream, one tier up: every stream that
    * scales with candidates must be priced before it is launched. */
  val allPairsVerifyRowOverheadBytes: Long = 48L

  /** The RESOURCE-DERIVED shuffle budget for the banded pair path's
    * survivor stream (r11 verdict item 1): the band-degenerate middle
    * regime — a corpus whose TRUE pair set is output-quadratic —
    * prices its candidates UNDER the cluster-sized
    * [[maxBandedCandidates]] and then fills a single node's shuffle
    * disk with survivors (measured: >60 GB before the r11 1000×
    * planted corpus killed the node). The budget that decision needs
    * is this deployment's, not a constant: half the usable space of
    * the configured shuffle dirs, times the executor count (each
    * executor contributes its local disks to the shuffle at scale;
    * in local mode the one node is the whole cluster). Deployments
    * with asymmetric disks pin [[bandedShuffleBudgetKey]] instead. */
  def bandedShuffleBudgetBytes(s: org.apache.spark.sql.SparkSession): Long =
    s.conf.getOption(bandedShuffleBudgetKey).map(_.toLong).getOrElse {
      val dirs = s.sparkContext.getConf
        .get("spark.local.dir", System.getProperty("java.io.tmpdir", "/tmp"))
        .split(",").map(_.trim).filter(_.nonEmpty)
      // Only dirs that EXIST contribute (a not-yet-created shuffle dir
      // reports getUsableSpace = 0, which would zero the whole budget
      // and refuse every sampled corpus spuriously), and two entries on
      // the SAME filesystem count its space once (a comma-list of
      // subdirs of one disk must not double the budget past real
      // capacity) — dedupe on the FileStore identity.
      val stores = dirs.map(p => new java.io.File(p))
        .filter(_.isDirectory)
        .flatMap { f =>
          try Some(java.nio.file.Files.getFileStore(f.toPath) -> f.getUsableSpace)
          catch { case _: java.io.IOException => None }
        }
        .groupBy(_._1).map(_._2.head._2)
      val usable0 = stores.sum
      // fall back to the JVM tmpdir before failing: a budget of 0 means
      // the refusal tier fires on EVERY corpus it samples, which is a
      // misconfiguration, not a measurement
      val usable =
        if (usable0 > 0) usable0
        else new java.io.File(System.getProperty("java.io.tmpdir", "/tmp")).getUsableSpace
      if (usable <= 0)
        throw new IllegalStateException(
          s"bandedShuffleBudgetBytes: no usable space under spark.local.dir=" +
            s"${dirs.mkString(",")} or java.io.tmpdir — pin $bandedShuffleBudgetKey " +
            "to this deployment's shuffle capacity")
      // statusTracker lists the driver too in cluster mode; local mode
      // has exactly one entry (the driver IS the executor)
      val execs = math.max(1, s.sparkContext.statusTracker.getExecutorInfos.length - 1)
      usable / 2 * execs
    }
}
