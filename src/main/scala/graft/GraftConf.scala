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

  /** Conf key overriding streaming shuffle sizing: stateful streaming
    * allocates one state store per shuffle partition per micro-batch,
    * so deployments with known key cardinality pin this. */
  val streamShuffleKey: String = "graft.stream.shuffle"

  /** Default streaming state-store sizing: one store per this many
    * source bytes (capped at session parallelism). See
    * [[graft.streaming.EventStream.streamShufflePartitions]]. */
  val streamBytesPerStore: Long = 32L * 1024 * 1024

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
  val lshBandRowsVerify: Int = 2

  /** Prefix length (whitespace tokens) for prefix-duplicate detection
    * ([[graft.operators.Dedup.prefixDup]]). Long enough that chance
    * collisions vanish on natural text, short enough to catch
    * truncation twins and shared boilerplate heads that diverge later.
    * COUPLED TO THE ORACLE (the SQL twin slices the same count). */
  val prefixDupTokens: Int = 8

  /** Floor on the angular-cell count for exact embedding near-dup
    * blocking (cells scale as ⌈√n⌉ above it). Below ~32 cells the
    * per-cell populations are so large that blocking stops pruning. */
  val minEmbedCells: Int = 32
}
