package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.{BaseJoinExec, SortMergeJoinExec}

/** Read-only probes over EXECUTED physical plans, used by the queries
  * that carry a plan-shape CERTIFICATE in their oracle-gated result
  * (q56's zero-shuffle bucketed join, q57's files-pruned scan): the
  * claim "this layout eliminated the shuffle / skipped those files" is
  * emitted as result columns the DuckDB oracle pins, so a planner
  * regression flips the correctness gate, not just a benchmark.
  *
  * Lives under `org.apache.spark.sql` because AQE wrappers
  * ([[AdaptiveSparkPlanExec]], [[QueryStageExec]]) hide the final
  * physical tree behind package-private accessors; like
  * [[org.apache.spark.graft.ListenerFlush]] this is a compile-time
  * shim, not reflection — it breaks loudly if the internals move.
  */
object PlanProbe {

  /** Children of `p` with AQE wrappers resolved to the plan that
    * actually ran: an [[AdaptiveSparkPlanExec]] yields its final
    * executed plan (only meaningful AFTER the frame was materialized),
    * a [[QueryStageExec]] yields the stage's plan, a reused exchange
    * its original. */
  private def kids(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
    case q: QueryStageExec        => Seq(q.plan)
    case r: ReusedExchangeExec    => Seq(r.child)
    case other                    => other.children
  }

  /** All nodes of the executed tree, AQE-resolved, pre-order. */
  def nodes(plan: SparkPlan): Seq[SparkPlan] =
    plan +: kids(plan).flatMap(nodes)

  def nodes(df: DataFrame): Seq[SparkPlan] = nodes(df.queryExecution.executedPlan)

  /** (shuffles, sorts) strictly BELOW the first sort-merge join of the
    * executed plan — the bucketed-layout certificate: both are 0 iff
    * the join consumed the tables' own bucketing+sort order, i.e. the
    * storage layout replaced the exchange. Throws if no SMJ is present
    * (a broadcast fallback would vacuously "pass" — that is a different
    * plan, not a bucket join). */
  def shufflesAndSortsUnderSmj(df: DataFrame): (Int, Int) = {
    val smj = nodes(df)
      .collectFirst { case j: SortMergeJoinExec => j }
      .getOrElse(throw new IllegalStateException(
        "no SortMergeJoin in executed plan — bucketed-join certificate is vacuous"))
    val below = kids(smj).flatMap(nodes)
    (below.count(_.isInstanceOf[ShuffleExchangeLike]),
      below.count(_.isInstanceOf[org.apache.spark.sql.execution.SortExec]))
  }

  /** True if any join below (or at) the root is something other than a
    * sort-merge join — used to assert the certificate measured the
    * intended plan. */
  def joins(df: DataFrame): Seq[String] =
    nodes(df).collect { case j: BaseJoinExec => j.getClass.getSimpleName }

  /** Sum of a named SQLMetric over every file-source scan in the
    * executed plan (e.g. "numFiles" = files read AFTER partition
    * pruning). Valid only after the frame was materialized — metrics
    * are filled by execution. */
  def scanMetricSum(df: DataFrame, metric: String): Long =
    nodes(df).collect {
      case s: FileSourceScanExec if s.metrics.contains(metric) =>
        s.metrics(metric).value
    }.sum

  /** [[scanMetricSum]] restricted to scans rooted under a path
    * containing `pathPart` — for plans that read more than one source
    * (e.g. a pruned fact plus the dimension that prunes it). */
  def scanMetricSumForPath(df: DataFrame, metric: String, pathPart: String): Long =
    nodes(df).collect {
      case s: FileSourceScanExec
          if s.metrics.contains(metric) &&
            s.relation.location.rootPaths.exists(_.toString.contains(pathPart)) =>
        s.metrics(metric).value
    }.sum

  /** Number of AQE shuffle reads in the executed plan that contain at
    * least one SKEWED partition split — the certificate that AQE's
    * runtime skew-join handling actually engaged (valid only after
    * materialization; the splits are a runtime re-plan). */
  def skewedShuffleReads(df: DataFrame): Int =
    nodes(df).count {
      case a: AQEShuffleReadExec => a.hasSkewedPartition
      case _                     => false
    }

  /** Number of executed-plan sites applying a RUNTIME bloom filter
    * ([[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
    * — InjectRuntimeFilter's rewrite): the certificate that the engine
    * pre-filtered the fact side with the dimension's join keys BEFORE
    * the shuffle. The probe checks both plain [[FilterExec]] conditions
    * and scan-pushed data filters, because the optimizer is free to
    * push the might_contain predicate into the scan node. */
  def bloomFilterApplications(df: DataFrame): Int = {
    def hasBloom(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
      e.find(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]).isDefined
    nodes(df).count {
      case f: org.apache.spark.sql.execution.FilterExec => hasBloom(f.condition)
      case s: FileSourceScanExec => s.dataFilters.exists(hasBloom)
      case _ => false
    }
  }

  /** Number of file-source scans whose partition filters are non-empty
    * — certifies the pruning predicate reached the scan as a PARTITION
    * filter (metadata-level skip), not a post-scan row filter. */
  def scansWithPartitionFilters(df: DataFrame): Int =
    nodes(df).count {
      case s: FileSourceScanExec => s.partitionFilters.nonEmpty
      case _                     => false
    }

  /** (reads with a COALESCED partition, minimum post-read partition
    * count) over the AQE shuffle reads of the executed plan — the
    * certificate that AQE's partition-coalescing engaged: a shuffle
    * planned at the session's static partition count was re-read as
    * fewer, larger partitions because the runtime map-output stats
    * said the static count over-partitioned the data. Valid only
    * after materialization. */
  def coalescedShuffleReads(df: DataFrame): (Int, Int) = {
    val reads = nodes(df).collect { case a: AQEShuffleReadExec => a }
    (reads.count(_.hasCoalescedPartition),
      if (reads.isEmpty) 0 else reads.map(_.partitionSpecs.size).min)
  }

  /** Number of [[ReusedExchangeExec]] nodes in the executed plan — the
    * engine's AUTOMATIC dedup of identical shuffles (ReuseExchange /
    * AQE stage reuse): two plan branches over the same canonicalized
    * subtree pay for ONE exchange. Distinct from q70's explicit
    * `persist` — nobody opted in here. */
  def reusedExchanges(df: DataFrame): Int =
    nodes(df).count(_.isInstanceOf[ReusedExchangeExec])

  /** Number of [[org.apache.spark.sql.execution.window.WindowGroupLimitExec]]
    * nodes in the executed plan — the optimizer's rewrite of a
    * `rank()/row_number() <= k` filter into a per-group top-k operator
    * that keeps a k-row heap per partition instead of fully sorting
    * and ranking every group. */
  def windowGroupLimits(df: DataFrame): Int =
    nodes(df).count {
      case _: org.apache.spark.sql.execution.window.WindowGroupLimitExec => true
      case _ => false
    }
}
