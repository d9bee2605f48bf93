package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Third tranche of relational coverage (SURVEY.md §2B continued):
  * GROUPING SETS, retention/new-user curves, ordered list aggregation,
  * and time-grid densification (gap fill).
  */
object RelationalExt2 {

  /** GROUPING SETS beyond ROLLUP/CUBE: the two single-axis slices plus
    * the grand total in ONE pass (CUBE would also compute the 2-axis
    * cells; ROLLUP only nests). Spark expands grouping sets into a
    * single Expand + partial/final aggregate — one scan, one shuffle,
    * regardless of how many sets are requested. The aggregation level
    * is derived from key nullness on both engines (the raw keys are
    * never null) so no engine-specific GROUPING_ID bit order leaks
    * into the result. */
  def q31GroupingSets(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), ExactRound.moneySum(col("o_totalprice")).as("sales"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        (when(col("o_orderstatus").isNull, 1).otherwise(0) +
          when(col("o_orderpriority").isNull, 2).otherwise(0)).as("lvl"),
        col("n"), col("sales"))
      .orderBy("status", "priority")

  val q31Sql: String =
    s"""SELECT coalesce(o_orderstatus, 'ALL') AS status,
       |  coalesce(o_orderpriority, 'ALL') AS priority,
       |  (CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END +
       |   CASE WHEN o_orderpriority IS NULL THEN 2 ELSE 0 END) AS lvl,
       |  count(*) AS n, ${ExactRound.moneySumSql("o_totalprice")} AS sales
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
       |ORDER BY status, priority""".stripMargin

  /** New-vs-active user curve per event type: distinct actives per day,
    * first-appearance ("new") count per day, and the cumulative distinct
    * user count — the standard growth-accounting query. The cumulative
    * distinct NEVER re-scans history: first-seen day per (type, user) is
    * one partial-agg shuffle, and the running total is a window over the
    * tiny (type, day) table. At 100 TB the same plan holds — the window
    * input is bounded by types × days, not by events. */
  def q32NewUsers(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
    val daily = e.groupBy("event_type", "day")
      .agg(countDistinct("user_id").as("n_active"))
    val firstSeen = e.groupBy("event_type", "user_id")
      .agg(min("day").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("n_new"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(firstSeen, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"), col("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
      .withColumn("cum_users", sum("n_new").over(w))
      .orderBy("event_type", "day")
  }

  val q32Sql: String =
    """WITH e AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, user_id FROM events
      |), daily AS (
      |  SELECT event_type, day, count(DISTINCT user_id) AS n_active
      |  FROM e GROUP BY event_type, day
      |), firstseen AS (
      |  SELECT event_type, min(day) AS day, user_id FROM e GROUP BY event_type, user_id
      |), news AS (
      |  SELECT event_type, day, count(*) AS n_new FROM firstseen GROUP BY event_type, day
      |)
      |SELECT d.event_type, d.day, d.n_active,
      |  coalesce(n.n_new, 0) AS n_new,
      |  CAST(sum(coalesce(n.n_new, 0)) OVER (PARTITION BY d.event_type ORDER BY d.day) AS BIGINT) AS cum_users
      |FROM daily d LEFT JOIN news n ON d.event_type = n.event_type AND d.day = n.day
      |ORDER BY d.event_type, d.day""".stripMargin

  /** Ordered list aggregation: each customer's order-status sequence in
    * (date, key) order as one string, plus order and distinct-status
    * counts. `collect_list` is shuffle-order-nondeterministic, so the
    * struct list is sorted AFTER collection (array_sort on (date, key,
    * status) structs — unique key makes the order total) — the
    * deterministic-listagg pattern. State per group is the group's own
    * rows, same as any engine's string_agg. */
  def q33ListAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct("o_orderstatus").as("n_statuses"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("o_orderdate"), col("o_orderkey"),
              col("o_orderstatus")))),
            x => x.getField("o_orderstatus")), "").as("status_seq"))
      .orderBy("custkey")

  val q33Sql: String =
    """SELECT o_custkey AS custkey, count(*) AS n_orders,
      |  count(DISTINCT o_orderstatus) AS n_statuses,
      |  string_agg(o_orderstatus, '' ORDER BY o_orderdate, o_orderkey) AS status_seq
      |FROM orders GROUP BY o_custkey ORDER BY custkey""".stripMargin

  /** Time-grid densification (gap fill): hourly event counts and integer-
    * cents value per type over the FULL hour grid — absent hours emitted
    * as zero — plus a running cumulative count. The grid is
    * types × hours built from one `sequence`/`explode` over the global
    * bounds (two scalar aggregates, broadcast): grid size is bounded by
    * the time span, not the data, so densification costs the same at
    * 100 TB as at 100 MB; the left join back to the hourly partial
    * aggregate is the only data-sized shuffle. */
  def q34GapFill(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("event_type"),
      date_trunc("hour", col("ts")).as("hour"),
      round(col("value") * 100).cast("long").as("cents"))
    val bounds = e.agg(min("hour").as("h0"), max("hour").as("h1"))
    val hours = bounds.select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    val grid = e.select("event_type").distinct().crossJoin(broadcast(hours))
    val actual = e.groupBy("event_type", "hour")
      .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
    val w = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(actual, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("cents"), lit(0L)).as("cents"))
      .withColumn("cum_n", sum("n").over(w))
      .orderBy("event_type", "hour")
  }

  val q34Sql: String =
    """WITH e AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events
      |), bounds AS (
      |  SELECT min(hour) AS h0, max(hour) AS h1 FROM e
      |), hours AS (
      |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds
      |), grid AS (
      |  SELECT t.event_type, h.hour FROM (SELECT DISTINCT event_type FROM e) t CROSS JOIN hours h
      |), actual AS (
      |  SELECT event_type, hour, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents
      |  FROM e GROUP BY event_type, hour
      |)
      |SELECT g.event_type, g.hour,
      |  coalesce(a.n, 0) AS n, coalesce(a.cents, 0) AS cents,
      |  CAST(sum(coalesce(a.n, 0)) OVER (PARTITION BY g.event_type ORDER BY g.hour) AS BIGINT) AS cum_n
      |FROM grid g LEFT JOIN actual a ON g.event_type = a.event_type AND g.hour = a.hour
      |ORDER BY g.event_type, g.hour""".stripMargin

  /** Equi-width histogram of order totals in 20 buckets between the
    * global min/max — the profiling primitive behind query planners'
    * column stats and data-quality dashboards. All-integer: prices in
    * cents, bucket = (cents−min)·20 / (max−min+1) by integer division,
    * so bucket edges are bit-portable (a double-width formulation can
    * put a boundary value on different sides per engine). Two scans
    * (bounds, then bucketing) with the 1-row bounds broadcast; the
    * histogram aggregate is partial — 20 rows cross the shuffle per
    * partition at any scale. */
  def q35Histogram(s: SparkSession, d: String): DataFrame = {
    val cents = round(col("o_totalprice") * 100).cast("long")
    val o = Tables.orders(s, d).select(cents.as("cents"))
    val bounds = o.agg(min("cents").as("lo"), max("cents").as("hi"))
    o.crossJoin(broadcast(bounds))
      .select(expr("((cents - lo) * 20) div (hi - lo + 1)").as("bucket"),
        col("lo"), col("hi"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("lo").as("lo0"), max("hi").as("hi0"))
      .select(col("bucket"),
        (expr("lo0 + (hi0 - lo0 + 1) * bucket div 20").cast("double") / 100.0).as("bucket_lo"),
        col("n"))
      .orderBy("bucket")
  }

  val q35Sql: String =
    """WITH o AS (
      |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
      |), b AS (
      |  SELECT min(cents) AS lo, max(cents) AS hi FROM o
      |)
      |SELECT ((cents - lo) * 20) // (hi - lo + 1) AS bucket,
      |  CAST(min(lo) + (max(hi) - min(lo) + 1) * (((cents - lo) * 20) // (hi - lo + 1)) // 20 AS DOUBLE) / 100.0 AS bucket_lo,
      |  count(*) AS n
      |FROM o, b
      |GROUP BY bucket ORDER BY bucket""".stripMargin

  /** The remaining rank-family window functions in one pass: rank,
    * dense_rank, percent_rank, cume_dist over order totals per status
    * (q7/q23 cover row_number, running sums, lag/lead/ntile). All four
    * share ONE window sort — Catalyst evaluates them in a single Window
    * operator, one shuffle-sort per status key at any scale. percent_rank
    * and cume_dist are single IEEE divisions of window-derived integers,
    * identical in both engines. Ties are real (many orders share a
    * rounded total), so rank vs dense_rank vs row_number genuinely
    * diverge — keyed on cents so tie groups are engine-independent. */
  def q36RankFamily(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_orderstatus").orderBy("cents")
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        percent_rank().over(w).as("prnk"),
        cume_dist().over(w).as("cdist"))
      .orderBy("o_orderkey")
  }

  val q36Sql: String =
    """SELECT o_orderkey, o_orderstatus,
      |  CAST(rank() OVER w AS BIGINT) AS rnk,
      |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      |  percent_rank() OVER w AS prnk,
      |  cume_dist() OVER w AS cdist
      |FROM (
      |  SELECT o_orderkey, o_orderstatus, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderkey % 7 = 0
      |)
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY cents)
      |ORDER BY o_orderkey""".stripMargin

  /** Last-observation-carried-forward imputation over the q34 time grid:
    * gap hours inherit the most recent observed hourly cents (IGNORE
    * NULLS window), plus the gap age in hours — the imputation step
    * between densification and any downstream model. Same single
    * window-sort per type as the gap fill; `last(_, ignoreNulls)` over
    * integer cents carries exact values, so LOCF is bit-portable. */
  def q37Locf(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("event_type"),
      date_trunc("hour", col("ts")).as("hour"),
      round(col("value") * 100).cast("long").as("cents"))
    val bounds = e.agg(min("hour").as("h0"), max("hour").as("h1"))
    val hours = bounds.select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("hour"))
    val grid = e.select("event_type").distinct().crossJoin(broadcast(hours))
    val actual = e.groupBy("event_type", "hour")
      .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
    val w = Window.partitionBy("event_type").orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(actual, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"),
        col("cents").isNotNull.as("observed"),
        last("cents", ignoreNulls = true).over(w).as("cents_locf"),
        last(when(col("cents").isNotNull, col("hour")), ignoreNulls = true).over(w)
          .as("last_obs_hour"))
      .select(col("event_type"), col("hour"), col("observed"), col("cents_locf"),
        (unix_timestamp(col("hour")) - unix_timestamp(col("last_obs_hour")))
          .cast("long").as("gap_secs"))
      .orderBy("event_type", "hour")
  }

  val q37Sql: String =
    """WITH e AS (
      |  SELECT event_type, date_trunc('hour', ts) AS hour,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events
      |), bounds AS (
      |  SELECT min(hour) AS h0, max(hour) AS h1 FROM e
      |), hours AS (
      |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds
      |), grid AS (
      |  SELECT t.event_type, h.hour FROM (SELECT DISTINCT event_type FROM e) t CROSS JOIN hours h
      |), actual AS (
      |  SELECT event_type, hour, count(*) AS n, CAST(sum(cents) AS BIGINT) AS cents
      |  FROM e GROUP BY event_type, hour
      |)
      |SELECT g.event_type, g.hour,
      |  a.cents IS NOT NULL AS observed,
      |  last_value(a.cents IGNORE NULLS) OVER w AS cents_locf,
      |  CAST(epoch(g.hour) - epoch(last_value(CASE WHEN a.cents IS NOT NULL THEN g.hour END IGNORE NULLS) OVER w) AS BIGINT) AS gap_secs
      |FROM grid g LEFT JOIN actual a ON g.event_type = a.event_type AND g.hour = a.hour
      |WINDOW w AS (PARTITION BY g.event_type ORDER BY g.hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY g.event_type, g.hour""".stripMargin

  /** Bag-semantics set operations (q17 covers the DISTINCT forms):
    * INTERSECT ALL keeps min(per-side multiplicity) copies, EXCEPT ALL
    * subtracts multiplicities — Spark lowers both to an aggregate of
    * per-side counts, one shuffle each, no distinct pass. Output is the
    * surviving multiplicity per key (deterministic presentation of a
    * multiset). */
  def q38IntersectAll(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    def keys(st: String) =
      o.filter(col("o_orderstatus") === st).select(col("o_custkey").as("custkey"))
    val surviving = keys("F").intersectAll(keys("O"))
      .groupBy("custkey").agg(count(lit(1)).as("n_common"))
    val excess = keys("F").exceptAll(keys("O"))
      .groupBy("custkey").agg(count(lit(1)).as("n_excess"))
    surviving.join(excess, Seq("custkey"), "left")
      .select(col("custkey"), col("n_common"), coalesce(col("n_excess"), lit(0L)).as("n_excess"))
      .orderBy("custkey")
  }

  val q38Sql: String =
    """WITH f AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'),
      |o AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'),
      |surv AS (
      |  SELECT custkey, count(*) AS n_common FROM (
      |    SELECT custkey FROM f INTERSECT ALL SELECT custkey FROM o
      |  ) GROUP BY custkey
      |), exc AS (
      |  SELECT custkey, count(*) AS n_excess FROM (
      |    SELECT custkey FROM f EXCEPT ALL SELECT custkey FROM o
      |  ) GROUP BY custkey
      |)
      |SELECT s.custkey, s.n_common, coalesce(e.n_excess, 0) AS n_excess
      |FROM surv s LEFT JOIN exc e USING (custkey)
      |ORDER BY custkey""".stripMargin

  /** UNPIVOT (melt) — the inverse of q14's pivot: the wide per-type
    * metrics row set folds into tidy (type, metric, value) triples.
    * Spark's `unpivot` is a zero-shuffle Expand over the aggregated
    * input — long format for downstream tools without rescanning the
    * fact table. */
  def q39Unpivot(s: SparkSession, d: String): DataFrame = {
    val wide = Tables.events(s, d)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("cents"),
        countDistinct("user_id").as("n_users"))
    wide.unpivot(Array(col("event_type")),
        Array(col("n_events"), col("cents"), col("n_users")), "metric", "value")
      .orderBy("event_type", "metric")
  }

  val q39Sql: String =
    """WITH wide AS (
      |  SELECT event_type, count(*) AS n_events,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
      |    count(DISTINCT user_id) AS n_users
      |  FROM events GROUP BY event_type
      |)
      |SELECT event_type, metric, value
      |FROM wide UNPIVOT (value FOR metric IN (n_events, cents, n_users))
      |ORDER BY event_type, metric""".stripMargin

  /** Exact per-group quartiles of order value in integer cents (the
    * per-group form of p_profile's corpus quartiles): sort-based exact
    * percentile per priority class. Dyadic fractions over integers
    * interpolate IEEE-exactly, so no rounding is needed anywhere. */
  def q40GroupMedian(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderpriority").as("priority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy("priority")
      .agg(count(lit(1)).as("n"),
        expr("percentile(cents, 0.25)").as("p25"),
        expr("percentile(cents, 0.5)").as("median"),
        expr("percentile(cents, 0.75)").as("p75"))
      .orderBy("priority")

  val q40Sql: String =
    """SELECT o_orderpriority AS priority, count(*) AS n,
      |  quantile_cont(cents, 0.25) AS p25,
      |  quantile_cont(cents, 0.5) AS median,
      |  quantile_cont(cents, 0.75) AS p75
      |FROM (SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
      |GROUP BY priority ORDER BY priority""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_intersect_all" -> (q38IntersectAll _),
    "q39_unpivot" -> (q39Unpivot _),
    "q40_group_median" -> (q40GroupMedian _),
    "q37_locf" -> (q37Locf _),
    "q36_rank_family" -> (q36RankFamily _),
    "q35_histogram" -> (q35Histogram _),
    "q31_grouping_sets" -> (q31GroupingSets _),
    "q32_new_users" -> (q32NewUsers _),
    "q33_listagg" -> (q33ListAgg _),
    "q34_gapfill" -> (q34GapFill _))

  val oracles: Map[String, String] = Map(
    "q38_intersect_all" -> q38Sql,
    "q39_unpivot" -> q39Sql,
    "q40_group_median" -> q40Sql,
    "q37_locf" -> q37Sql,
    "q36_rank_family" -> q36Sql,
    "q35_histogram" -> q35Sql,
    "q31_grouping_sets" -> q31Sql,
    "q32_new_users" -> q32Sql,
    "q33_listagg" -> q33Sql,
    "q34_gapfill" -> q34Sql)
}
