package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational / analytic operator suite (SURVEY.md §2B).
  *
  * Every query is a declarative DataFrame plan so Catalyst gets full
  * freedom: filters/projections reach the parquet scan, small dimension
  * tables are broadcast, AQE re-plans shuffles at runtime. Outputs are
  * deterministic (total-order sorts, fixed-precision rounding, temporal
  * columns rendered as UTC strings) for the DuckDB oracle hash-compare.
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary: single scan, partial aggregation
    * map-side, tiny shuffle (|groups| = 6). Scales linearly in input. */
  def q1Agg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        // sums of exact-integer / 2-decimal inputs cannot hit a rounding
        // boundary; the 4- and 6-decimal PRODUCT sums and the averages go
        // through exact integer micros (see ExactRound)
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        ExactRound.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        ExactRound.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        ExactRound.r(avg("l_quantity"), 4).as("avg_qty"),
        ExactRound.avgMicros(col("l_extendedprice"), 4).as("avg_price"),
        ExactRound.avgMicros(col("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity),2) AS sum_qty,
      | round(sum(l_extendedprice),2) AS sum_base_price,
      | ${ExactRound.moneySumSql("l_extendedprice*(1-l_discount)")} AS sum_disc_price,
      | ${ExactRound.moneySumSql("l_extendedprice*(1-l_discount)*(1+l_tax)")} AS sum_charge,
      | ${ExactRound.rSql("avg(l_quantity)", 4)} AS avg_qty,
      | ${ExactRound.avgMicrosSql("l_extendedprice", 4)} AS avg_price,
      | ${ExactRound.avgMicrosSql("l_discount", 4)} AS avg_disc,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-01-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Pushdown probe: predicate + projection must reach the parquet scan
    * (PushedFilters / 3-column ReadSchema in the explain output). */
  def q2FilterProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1999-01-01").cast("timestamp") && col("l_quantity") < 5)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  val q2Sql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00' AND l_quantity < 5
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** TPC-H Q3 shape: filtered fact-fact join with a broadcast dimension,
    * then agg + top-k. customer is broadcast; orders⋈lineitem shuffles on
    * the join key with AQE skew handling. */
  def q3JoinAgg(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
    val li = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"), col("o_orderpriority"))
      .agg(ExactRound.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority,
      | ${ExactRound.moneySumSql("l_extendedprice*(1-l_discount)")} AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
      |GROUP BY l_orderkey, orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** EXISTS → left-semi join: no row duplication, right side reduced to
    * distinct keys before the shuffle. */
  def q4Semijoin(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
    Tables.customer(s, d)
      .join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  val q4Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin

  /** NOT EXISTS → left-anti join: customers with no open-partial orders. */
  def q5Antijoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "P"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  val q5Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin

  /** Total-order top-k: Spark plans TakeOrderedAndProject — per-partition
    * heaps + a k-row merge on the driver, no global sort at scale. */
  def q6Topk(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(20)

  val q6Sql: String =
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
      |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      |LIMIT 20""".stripMargin

  /** Window functions: one shuffle on the partition key serves both the
    * rank and the running sum (same window spec). */
  def q7Window(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"),
        rank().over(w).as("rnk"),
        round(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val q7Sql: String =
    """SELECT o_custkey, o_orderkey,
      | rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rnk,
      | round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_total
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Exact grouped distinct: Spark expands to a two-phase aggregate
    * (partial distinct map-side, final count). */
  def q8Distinct(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy("o_orderstatus")
      .agg(countDistinct("o_custkey").as("n_cust"), count(lit(1)).as("n_orders"))
      .orderBy("o_orderstatus")

  val q8Sql: String =
    """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust, count(*) AS n_orders
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** CASE-WHEN bucketing + HAVING (post-aggregation filter). */
  def q9CaseHaving(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .withColumn("qty_band",
        when(col("l_quantity") < 10, "low").when(col("l_quantity") < 30, "mid").otherwise("high"))
      .groupBy("qty_band")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("total_price"))
      .filter(col("n") > 10)
      .orderBy("qty_band")

  val q9Sql: String =
    """SELECT CASE WHEN l_quantity < 10 THEN 'low' WHEN l_quantity < 30 THEN 'mid' ELSE 'high' END AS qty_band,
      | count(*) AS n, round(sum(l_extendedprice),2) AS total_price
      |FROM lineitem GROUP BY 1 HAVING count(*) > 10 ORDER BY qty_band""".stripMargin

  /** 5-way star join: all dimensions broadcast (region/nation/customer are
    * tiny relative to the facts), facts shuffle once on their join keys. */
  def q10StarJoin(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(ExactRound.moneySum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy("r_name", "n_name")

  val q10Sql: String =
    s"""SELECT r_name, n_name, ${ExactRound.moneySumSql("l_extendedprice*(1-l_discount)")} AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin

  /** Scalar subquery: above-average filter. The 1-row aggregate is
    * broadcast-cross-joined — no driver round-trip, stays in one job. */
  def q11Subquery(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d)
    val avgPrice = p.agg(avg("p_retailprice").as("avg_price"))
    p.crossJoin(broadcast(avgPrice))
      .filter(col("p_retailprice") > col("avg_price"))
      .select("p_partkey", "p_name", "p_retailprice")
      .orderBy("p_partkey")
  }

  val q11Sql: String =
    """SELECT p_partkey, p_name, p_retailprice FROM part
      |WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
      |ORDER BY p_partkey""".stripMargin

  /** ROLLUP hierarchy: (status, priority) → (status) → (). */
  def q12Rollup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("total"))
      .orderBy("status", "priority")

  val q12Sql: String =
    """SELECT coalesce(o_orderstatus,'ALL') AS status, coalesce(o_orderpriority,'ALL') AS priority,
      | count(*) AS n, round(sum(o_totalprice),2) AS total
      |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** UNION with dedup across heterogeneous sources. */
  def q13Union(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
      .select(col("c_custkey").as("key"), col("c_name").as("name"))
    val sup = Tables.supplier(s, d).filter(col("s_acctbal") > 0)
      .select(col("s_suppkey").as("key"), col("s_name").as("name"))
    c.union(sup).distinct().orderBy("key", "name")
  }

  val q13Sql: String =
    """SELECT c_custkey AS key, c_name AS name FROM customer WHERE c_acctbal > 5000
      |UNION
      |SELECT s_suppkey AS key, s_name AS name FROM supplier WHERE s_acctbal > 0
      |ORDER BY key, name""".stripMargin

  /** Pivot: event_type rows → columns. Spark's pivot with an explicit value
    * list stays a single aggregate (no second pass to discover values). */
  def q14Pivot(s: SparkSession, d: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = Tables.events(s, d)
      .withColumn("user_bucket", col("user_id") % 10)
      .groupBy("user_bucket")
      .pivot("event_type", types)
      .agg(round(sum("value"), 2))
    types.foldLeft(pivoted)((df, t) => df.withColumnRenamed(t, s"${t}_v"))
      .na.fill(0.0, types.map(_ + "_v"))
      .orderBy("user_bucket")
  }

  val q14Sql: String =
    """SELECT user_id % 10 AS user_bucket,
      | coalesce(round(sum(CASE WHEN event_type='click' THEN value END),2),0) AS click_v,
      | coalesce(round(sum(CASE WHEN event_type='error' THEN value END),2),0) AS error_v,
      | coalesce(round(sum(CASE WHEN event_type='purchase' THEN value END),2),0) AS purchase_v,
      | coalesce(round(sum(CASE WHEN event_type='signup' THEN value END),2),0) AS signup_v,
      | coalesce(round(sum(CASE WHEN event_type='view' THEN value END),2),0) AS view_v
      |FROM events GROUP BY 1 ORDER BY user_bucket""".stripMargin

  /** Statistical aggregates: avg / sample stddev / correlation. */
  def q15CorrStats(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        ExactRound.r(avg("l_quantity"), 4).as("avg_qty"),
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"))
      .orderBy("l_returnflag")

  val q15Sql: String =
    s"""SELECT l_returnflag, ${ExactRound.rSql("avg(l_quantity)", 4)} AS avg_qty,
      | round(stddev_samp(l_quantity),4) AS sd_qty,
      | round(corr(l_quantity, l_extendedprice),4) AS corr_qp
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q2_filter_project" -> (q2FilterProject _),
    "q3_join_agg" -> (q3JoinAgg _),
    "q4_semijoin" -> (q4Semijoin _),
    "q5_antijoin" -> (q5Antijoin _),
    "q6_topk" -> (q6Topk _),
    "q7_window" -> (q7Window _),
    "q8_distinct" -> (q8Distinct _),
    "q9_case_having" -> (q9CaseHaving _),
    "q10_star_join" -> (q10StarJoin _),
    "q11_subquery" -> (q11Subquery _),
    "q12_rollup" -> (q12Rollup _),
    "q13_union" -> (q13Union _),
    "q14_pivot" -> (q14Pivot _),
    "q15_corr_stats" -> (q15CorrStats _))

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1Sql,
    "q2_filter_project" -> q2Sql,
    "q3_join_agg" -> q3Sql,
    "q4_semijoin" -> q4Sql,
    "q5_antijoin" -> q5Sql,
    "q6_topk" -> q6Sql,
    "q7_window" -> q7Sql,
    "q8_distinct" -> q8Sql,
    "q9_case_having" -> q9Sql,
    "q10_star_join" -> q10Sql,
    "q11_subquery" -> q11Sql,
    "q12_rollup" -> q12Sql,
    "q13_union" -> q13Sql,
    "q14_pivot" -> q14Sql,
    "q15_corr_stats" -> q15Sql)
}
