package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{count, floor, lit, round, sum, when}

/** Cross-engine-exact rounding for ratio-valued columns.
  *
  * Spark's `round(x, n)` quantizes the double's SHORTEST DECIMAL
  * REPRESENTATION (BigDecimal.valueOf, HALF_UP) while DuckDB rounds the
  * scaled BINARY value — on small-integer ratios (jaccards, tf-idf,
  * quality ratios) they disagree roughly 5 times per million values
  * (e.g. 333/640 = 0.5203125: shortest repr ends in a 7th-decimal '5'
  * but the stored double sits just below the half boundary). The
  * explicit `round(x·10ⁿ)/10ⁿ` form is an IEEE multiply, an
  * integer-scale round, and an IEEE divide — all three bit-identical in
  * both engines (the only integer-scale boundaries are exact .5
  * doubles, which both round away from zero; verified over 1.1M
  * ratios with zero divergence). Use [[r]] with the SQL twin [[rSql]]
  * for any rounded column whose value can be a small-integer ratio.
  */
object ExactRound {
  def r(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    round(c * lit(p)) / lit(p)
  }

  def rSql(expr: String, n: Int): String = {
    val p = BigInt(10).pow(n)
    s"round(($expr) * $p) / $p"
  }

  /** Exact order-insensitive money sum rounded to cents: per-row micros
    * via round(v·10⁶), integer half-away-from-zero cents, one exact
    * division. A plain double sum depends on accumulation order, and a
    * group whose true total lands exactly on a half-cent (a ~1 % event
    * per group for 4-decimal products like price·(1−discount)) rounds
    * by the SIGN OF THE FP NOISE — a cross-engine coin flip. Integer
    * sums cannot. */
  def moneySum(value: Column): Column = {
    val s = sum(round(value * lit(1000000L)).cast("decimal(28,0)"))
    val cents = when(s >= 0, floor((s + lit(5000)) / lit(10000)))
      .otherwise(-floor((-s + lit(5000)) / lit(10000)))
    cents.cast("double") / lit(100.0)
  }

  /** SQL twin of [[moneySum]]. */
  def moneySumSql(expr: String): String = {
    val s = s"sum(CAST(round(($expr) * 1000000) AS BIGINT))"
    s"CAST(CASE WHEN $s >= 0 THEN ($s + 5000) // 10000 " +
      s"ELSE -((-$s + 5000) // 10000) END AS DOUBLE) / 100.0"
  }

  /** Exact mean of micro-quantized values rounded to n decimals: the
    * integer micro sum is order-free, and the single division plus [[r]]
    * are bit-identical across engines. */
  def avgMicros(value: Column, n: Int): Column = {
    val s = sum(round(value * lit(1000000L)).cast("decimal(28,0)"))
    r(s.cast("double") / (count(value) * lit(1000000.0)), n)
  }

  /** SQL twin of [[avgMicros]]. */
  def avgMicrosSql(expr: String, n: Int): String =
    rSql(s"sum(CAST(round(($expr) * 1000000) AS BIGINT)) / (count($expr) * 1000000.0)", n)

  /** Scalar twin of the per-row micros quantization Spark's
    * round(value·10⁶) performs (HALF_UP on the shortest representation —
    * identical to DuckDB's binary-value rounding at integer scale, where
    * the only boundary cases are exact .5 doubles, rounded away from
    * zero by both). For imperative reducers/state machines that must
    * agree with the declarative [[moneySum]]/[[avgMicros]] plans. */
  def valueMicros(v: Double): Long =
    java.math.BigDecimal.valueOf(v * 1000000L)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()

  /** Scalar twin of [[r]]. */
  def rScalar(x: Double, n: Int): Double = {
    val p = math.pow(10, n)
    java.math.BigDecimal.valueOf(x * p)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / p
  }
}
