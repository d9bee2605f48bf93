package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("every relational query runs and returns rows at sf0.001") {
    Relational.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("q1_agg has 6 groups (3 returnflags x 2 linestatus) and sane sums") {
    val rows = Relational.q1Agg(spark, sf).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Double]("sum_charge") >= r.getAs[Double]("sum_disc_price"))
    }
  }

  test("q6_topk is sorted descending with deterministic tie-break") {
    val prices = Relational.q6Topk(spark, sf).collect().map(_.getAs[Double]("l_extendedprice"))
    assert(prices.length == 20)
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
  }

  test("q4 semi and q5 anti partition the customer set sensibly") {
    val total = Tables.customer(spark, sf).count()
    val semi = Relational.q4Semijoin(spark, sf).count()
    val anti = Relational.q5Antijoin(spark, sf).count()
    assert(semi <= total && anti <= total)
  }

  test("q10 star join covers all 5 regions") {
    val regions = Relational.q10StarJoin(spark, sf).select("r_name").distinct().count()
    assert(regions == 5)
  }

  test("every oracle key exists in queries") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keySet.foreach(k => assert(qs.contains(k), s"oracle $k has no query"))
  }
}
