package graft

import org.apache.spark.sql.functions._

import graft.operators.RelationalExt

class RelationalExtSpec extends SparkSpec {

  test("all extended queries return rows at sf0.001") {
    RelationalExt.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name empty")
    }
  }

  test("as-of join: matched order is at-or-before the event, and is the latest such") {
    val rows = RelationalExt.q26Asof(spark, sf).collect()
    assert(rows.nonEmpty)
    // every matched order ts <= event ts
    rows.foreach { r =>
      assert(r.getAs[String]("order_ts") <= r.getAs[String]("event_ts"),
        s"order after event: $r")
    }
    // cross-check one user against a brute-force range join
    val uid = rows.head.getAs[Long]("user_id")
    import org.apache.spark.sql.functions._
    val fmt = "yyyy-MM-dd HH:mm:ss"
    // formatted strings compare lexically == chronologically
    val orders = Tables.orders(spark, sf)
      .filter(col("o_custkey") === uid)
      .select(date_format(col("o_orderdate"), fmt).as("ots"), col("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = Tables.events(spark, sf)
      .filter(col("user_id") === uid)
      .select(col("event_id"), date_format(col("ts"), fmt).as("ets")).collect()
      .flatMap { r =>
        val cand = orders.filter(_._1 <= r.getString(1))
        if (cand.isEmpty) None
        else Some(r.getLong(0) -> cand.max._2)
      }.toMap
    val got = rows.filter(_.getAs[Long]("user_id") == uid)
      .map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("o_orderkey")).toMap
    assert(got == expected, "as-of result differs from brute force for sampled user")
  }

  test("approx sketches certify their own accuracy contracts (self-checking flags)") {
    val rows = RelationalExt.q21Approx(spark, sf).collect()
    assert(rows.nonEmpty)
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("parts"))
      .collect()
      .map(r => r.getString(0) -> r.getAs[Long]("parts"))
      .toMap
    rows.foreach { r =>
      val flag = r.getString(0)
      assert(r.getAs[Long]("exact_parts") == exact(flag), s"$flag exact side wrong")
      assert(r.getAs[Boolean]("hll_ok"), s"$flag HLL estimate outside 3-sigma bound")
      assert(r.getAs[Boolean]("median_ok"), s"$flag approx median outside rank-error bound")
    }
  }

  test("cube covers all four grouping sets and agrees with rollup on shared slices") {
    val cube = RelationalExt.q27Cube(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val rollup = graft.operators.Relational.q12Rollup(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // rollup's sets are a subset of cube's, with identical values
    rollup.foreach { case (k, v) => assert(cube(k) == v, s"cube/rollup disagree at $k") }
    // cube additionally has the priority-only slice
    assert(cube.keys.exists { case (st, pr) => st == "ALL" && pr != "ALL" })
  }

  test("topk aggregate equals window-rank formulation and uses partial aggregation") {
    import org.apache.spark.sql.expressions.Window
    val viaAgg = RelationalExt.q25TopkAgg(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    val w = Window.partitionBy("o_orderstatus").orderBy(col("o_totalprice").desc)
    val viaWindow = Tables.orders(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .groupBy("o_orderstatus")
      .agg(array_join(collect_list(round(col("o_totalprice"), 2).cast("string")), ",").as("top5"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(viaAgg == viaWindow)
    val plan = RelationalExt.q25TopkAgg(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      "typed imperative aggregate should plan as object/sort aggregate")
  }

  test("q28_json: typed extraction parses every props row, aggregates consistent") {
    val rows = RelationalExt.q28Json(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == r.getAs[Long]("n_with_k"), "a props row failed to parse")
      assert(r.getAs[Long]("min_k") * r.getAs[Long]("n") <= r.getAs[Long]("sum_k"))
      assert(r.getAs[Long]("sum_k") <= r.getAs[Long]("max_k") * r.getAs[Long]("n"))
    }
  }

  test("q30_merge_upsert: statuses partition rows, balances move by exact cents") {
    val rows = RelationalExt.q30MergeUpsert(spark, sf).collect()
    assert(rows.nonEmpty)
    val byStatus = rows.groupBy(_.getAs[String]("status")).view.mapValues(_.length).toMap
    assert(byStatus.keySet.subsetOf(Set("updated", "inserted", "kept")))
    assert(byStatus.getOrElse("inserted", 0) > 0, "feed keys beyond the target must insert")
    assert(byStatus.getOrElse("kept", 0) > 0, "target keys without updates must be kept")
    rows.foreach { r =>
      val cents = math.round(r.getAs[Double]("balance") * 100)
      assert(math.abs(r.getAs[Double]("balance") - cents / 100.0) < 1e-9, "balance not cent-exact")
    }
  }

  test("salted aggregation equals direct aggregation") {
    val salted = RelationalExt.q22SaltedAgg(spark, sf).collect()
      .map(r => (r.getString(0), r.getAs[Double]("sum_qty"), r.getAs[Long]("n")))
    val direct = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 2).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy("l_returnflag")
      .collect()
      .map(r => (r.getString(0), r.getAs[Double]("sum_qty"), r.getAs[Long]("n")))
    assert(salted.sameElements(direct))
  }
}
