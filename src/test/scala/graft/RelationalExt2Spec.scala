package graft

import org.apache.spark.sql.functions._

import graft.operators.RelationalExt2

class RelationalExt2Spec extends SparkSpec {

  test("all RelationalExt2 queries return rows at sf0.001") {
    RelationalExt2.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name empty")
    }
  }

  test("grouping sets: slice totals each sum to the row count; grand total present") {
    val rows = RelationalExt2.q31GroupingSets(spark, sf).collect()
    val total = Tables.orders(spark, sf).count()
    val grand = rows.filter(r => r.getAs[Int]("lvl") == 3)
    assert(grand.length == 1 && grand.head.getAs[Long]("n") == total)
    // status slice (lvl=2: priority aggregated away) sums to total
    val bySlice = rows.groupBy(_.getAs[Int]("lvl")).view.mapValues(_.map(_.getAs[Long]("n")).sum)
    assert(bySlice(2) == total && bySlice(1) == total)
  }

  test("new users: cumulative count matches distinct users through each day") {
    val df = RelationalExt2.q32NewUsers(spark, sf)
    val rows = df.filter(col("event_type") === "purchase").orderBy("day").collect()
    assert(rows.nonEmpty)
    // last cumulative value = total distinct purchase users
    val expected = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(rows.last.getAs[Long]("cum_users") == expected)
    // cum is nondecreasing and >= n_active's new component
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("cum_users") ==
          a.getAs[Long]("cum_users") + b.getAs[Long]("n_new"))
      case _ =>
    }
  }

  test("listagg: sequence length equals order count and is date-ordered") {
    val rows = RelationalExt2.q33ListAgg(spark, sf).limit(50).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("status_seq").length == r.getAs[Long]("n_orders"))
    }
    // cross-check one customer against an explicit sort
    val ck = rows.head.getAs[Long]("custkey")
    val expected = Tables.orders(spark, sf).filter(col("o_custkey") === ck)
      .orderBy("o_orderdate", "o_orderkey")
      .select("o_orderstatus").collect().map(_.getString(0)).mkString
    assert(rows.head.getAs[String]("status_seq") == expected)
  }

  test("gap fill: full hour grid, zero-filled, cumulative equals per-type event count") {
    val df = RelationalExt2.q34GapFill(spark, sf)
    val rows = df.collect()
    val types = rows.map(_.getAs[String]("event_type")).distinct
    val perType = rows.groupBy(_.getAs[String]("event_type"))
    // every type covers the same (global) hour grid
    val gridSizes = perType.values.map(_.length).toSet
    assert(gridSizes.size == 1, s"uneven grids: $gridSizes")
    // zero-filled rows exist (the grid is denser than the data at sf0.001)
    assert(rows.exists(_.getAs[Long]("n") == 0L))
    // last cumulative value equals the type's event count
    val counts = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    types.foreach { t =>
      val last = perType(t).maxBy(_.getAs[java.sql.Timestamp]("hour").getTime)
      assert(last.getAs[Long]("cum_n") == counts(t), s"cum mismatch for $t")
    }
  }
  test("q35_histogram: buckets cover all rows, bounds monotone, bucket ids in range") {
    val rows = RelationalExt2.q35Histogram(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == Tables.orders(spark, sf).count())
    val ids = rows.map(_.getAs[Long]("bucket"))
    assert(ids.forall(b => b >= 0 && b < 20))
    val los = rows.sortBy(_.getAs[Long]("bucket")).map(_.getAs[Double]("bucket_lo"))
    assert(los.zip(los.tail).forall { case (a, b) => a < b })
  }

  test("q36_rank_family: invariants between rank, dense_rank, percent_rank, cume_dist") {
    val rows = RelationalExt2.q36RankFamily(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("rnk") >= r.getAs[Long]("drnk"))
      val p = r.getAs[Double]("prnk"); val c = r.getAs[Double]("cdist")
      assert(p >= 0.0 && p <= 1.0 && c > 0.0 && c <= 1.0)
    }
  }

  test("q37_locf: observed rows carry their own value, gaps carry the last observed one") {
    val rows = RelationalExt2.q37Locf(spark, sf)
      .filter(col("event_type") === "purchase").orderBy("hour").collect()
    assert(rows.nonEmpty)
    var lastSeen: Option[Long] = None
    rows.foreach { r =>
      if (r.getAs[Boolean]("observed")) {
        lastSeen = Some(r.getAs[Long]("cents_locf"))
        assert(r.getAs[Long]("gap_secs") == 0L)
      } else if (lastSeen.isDefined) {
        assert(r.getAs[Long]("cents_locf") == lastSeen.get)
        assert(r.getAs[Long]("gap_secs") > 0L)
      }
    }
  }

  test("q38: multiplicities match min/excess of per-side counts") {
    val byStatus = Tables.orders(spark, sf).groupBy("o_custkey", "o_orderstatus").count()
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2))).toMap
    RelationalExt2.q38IntersectAll(spark, sf).collect().foreach { r =>
      val k = r.getAs[Long]("custkey")
      val f = byStatus.getOrElse((k, "F"), 0L); val o = byStatus.getOrElse((k, "O"), 0L)
      assert(r.getAs[Long]("n_common") == math.min(f, o))
      assert(r.getAs[Long]("n_excess") == math.max(f - o, 0L))
    }
  }

  test("q39: unpivot emits 3 metric rows per type and round-trips the wide values") {
    val rows = RelationalExt2.q39Unpivot(spark, sf).collect()
    val types = rows.map(_.getAs[String]("event_type")).distinct
    assert(rows.length == types.length * 3)
    assert(rows.map(_.getAs[String]("metric")).toSet == Set("n_events", "cents", "n_users"))
  }

  test("q40: per-group quartiles are ordered and bracket the group range") {
    RelationalExt2.q40GroupMedian(spark, sf).collect().foreach { r =>
      val (p25, med, p75) = (r.getAs[Double]("p25"), r.getAs[Double]("median"), r.getAs[Double]("p75"))
      assert(p25 <= med && med <= p75)
    }
  }

}
