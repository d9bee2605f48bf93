package graft

import org.apache.spark.sql.functions._

import graft.operators.{ExactRound, RelationalExt3}

class RelationalExt3Spec extends SparkSpec {

  test("q41_funnel: stage reach matches an in-memory ordered-funnel replay") {
    val events = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
    def firstAtOrAfter(user: Long, tpe: String, lo: Long): Option[Long] =
      events.collect { case (u, t, ts) if u == user && t == tpe && ts >= lo => ts }
        .sorted.headOption
    val users = events.map(_._1).distinct
    val v = users.flatMap(u => firstAtOrAfter(u, "view", Long.MinValue).map(u -> _)).toMap
    val c = v.flatMap { case (u, ts) => firstAtOrAfter(u, "click", ts).map(u -> _) }
    val p = c.flatMap { case (u, ts) => firstAtOrAfter(u, "purchase", ts).map(u -> _) }
    val rows = RelationalExt3.q41Funnel(spark, sf).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(rows == Map("view" -> v.size.toLong, "click" -> c.size.toLong,
      "purchase" -> p.size.toLong))
  }

  test("q41_funnel: reach is monotone non-increasing and conversion is a fraction of stage 1") {
    val rows = RelationalExt3.q41Funnel(spark, sf).orderBy("stage_idx").collect()
    assert(rows.length == 3)
    val reach = rows.map(_.getAs[Long]("n_users"))
    assert(reach.zip(reach.tail).forall { case (a, b) => a >= b })
    assert(rows.head.getAs[Double]("conv_pct") == 1.0)
    rows.foreach { r =>
      val cp = r.getAs[Double]("conv_pct")
      assert(cp >= 0.0 && cp <= 1.0)
      assert(r.getAs[Long]("micros_from_view") >= 0L)
    }
  }

  test("q43_trailing_dau: wau equals an in-memory trailing-7-day distinct recount") {
    val pairs = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val maxDay = pairs.map(_._1).maxBy(_.toEpochDay)
    val got = RelationalExt3.q43TrailingDau(spark, sf).collect()
      .map(r => (r.getAs[String]("day"), r.getAs[Long]("dau"), r.getAs[Long]("wau")))
    assert(got.nonEmpty)
    got.foreach { case (dayStr, dau, wau) =>
      val day = java.time.LocalDate.parse(dayStr)
      assert(!day.isAfter(maxDay))
      val expDau = pairs.count(_._1 == day).toLong
      val expWau = pairs.filter { case (d, _) =>
        !d.isAfter(day) && !d.isBefore(day.minusDays(6))
      }.map(_._2).distinct.length.toLong
      assert(dau == expDau, s"dau mismatch on $dayStr")
      assert(wau == expWau, s"wau mismatch on $dayStr")
      assert(wau >= dau)
    }
  }

  test("q42_retention: offset 0 is full retention; cohort sizes partition the customers") {
    val rows = RelationalExt3.q42Retention(spark, sf).collect()
    val atZero = rows.filter(_.getAs[Long]("month_offset") == 0L)
    atZero.foreach { r =>
      assert(r.getAs[Long]("n_active") == r.getAs[Long]("cohort_size"))
      assert(r.getAs[Double]("retention") == 1.0)
    }
    // every cohort has its offset-0 row, and cohort sizes sum to distinct customers
    val cohorts = rows.map(_.getAs[String]("cohort")).distinct
    assert(atZero.map(_.getAs[String]("cohort")).distinct.length == cohorts.length)
    val totalCustomers = Tables.orders(spark, sf)
      .select(countDistinct("o_custkey")).first().getLong(0)
    assert(atZero.map(_.getAs[Long]("cohort_size")).sum == totalCustomers)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active") <= r.getAs[Long]("cohort_size"))
      assert(r.getAs[Long]("month_offset") >= 0L)
    }
  }

  test("q44_attribution: credit replays from an in-memory last-click scan") {
    import org.apache.spark.sql.functions.unix_micros
    val lookbackUs = 7L * 86400 * 1000 * 1000
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val clicksByUser = ev.filter(_._3 == "click").groupBy(_._2)
    val expected = ev.filter(_._3 == "purchase").flatMap { case (pid, u, _, pts) =>
      val cands = clicksByUser.getOrElse(u, Array.empty)
        .filter(c => c._4 <= pts && pts - c._4 <= lookbackUs)
      if (cands.isEmpty) None
      else {
        // latest click instant; max event_id breaks same-instant ties
        val best = cands.maxBy(c => (c._4, c._1))
        Some(pid -> ((best._1, pts - best._4)))
      }
    }.toMap
    val got = RelationalExt3.q44Attribution(spark, sf).collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        ((r.getAs[Long]("click_id"), r.getAs[Long]("time_to_convert_us")))).toMap
    assert(got == expected,
      s"attribution diverges: ${got.toSet.diff(expected.toSet).take(3)}")
    assert(got.nonEmpty && got.values.forall(_._2 >= 0L))
    // some purchases fall outside the 7-day lookback and stay unattributed
    assert(got.size < ev.count(_._3 == "purchase"), "lookback must exclude someone")
  }

  test("q45_pareto: deciles conserve customers and revenue; cum_share ends at 1") {
    val rows = RelationalExt3.q45Pareto(spark, sf).collect()
    val revs = Tables.orders(spark, sf).collect()
      .map(r => r.getAs[Long]("o_custkey") ->
        ExactRound.valueMicros(r.getAs[Double]("o_totalprice")))
      .groupBy(_._1).map { case (_, vs) => vs.map(_._2).sum }.toSeq
    assert(rows.map(_.getAs[Long]("n_customers")).sum == revs.size.toLong,
      "deciles partition the customer set")
    val totalRevenue = ExactRound.rScalar(revs.sum.toDouble / 1000000.0, 2)
    assert(ExactRound.rScalar(
      rows.map(_.getAs[Double]("revenue_total")).sum, 1) ==
      ExactRound.rScalar(totalRevenue, 1), "revenue is conserved")
    val cums = rows.sortBy(_.getAs[Long]("decile")).map(_.getAs[Double]("cum_share"))
    assert(cums.last == 1.0, "cumulative share ends at exactly 1")
    assert(cums.zip(cums.tail).forall { case (a, b) => a < b }, "cum_share strictly increases")
    // concentration is real: the top decile outweighs the bottom one
    val byDec = rows.map(r => r.getAs[Long]("decile") -> r.getAs[Double]("share")).toMap
    assert(byDec(10L) > byDec(1L), "top revenue decile carries more share")
  }

  test("q46_yoy: rows match an in-memory monthly micros replay") {
    val monthly = Tables.orders(spark, sf).select("o_orderdate", "o_totalprice").collect()
      .map { r =>
        val dt = r.getAs[java.time.LocalDateTime](0).toLocalDate
        (dt.getYear.toLong * 12 + dt.getMonthValue - 1,
          ExactRound.valueMicros(r.getDouble(1)))
      }
      .groupBy(_._1).map { case (ym, vs) => ym -> (vs.size.toLong, vs.map(_._2).sum) }
    val expected = monthly.keys.filter(ym => monthly.contains(ym - 12)).map { ym =>
      val (n, rev) = monthly(ym)
      val (_, prev) = monthly(ym - 12)
      f"${ym / 12}%04d-${ym % 12 + 1}%02d" ->
        ((n, ExactRound.rScalar(rev.toDouble / 1e6, 2),
          ExactRound.rScalar(rev.toDouble / prev, 6)))
    }.toMap
    val got = RelationalExt3.q46Yoy(spark, sf).collect()
      .map(r => r.getAs[String]("month") ->
        ((r.getAs[Long]("n_orders"), r.getAs[Double]("revenue"),
          r.getAs[Double]("yoy_ratio")))).toMap
    assert(got == expected, s"yoy diverges: ${got.toSet.diff(expected.toSet).take(3)}")
    assert(got.nonEmpty && got.size < monthly.size, "first 12 months have no prior year")
  }

  test("q49_returns: per-segment return rates replay from collected tables") {
    val seg = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ordSeg = Tables.orders(spark, sf).select("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> seg(r.getLong(1))).toMap
    val lines = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_returnflag", "l_extendedprice", "l_discount").collect()
      .map { r =>
        val us = BigDecimal(r.getDouble(2) * (1.0 - r.getDouble(3)) * 1e6)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        (ordSeg(r.getLong(0)), r.getString(1) == "R", us)
      }
    val expected = lines.groupBy(_._1).map { case (s2, vs) =>
      s2 -> ((vs.length.toLong, vs.count(_._2).toLong,
        vs.filter(_._2).map(_._3).sum, vs.map(_._3).sum))
    }
    val rows = RelationalExt3.q49Returns(spark, sf).collect()
    assert(rows.map(_.getAs[String]("c_mktsegment")).toSet == expected.keySet)
    rows.foreach { r =>
      val (n, nr, retUs, totUs) = expected(r.getAs[String]("c_mktsegment"))
      assert(r.getAs[Long]("n_lines") == n)
      assert(r.getAs[Long]("n_returned") == nr)
      assert(r.getAs[Double]("return_rate") == math.round(nr.toDouble / n * 1e6) / 1e6)
      assert(r.getAs[Double]("revenue_share") ==
        math.round(retUs.toDouble / totUs * 1e6) / 1e6)
    }
  }

  test("q48_decile_moves: matrix conserves customers; quintiles balanced within periods") {
    val rows = RelationalExt3.q48DecileMoves(spark, sf).collect()
    val cells = rows.map(r => (r.getAs[Long]("q_before"), r.getAs[Long]("q_after")) ->
      r.getAs[Long]("n_customers")).toMap
    // no customer can be absent from both periods
    assert(!cells.contains((0L, 0L)))
    assert(cells.keys.forall { case (a, b) => a >= 0 && a <= 5 && b >= 0 && b <= 5 })
    // total customers = distinct custkeys with any order
    val nCust = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(cells.values.sum == nCust)
    // shares are the exact rounded ratios and sum to ~1
    val total = cells.values.sum.toDouble
    rows.foreach { r =>
      assert(r.getAs[Double]("share") ==
        math.round(r.getAs[Long]("n_customers") / total * 1e6) / 1e6)
    }
    // each period's present-quintiles are ~equal by construction (percentile edges)
    val byBefore = cells.collect { case ((a, _), n) if a > 0 => a -> n }
      .groupBy(_._1).map { case (q, vs) => q -> vs.map(_._2).sum }
    assert(byBefore.values.max - byBefore.values.min <=
      byBefore.values.max / 2, s"quintiles wildly unbalanced: $byBefore")
  }

  test("q47_basket: pair counts match in-memory brute force; top-20 order deterministic") {
    val brand = Tables.part(spark, sf).select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val orderBrands = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey").collect()
      .map(r => r.getLong(0) -> brand(r.getLong(1)))
      .groupBy(_._1).map { case (o, vs) => o -> vs.map(_._2).toSet }
    val counts = orderBrands.values.toSeq
      .flatMap(bs => bs.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (p, vs) => p -> vs.size.toLong }
    val expectedTop = counts.toSeq
      .sortBy { case ((a, b), n) => (-n, a, b) }.take(20)
    val rows = RelationalExt3.q47Basket(spark, sf).collect()
    assert(rows.map(r => ((r.getAs[String]("brand_a"), r.getAs[String]("brand_b")),
      r.getAs[Long]("n_orders"))).toSeq == expectedTop)
    val total = orderBrands.size.toDouble
    rows.foreach { r =>
      assert(r.getAs[String]("brand_a") < r.getAs[String]("brand_b"))
      assert(r.getAs[Double]("support") ==
        ExactRound.rScalar(r.getAs[Long]("n_orders") / total, 6))
    }
  }

  test("q50_rfm: segments conserve purchasers and revenue; scores in 1..5") {
    val rows = RelationalExt3.q50Rfm(spark, sf).collect()
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("user_id", "value").collect()
      .map(r => r.getAs[Long]("user_id") -> ExactRound.valueMicros(r.getAs[Double]("value")))
    assert(rows.map(_.getAs[Long]("n_users")).sum ==
      purchases.map(_._1).distinct.length.toLong, "segments partition the purchaser set")
    assert(rows.map(_.getAs[Long]("rev_us")).sum == purchases.map(_._2).sum,
      "micros revenue is conserved across segments")
    rows.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= 1L && v <= 5L, s"$c out of range: $v")
      }
      assert(r.getAs[Long]("n_users") > 0L)
    }
    // quintile scoring must actually spread: more than one segment cell
    assert(rows.length > 1, "RFM collapsed to a single segment")
  }

  test("q51_cohort_ltv: cumulative micros replay; LTV is monotone per cohort") {
    val orders = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderdate", "o_totalprice").collect().map { r =>
        val d = r.getAs[Any]("o_orderdate") match {
          case d: java.sql.Date => d.toLocalDate
          case t: java.time.LocalDateTime => t.toLocalDate
          case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
          case t: java.time.LocalDate => t
        }
        (r.getAs[Long]("o_custkey"), d.getYear * 12 + d.getMonthValue,
          ExactRound.valueMicros(r.getAs[Double]("o_totalprice")))
      }
    val cym = orders.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val monthly = orders.groupBy(o => (cym(o._1), o._2 - cym(o._1)))
      .view.mapValues(_.map(_._3).sum).toMap
    val rows = RelationalExt3.q51CohortLtv(spark, sf).collect()
    val byCohort = rows.groupBy(_.getAs[String]("cohort"))
    byCohort.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("month_offset"))
      val cums = sorted.map(_.getAs[Long]("cum_rev_us"))
      assert(cums.zip(cums.tail).forall { case (a, b) => a < b },
        "cumulative revenue must strictly increase")
      val ltvs = sorted.map(_.getAs[Double]("ltv_per_user"))
      assert(ltvs.zip(ltvs.tail).forall { case (a, b) => a <= b })
    }
    // spot-replay every row's cumulative against the in-memory micros table
    rows.foreach { r =>
      val Array(y, m) = r.getAs[String]("cohort").split("-").map(_.toInt)
      val c = y * 12 + m
      val off = r.getAs[Long]("month_offset")
      val expected = (0L to off).map(o => monthly.getOrElse((c, o.toInt), 0L)).sum
      assert(r.getAs[Long]("cum_rev_us") == expected,
        s"cohort $c offset $off: ${r.getAs[Long]("cum_rev_us")} != $expected")
    }
  }

  test("q52_skew_join: salted join equals the unsalted join, and the salted plan shuffle-joins") {
    val q = RelationalExt3.q52SkewJoin(spark, sf)
    val got = q.collect().map(r =>
      (r.getAs[String]("event_type"), r.getAs[Long]("n_events"),
        r.getAs[Long]("weighted_micros"))).toSeq
    // unsalted twin computed inline
    val ev = Tables.events(spark, sf).select(col("event_type"), col("value"))
    val dim = ev.select("event_type").distinct()
      .withColumn("type_weight", length(col("event_type")).cast("long"))
    val want = ev.join(dim, "event_type")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * lit(1000000L)).cast("long") * col("type_weight")).as("wm"))
      .collect().map(r =>
        (r.getAs[String]("event_type"), r.getAs[Long]("n"), r.getAs[Long]("wm")))
      .sortBy(_._1).toSeq
    assert(got == want, s"salted join diverges from unsalted: ${got.take(2)} vs ${want.take(2)}")
    // the hot-key join must be a real shuffle join (not broadcast, never cartesian)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"expected a shuffle-hash join in:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q53_column_profile: counts match per-column direct aggregates; one shuffle, not k") {
    val q = RelationalExt3.q53ColumnProfile(spark, sf)
    val got = q.collect().map(r => r.getAs[String]("column_name") ->
      ((r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"), r.getAs[Long]("n_distinct")))).toMap
    val li = Tables.lineitem(spark, sf)
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag", "l_shipdate").foreach { c =>
      val direct = li.agg(count(lit(1)), sum(when(col(c).isNull, 1L).otherwise(0L)),
        countDistinct(col(c))).first()
      assert(got(c) == ((direct.getLong(0), direct.getLong(1), direct.getLong(2))),
        s"profile diverges for $c")
    }
    // the melt is a zero-shuffle row-local operator (Generate), and the whole
    // profile takes ONE hash-partitioned aggregation shuffle over (column, value)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Generate explode") || plan.contains("Expand"),
      "melt must compile to a row-local Generate/Expand, not a join or union of scans")
    // (AQE prints Final + Initial sections; count only the final plan.
    // count(DISTINCT) lowers to two phases = 2 hash exchanges, regardless
    // of column count — the per-column-job alternative would show 5+.)
    val finalPlan = plan.split("== Initial Plan ==")(0)
    val aggShuffles = finalPlan.split("\n")
      .count(l => l.contains("Exchange hashpartitioning"))
    assert(aggShuffles <= 2, s"profiler must not shuffle per column, saw $aggShuffles")
  }

  test("q54_correlated_sub: decorrelates to aggregate+join; replay matches in-memory") {
    val q = RelationalExt3.q54CorrelatedSub(spark, sf)
    // the correlated subqueries must be decorrelated, not executed per row
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("SubqueryExec"), "correlated subqueries must decorrelate")
    assert(plan.contains("Join"), "decorrelation produces an aggregate+join")
    // in-memory replay of the integer-exact predicate
    def us(v: Double): Long = graft.operators.ExactRound.valueMicros(v)
    val orders = Tables.orders(spark, sf).select("o_custkey", "o_totalprice").collect()
      .map(r => r.getLong(0) -> us(r.getDouble(1)))
    val byCust = orders.groupBy(_._1).view
      .mapValues(os => (os.length.toLong, os.map(_._2).sum)).toMap
    val expected = orders.filter { case (c, p) =>
      val (cnt, sum) = byCust(c); 2 * p * cnt > 3 * sum
    }.groupBy(_._1).view.mapValues(os => (os.length.toLong, os.map(_._2).sum))
      .toSeq.sortBy(_._1).map { case (c, (n, rev)) => (c, n, rev) }
    val got = q.collect().map(r => (r.getAs[Long]("o_custkey"),
      r.getAs[Long]("n_big"), r.getAs[Long]("big_rev_us"))).toSeq
    assert(got == expected, s"q54 diverges: ${got.take(3)} vs ${expected.take(3)}")
  }

  test("q55_observe: observed metrics equal direct aggregates; repeated runs don't cross-talk") {
    val r1 = RelationalExt3.q55Observe(spark, sf).first()
    val direct = Tables.lineitem(spark, sf).agg(count(lit(1)),
      sum(round(col("l_extendedprice") * lit(1000000L)).cast("long")),
      min(col("l_quantity")), max(col("l_quantity"))).first()
    assert(r1.getAs[Long]("n_rows") == direct.getLong(0))
    assert(r1.getAs[Long]("rev_us") == direct.getLong(1))
    assert(r1.getAs[Double]("min_qty") == direct.getDouble(2))
    assert(r1.getAs[Double]("max_qty") == direct.getDouble(3))
    // a second invocation must capture ITS OWN metrics, not a stale row
    val r2 = RelationalExt3.q55Observe(spark, sf).first()
    assert(r2 == r1, "observe must be idempotent across invocations")
  }

  test("q52 technique under PLANTED skew: one key carrying 50k rows still joins exactly") {
    import spark.implicits._
    val salts = 8
    // 50k rows of one hot key + a tail of 100 cold keys, tiny dim
    val fact = ((1 to 50000).map(i => ("hot", i.toLong)) ++
      (1 to 100).map(i => (s"cold$i", i.toLong))).toDF("k", "v")
    val dim = (Seq("hot") ++ (1 to 100).map(i => s"cold$i"))
      .map(k => (k, k.length.toLong)).toDF("k", "w")
    val dimExp = dim.withColumn("salt", explode(sequence(lit(0L), lit(salts - 1L))))
    val salted = fact.withColumn("salt", pmod(col("v"), lit(salts.toLong)))
      .join(dimExp.hint("shuffle_hash"), Seq("k", "salt"))
      .groupBy("k").agg(count(lit(1)).as("n"), sum(col("v") * col("w")).as("wv"))
    val direct = fact.join(dim, "k")
      .groupBy("k").agg(count(lit(1)).as("n"), sum(col("v") * col("w")).as("wv"))
    val a = salted.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val b = direct.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(a == b, "salted join must equal the direct join under real skew")
    assert(a.find(_._1 == "hot").get._2 == 50000L)
  }
}
