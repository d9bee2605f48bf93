package graft

import org.apache.spark.sql.functions._

import graft.operators.{RelationalExt5, Similarity}

/** The oracle gate covers value correctness; these pin the invariants
  * each operator's algebra must satisfy at any scale.
  */
class RelationalExt5Spec extends SparkSpec {

  test("q64: sweep-line invariants — coverage bounded by interval mass, counts close") {
    val rows = RelationalExt5.q64IntervalOverlap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_intervals")
      val maxC = r.getAs[Int]("max_concurrent")
      val covered = r.getAs[Long]("covered_us")
      assert(n > 0 && maxC >= 1 && maxC <= n)
      // union length can never exceed total interval mass (30 min each),
      // and with >=1 interval is at least one interval long
      assert(covered >= 1800000000L && covered <= n * 1800000000L,
        s"covered_us=$covered outside [30min, n*30min] for $r")
    }
  }

  test("q64: per-type sweep always closes — sum of deltas is zero (cum ends at 0)") {
    // equivalently: covered_us is finite and the last gap never counts;
    // replay the endpoint sum directly
    val e = Tables.events(spark, sf)
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    val byType = RelationalExt5.q64IntervalOverlap(spark, sf)
      .select("event_type", "n_intervals")
    val joined = byType.join(e, "event_type")
      .filter(col("n_intervals") =!= col("n")).count()
    assert(joined == 0, "n_intervals must equal the raw event count per type")
  }

  test("q67: decimal renderings carry full scale and replay from exact cents") {
    val rows = RelationalExt5.q67Decimal(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val p = r.getAs[String]("sum_price"); val dp = r.getAs[String]("sum_disc_price")
      assert(p.matches("""\d+\.\d{2}"""), s"sum_price must render scale 2: $p")
      assert(dp.matches("""\d+\.\d{4}"""), s"sum_disc_price must render scale 4: $dp")
      // discounted never exceeds gross price sum
      assert(BigDecimal(dp) <= BigDecimal(p))
    }
  }

  test("s_graph_search: beams are valid top-3 sets with monotone scores") {
    val rows = Similarity.graphSearch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, beam) =>
      assert(beam.length <= 3)
      val byRank = beam.sortBy(_.getAs[Int]("rank_n"))
      assert(byRank.map(_.getAs[Int]("rank_n")).toSeq == (1 to beam.length))
      val scores = byRank.map(_.getAs[Double]("cos"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"query $q beam scores must be non-increasing")
      assert(byRank.forall(_.getAs[Long]("vec_id") != q), "a query never retrieves itself")
    }
  }

  test("s_ivf_pq: ADC ordering holds and the standalone IVF top stays reachable") {
    val composed = Similarity.annIvfPq(spark, sf).collect()
    assert(composed.length == 10)
    // approx scores ascend with rank (ADC distance ordering)
    val scores = composed.map(_.getAs[Long]("approx_micros"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a <= b })
    // the IVF half is shared: the standalone IVF retrieval's probed
    // cells are non-empty, so the composed cut had candidates to rank
    assert(Similarity.annIvf(spark, sf).collect().nonEmpty)
    assert(composed.forall(_.getAs[Long]("vec_id") != 0L))
  }

  test("s_maxsim: bag scores are bounded by the token count and ranked descending") {
    val rows = Similarity.maxSim(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val scores = rows.map(_.getAs[Double]("maxsim"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // 8 query tokens, each max-cosine <= 1 → score <= 8
    assert(scores.forall(v => v <= 8.0 + 1e-9 && v >= -8.0 - 1e-9))
    assert(rows.forall(_.getAs[Long]("doc_bag") != 0L), "the query bag never retrieves itself")
  }

  test("q79: drift-tolerant union routes every row exactly once") {
    val rows = operators.RelationalExt5.q79UnionByName(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == Tables.events(spark, sf).count())
    val pre = rows.filter(_.getAs[String]("channel") == "(pre-drift)")
    assert(pre.length == 1 && pre.head.getAs[Long]("n") > 0)
  }

  test("q80: AQE coalesce certificate — business result intact, vacuity guard armed") {
    // the in-query guards throw if no AQE read coalesced below the static
    // partition count, so a green run IS the plan certificate; pin the
    // business half: every signup is counted exactly once
    val rows = RelationalExt5.q80AqeCoalesce(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Boolean]("coalesced")))
    val total = rows.map(_.getAs[Long]("n_signups")).sum
    val expected = Tables.events(spark, sf)
      .filter(col("event_type") === "signup").count()
    assert(total == expected, s"daily sums $total != signup count $expected")
  }

  test("q81: window group limit — exactly top-3 per group, ranks dense from 1") {
    val rows = RelationalExt5.q81WindowGroupLimit(spark, sf).collect()
    assert(rows.forall(_.getAs[Boolean]("group_limited")))
    val byPrio = rows.groupBy(_.getAs[String]("o_orderpriority"))
    assert(byPrio.nonEmpty)
    byPrio.foreach { case (p, rs) =>
      val rns = rs.map(_.getAs[Int]("rn")).sorted
      assert(rns.sameElements(1 to rns.length) && rns.length <= 3,
        s"priority $p ranks ${rns.mkString(",")}")
      // row_number follows price desc: cents non-increasing within group
      val prices = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Long]("price_c"))
      assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    }
    // every priority with >=1 order appears
    val nPrios = Tables.orders(spark, sf).select("o_orderpriority").distinct().count()
    assert(byPrio.size.toLong == nPrios)
  }

  test("q65: bitmap algebra is lossless vs exact distinct-set arithmetic") {
    val rows = RelationalExt5.q65BitmapDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    // exact recompute in-memory at test scale
    val pairs = Tables.events(spark, sf)
      .select("event_type", "user_id").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val byType = pairs.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { r =>
      val a = r.getAs[String]("type_a"); val b = r.getAs[String]("type_b")
      assert(a < b, "grid must be the ordered upper triangle")
      assert(r.getAs[Long]("aud_a") == byType(a).size.toLong)
      assert(r.getAs[Long]("aud_b") == byType(b).size.toLong)
      assert(r.getAs[Long]("n_shared") == (byType(a) & byType(b)).size.toLong)
    }
    // complete pair grid: k*(k-1)/2 rows even if an intersection is empty
    val k = byType.size
    assert(rows.length == k * (k - 1) / 2)
  }

  test("q82: typed Aggregator and udaf registration agree; counts partition the table") {
    val rows = RelationalExt5.q82TypedAgg(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("apis_agree")), "typed vs udaf paths diverged")
    assert(rows.map(_.getAs[Long]("n")).sum == Tables.orders(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("max_cents") * r.getAs[Long]("n") >= r.getAs[Long]("sum_cents"),
        "max * n must bound the sum")
    }
  }

  test("q83: exchange reuse — extremes agree with a direct batch replay") {
    val rows = RelationalExt5.q83ExchangeReuse(spark, sf).collect()
    assert(rows.length == 2 && rows.forall(_.getAs[Boolean]("exchange_reused")))
    val daily = Tables.events(spark, sf)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n"), sum(round(col("value") * lit(100)).cast("long")).as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byN = daily.sortBy(r => (-r._2, r._1)).head
    val byV = daily.sortBy(r => (-r._3, r._1)).head
    val got = rows.map(r => r.getAs[String]("metric") -> r.getAs[String]("day")).toMap
    assert(got("max_events") == byN._1 && got("max_value") == byV._1)
  }
}
