package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink round-trips (SURVEY.md §2H): the engine must read and write
  * every interchange format losslessly, and partitioned writes must prune
  * at read time.
  */
class SourcesSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("csv round-trip preserves rows and schema-inferred values") {
    val out = tmp("graft_csv")
    val src = Tables.nation(spark, sf)
    src.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(out)
    assert(back.count() == src.count())
    assert(back.select(sum("n_nationkey")).first().getLong(0)
      == src.select(sum("n_nationkey")).first().getLong(0))
  }

  test("json round-trip preserves rows and values") {
    val out = tmp("graft_json")
    val src = Tables.supplier(spark, sf)
    src.write.mode("overwrite").json(out)
    val back = spark.read.json(out)
    assert(back.count() == src.count())
    assert(back.agg(round(sum("s_acctbal"), 2)).first().getDouble(0)
      == src.agg(round(sum("s_acctbal"), 2)).first().getDouble(0))
  }

  test("orc round-trip preserves rows and values") {
    val out = tmp("graft_orc")
    val src = Tables.part(spark, sf)
    src.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.count() == src.count())
    assert(back.agg(round(sum("p_retailprice"), 2)).first().getDouble(0)
      == src.agg(round(sum("p_retailprice"), 2)).first().getDouble(0))
  }

  test("partitioned parquet write prunes partitions at read") {
    val out = tmp("graft_part")
    Tables.orders(spark, sf)
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("o_orderstatus") === "F")
    // physical plan must show partition filters, not a data filter over all files
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || !plan.contains("o_orderstatus#"),
      s"expected partition pruning in plan")
    val full = Tables.orders(spark, sf).filter(col("o_orderstatus") === "F").count()
    assert(pruned.count() == full)
  }

  test("streaming parquet sink: append with checkpoint equals the batch result") {
    val out = tmp("st_sink")
    val ckpt = tmp("st_ckpt")
    val q = graft.streaming.EventStream.eventStream(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "value")
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .start()
    try q.processAllAvailable()
    finally q.stop()
    val streamed = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch, "streaming parquet sink diverges from batch")
  }

  test("bucketed table write co-locates join keys (no exchange on bucketed join)") {
    val db = "graft_test"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    try {
      Tables.orders(spark, sf).write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"$db.orders_bucketed")
      val t = spark.table(s"$db.orders_bucketed")
      assert(t.count() == Tables.orders(spark, sf).count())
      // sort-merge self-join on the bucket key: bucketing replaces the shuffle
      val joined = t.as("a").hint("merge").join(t.as("b"), "o_orderkey")
      val exchanges = joined.queryExecution.executedPlan.toString
        .split("\n").count(_.contains("ShuffleExchange"))
      assert(exchanges == 0, s"bucketed self-join should not shuffle, saw $exchanges shuffles")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $db.orders_bucketed")
    }
  }

  test("escLine/unescLine: adversarial strings round-trip, escaped form is line-atomic") {
    import operators.Pipeline.{escLine, unescLine}
    val cases = Seq(
      "plain", "", "%", "%%", "%25", "%0A", "%%0A", "%250A", "a\nb", "a\tb\rc",
      "\n\r\t%", "tab\tnl\npct%pct%09end", "%0", "25%09", "ünïcødé\n%25\t")
    val df = spark.createDataFrame(
      cases.zipWithIndex.map { case (t, i) => (i, t) }).toDF("i", "t")
    val out = df.select(col("i"), col("t"), escLine(col("t")).as("e"))
      .select(col("i"), col("t"), col("e"), unescLine(col("e")).as("back"))
      .collect().sortBy(_.getInt(0))
    out.zip(cases).foreach { case (r, orig) =>
      assert(r.getAs[String]("back") == orig, s"round-trip broke for <$orig>")
      val e = r.getAs[String]("e")
      assert(!e.exists(c => c == '\n' || c == '\r' || c == '\t'),
        s"escaped form not line-atomic for <$orig>: <$e>")
    }
  }

  test("p_text_roundtrip and p_jsonl_roundtrip hash-equal p_manifest") {
    val want = operators.Pipeline.manifest(spark, sf).collect().map(_.toSeq).toSeq
    val text = operators.Pipeline.textRoundtrip(spark, sf).collect().map(_.toSeq).toSeq
    val json = operators.Pipeline.jsonlRoundtrip(spark, sf).collect().map(_.toSeq).toSeq
    assert(text == want, "text round-trip manifest drifted from the parquet manifest")
    assert(json == want, "jsonl round-trip manifest drifted from the parquet manifest")
  }
}
