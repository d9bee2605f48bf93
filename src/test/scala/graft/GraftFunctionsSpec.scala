package graft

class GraftFunctionsSpec extends SparkSpec {

  test("registered SQL functions evaluate and agree with the Column API") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT djb2('a') AS h, djb2_partition('spark', 10) AS p,
        | simhash64(array('a', 'b', 'a')) AS sh,
        | dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dp,
        | word_shingles(array('a','b','c','b','c'), 2) AS ws,
        | est_jaccard(minhash_sig(array('x y z')), minhash_sig(array('x y z'))) AS ej
        |""".stripMargin).first()
    assert(r.getAs[Long]("h") == 177670L)
    val p = r.getAs[Int]("p")
    assert(p == graft.functions.Djb2.partition("spark".getBytes("UTF-8"), 10))
    assert(r.getAs[Double]("dp") == 11.0)
    assert(r.getSeq[String](r.fieldIndex("ws")) == Seq("a b", "b c", "c b"))
    assert(r.getAs[Double]("ej") == 1.0)
  }

  test("literal-typed scalar args are accepted; bad args fail with a clear message") {
    GraftFunctions.register(spark)
    // BIGINT literal and a constant-folded expression are both fine
    assert(spark.sql("SELECT djb2_partition('spark', CAST(10 AS BIGINT)) AS p").first()
      .getAs[Int]("p") == graft.functions.Djb2.partition("spark".getBytes("UTF-8"), 10))
    assert(spark.sql("SELECT size(word_shingles(array('a','b','c'), 1+1)) AS n").first()
      .getAs[Int]("n") == 2)
    // a column reference is not a literal: descriptive error, not a CCE/NPE
    val err = intercept[Exception] {
      spark.sql("SELECT djb2_partition(t, n) FROM VALUES ('a', 3) AS v(t, n)").collect()
    }
    assert(err.getMessage.contains("must be a literal integer"),
      s"expected a descriptive error, got: ${err.getMessage}")
  }
}
