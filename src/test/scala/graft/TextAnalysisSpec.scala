package graft

import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  test("token stats: bpe tokenization is at least as fine as whitespace") {
    TextAnalysis.tokenStats(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_bpe_tokens") >= r.getAs[Long]("n_ws_tokens"))
      assert(r.getAs[Long]("len_chars") > 0)
    }
  }

  test("langid: prediction is one of the five languages and scores are non-negative") {
    val langs = Set("en", "de", "es", "fr", "zh")
    TextAnalysis.langid(spark, sf).collect().foreach { r =>
      assert(langs.contains(r.getAs[String]("pred_lang")))
      assert(r.getAs[Long]("s_en") >= 0)
    }
  }

  test("quality: ratios in [0,1], score in [0,1]") {
    TextAnalysis.quality(spark, sf).collect().foreach { r =>
      val pr = r.getAs[Double]("punct_ratio")
      val sr = r.getAs[Double]("stopword_ratio")
      val q = r.getAs[Double]("quality_score")
      assert(pr >= 0 && pr <= 1); assert(sr >= 0); assert(q >= 0 && q <= 1)
    }
  }

  test("fingerprint: md5 is 32 hex chars, identical docs get identical fingerprints") {
    val rows = TextAnalysis.fingerprint(spark, sf).collect()
    rows.foreach(r => assert(r.getAs[String]("md5_fp").matches("[0-9a-f]{32}")))
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
  }
}
