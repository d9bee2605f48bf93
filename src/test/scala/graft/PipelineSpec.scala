package graft

import org.apache.spark.sql.functions._

import graft.operators.Pipeline

class PipelineSpec extends SparkSpec {

  test("p_pack: packing conserves docs and tokens; per-bucket sequences are contiguous") {
    val seqs = Pipeline.pack(spark, sf).collect()
    val totalDocs = Tables.documents(spark, sf).count()
    assert(seqs.map(_.getAs[Long]("n_docs")).sum == totalDocs, "packing dropped documents")
    val totalTokens = Tables.documents(spark, sf)
      .select(size(split(trim(col("text")), "[ \t\n\r]+")).cast("long"))
      .collect().map(_.getLong(0)).sum
    assert(seqs.map(_.getAs[Long]("n_tokens")).sum == totalTokens, "packing dropped tokens")
    // the running sum admits no gaps: each bucket's seq ids are 0..max
    seqs.groupBy(_.getAs[Long]("bucket")).foreach { case (bucket, ss) =>
      val ids = ss.map(_.getAs[Long]("seq_id")).sorted
      ids.zipWithIndex.foreach { case (v, i) =>
        assert(v == i, s"bucket $bucket has non-contiguous seq ids: ${ids.mkString(",")}")
      }
    }
    // doc spans are disjoint across consecutive sequences of a bucket
    seqs.groupBy(_.getAs[Long]("bucket")).foreach { case (_, ss) =>
      ss.sortBy(_.getAs[Long]("seq_id")).sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
        case _ => ()
      }
    }
  }
  test("p_split: splits partition the corpus and all three splits appear") {
    val rows = Pipeline.stratSplit(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == total)
    assert(rows.map(_.getAs[String]("split")).toSet == Set("train", "val", "test"))
    // hash split is roughly 90/5/5: train strictly dominates per source
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val bySplit = rs.map(r => r.getAs[String]("split") -> r.getAs[Long]("n_docs")).toMap
      assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("val", 0L))
    }
  }

}
