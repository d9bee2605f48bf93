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
  test("p_quota: kept set is exactly the budgeted hash-order prefix per source") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        size(split(trim(col("text")), "[ \t\n\r]+")).cast("long").as("n_tok"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // the window cum includes every doc in order, so the kept set is the
    // prefix up to the first overflow (a later smaller doc cannot re-fit)
    val strict = docs.groupBy(_._2).values.flatMap { srcDocs =>
      val ordered = srcDocs.sortBy { case (id, _, _) =>
        (graft.functions.Djb2.partition(id.toString.getBytes, 100), id)
      }
      val cums = ordered.scanLeft(0L) { case (acc, (_, _, n)) => acc + n }.tail
      ordered.zip(cums).takeWhile(_._2 <= 800L).map { case ((id, _, _), c) => id -> c }
    }.toMap
    val got = Pipeline.quota(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cum_tok")).toMap
    assert(got == strict, s"quota diverges: ${got.toSet.diff(strict.toSet).take(3)}")
  }

  test("p_manifest: shard hashes are stable across runs and change with membership") {
    val a = Pipeline.manifest(spark, sf).collect()
    val b = Pipeline.manifest(spark, sf).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)),
      "manifest must be independent of shuffle order")
    assert(a.map(_.getAs[Long]("n_docs")).sum == Tables.documents(spark, sf).count())
    val hashes = a.map(_.getAs[String]("manifest_md5"))
    assert(hashes.distinct.length == hashes.length, "shard hashes must differ")
    hashes.foreach(h => assert(h.matches("[0-9a-f]{32}")))
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

  test("token budget: epochs replay from exact token counts; realized >= target") {
    val docs = Tables.documents(spark, sf).collect()
      .map(r => (r.getAs[String]("source"),
        r.getAs[String]("text").trim.split("[ \t\n\r]+").length.toLong))
    val perSrc = docs.groupBy(_._1).view
      .mapValues(ds => (ds.length.toLong, ds.map(_._2).sum)).toMap
    val budget = perSrc.values.map(_._2).sum
    val target = budget / perSrc.size
    val got = Pipeline.tokenBudget(spark, sf).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("target_tokens"), r.getAs[Long]("epochs"),
          r.getAs[Boolean]("oversampled")))).toMap
    assert(got.keySet == perSrc.keySet)
    got.foreach { case (src, (nd, nt, tgt, ep, over)) =>
      val (end, ent) = perSrc(src)
      assert(nd == end && nt == ent, s"counts at $src")
      assert(tgt == target)
      assert(ep == (target + nt - 1) / nt, s"epochs at $src")
      assert(ep * nt >= target, "realized tokens cover the target")
      assert((ep - 1) * nt < target, "epochs is the MINIMAL cover")
      assert(over == (ep > 1L))
    }
  }

  test("epoch shuffle: shards partition the corpus, checksums replay, epochs differ") {
    val docs = Tables.documents(spark, sf).select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val rows = graft.operators.Pipeline.epochShuffle(spark, sf).collect()
    val byEpoch = rows.groupBy(_.getAs[Long]("epoch"))
    assert(byEpoch.keySet == Set(0L, 1L, 2L))
    byEpoch.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("n_docs")).sum == docs.length.toLong)
      assert(rs.map(_.getAs[Long]("total_chars")).sum == docs.map(_._2).sum)
    }
    // replay one epoch's permutation in memory via the same djb2 routing
    val e0 = docs.map { case (id, _) =>
      val h = graft.functions.Djb2.hash(s"0:$id".getBytes("UTF-8"))
      (java.lang.Long.remainderUnsigned(h, 32L).toInt, h, id)
    }.groupBy(_._1).map { case (shard, vs) =>
      val ordered = vs.sortBy { case (_, h, id) => (h, id) }.map(_._3)
      shard -> ((ordered.head,
        ordered.zipWithIndex.map { case (id, i) => id * (i + 1L) }.sum))
    }
    byEpoch(0L).foreach { r =>
      val (first, cks) = e0(r.getAs[Int]("shard"))
      assert(r.getAs[Long]("first_doc") == first, s"shard ${r.getAs[Int]("shard")}")
      assert(r.getAs[Long]("order_checksum") == cks)
    }
    // different epochs yield genuinely different permutations
    val cks = byEpoch.map { case (e, rs) =>
      e -> rs.map(r => r.getAs[Int]("shard") -> r.getAs[Long]("order_checksum")).toMap
    }
    assert(cks(0L) != cks(1L) && cks(1L) != cks(2L))
  }

  test("p_upsample: replication factors replay from language counts; balance improves") {
    val langs = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang"))
    val cnt = langs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val mx = cnt.values.max
    val rows = graft.operators.Pipeline.upsample(spark, sf).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == langs.map(_._1).toSet, "every doc appears")
    byDoc.foreach { case (id, rs) =>
      val lang = langs.find(_._1 == id).get._2
      val expected = mx / cnt(lang)
      assert(rs.length.toLong == expected, s"doc $id: ${rs.length} != $expected replicas")
      assert(rs.map(_.getAs[Long]("replica_idx")).sorted.sameElements(1L to expected))
      assert(rs.forall(_.getAs[Long]("n_rep") == expected))
    }
    // post-expansion counts are within one source-count of the max language
    val post = rows.groupBy(_.getAs[String]("lang")).view.mapValues(_.length.toLong)
    post.foreach { case (lang, n) =>
      assert(n > mx - cnt(lang), s"$lang under-replicated: $n")
      assert(n <= mx, s"$lang over-replicated past the majority: $n")
    }
  }

  test("p_incremental: merged partials equal the one-shot aggregate; both slices contribute") {
    import org.apache.spark.sql.functions._
    val got = operators.Pipeline.incremental(spark, sf).collect()
      .map(r => (r.getAs[String]("month"), r.getAs[Long]("n_orders"),
        r.getAs[Long]("rev_us"))).toSeq
    val want = Tables.orders(spark, sf)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("o_totalprice") * lit(1000000L)).cast("long")).as("rev"))
      .collect().map(r => (r.getAs[String]("month"), r.getAs[Long]("n"),
        r.getAs[Long]("rev"))).sortBy(_._1).toSeq
    assert(got == want, s"incremental merge diverges: ${got.take(3)} vs ${want.take(3)}")
    // the split point must fall inside the data, or the merge is vacuous
    assert(got.exists(_._1 < "1997-01"), "no history slice")
    assert(got.exists(_._1 >= "1997-01"), "no increment slice")
  }

  test("p_compaction: file count collapses 64 -> 4; manifest survives both rewrites") {
    import java.nio.file.Files
    val out = Files.createTempDirectory("graft_compact_spec_").toString
    try {
      Tables.documents(spark, sf).select("doc_id", "n_chars", "text")
        .repartition(64).write.mode("overwrite").parquet(s"$out/fragments")
      spark.read.parquet(s"$out/fragments").repartition(4)
        .write.mode("overwrite").parquet(s"$out/compacted")
      def nFiles(dir: String): Int = new java.io.File(dir).listFiles()
        .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(nFiles(s"$out/fragments") == 64, "fragmented state must be 64 files")
      assert(nFiles(s"$out/compacted") == 4, "compacted state must be 4 files")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(out))
    }
    val got = operators.Pipeline.compaction(spark, sf).collect().map(_.toSeq).toSeq
    val want = operators.Pipeline.manifest(spark, sf).collect().map(_.toSeq).toSeq
    assert(got == want, "compaction must move bytes, never data")
  }

  test("p_schema_evolution: gen-1 rows surface the added column as the sentinel only") {
    val rows = operators.Pipeline.schemaEvolution(spark, sf).collect()
    val byGen = rows.groupBy(_.getAs[Long]("gen"))
    assert(byGen(1L).map(_.getAs[String]("lang")).toSet == Set("(missing)"),
      "old-writer rows must see NULL->sentinel for the added column")
    assert(byGen(2L).forall(_.getAs[String]("lang") != "(missing)"),
      "new-writer rows must carry their real lang")
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.documents(spark, sf).count(), "no row may be lost in the merge")
  }

  test("p_corrupt_records: quarantine counts match the planting rule exactly") {
    import org.apache.spark.sql.functions._
    val r = operators.Pipeline.corruptRecords(spark, sf).first()
    val docs = Tables.documents(spark, sf)
    val planted = docs.filter(col("doc_id") % 50 === 0).count()
    assert(r.getAs[Long]("n_total") == docs.count())
    assert(r.getAs[Long]("n_corrupt") == planted, "every planted row must be quarantined")
    assert(r.getAs[Long]("n_good") == docs.count() - planted,
      "no good row may be dropped")
  }

  test("p_reshard_cost: ring movement is bounded by new-node share; mod-N moves most") {
    val r = operators.Pipeline.reshardCost(spark, sf).first()
    val n = r.getAs[Long]("n_docs")
    assert(n == Tables.documents(spark, sf).count())
    val fracMod = r.getAs[Double]("frac_mod")
    val fracRing = r.getAs[Double]("frac_ring")
    // mod-N reshuffles most docs; the ring only what the 4 new nodes capture
    assert(fracMod > 0.5, s"mod-N resharding should move most docs, got $fracMod")
    assert(fracRing > 0.0 && fracRing < fracMod,
      s"ring must move strictly less than mod-N: $fracRing vs $fracMod")
    assert(fracRing < 0.5, s"ring movement should stay near the 4/20 share, got $fracRing")
  }
}
