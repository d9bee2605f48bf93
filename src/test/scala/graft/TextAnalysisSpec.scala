package graft

import graft.operators.{ExactRound, TextAnalysis}

class TextAnalysisSpec extends SparkSpec {

  test("token stats: bpe tokenization is at least as fine as whitespace") {
    TextAnalysis.tokenStats(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_bpe_tokens") >= r.getAs[Long]("n_ws_tokens"))
      assert(r.getAs[Long]("len_chars") > 0)
    }
  }

  test("t_readability: raw counts match an in-memory recount, score in sane band") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = graft.operators.TextAnalysis.readability(spark, sf).collect()
    rows.foreach { r =>
      val text = texts(r.getAs[Long]("doc_id"))
      val sents = text.split("[.!?]+").count(_.trim.nonEmpty)
      val words = text.trim.split("[ \t\n\r]+").length
      val sylls = "[aeiouyAEIOUY]+".r.findAllIn(text).length
      assert(r.getAs[Long]("n_sentences") == sents.toLong)
      assert(r.getAs[Long]("n_words") == words.toLong)
      assert(r.getAs[Long]("n_syllables") == sylls.toLong)
      val f = r.getAs[Double]("flesch")
      assert(f > -300 && f < 207, s"flesch out of band: $f")
    }
  }

  test("t_sentences: counts match an in-memory resegmentation") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = graft.operators.TextAnalysis.sentences(spark, sf).collect()
    rows.foreach { r =>
      val segs = texts(r.getAs[Long]("doc_id")).split("[.!?]+")
        .map(_.trim).filter(_.nonEmpty)
      assert(r.getAs[Long]("n_sentences") == segs.length.toLong)
      assert(r.getAs[Long]("max_sent_chars") == segs.map(_.length).max.toLong)
      assert(r.getAs[Long]("max_sent_chars") <= r.getAs[Long]("n_chars"))
    }
  }

  test("t_ttr: token/type/hapax counts match an in-memory recount") {
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = graft.operators.TextAnalysis.ttr(spark, sf).collect()
    assert(rows.length == texts.size)
    rows.foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id")).trim.split("[ \t\n\r]+").toSeq
      val freq = toks.groupBy(identity).view.mapValues(_.size)
      assert(r.getAs[Long]("n_tokens") == toks.size.toLong)
      assert(r.getAs[Long]("n_types") == freq.size.toLong)
      assert(r.getAs[Long]("n_hapax") == freq.count(_._2 == 1).toLong)
      assert(r.getAs[Double]("ttr") <= 1.0 && r.getAs[Double]("ttr") > 0.0)
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

  test("dup_ngrams: ratios bounded, exact-duplicate docs have full 5-gram coverage") {
    import org.apache.spark.sql.functions.col
    val rows = TextAnalysis.dupNgrams(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_shared") <= r.getAs[Long]("n_grams"))
      val ratio = r.getAs[Double]("dup_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
    // a doc with an exact duplicate shares every one of its 5-grams
    val dupIds = graft.operators.Dedup.exact(spark, sf)
      .filter(col("group_size") >= 2).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    rows.filter(r => dupIds.contains(r.getAs[Long]("doc_id"))).foreach { r =>
      assert(r.getAs[Double]("dup_ratio") == 1.0,
        s"exact-dup doc ${r.getAs[Long]("doc_id")} has ratio ${r.getAs[Double]("dup_ratio")}")
    }
  }
  test("t_scrub: negative controls zero, term dictionary hits, flag consistent") {
    val rows = TextAnalysis.scrub(spark, sf).collect()
    assert(rows.forall(_.getAs[Long]("n_email") == 0L))
    assert(rows.forall(_.getAs[Long]("n_ip") == 0L))
    assert(rows.exists(_.getAs[Long]("n_term") > 0L))
    rows.foreach { r =>
      assert(r.getAs[String]("clean_hash").matches("[0-9a-f]{32}"))
      assert(r.getAs[Boolean]("is_clean") ==
        (r.getAs[Long]("n_email") + r.getAs[Long]("n_ip") + r.getAs[Long]("n_term") == 0L))
    }
  }

  test("t_kwic: snippet contains the term at the expected offset, n_occ >= 1") {
    val rows = TextAnalysis.kwic(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_occ") >= 1)
      assert(r.getAs[String]("snippet").contains("spark"))
    }
  }

  test("t_zipf: head coverage replays from an in-memory frequency table, monotone in k") {
    val freqs = Tables.documents(spark, sf).collect()
      .flatMap(_.getAs[String]("text").trim.split("[ \t\n\r]+"))
      .filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = freqs.values.sum
    val ranked = freqs.toSeq.sortBy { case (t, c) => (-c, t) }
    val got = TextAnalysis.zipf(spark, sf).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("head_tokens"),
        r.getAs[Long]("total_tokens"), r.getAs[Long]("vocab_size"),
        r.getAs[Double]("coverage")))
    assert(got.map(_._1).toSeq == Seq(1L, 10L, 100L, 1000L))
    got.foreach { case (k, head, tot, vocab, cov) =>
      val expHead = ranked.take(k.toInt).map(_._2).sum
      assert(head == expHead, s"head_tokens at k=$k")
      assert(tot == total && vocab == freqs.size.toLong)
      assert(cov == math.round(expHead.toDouble / total * 1e6) / 1e6, s"coverage at k=$k")
    }
    // coverage is monotone non-decreasing in k and bounded by 1
    val covs = got.map(_._5).toSeq
    assert(covs == covs.sorted && covs.forall(_ <= 1.0))
  }

  test("vocab overlap: pair table replays from in-memory per-source vocabularies") {
    val vocab = Tables.documents(spark, sf).select("source", "text").collect()
      .groupBy(_.getAs[String]("source"))
      .map { case (src, rows) =>
        src -> rows.flatMap(_.getAs[String]("text").trim.toLowerCase
          .split("[ \t\n\r]+")).toSet
      }
    val srcs = vocab.keys.toSeq.sorted
    val expected = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.length
      a = srcs(i); b = srcs(j)
      inter = (vocab(a) & vocab(b)).size.toLong
    } yield (a, b) -> ((vocab(a).size.toLong, vocab(b).size.toLong, inter))).toMap
    val got = TextAnalysis.vocabOverlap(spark, sf).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        ((r.getAs[Long]("v_a"), r.getAs[Long]("v_b"), r.getAs[Long]("n_shared")))).toMap
    assert(got == expected.filter(_._2._3 > 0L))
    // jaccard is the exact ratio of the replayed integers
    TextAnalysis.vocabOverlap(spark, sf).collect().foreach { r =>
      val (va, vb, n) = (r.getAs[Long]("v_a"), r.getAs[Long]("v_b"), r.getAs[Long]("n_shared"))
      assert(r.getAs[Double]("jaccard") ==
        graft.operators.ExactRound.rScalar(n.toDouble / (va + vb - n), 6))
    }
  }

  test("langid_eval: matrix cells recount t_langid's predictions exactly") {
    val pred = TextAnalysis.langid(spark, sf).select("doc_id", "pred_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val labeled = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val cells = labeled.toSeq.map { case (id, lang) => (lang, pred(id)) }
      .groupBy(identity).map { case (c, vs) => c -> vs.size.toLong }
    val byLang = labeled.values.toSeq.groupBy(identity).map { case (l, vs) => l -> vs.size.toLong }
    val rows = TextAnalysis.langidEval(spark, sf).collect()
    assert(rows.map(r => (r.getAs[String]("lang"), r.getAs[String]("pred_lang")) ->
      r.getAs[Long]("n_docs")).toMap == cells)
    rows.foreach { r =>
      assert(r.getAs[Long]("lang_total") == byLang(r.getAs[String]("lang")))
      assert(r.getAs[Boolean]("is_correct") ==
        (r.getAs[String]("lang") == r.getAs[String]("pred_lang")))
      assert(r.getAs[Double]("share") == graft.operators.ExactRound.rScalar(
        r.getAs[Long]("n_docs").toDouble / r.getAs[Long]("lang_total"), 6))
    }
    // every labeled doc lands in exactly one cell
    assert(rows.map(_.getAs[Long]("n_docs")).sum == labeled.size.toLong)
  }

  test("template sentences: per-doc counts replay from an in-memory doc-frequency table") {
    val segs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("[.!?]+")
        .map(_.trim.toLowerCase).filter(_.nonEmpty).toSeq)
    val docFreq = segs.flatMap { case (id, ss) => ss.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (s2, vs) => s2 -> vs.length.toLong }
    val rows = TextAnalysis.templateSentences(spark, sf).collect()
    val byDoc = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    segs.filter(_._2.nonEmpty).foreach { case (id, ss) =>
      val r = byDoc(id)
      assert(r.getAs[Long]("n_sentences") == ss.length.toLong)
      val nTemplate = ss.count(docFreq(_) >= 3).toLong
      assert(r.getAs[Long]("n_template") == nTemplate, s"doc $id")
      assert(r.getAs[Long]("max_doc_freq") == ss.map(docFreq).max)
      assert(r.getAs[Boolean]("is_templated") == (nTemplate * 2 >= ss.length))
      assert(r.getAs[Double]("template_ratio") ==
        math.round(nTemplate.toDouble / ss.length * 1e6) / 1e6)
    }
    assert(rows.length == segs.count(_._2.nonEmpty))
  }

  test("bm25: top-10 replays from an in-memory scorer with the same float order") {
    import graft.operators.ExactRound
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").trim.split("[ \t\n\r]+").filter(_.nonEmpty))
    val dl = docs.map { case (id, ts) => id -> ts.length.toLong }.toMap
    val nd = dl.size.toLong
    val avgdl = dl.values.sum.toDouble / nd
    val terms = Seq("spark", "window")
    val tf = (for ((id, ts) <- docs; t <- terms; c = ts.count(_ == t) if c > 0)
      yield (id, t) -> c.toLong).toMap
    val dfq = terms.map(t => t -> tf.keys.count(_._2 == t).toLong).toMap
    val scored = tf.toSeq.map { case ((id, t), f) =>
      val idf = (nd - dfq(t) + 0.5) / (dfq(t) + 0.5)
      val tfp = (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * (dl(id) / avgdl)))
      id -> ExactRound.rScalar(idf * tfp, 6)
    }
    val perDoc = scored.groupBy(_._1).view
      .mapValues(vs => ExactRound.rScalar(vs.map(_._2).sum, 6)).toMap
    val expected = perDoc.toSeq.sortBy { case (id, s) => (-s, id) }.take(10)
    val got = TextAnalysis.bm25(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toSeq
    assert(got == expected, s"bm25 diverges: got ${got.take(3)} expected ${expected.take(3)}")
  }

  test("bigram_lm: table replays from in-memory bigram counts; probs partition") {
    import graft.operators.ExactRound
    val bigrams = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0).trim.split("[ \t\n\r]+").filter(_.nonEmpty))
      .flatMap(ts => ts.zip(ts.drop(1)))
    val cnt = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ctx = cnt.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val top20 = ctx.toSeq.sortBy { case (w, c) => (-c, w) }.take(20).toMap
    val expected = (for {
      ((w1, w2), c) <- cnt.toSeq if top20.contains(w1)
    } yield (w1, w2, c)).groupBy(_._1).toSeq.flatMap { case (w1, rows) =>
      rows.sortBy { case (_, w2, c) => (-c, w2) }.take(3).zipWithIndex.map {
        case ((_, w2, c), i) =>
          (w1, (i + 1).toLong, w2, c, ExactRound.rScalar(c.toDouble / top20(w1), 6))
      }
    }.sortBy { case (w1, rnk, _, _, _) => (w1, rnk) }
    val got = TextAnalysis.bigramLm(spark, sf).collect().map(r =>
      (r.getAs[String]("w1"), r.getAs[Long]("rnk"), r.getAs[String]("w2"),
        r.getAs[Long]("n_occ"), r.getAs[Double]("prob"))).toSeq
    assert(got == expected, s"bigram_lm diverges: ${got.take(2)} vs ${expected.take(2)}")
    // per-context ranks are 1..k and probabilities never exceed 1
    got.groupBy(_._1).values.foreach { rows =>
      assert(rows.map(_._2).sorted == (1L to rows.length).toSeq)
      assert(rows.map(_._5).forall(p => p > 0.0 && p <= 1.0))
    }
  }

  test("bpe_pairs: top-20 replays from an in-memory vocabulary-weighted count") {
    val words = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).trim.split("[ \t\n\r]+").filter(_.nonEmpty))
    val vocab = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val counts = collection.mutable.Map[String, Long]().withDefaultValue(0L)
    vocab.foreach { case (w, n) =>
      (0 until w.length - 1).foreach(i => counts(w.substring(i, i + 2)) += n)
    }
    val expected = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = TextAnalysis.bpePairs(spark, sf).collect()
      .map(r => r.getAs[String]("pair") -> r.getAs[Long]("n_occ")).toSeq
    assert(got == expected, s"bpe_pairs diverges: ${got.take(3)} vs ${expected.take(3)}")
  }

  test("span_dedup: replays an in-memory tumbling-block removal, kept text hash-stable") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val blocks = docs.toSeq.flatMap { case (id, text) =>
      text.trim.split("[ \t\n\r]+").grouped(10).zipWithIndex
        .map { case (b, i) => (id, i, b.mkString(" ")) }
    }
    val docsPerKey = blocks.groupBy(_._3.toLowerCase).view.mapValues(_.map(_._1).distinct.size)
    val expected = blocks.groupBy(_._1).map { case (id, bs) =>
      val sorted = bs.sortBy(_._2)
      val removed = sorted.filter(b => docsPerKey(b._3.toLowerCase) >= 2)
      (id, sorted.size.toLong, removed.size.toLong,
        removed.map(_._3.length.toLong).sum,
        md5hex(sorted.filter(b => docsPerKey(b._3.toLowerCase) < 2).map(_._3).mkString(" ")))
    }.toSeq.sortBy(_._1)
    val got = TextAnalysis.spanDedup(spark, sf).collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_blocks"), r.getAs[Long]("n_removed"),
        r.getAs[Long]("chars_removed"), r.getAs[String]("kept_md5"))).toSeq
    assert(got == expected, s"span_dedup diverges: ${got.take(2)} vs ${expected.take(2)}")
    // a corpus with boilerplate planted across docs must remove something at sf0.01+
    assert(got.map(_._2).sum > 0)
  }

  test("token_gini: replays in-memory, bounded in [0,1), tie-order invariant") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.map { case (id, text) =>
      val counts = text.trim.toLowerCase.split("[ \t\n\r]+")
        .groupBy(identity).values.map(_.length.toLong).toSeq.sorted
      val n = counts.size.toLong
      val total = counts.sum
      val num = counts.zipWithIndex.map { case (c, i0) => (2L * (i0 + 1) - n - 1) * c }.sum
      (id, n, total, num,
        ExactRound.rScalar(num.toDouble / (n.toDouble * total.toDouble), 6))
    }.sortBy(_._1).toSeq
    val got = TextAnalysis.tokenGini(spark, sf).collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_types"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("gini_num"), r.getAs[Double]("gini"))).toSeq
    assert(got == expected, s"token_gini diverges: ${got.take(2)} vs ${expected.take(2)}")
    assert(got.forall(g => g._5 >= 0.0 && g._5 < 1.0))
  }

  test("t_novelty: replays from an in-memory first-seen table; doc 0 is fully novel") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def grams(t: String): Set[String] = {
      val toks = t.trim.split("[ \t\n\r]+")
      if (toks.length < 5) Set.empty
      else (0 to toks.length - 5).map(i => toks.slice(i, i + 5).mkString(" ")).toSet
    }
    val firstSeen = collection.mutable.Map[String, Long]()
    docs.sortBy(_._1).foreach { case (id, t) =>
      grams(t).foreach(g => if (!firstSeen.contains(g)) firstSeen(g) = id)
    }
    val expected = docs.sortBy(_._1).flatMap { case (id, t) =>
      val gs = grams(t)
      if (gs.isEmpty) None
      else Some((id, gs.size.toLong, gs.count(firstSeen(_) == id).toLong))
    }.toSeq
    val got = TextAnalysis.novelty(spark, sf).collect().map(r =>
      (r.getAs[Long]("doc_id"), r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"))).toSeq
    assert(got == expected, s"novelty diverges: ${got.take(3)} vs ${expected.take(3)}")
    // the lowest doc_id in the result is by construction fully novel
    assert(got.head._2 == got.head._3)
  }

  test("t_html_strip: byte-exact recovery on every doc; ratio consistent with lengths") {
    val rows = operators.TextAnalysis.htmlStrip(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Boolean]("recovered_ok"),
        s"doc ${r.getAs[Long]("doc_id")} did not survive the strip round-trip")
      val h = r.getAs[Int]("n_chars_html"); val x = r.getAs[Int]("n_chars_text")
      assert(h > x, "wrapper must add markup mass")
      val ratio = r.getAs[Double]("boilerplate_ratio")
      assert(ratio > 0.0 && ratio < 1.0)
      assert(math.abs(ratio - (h - x).toDouble / h) < 1e-5)
    }
  }
}
