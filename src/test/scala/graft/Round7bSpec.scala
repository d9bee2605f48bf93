package graft

import org.apache.spark.sql.functions._

/** Specs for the round-7 second tranche: gaps-and-islands, binary
  * (1-bit) quantization ANN, PDF structure triage, rich-club. Each
  * test re-derives the operator's claim independently (in-memory
  * replay or an internal-consistency invariant), the family
  * discipline — the DuckDB hash gate pins cross-engine equality, the
  * spec pins the SEMANTICS. */
class Round7bSpec extends SparkSpec {

  test("q84_islands: streaks replay from the raw distinct (user, day) sets") {
    val out = operators.RelationalExt6.q84Islands(spark, sf).collect()
    assert(out.nonEmpty)
    val days = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay))
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).sorted }
    out.foreach { r =>
      val ds = days(r.getLong(0))
      // split the sorted day numbers into maximal consecutive runs
      val runs = ds.tail.foldLeft(List(List(ds.head))) { (acc, d) =>
        if (d == acc.head.head + 1) (d :: acc.head) :: acc.tail
        else List(d) :: acc
      }
      assert(r.getLong(1) == runs.length.toLong, s"n_islands user ${r.getLong(0)}")
      assert(r.getLong(2) == runs.map(_.length).max.toLong, "longest_streak")
      assert(r.getLong(3) == ds.length.toLong, "active_days")
      assert(r.getDate(4).toLocalDate.toEpochDay == ds.min, "first_day")
    }
  }

  test("s_binary_hamming: hamming replays from an in-memory sign pack; rerank is exact") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def sig(v: Array[Double]): (Long, Long) = {
      var lo = 0L; var hi = 0L
      (0 until 32).foreach { i => if (v(i) >= 0) lo |= (1L << i) }
      (32 until 64).foreach { i => if (v(i) >= 0) hi |= (1L << (i - 32)) }
      (lo, hi)
    }
    val q = sig(vecs(0L))
    val out = operators.Similarity.binaryHamming(spark, sf).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val s = sig(vecs(r.getLong(0)))
      val expected = java.lang.Long.bitCount(s._1 ^ q._1) +
        java.lang.Long.bitCount(s._2 ^ q._2)
      assert(r.getInt(1) == expected, s"hamming vec ${r.getLong(0)}")
    }
    // final ordering is by exact cosine descending (vec_id tie-break)
    val cos = out.map(_.getDouble(2))
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
  }

  test("m_pdf_meta: encodePdf is parseable and byte-exact; xref entries point at objects") {
    val text = "hello pdf world"
    val pdf = new String(multimodal.Multimodal.encodePdf(text),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(pdf.startsWith("%PDF-1.7\n"))
    assert(pdf.endsWith("%%EOF"))
    val sxr = "startxref\n(\\d+)\n%%EOF$".r.findFirstMatchIn(pdf).get.group(1).toInt
    assert(pdf.substring(sxr, sxr + 4) == "xref", "startxref dereferences to the xref keyword")
    // every in-use xref entry must point at "<n> 0 obj"
    val entries = "\n(\\d{10}) 00000 n ".r.findAllMatchIn(pdf).map(_.group(1).toInt).toList
    assert(entries.length == 4)
    entries.zipWithIndex.foreach { case (off, i) =>
      assert(pdf.substring(off, off + 7) == s"${i + 1} 0 obj", s"xref entry ${i + 1}")
    }
    assert(pdf.contains(s"<</Length ${text.length}>>stream\n" + text + "\nendstream"))
  }

  test("m_pdf_meta: multibyte payloads keep byte-exact offsets (bytes != chars)") {
    val text = "naïve ☃ 中文 payload"
    val bytes = multimodal.Multimodal.encodePdf(text)
    val pdfAscii = new String(bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    val sxr = "startxref\n(\\d+)\n%%EOF$".r.findFirstMatchIn(pdfAscii).get.group(1).toInt
    // the offset is a BYTE offset: dereference in the raw byte array
    assert(new String(bytes.slice(sxr, sxr + 4),
      java.nio.charset.StandardCharsets.US_ASCII) == "xref")
    val utfLen = text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    assert(pdfAscii.contains(s"<</Length $utfLen>>stream"), "/Length counts bytes")
    assert(utfLen != text.length, "the fixture must actually be multibyte")
  }

  test("d_edit_distance: levenshtein replays in-memory on the ASCII projection") {
    val out = operators.Dedup.editDistance(spark, sf).collect()
    assert(out.nonEmpty, "the near-dup pair table must be non-empty at sf0.001")
    val norms = Tables.documents(spark, sf)
      .select(col("doc_id"), lower(regexp_replace(col("text"), "[^\\x20-\\x7E]", "")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    out.foreach { r =>
      val (a, b) = (norms(r.getLong(0)), norms(r.getLong(1)))
      assert(r.getLong(2) == lev(a, b).toLong,
        s"edit_dist pair (${r.getLong(0)}, ${r.getLong(1)})")
      assert(r.getLong(3) == a.length.toLong && r.getLong(4) == b.length.toLong)
    }
  }

  test("t_script_profile: counts replay in-memory; the zh tag is exposed as Latin-script") {
    val out = operators.TextAnalysis.scriptProfile(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val docs = Tables.documents(spark, sf).select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val langs = docs.map(_._1).distinct
    langs.foreach { lang =>
      val texts = docs.filter(_._1 == lang).map(_._2)
      val r = out(lang)
      assert(r.getLong(1) == texts.length.toLong, s"n_docs $lang")
      def cnt(t: String, p: Char => Boolean) = t.count(p).toLong
      val latin = texts.map(cnt(_, c => (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))).sum
      val cjk = texts.map(cnt(_, c => c >= '一' && c <= '鿿')).sum
      assert(r.getLong(4) == latin, s"latin_chars $lang")
      assert(r.getLong(5) == cjk, s"cjk_chars $lang")
    }
    // the profiler's real finding on this corpus: every lang tag —
    // including zh — fronts Latin-script text (synthetic labels), which
    // is exactly the mislabel signal the operator exists to surface
    assert(out.values.forall(_.getLong(4) > 0), "all tags are Latin-script here")
    if (out.contains("zh"))
      assert(out("zh").getLong(2) == 0, "zh tag carries no CJK in this corpus")
  }

  test("m_webp_meta: encodeWebp header fields and RIFF pad arithmetic replay byte-level") {
    // one even-length and one odd-length payload exercise the pad byte
    Seq("even-length!", "odd length!").foreach { text =>
      val b = multimodal.Multimodal.encodeWebp(text)
      assert(new String(b.slice(0, 4), "US-ASCII") == "RIFF")
      assert(new String(b.slice(8, 12), "US-ASCII") == "WEBP")
      assert(new String(b.slice(12, 16), "US-ASCII") == "VP8L")
      def le32(off: Int) =
        (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
          ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
      assert(le32(4) == b.length - 8, "RIFF size covers everything after the size field")
      val n = text.getBytes("UTF-8").length
      assert(le32(16) == 5 + n, "chunk length excludes the pad byte")
      assert((b.length - 8 - 12 - 5 - n) == (5 + n) % 2, "pad byte present iff chunk odd")
      assert(b(20) == 0x2f.toByte)
      val bits = le32(21)
      assert((bits & 0x3fff) + 1 == 64, "width")
      assert(((bits >> 14) & 0x3fff) + 1 == math.max(1, (n + 63) / 64), "height")
      assert((bits >>> 28) == 0, "alpha hint and version zero")
    }
  }

  test("q85_argmax_mode: struct-min argmax equals an in-memory count + tie-break replay") {
    val out = operators.RelationalExt6.q85ArgmaxMode(spark, sf).collect()
    assert(out.nonEmpty)
    val events = Tables.events(spark, sf).select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byUser = events.groupBy(_._1)
    out.foreach { r =>
      val cnts = byUser(r.getLong(0)).groupBy(_._2).view.mapValues(_.length.toLong).toMap
      // deterministic tie-break: highest count, then smallest type name
      val (et, cnt) = cnts.toSeq.sortBy { case (t, c) => (-c, t) }.head
      assert(r.getString(1) == et, s"modal_type user ${r.getLong(0)}")
      assert(r.getLong(2) == cnt && r.getLong(3) == cnts.values.sum)
    }
  }

  test("m_bmp_meta: real-codec BMP round-trips losslessly and header fields replay") {
    val text = "bmp raster payload 0123456789"
    val b = multimodal.Multimodal.encodeBmp(text)
    def le32(off: Int) =
      (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
        ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
    assert(b(0) == 'B'.toByte && b(1) == 'M'.toByte)
    val n = text.getBytes("UTF-8").length
    val h = math.max(1, (n + 63) / 64)
    assert(le32(2) == b.length, "header file size equals actual bytes")
    assert(le32(2) == 1078 + 64 * h)
    assert(le32(10) == 1078 && le32(14) == 40)
    assert(le32(18) == 64 && le32(22) == h)
    // BMP is uncompressed: the decoded raster is the text bytes verbatim
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    val back = (0 until n).map(p => img.getRaster.getSample(p % 64, p / 64, 0).toByte)
    assert(back == text.getBytes("UTF-8").toSeq, "lossless identity")
  }

  test("s_random_projection: projected cosines replay from the literal sign matrix") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def proj(v: Array[Double]): Array[Double] =
      operators.Similarity.jlSigns.map(row =>
        row.zip(v).map { case (s, x) => s * x }.sum).toArray
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def dot(x: Array[Double], y: Array[Double]) =
        x.zip(y).map { case (p, q) => p * q }.sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val qp = proj(vecs(0L))
    val out = operators.Similarity.randomProjection(spark, sf).collect()
    assert(out.length == 10)
    out.foreach { r =>
      val replay = math.round(cos(proj(vecs(r.getLong(0))), qp) * 1e6) / 1e6.toDouble
      // in-memory zip-fold vs the engine's index-order dot can differ in
      // the last ULP before rounding; equality after 1e-9 tolerance is
      // the semantic claim (the hex gate vs DuckDB pins bit-exactness)
      assert(math.abs(r.getDouble(1) - replay) < 1e-6, s"proj cosine vec ${r.getLong(0)}")
    }
    // the sign matrix itself is balanced-ish: no row is constant
    operators.Similarity.jlSigns.foreach { row =>
      assert(row.toSet.size == 2, "a constant sign row projects onto the all-ones axis")
    }
  }

  test("g_cliques4: membership conservation (4 per clique) and clique validity") {
    val out = operators.Graph.cliques4(spark, sf).collect()
    val total = out.map(_.getLong(1)).sum
    assert(total % 4 == 0, "every K4 contributes exactly 4 memberships")
    if (out.nonEmpty) {
      // every counted node must sit on >= 3 edges of the same graph
      val edges = operators.Dedup.embedPairBlocks(
        Tables.embeddings(spark, sf), t = 0.25)._1
        .select(col("vec_a").cast("long"), col("vec_b").cast("long")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val deg = (edges.map(_._1) ++ edges.map(_._2))
        .groupBy(identity).view.mapValues(_.length).toMap
      out.foreach(r => assert(deg(r.getLong(0)) >= 3,
        s"node ${r.getLong(0)} in a K4 needs degree >= 3"))
    }
  }

  test("m_exif_scrub: surgery is byte-exact, reversible-free, and throws on bad input") {
    val text = "scrub me please, roughly one raster row of text"
    val withGps = multimodal.Multimodal.encodeExifGpsJpeg(7L, text)
    val scrubbed = multimodal.Multimodal.stripExifGps(withGps)
    val reference = multimodal.Multimodal.encodeExifJpeg(7L, text)
    assert(scrubbed.toSeq == reference.toSeq,
      "scrubbed file must be byte-identical to the never-had-GPS encoding")
    assert(withGps.length - scrubbed.length == 66,
      "GPS block = entry(12) + GPS IFD(30) + rationals(24)")
    // the decoded image is untouched by the surgery
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(scrubbed))
    assert(img != null && img.getWidth == 64)
    // a PII pass must never silently emit on unexpected input
    intercept[IllegalArgumentException] {
      multimodal.Multimodal.stripExifGps("not a jpeg at all".getBytes)
    }
    val noApp1 = multimodal.Multimodal.encodeJpeg(text) // plain JPEG, no EXIF
    intercept[IllegalArgumentException] {
      multimodal.Multimodal.stripExifGps(noApp1)
    }
  }

  test("p_aes_roundtrip: GCM framing and tamper detection behave as the certificate claims") {
    import spark.implicits._
    val df = Seq((1L, "secret payload"), (2L, "naïve ☃ 中文")).toDF("doc_id", "text")
    val enc = df.selectExpr("doc_id", "octet_length(text) AS n",
      "aes_encrypt(text, 'graft-demo-key16', 'GCM', 'DEFAULT', " +
        "substring(unhex(md5(cast(doc_id AS string))), 1, 12)) AS ct")
    val rows = enc.selectExpr("doc_id", "n", "octet_length(ct) AS c",
      "cast(aes_decrypt(ct, 'graft-demo-key16', 'GCM') AS string) AS back",
      "ct").collect()
    rows.foreach { r =>
      assert(r.getInt(2) == r.getInt(1) + 28, "IV(12) + ct + tag(16) framing")
    }
    assert(rows.map(_.getString(3)).toSet == Set("secret payload", "naïve ☃ 中文"))
    // same plaintext, same derived IV -> deterministic bytes (the
    // certificate's reproducibility claim)
    val again = df.selectExpr("aes_encrypt(text, 'graft-demo-key16', 'GCM', 'DEFAULT', " +
      "substring(unhex(md5(cast(doc_id AS string))), 1, 12)) AS ct")
      .collect().map(_.getAs[Array[Byte]](0).toSeq)
    assert(again.toSet == rows.map(_.getAs[Array[Byte]]("ct").toSeq).toSet)
    // GCM authenticates: one flipped ciphertext byte must fail decryption
    val tampered = rows.head.getAs[Array[Byte]]("ct").clone()
    tampered(tampered.length - 1) = (tampered(tampered.length - 1) ^ 1).toByte
    val err = intercept[Exception] {
      Seq(tampered).toDF("ct")
        .selectExpr("cast(aes_decrypt(ct, 'graft-demo-key16', 'GCM') AS string)")
        .collect()
    }
    assert(err.getMessage != null)
  }

  test("p_referential_integrity: orphan/childless counts replay from key sets") {
    val out = operators.Pipeline.referentialIntegrity(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    assert(out.size == 5)
    val oKeys = Tables.orders(spark, sf).select("o_orderkey").collect()
      .map(_.getLong(0)).toSet
    val lKeys = Tables.lineitem(spark, sf).select("l_orderkey").collect()
      .map(_.getLong(0))
    val (nChild, orphans, childless) = out("lineitem->orders")
    assert(nChild == lKeys.length.toLong)
    assert(orphans == lKeys.count(k => !oKeys(k)).toLong)
    assert(childless == oKeys.count(k => !lKeys.contains(k)).toLong)
    // the generated star schema is orphan-free on every edge — measured
    assert(out.values.forall(_._2 == 0L), "no FK edge carries orphans")
  }

  test("s_quantizer_recall: hamming row replays from sign packs vs exact top-10") {
    val out = operators.Similarity.quantizerRecall(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out.keySet == Set("binary_hamming", "jl_projection16", "matryoshka16"))
    assert(out.values.forall(n => n >= 0 && n <= 10))
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cos(a: Array[Double], b: Array[Double]) =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    def sig(v: Array[Double]): (Long, Long) = {
      var lo = 0L; var hi = 0L
      (0 until 32).foreach(i => if (v(i) >= 0) lo |= (1L << i))
      (32 until 64).foreach(i => if (v(i) >= 0) hi |= (1L << (i - 32)))
      (lo, hi)
    }
    val q = vecs(0L); val qs = sig(q)
    val others = vecs.view.filterKeys(_ != 0L).toSeq
    // rounded-cosine ordering with vec_id tie-break, like the engine
    val truth = others
      .map { case (id, v) => (id, math.round(cos(v, q) * 1e6) / 1e6.toDouble) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val hamTop = others
      .map { case (id, v) =>
        val sv = sig(v)
        (id, java.lang.Long.bitCount(sv._1 ^ qs._1) + java.lang.Long.bitCount(sv._2 ^ qs._2))
      }
      .sortBy { case (id, h) => (h, id) }.take(10).map(_._1)
    assert(out("binary_hamming") == hamTop.count(truth).toLong)
  }

  test("d_width_sweep: w=3 row equals the canonical pair table; pricing is monotone") {
    val rows = operators.Dedup.widthSweep(spark, sf).collect()
    val byW = rows.map(r => r.getInt(0) -> r).toMap
    assert(byW.keySet == Set(2, 3, 5, 8))
    // join volume shrinks monotonically with width
    val jr = Seq(2, 3, 5, 8).map(w => byW(w).getLong(1))
    assert(jr.zip(jr.tail).forall { case (a, b) => a >= b }, s"join volume $jr")
    // the cost-skipped width carries NULL verify columns + verified=false
    assert(!byW(2).getBoolean(5) && byW(2).isNullAt(2) && byW(2).isNullAt(3))
    // the w=3 verified count must equal the engine's canonical pair table
    val canonical = operators.Dedup.ngramJaccard(spark, sf).count()
    assert(byW(3).getLong(3) == canonical, "w=3 sweep row vs d_ngram_jaccard")
    Seq(3, 5, 8).foreach { w =>
      val r = byW(w)
      assert(r.getBoolean(5))
      assert(r.getLong(3) <= r.getLong(2), "verified pairs are a subset of candidates")
      assert(r.getLong(4) <= 2 * r.getLong(3), "each pair covers at most 2 docs")
    }
  }

  test("d_overcollapse: pair counts are k-choose-2 per cluster; density is honest") {
    val out = operators.Dedup.overcollapse(spark, sf).collect()
    assert(out.nonEmpty)
    val sizes = operators.Dedup.dupClusters(spark, sf).collect()
      .groupBy(_.getLong(1)).view.mapValues(_.length).toMap
    out.foreach { r =>
      val k = sizes(r.getLong(0))
      assert(r.getLong(1) == k.toLong * (k - 1) / 2, s"n_pairs of cluster ${r.getLong(0)}")
      assert(r.getLong(2) <= r.getLong(1), "verified pairs bounded by all pairs")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      // the flag is exactly the weakest-link rule
      assert(r.getBoolean(5) == (r.getDouble(4) < 0.5))
    }
    // every multi-member cluster is audited, singletons are not
    assert(out.length == sizes.count(_._2 >= 2))
  }

  test("m_wds_paired: the planted breakage is found, nothing else is flagged") {
    val out = multimodal.Multimodal.wdsPaired(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(1)
      assert(r.getBoolean(2), s"txt member of $id must parse checksum-clean")
      assert(r.getBoolean(3) == (id % 13 != 0), s"img presence of $id")
      assert(r.getBoolean(6) == (id % 13 != 0), s"completeness of $id")
      assert(r.getInt(5) == (if (id % 13 != 0) 2 else 1), s"member count of $id")
    }
    assert(out.exists(!_.getBoolean(6)), "the plant must produce at least one half-sample")
  }

  test("t_fertility: per-lang piece/base totals equal t_bpe_apply's per-doc sums") {
    val fert = operators.TextAnalysis.fertility(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val langOf = Tables.documents(spark, sf).select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val perDoc = operators.TextAnalysis.bpeApply(spark, sf).collect()
      .map(r => (langOf(r.getLong(0)), r.getLong(1), r.getLong(2)))
    val byLang = perDoc.groupBy(_._1).view
      .mapValues(xs => (xs.map(_._2).sum, xs.map(_._3).sum)).toMap
    // same merge table, same corpus — the two rollups must agree exactly
    fert.foreach { case (lang, (pieces, base)) =>
      assert(byLang(lang) == ((pieces, base)), s"lang $lang")
    }
    assert(fert.keySet == byLang.keySet)
  }

  test("g_coloring: every color class is an independent set; converged means total") {
    val out = operators.Graph.coloring(spark, sf).collect()
    assert(out.nonEmpty)
    val color = out.map(r => r.getLong(0) -> r.getInt(1)).toMap
    val converged = out.head.getBoolean(2)
    if (converged) assert(color.values.forall(_ >= 0), "converged ⇒ no -1 colors")
    val edges = operators.Dedup.ngramJaccard(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    edges.foreach { case (a, b) =>
      assert(color(a) == -1 || color(a) != color(b),
        s"edge ($a,$b) joins two color-${color(a)} nodes — not independent")
    }
    // greedy MIS can't skip a color class: classes are used in order
    val used = color.values.filter(_ >= 0).toSet
    assert((0 until used.size).forall(used.contains), "color classes are contiguous")
  }

  test("d_simhash_recall: bucket counts replay from per-pair hamming; recall is honest") {
    val out = operators.Dedup.simhashRecall(spark, sf).collect()
    assert(out.nonEmpty)
    val pairs = operators.Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val sigs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.MinHashFns.simhash64(
          split(trim(col("text")), "[ \t\n\r]+")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byBucket = pairs.groupBy { case (_, _, j) => math.floor(j * 10).toInt }
    out.foreach { r =>
      val bucket = byBucket(r.getInt(0))
      val hams = bucket.map { case (a, b, _) =>
        java.lang.Long.bitCount(sigs(a) ^ sigs(b)).toLong
      }
      assert(r.getLong(1) == bucket.length.toLong, "n_pairs")
      assert(r.getLong(2) == hams.count(_ <= 3).toLong, "caught_h3")
      assert(r.getLong(3) == hams.count(_ <= 8).toLong, "caught_h8")
      assert(r.getLong(4) == hams.max, "max_hamming")
    }
    // every verified pair appears in exactly one bucket
    assert(out.map(_.getLong(1)).sum == pairs.length.toLong)
  }

  test("m_zstd_frame: FCS field width switches at 256 and 65792 bytes as parsed") {
    // the three RFC 8878 content-size encodings the parser handles:
    // 1-byte (<256), 2-byte LE + 256, 4-byte LE
    Seq(100, 300, 70000).foreach { n =>
      val src = Array.tabulate[Byte](n)(i => ('a' + i % 7).toByte)
      val c = com.github.luben.zstd.Zstd.compress(src, 3)
      assert((c(0) & 0xff) == 0x28 && (c(1) & 0xff) == 0xb5 &&
        (c(2) & 0xff) == 0x2f && (c(3) & 0xff) == 0xfd)
      val fhd = c(4) & 0xff
      val fcsFlag = fhd >> 6
      val parsed = fcsFlag match {
        case 0 => (c(5) & 0xffL)
        case 1 => ((c(5) & 0xffL) | ((c(6) & 0xffL) << 8)) + 256L
        case 2 => (c(5) & 0xffL) | ((c(6) & 0xffL) << 8) |
          ((c(7) & 0xffL) << 16) | ((c(8) & 0xffL) << 24)
        case _ => fail(s"unexpected 8-byte FCS for n=$n")
      }
      assert(parsed == n.toLong, s"content size for n=$n (fcsFlag=$fcsFlag)")
      assert(com.github.luben.zstd.Zstd.decompress(c, n).toSeq == src.toSeq)
    }
  }

  test("p_xml_roundtrip: adversarial markup/unicode strings survive the XML codec") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a < b & c > d"),
      (2L, "quotes \" and ' apostrophes"),
      (3L, "entity-looking text &amp; &#60; stays literal"),
      (4L, "naïve ☃ 中文 mixed"),
      (5L, "]]> cdata terminator"))
    val dir = java.nio.file.Files.createTempDirectory("xmlrt_spec_").toString
    try {
      rows.toDF("id", "text").write.mode("overwrite")
        .option("rowTag", "doc").format("xml").save(dir)
      val back = spark.read.schema("id LONG, text STRING")
        .option("rowTag", "doc").option("ignoreSurroundingSpaces", "false")
        .format("xml").load(dir)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      rows.foreach { case (id, t) => assert(back(id) == t, s"row $id mangled") }
    } finally Scratch.rmTree(dir)
  }

  test("g_richclub: node census is degree-threshold monotone and phi stays in [0,1]") {
    val out = operators.Graph.richClub(spark, sf).collect()
    assert(out.nonEmpty)
    val nodes = out.map(_.getLong(1))
    assert(nodes.zip(nodes.tail).forall { case (a, b) => a >= b },
      "raising k can only shrink the club")
    val edges = out.map(_.getLong(2))
    assert(edges.zip(edges.tail).forall { case (a, b) => a >= b },
      "edges within the club shrink with it")
    out.filter(!_.isNullAt(3)).foreach { r =>
      val phi = r.getDouble(3)
      assert(phi >= 0.0 && phi <= 1.0, s"phi k=${r.getInt(0)}")
      // phi replays exactly from the emitted integers
      val n = r.getLong(1); val e = r.getLong(2)
      val replay = math.round(2.0 * e / (n.toDouble * (n - 1).toDouble) * 1e6) / 1e6.toDouble
      assert(phi == replay)
    }
  }

  test("p_fingerprint: xor/sum folds replay from an in-memory md5 pass; order-invariant") {
    val out = operators.Pipeline.fingerprint(spark, sf).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getBoolean(3), "half-split repartitioned traversal must agree")
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_linestatus"), col("l_quantity"), col("l_extendedprice"),
        col("l_shipdate").cast("date").cast("string"))
      .collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    var xorFp = 0L; var sumFp = 0L
    rows.foreach { row =>
      val canonical = s"${row.getLong(0)}|${row.getInt(1)}|${row.getString(2)}|" +
        s"${row.getString(3)}|${math.round(row.getDouble(4))}|" +
        s"${math.round(row.getDouble(5) * 100)}|${row.getString(6)}"
      val hex = md.digest(canonical.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 12)
      val h = java.lang.Long.parseLong(hex, 16)
      xorFp ^= h; sumFp += h % 1000003L
    }
    assert(r.getLong(0) == rows.length.toLong, "n_rows")
    assert(r.getLong(1) == xorFp, "fp_xor")
    assert(r.getLong(2) == sumFp, "fp_sum_mod")
  }

  test("g_eccentricity: bounds replay from an in-memory multi-source BFS") {
    val pairs = operators.Dedup.ngramJaccard(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nodes = adj.keySet
    val pivots = nodes.filter(_ % 5 == 0).toSeq.sorted
    // distances per pivot (hop-accurate via level sets)
    val byPivot = pivots.map { p =>
      var level = Map(p -> 0); var front = Set(p); var d = 0
      while (front.nonEmpty) {
        d += 1
        val next = front.flatMap(adj(_)) -- level.keySet
        next.foreach(n => level += n -> d)
        front = next
      }
      p -> level
    }
    val out = operators.Graph.eccentricity(spark, sf).collect()
    val expected = nodes.toSeq.sorted.flatMap { v =>
      val reached = byPivot.flatMap { case (p, lv) => lv.get(v).map(p -> _) }
      if (reached.isEmpty) None
      else {
        val ecc = reached.map(_._2).max
        val far = reached.filter(_._2 == ecc).map(_._1).min
        Some((v, ecc.toLong, far, reached.size.toLong))
      }
    }
    assert(out.length == expected.length)
    out.zip(expected).foreach { case (r, (v, ecc, far, n)) =>
      assert(r.getLong(0) == v); assert(r.getLong(1) == ecc, s"ecc $v")
      assert(r.getLong(2) == far, s"far_pivot $v"); assert(r.getLong(3) == n, s"n $v")
    }
  }

  test("s_silhouette: a/b means and scores replay from an in-memory distance pass") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    def sq(a: Array[Double], b: Array[Double]) = dot(a, a) - 2 * dot(a, b) + dot(b, b)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    val cents = vecs.filter(_._1 < 10)
    val assign = vecs.map { case (id, v) =>
      id -> cents.toSeq.map { case (c, cv) => (r6(sq(v, cv)), c) }.min._2
    }
    val out = operators.Similarity.silhouette(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val q = r.getLong(0)
      assert(q % 20 == 3)
      assert(r.getLong(1) == assign(q), s"cluster $q")
      val byCl = vecs.keys.filter(_ != q).toSeq.groupBy(assign)
        .map { case (cl, ids) =>
          val dms = ids.map(i => math.round(sq(vecs(i), vecs(q)) * 1e6))
          cl -> (dms.sum.toDouble / (dms.length * 1e6))
        }
      val aOpt = byCl.get(assign(q))
      val (bRaw, nearest) = byCl.filter(_._1 != assign(q)).toSeq
        .map { case (cl, m) => (m, cl) }.min
      assert(r.getDouble(3) == r6(bRaw), s"b_mean $q")
      assert(r.getLong(4) == nearest, s"nearest_other $q")
      aOpt match {
        case Some(a) =>
          assert(r.getDouble(2) == r6(a), s"a_mean $q")
          val sil = if (math.max(a, bRaw) == 0) 0.0 else r6((bRaw - a) / math.max(a, bRaw))
          assert(r.getDouble(5) == sil, s"silhouette $q")
        case None =>
          assert(r.isNullAt(2)); assert(r.getDouble(5) == 0.0)
      }
    }
  }

  test("m_avro_ocf: hand-built containers decode through the real Avro DataFileStream") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
      .orderBy("doc_id").limit(5).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    docs.foreach { case (id, text) =>
      val bytes = multimodal.Multimodal.encodeAvroOcf(id, text)
      val reader = new org.apache.avro.file.DataFileStream(
        new java.io.ByteArrayInputStream(bytes),
        new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
      assert(reader.getMetaString("avro.codec") == "null")
      assert(reader.hasNext)
      val rec = reader.next()
      val body = rec.get("body").asInstanceOf[java.nio.ByteBuffer]
      val got = new Array[Byte](body.remaining()); body.get(got)
      assert(java.util.Arrays.equals(got, text.getBytes("UTF-8")), s"body doc $id")
      assert(!reader.hasNext, "exactly one record")
      reader.close()
    }
    // the declarative parse agrees with the encoder's framing on every doc
    val out = multimodal.Multimodal.avroOcf(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(1) && r.getBoolean(6) && r.getBoolean(7) && r.getBoolean(8),
        s"certificates doc ${r.getLong(0)}")
      assert(r.getString(2) == "null"); assert(r.getLong(3) == 1L)
      assert(r.getLong(4) == r.getLong(5) + (if (r.getLong(5) < 64) 1 else 2))
    }
  }

  test("t_rake: top phrases replay from an in-memory RAKE pass") {
    val stop = Set("the", "of", "and", "a", "an", "in", "to", "is", "it", "that",
      "this", "with", "for", "as", "on", "are", "be", "by", "or", "at", "from",
      "was", "were", "not", "but")
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // phrases per doc: split segments at punctuation, break runs at stopwords
    val phrases = docs.flatMap { case (_, text) =>
      text.toLowerCase.split("[^a-z0-9 ]+").flatMap { seg =>
        val toks = seg.split(" +").filter(_.nonEmpty)
        val runs = scala.collection.mutable.ArrayBuffer(scala.collection.mutable.ArrayBuffer.empty[String])
        toks.foreach { t => if (stop(t)) runs += scala.collection.mutable.ArrayBuffer.empty[String] else runs.last += t }
        runs.filter(_.nonEmpty).map(_.toSeq)
      }
    }
    val freq = phrases.flatten.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val deg = phrases.flatMap(p => p.map(_ -> p.length.toLong))
      .groupBy(_._1).map { case (w, xs) => w -> xs.map(_._2).sum }
    val scoreM = freq.keys.map(w => w -> math.round(deg(w) * 1e6 / freq(w))).toMap
    val byText = phrases.groupBy(_.mkString(" ")).map { case (txt, occ) =>
      (txt, occ.head.map(scoreM).sum, occ.head.length.toLong, occ.length.toLong)
    }
    val expected = byText.toSeq.sortBy { case (txt, sm, _, _) => (-sm, txt) }.take(15)
    val out = operators.TextAnalysis.rake(spark, sf).collect()
    assert(out.length == expected.length)
    out.zip(expected).foreach { case (r, (txt, sm, nw, no)) =>
      assert(r.getString(0) == txt, s"phrase ${r.getString(0)} vs $txt")
      assert(r.getLong(1) == sm, s"score $txt")
      assert(r.getLong(2) == nw && r.getLong(3) == no, s"census $txt")
    }
  }

  test("g_mst: Borůvka forest equals an in-memory Kruskal (unique weights ⇒ unique MSF)") {
    val edges = operators.Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), 1000000L - math.round(r.getDouble(2) * 1e6)))
    // Kruskal with union-find over the same unique (wm, a, b) order
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      parent.getOrElseUpdate(x, x)
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    }
    val kruskal = edges.sortBy { case (a, b, w) => (w, a, b) }.filter { case (a, b, _) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { parent(math.max(ra, rb)) = math.min(ra, rb); true } else false
    }.map { case (a, b, w) => (a, b, w) }.sortBy(e => (e._1, e._2))
    val out = operators.Graph.mst(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == kruskal.length,
      s"forest size ${out.length} vs kruskal ${kruskal.length}")
    assert(out.toSeq == kruskal.toSeq)
    // spanning invariant: |forest| = nodes − components
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val comps = nodes.map(find).distinct
    assert(out.length == nodes.length - comps.length)
  }

  test("m_ebml_meta: vint widths round-trip at the all-ones boundaries; certificates hold") {
    // RFC 8794: 1-byte vints carry 0..126 (127 = unknown-size reservation)
    def decode(bs: Array[Byte]): (Long, Int) = {
      val b0 = bs(0) & 0xff
      if (b0 >= 128) ((b0 - 128).toLong, 1)
      else if (b0 >= 64) (((b0 - 64).toLong << 8) | (bs(1) & 0xff), 2)
      else (((b0 - 32).toLong << 16) | ((bs(1) & 0xff) << 8) | (bs(2) & 0xff), 3)
    }
    Seq(0L, 1L, 126L, 127L, 128L, 553L, 16382L, 16383L, 20000L).foreach { n =>
      val enc = multimodal.Multimodal.ebmlVint(n)
      val (v, w) = decode(enc)
      assert(v == n && w == enc.length, s"vint $n")
      val expectW = if (n < 127) 1 else if (n < 16383) 2 else 3
      assert(enc.length == expectW, s"width $n")
    }
    val out = multimodal.Multimodal.ebmlMeta(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(1) && r.getBoolean(6) && r.getBoolean(7), s"doc ${r.getLong(0)}")
      assert(r.getString(2) == "webm"); assert(r.getLong(3) == 19L)
      val pl = r.getLong(5)
      assert(r.getLong(4) == pl + 1 + (if (pl < 127) 1 else if (pl < 16383) 2 else 3))
    }
    // a corrupted Segment size vint must flip size_ok, not parse clean
    val doc = Tables.documents(spark, sf).select("text").limit(1).collect()(0).getString(0)
    val bytes = multimodal.Multimodal.encodeEbml(doc)
    val segVintPos = 4 + 1 + 19 + 4 // prefix + header vint + children + segment id
    bytes(segVintPos) = (bytes(segVintPos) ^ 0x01).toByte
    val (segSize, sw) = decode(bytes.drop(segVintPos))
    assert(4 + 1 + 19 + 4 + sw + segSize != bytes.length, "corrupt size must break replay")
  }

  test("q86_join_hints: three hinted paths agree row-for-row and replay from raw keys") {
    val out = operators.RelationalExt6.q86JoinHints(spark, sf).collect()
    val byVariant = out.groupBy(_.getString(0))
      .map { case (v, rs) => v -> rs.map(r => (r.getInt(1).toLong, r.getLong(2), r.getLong(3))).sorted.toSeq }
    assert(byVariant.keySet == Set("broadcast", "merge", "shuffle_hash"))
    assert(byVariant("broadcast") == byVariant("merge"))
    assert(byVariant("merge") == byVariant("shuffle_hash"))
    val cust = Tables.customer(spark, sf).select("c_custkey", "c_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val perNation = Tables.orders(spark, sf).select("o_custkey").collect()
      .map(_.getLong(0)).filter(cust.contains).groupBy(cust)
    byVariant("broadcast").foreach { case (nk, nOrders, nCust) =>
      assert(nOrders == perNation(nk).length.toLong, s"orders nation $nk")
      assert(nCust == perNation(nk).distinct.length.toLong, s"customers nation $nk")
    }
  }

  test("g_widest_path: bottlenecks replay from an in-memory maximin pass") {
    val pairs = operators.Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e6)))
    val adj = (pairs.map { case (a, b, w) => (a, (b, w)) } ++
        pairs.map { case (a, b, w) => (b, (a, w)) })
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val seeds = adj.keySet.filter(_ % 10 == 0)
    // fixpoint maximin (graphs here are tiny; iterate to stability)
    var bm = seeds.map(_ -> 1000000L).toMap
    var changed = true
    while (changed) {
      changed = false
      val next = collection.mutable.Map(bm.toSeq: _*)
      bm.foreach { case (u, b) =>
        adj(u).foreach { case (v, w) =>
          val cand = math.min(b, w)
          if (cand > next.getOrElse(v, Long.MinValue)) { next(v) = cand; changed = true }
        }
      }
      bm = next.toMap
    }
    val out = operators.Graph.widestPath(spark, sf).collect()
    assert(out.length == bm.size)
    out.foreach { r =>
      assert(r.getLong(1) == bm(r.getLong(0)), s"bottleneck ${r.getLong(0)}")
    }
    // seeds report full strength; non-seeds at most their best incident edge
    out.filter(_.getLong(0) % 10 == 0).foreach(r => assert(r.getLong(1) == 1000000L))
  }

  test("q87_percentiles: ANSI cont/disc replay from an in-memory sorted pass") {
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), round(col("l_extendedprice") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    def cont(xs: Array[Long], f: Double): Double = {
      val pos = (xs.length - 1) * f
      val lo = pos.toInt; val frac = pos - lo
      if (lo + 1 < xs.length) xs(lo) + frac * (xs(lo + 1) - xs(lo)) else xs(lo).toDouble
    }
    def disc(xs: Array[Long], f: Double): Long = xs(math.ceil(xs.length * f).toInt - 1)
    val out = operators.RelationalExt6.q87Percentiles(spark, sf).collect()
    assert(out.length == rows.size)
    out.foreach { r =>
      val xs = rows(r.getString(0))
      assert(r.getLong(1) == xs.length.toLong)
      assert(r.getDouble(2) == cont(xs, 0.25), s"p25_cont ${r.getString(0)}")
      assert(r.getDouble(3) == cont(xs, 0.50), s"p50_cont ${r.getString(0)}")
      assert(r.getDouble(4) == cont(xs, 0.75), s"p75_cont ${r.getString(0)}")
      assert(r.getLong(5) == disc(xs, 0.25), s"p25_disc ${r.getString(0)}")
      assert(r.getLong(6) == disc(xs, 0.75), s"p75_disc ${r.getString(0)}")
    }
  }

  test("m_pcm_ulaw: exhaustive 16-bit round-trip bound; decode is monotone per sign") {
    import multimodal.Multimodal.{ulawEncode, ulawDecode}
    // ITU anchor points
    assert(ulawEncode(0) == 0xff, "positive zero is 0xFF")
    assert(ulawDecode(0xff) == 0)
    assert(ulawDecode(ulawEncode(32767)) == 32124, "clamp region decodes to segment max")
    var x = -32768
    while (x <= 32767) {
      val u = ulawEncode(x)
      val dec = ulawDecode(u)
      val exp = ((~u & 0xff) >> 4) & 0x07
      assert(math.abs(x.toLong - dec) <= (1L << (exp + 2)) ||
        math.abs(x) > 32635, s"bound at $x")
      x += 1
    }
    // decode magnitude is strictly monotone over the positive code space
    val mags = (0 to 127).map(c => ulawDecode(~c & 0xff))
    assert(mags.zip(mags.tail).forall { case (a, b) => a < b })
    val out = multimodal.Multimodal.pcmUlaw(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(4), s"bound_ok doc ${r.getLong(0)}")
      assert(r.getLong(2) <= r.getLong(1) * r.getLong(3), "sum <= n * max")
    }
  }

  test("q88_twap: duration-weighted means replay from an in-memory integral") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), expr("unix_micros(ts)"), round(col("value") * 100).cast("long"),
        col("event_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val out = operators.RelationalExt6.q88Twap(spark, sf).collect()
    val byUser = ev.groupBy(_._1)
    out.foreach { r =>
      val rows = byUser(r.getLong(0)).sortBy(t => (t._2, t._4))
      val segs = rows.zip(rows.tail).map { case ((_, us, vc, _), (_, nxt, _, _)) =>
        (vc, (nxt - us) / 1000)
      }
      val span = segs.map(_._2).sum
      val wsum = segs.map { case (vc, d) => vc * d }.sum
      assert(r.getLong(1) == segs.length.toLong, "n_segments")
      assert(r.getLong(2) == span, "span_ms")
      assert(r.getDouble(3) == math.round(wsum.toDouble / span * 1e6) / 1e6, "twap")
    }
    // every multi-event user with positive span is present
    val expected = byUser.count { case (_, rows) =>
      rows.length > 1 && (rows.map(_._2).max - rows.map(_._2).min) / 1000 > 0
    }
    assert(out.length == expected)
  }

  test("p_sample_exact_k: the sample is the k md5-smallest keys, stable and exact") {
    val out = operators.Pipeline.sampleExactK(spark, sf).collect()
    assert(out.length == 50)
    val md = java.security.MessageDigest.getInstance("MD5")
    val all = Tables.documents(spark, sf).select("doc_id").collect().map(_.getLong(0))
      .map { id =>
        val h = md.digest(s"doc-$id-salt42".getBytes("UTF-8")).map(b => f"$b%02x").mkString
        (h, id)
      }.sorted.take(50)
    out.zip(all).zipWithIndex.foreach { case ((r, (h, id)), i) =>
      assert(r.getInt(0) == i + 1, "rank")
      assert(r.getLong(1) == id, s"doc at rank ${i + 1}")
      assert(r.getString(2) == h.take(12), "hash prefix")
      assert(r.getBoolean(3))
    }
  }

  test("s_incremental_ivf: cell growth and means replay from an in-memory assign") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    def sq(a: Array[Double], b: Array[Double]) = dot(a, a) - 2 * dot(a, b) + dot(b, b)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    val cents = vecs.filter { case (id, _) => id < 10 && id % 7 != 1 }
    def assign(ids: Iterable[Long]) = ids.map { id =>
      val c = cents.toSeq.map { case (cid, cv) => (r6(sq(vecs(id), cv)), cid) }.min._2
      (c, math.round(r6(sq(vecs(id), cents(c))) * 1e6))
    }
    val base = assign(vecs.keys.filter(_ % 7 != 1)).groupBy(_._1)
    val nw = assign(vecs.keys.filter(_ % 7 == 1)).groupBy(_._1)
    val out = operators.Similarity.incrementalIvf(spark, sf).collect()
    assert(out.length == base.size)
    out.foreach { r =>
      val c = r.getLong(0)
      val b = base(c).map(_._2)
      assert(r.getLong(1) == b.size.toLong, s"n_base $c")
      assert(r.getDouble(4) == r6(b.sum.toDouble / (b.size * 1e6)), s"mean base $c")
      nw.get(c) match {
        case Some(xs) =>
          assert(r.getLong(2) == xs.size.toLong, s"n_new $c")
          assert(r.getDouble(5) == r6(xs.map(_._2).sum.toDouble / (xs.size * 1e6)))
        case None => assert(r.getLong(2) == 0L); assert(r.isNullAt(5))
      }
      assert(r.getDouble(3) == r6(r.getLong(2).toDouble / r.getLong(1)), s"growth $c")
    }
  }

  test("m_ogg_pages: lacing arithmetic survives the multiple-of-255 edge") {
    // payloads straddling the lacing boundary, incl. the exact multiple
    Seq(1, 254, 255, 256, 510, 511).foreach { n =>
      val b = multimodal.Multimodal.encodeOgg(7L, "x" * n)
      assert(new String(b.slice(0, 4), "US-ASCII") == "OggS")
      val nSeg = b(26) & 0xff
      assert(nSeg == n / 255 + 1, s"n_segments for $n")
      val lacing = b.slice(27, 27 + nSeg).map(_ & 0xff)
      assert(lacing.init.forall(_ == 255) && lacing.last == n % 255, s"lacing $n")
      assert(lacing.sum == n, s"lacing sum $n")
      assert(b.length == 27 + nSeg + n, s"page length $n")
    }
    val out = multimodal.Multimodal.oggPages(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(1) && r.getBoolean(8) && r.getBoolean(9), s"doc ${r.getLong(0)}")
      assert(r.getLong(4) == r.getLong(7), "granule equals payload length")
      assert(r.getLong(5) == r.getLong(0), "serial equals doc id")
      assert(r.getLong(6) == r.getLong(7) / 255 + 1, "segment count")
    }
  }

  test("d_cluster_purity: purity replays from in-memory CC + label counts") {
    val pairs = operators.Dedup.embedDup(spark, sf).select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      parent.getOrElseUpdate(x, x)
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val labels = Tables.embeddings(spark, sf).select(col("vec_id"), col("label").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byCluster = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .groupBy(find).map { case (c, vs) => c -> vs.map(labels) }
    val out = operators.Dedup.clusterPurity(spark, sf).collect()
    assert(out.length == byCluster.size)
    out.foreach { r =>
      val ls = byCluster(r.getLong(0))
      val counts = ls.groupBy(identity).map { case (l, xs) => (l, xs.length.toLong) }
      val (modal, cnt) = counts.toSeq.map { case (l, c) => (-c, l) }.min match {
        case (nc, l) => (l, -nc)
      }
      assert(r.getLong(1) == ls.length.toLong, "size")
      assert(r.getLong(2) == counts.size.toLong, "n_labels")
      assert(r.getLong(3) == modal && r.getLong(4) == cnt, s"modal ${r.getLong(0)}")
      assert(r.getDouble(5) == math.round(cnt.toDouble / ls.length * 1e6) / 1e6)
    }
  }

  test("m_ar_archive: header layout is byte-exact; odd payloads carry the pad byte") {
    Seq("odd", "even", "x" * 99, "y" * 100).foreach { text =>
      val b = multimodal.Multimodal.encodeAr(text)
      assert(new String(b.slice(0, 8), "US-ASCII") == "!<arch>\n")
      assert(new String(b.slice(8, 24), "US-ASCII").trim == "doc.txt/")
      val n = text.getBytes("UTF-8").length
      assert(new String(b.slice(56, 66), "US-ASCII").trim.toInt == n, "decimal size")
      assert(b(66) == '`' && b(67) == '\n', "end-of-header magic")
      assert(b.length == 68 + n + n % 2, s"even alignment for $n")
      if (n % 2 == 1) assert(b.last == '\n', "pad byte")
    }
    val out = multimodal.Multimodal.arMeta(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(1) && r.getBoolean(5) && r.getBoolean(6), s"doc ${r.getLong(0)}")
      assert(r.getString(2) == "doc.txt/" && r.getString(3) == "100644")
    }
  }
}
