package graft

import org.apache.spark.sql.functions._

/** Specs for round 8: unigram-LM tokenizer trainer, plus the
  * ADVICE-driven convergence/certificate hardening. Each test
  * re-derives the operator's claim independently — the DuckDB hash
  * gate pins cross-engine equality, the spec pins the SEMANTICS. */
class Round8Spec extends SparkSpec {

  test("t_unigram_lm: final pieces tile the corpus exactly; probabilities sum from usage") {
    val out = operators.TextAnalysis.unigramLm(spark, sf).collect()
    assert(out.nonEmpty)
    // coverage invariant: every included term is fully segmented, so
    // Σ n_uses·piece_len over the final piece table equals the total
    // included character mass Σ cnt·len(term)
    val charMass = Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), "[ \t\n\r]+")).as("term"))
      .filter(col("term").rlike("^[!-~]{1,12}$"))
      .agg(sum(length(col("term")))).head().getLong(0)
    val pieceMass = out.map(r => r.getLong(3) * r.getLong(2)).sum
    assert(pieceMass == charMass, s"piece char mass $pieceMass != corpus $charMass")
    // ranks are 1..n in (n_uses desc, piece asc) order and p_us is the
    // integer-micros share of total usage
    val totalUses = out.map(_.getLong(3)).sum
    out.sortBy(_.getLong(0)).zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i + 1, "rank sequence")
      assert(r.getLong(4) == 1000000L * r.getLong(3) / totalUses, s"p_us of ${r.getString(1)}")
      assert(r.getLong(3) >= 1, "unused piece survived the prune")
      assert(r.getString(1).length == r.getLong(2), "piece_len")
    }
    // EM actually concentrated: multi-char pieces captured usage (the
    // corpus is word-templated, so pure char fallback would be a bug)
    assert(out.filter(_.getLong(2) >= 2).map(_.getLong(3)).sum > 0L)
  }

  test("t_unigram_lm: segmentation objective is fewest-pieces-first with score then lex ties") {
    // in-memory mini-trainer replay of the pinned DP on a synthetic
    // inventory: "abcd" with pieces {abcd} beats {ab,cd} beats chars;
    // with equal piece-count, higher score wins; then lex
    def viterbi(term: String, inv: Map[String, Long]): String = {
      val n = term.length
      val best = new Array[(Long, Long, String)](n + 1)
      best(0) = (0L, 0L, "")
      for (i <- 1 to n) {
        var cur: (Long, Long, String) = null
        for (l <- 1 to math.min(4, i); start = i - l if best(start) != null) {
          val p = term.substring(start, i)
          inv.get(p).foreach { sc =>
            val cand = (best(start)._1 + 1, best(start)._2 + sc,
              if (best(start)._3.isEmpty) p else best(start)._3 + " " + p)
            if (cur == null || cand._1 < cur._1 ||
              (cand._1 == cur._1 && (cand._2 > cur._2 ||
                (cand._2 == cur._2 && cand._3 < cur._3)))) cur = cand
          }
        }
        best(i) = cur
      }
      best(n)._3
    }
    val base = Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L)
    assert(viterbi("abcd", base + ("abcd" -> 1L)) == "abcd")
    assert(viterbi("abcd", base + ("ab" -> 99L, "cd" -> 99L)) == "ab cd")
    // equal piece count (2), score picks the heavier split (11 > 10)
    assert(viterbi("abcd", base + ("ab" -> 5L, "cd" -> 5L, "abc" -> 10L)) == "abc d")
    // equal count and score -> lexicographically smallest segmentation
    assert(viterbi("abab", Map("ab" -> 2L, "a" -> 1L, "b" -> 1L, "aba" -> 3L)) == "ab ab")
  }

  test("s_hnsw: entries come from the upper sample; walks are monotone vs the global entry") {
    val out = graft.operators.Similarity.hnsw(spark, sf).collect()
    assert(out.nonEmpty)
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val globalEntry = vecs.keys.filter(_ % 16 == 0).min
    def cos(a: Long, b: Long): Double = {
      val (x, y) = (vecs(a), vecs(b))
      val d = x.indices.map(i => x(i) * y(i)).sum
      val r = d / (math.sqrt(x.map(t => t * t).sum) * math.sqrt(y.map(t => t * t).sum))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val byRank = rows.sortBy(_.getLong(1))
      // ranks 1..3, cosines non-increasing
      assert(byRank.map(_.getLong(1)).toSeq == (1L to byRank.length))
      assert(byRank.map(_.getDouble(3)).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
      // entry is an upper-layer node, and both greedy walks only improve
      // on the global entry's own cosine (beams retain their seed)
      val entry = byRank.head.getLong(4)
      assert(entry % 16 == 0, s"entry $entry not in upper sample")
      val base = cos(q, globalEntry)
      assert(byRank.head.getDouble(3) >= base, s"hier walk below entry cos for q=$q")
      assert(byRank.head.getDouble(7) >= base, s"flat walk below entry cos for q=$q")
      assert(byRank.head.getLong(5) >= 1 && byRank.head.getLong(6) >= 1)
    }
  }

  test("s_noise_floor: densities replay from the stride pairs; wedge price ties to the guard") {
    val out = graft.operators.Similarity.noiseFloor(spark, sf).collect()
      .sortBy(_.getDouble(0))
    // one row per ladder rung (r10 extended the ladder past 0.6 for
    // the banded path — the audit follows GraftConf, not a literal)
    assert(out.map(_.getDouble(0)).toSeq == GraftConf.cosineLadder)
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val n = vecs.size
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.indices.map(i => a(i) * b(i)).sum
      val r = d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val pairCos = for {
      k <- Seq(1L, 7L, 61L, 127L)
      (id, v) <- vecs
      w <- vecs.get(id + k)
    } yield cos(v, w)
    out.foreach { r =>
      val t = r.getDouble(0)
      val ge = pairCos.count(_ >= t).toLong
      assert(r.getLong(1) == pairCos.size.toLong, "n_pairs")
      assert(r.getLong(2) == ge, s"n_ge at $t")
      assert(r.getLong(3) == 1000000L * ge / pairCos.size, "density_micros")
      val d = BigDecimal((n - 1).toDouble * ge / pairCos.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(4) == d, "est_degree")
      assert(r.getLong(5) == math.round(n * d * d / 2), "est_wedges")
      assert(r.getBoolean(6) == (r.getLong(5) <= graft.GraftConf.maxWedges), "guard_ok")
    }
    // density is monotone non-increasing in the threshold
    assert(out.map(_.getLong(3)).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("p_iceberg_manifest: planning replays from the table; pruning is sound and non-vacuous") {
    val r = operators.Pipeline.icebergManifest(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getBoolean(7), "prune_sound")
    // replay the manifest tree in memory from documents
    val docs = Tables.documents(spark, sf).select("doc_id", "n_chars").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val mx = docs.map(_._1).max
    val (lo, hi) = (mx / 2, 3 * (mx / 4))
    val files = docs.groupBy { case (id, _) => (id % 2, id * 4 / (mx + 1)) }
    val oddFiles = files.filter(_._1._1 == 1L)
    val survivors = oddFiles.filter { case (_, rows) =>
      rows.map(_._1).max >= lo && rows.map(_._1).min < hi }
    val res = docs.filter { case (id, _) => id % 2 == 1 && id >= lo && id < hi }
    assert(row.getLong(0) == 2 && row.getLong(1) == 1, "manifest counts")
    assert(row.getLong(2) == oddFiles.size.toLong, "files listed")
    assert(row.getLong(3) == survivors.size.toLong, "files scanned")
    assert(row.getLong(4) == survivors.values.map(_.length).sum.toLong, "rows scanned")
    assert(row.getLong(5) == res.length.toLong && row.getLong(6) == res.map(_._2).sum)
    // the kernel's point: pruning actually bit on this layout
    assert(row.getLong(3) < row.getLong(2), "file pruning vacuous")
    assert(row.getLong(4) > row.getLong(5), "scan cost should exceed result rows")
  }

  test("m_mp3_frames: the declarative walk equals an in-memory frame-by-frame parse") {
    val out = graft.multimodal.Multimodal.mp3Frames(spark, sf).collect()
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.length == docs.size)
    out.foreach { r =>
      val m = graft.multimodal.Multimodal.encodeMp3(docs(r.getLong(0)))
      // independent imperative walk over the real bytes
      var off = 0; var n = 0L; var sk = 0L; var np = 0L; var ok = true
      while (off < m.length && ok) {
        ok = (m(off) & 0xff) == 0xff && (m(off + 1) & 0xff) == 0xfb
        val b2 = m(off + 2) & 0xff
        val kbps = (b2 >> 4) match {
          case 5 => 64; case 7 => 96; case 9 => 128; case 10 => 160; case _ => 0 }
        ok &&= kbps > 0 && ((b2 >> 2) & 3) == 1
        if (ok) { val pad = (b2 >> 1) & 1; off += 3 * kbps + pad; n += 1; sk += kbps; np += pad }
      }
      assert(ok && off == m.length, s"walk desync for doc ${r.getLong(0)}")
      assert(r.getLong(1) == n && r.getLong(2) == 24 * n &&
        r.getLong(3) == sk && r.getLong(4) == np)
      assert(r.getBoolean(5) && r.getBoolean(6))
    }
  }

  test("g_widest_path: bottlenecks equal the in-memory maximin fixpoint (no round cap)") {
    val out = operators.Graph.widestPath(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = operators.Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1000000)))
    val adj = pairs.flatMap { case (a, b, w) => Seq(a -> (b, w), b -> (a, w)) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var bm = adj.keys.filter(_ % 10 == 0).map(_ -> 1000000L).toMap
    var changed = true
    while (changed) {
      changed = false
      val next = collection.mutable.Map(bm.toSeq: _*)
      bm.foreach { case (id, b) =>
        adj.getOrElse(id, Array.empty[(Long, Long)]).foreach { case (dst, w) =>
          val cand = math.min(b, w)
          if (next.getOrElse(dst, Long.MinValue) < cand) { next(dst) = cand; changed = true }
        }
      }
      bm = next.toMap
    }
    assert(out == bm, "Spark maximin fixpoint != in-memory fixpoint")
  }

  test("m_pcm_ulaw: bound certificate excludes only clamped samples and holds in-range") {
    val rows = graft.multimodal.Multimodal.pcmUlaw(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(4), s"bound_ok false for asset ${r.getLong(0)}"))
    // direct codec check across the full 16-bit range: in-range samples
    // obey the half-step bound, clamped ones exceed it (the reason for
    // the exclusion) — exercised beyond the corpus's codepoints
    var worstInRange = 0L
    var clampViolates = false
    var v = -32768
    while (v <= 32767) {
      val u = graft.multimodal.Multimodal.ulawEncode(v)
      val dec = graft.multimodal.Multimodal.ulawDecode(u)
      val exp = ((~u & 0xff) >> 4) & 0x07
      val err = math.abs(v.toLong - dec)
      val bound = 1L << (exp + 2)
      if (math.abs(v) <= 32635) worstInRange = math.max(worstInRange, err - bound)
      else if (err > bound) clampViolates = true
      v += 1
    }
    assert(worstInRange <= 0, "half-step bound broken inside codec range")
    assert(clampViolates, "clamp region unexpectedly satisfies the bound (exclusion vacuous?)")
  }

  test("m_mp3_frames: encoder emits spec-exact headers; lengths follow the Layer III formula") {
    // "AB" -> cps (65, 66), 6 frames cycling: 65 -> bi=1 (96 kbps, idx 7),
    // pad (65/4)%2=0; 66 -> bi=2 (128 kbps, idx 9), pad (66/4)%2=0
    val m = graft.multimodal.Multimodal.encodeMp3("AB")
    assert((m(0) & 0xff) == 0xff && (m(1) & 0xff) == 0xfb, "sync+version+layer")
    assert((m(2) & 0xff) == ((7 << 4) | 4), "bitrate idx 7, 48 kHz, no pad")
    val f0 = 3 * 96
    assert((m(f0) & 0xff) == 0xff && (m(f0 + 2) & 0xff) == ((9 << 4) | 4), "frame 1 header")
    // total bytes = sum of per-frame 3*kbps+pad over the 6-frame cycle
    val exp = Seq(96, 128, 96, 128, 96, 128).map(_ * 3).sum
    assert(m.length == exp, s"stream length ${m.length} != $exp")
    // odd codepoint exercises the padding bit: 'F' = 70 -> (70/4)%2 = 1
    val p = graft.multimodal.Multimodal.encodeMp3("F")
    assert(((p(2) >> 1) & 1) == 1, "padding bit")
    assert(graft.multimodal.Multimodal.encodeMp3("").isEmpty)
  }

  test("m_ogg_pages: encoder refuses payloads beyond the single-page segment limit") {
    val e = intercept[IllegalArgumentException] {
      graft.multimodal.Multimodal.encodeOgg(7L, "x" * 65025)
    }
    assert(e.getMessage.contains("single-page limit"))
    // boundary: 65024 bytes = 254 full segments + final 254 lacing = 255 entries
    val page = graft.multimodal.Multimodal.encodeOgg(8L, "x" * 65024)
    assert((page(26) & 0xff) == 255)
  }
}
