package graft

import org.apache.spark.sql.functions.col
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{Djb2, MinHashFns, MinHashImpl}

/** Property-based checks of the native Catalyst expressions against
  * independent naive reimplementations, over deterministic scalacheck
  * inputs (fixed seeds — CI-stable). The expressions run through REAL
  * DataFrame plans, so both the interpreted `nullSafeEval` path and the
  * whole-stage-codegen path are what gets exercised — a codegen template
  * bug (quoting, boxing, nullability) shows up here even when the Scala
  * helper it calls is correct.
  */
class ExpressionPropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int, seed: Long): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private def naiveDjb2(bytes: Array[Byte]): Long = {
    var h = 5381L; bytes.foreach(b => h = h * 33 + b); h
  }

  test("djb2_hash equals a signed-byte fold on random ASCII, multi-byte and NUL strings") {
    import spark.implicits._
    val gen = Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf[Char](Gen.alphaNumChar, Gen.oneOf('é', 'ß', '中', '\u0000')))
        .map(_.mkString))
    val texts = samples(gen, 400, 1L).distinct
    val got = texts.toDF("t").select(col("t"), Djb2.djb2_hash(col("t")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    texts.foreach { t =>
      assert(got(t) == naiveDjb2(t.getBytes("UTF-8")),
        s"djb2 mismatch on ${t.take(20).map(_.toInt)}")
    }
  }

  test("djb2_partition matches C NUL-stop + unsigned-modulo semantics") {
    import spark.implicits._
    val gen = for {
      pre <- Gen.asciiPrintableStr
      post <- Gen.asciiPrintableStr
      withNul <- Gen.oneOf(true, false)
    } yield if (withNul) pre + "\u0000" + post else pre
    val texts = samples(gen, 400, 2L).distinct
    val got = texts.toDF("t").select(col("t"), Djb2.djb2_partition(col("t"), 10).as("p"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    texts.foreach { t =>
      val stopped = t.getBytes("UTF-8").takeWhile(_ != 0)
      val want = java.lang.Long.remainderUnsigned(naiveDjb2(stopped), 10L).toInt
      assert(got(t) == want, s"partition mismatch on ${t.take(20).map(_.toInt)}")
    }
  }

  private val wordPool = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
    "eta", "theta", "iota", "kappa", "the", "of", "and")
  private def naiveShingles(toks: Seq[String], k: Int): Seq[String] =
    toks.sliding(k).filter(_.size == k).map(_.mkString(" ")).toSeq.distinct
  private def naiveSig(shingles: Seq[String]): Array[Long] = {
    if (shingles.isEmpty) return Array.emptyLongArray
    val hs = shingles.map(s => naiveDjb2(s.getBytes("UTF-8")) & 0x7FFFFFFFL)
    Array.tabulate(MinHashImpl.NumPerms) { p =>
      hs.map(h => (MinHashImpl.permA(p) * h + MinHashImpl.permB(p)) % MinHashImpl.Prime).min
    }
  }
  private def naiveSimhash(toks: Seq[String]): Long = {
    val acc = new Array[Int](64)
    toks.foreach { t =>
      val h = naiveDjb2(t.getBytes("UTF-8")) * 0x9E3779B97F4A7C15L
      (0 until 64).foreach(b => if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1)
    }
    (0 until 64).foldLeft(0L)((out, b) => if (acc(b) > 0) out | (1L << b) else out)
  }

  test("word_shingles + minhash_sig + simhash64 equal naive replays on random token lists") {
    import spark.implicits._
    val tokensGen = Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, Gen.oneOf(wordPool)))
    val lists = samples(tokensGen, 150, 3L).zipWithIndex.map { case (ts, i) => (i.toLong, ts) }
    val rows = lists.toDF("id", "toks")
      .select(col("id"),
        MinHashFns.word_shingles(col("toks"), 3).as("sh"),
        MinHashFns.simhash64(col("toks")).as("sim"))
      .withColumn("sig", MinHashFns.minhash_sig(col("sh")))
      .collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[scala.collection.Seq[String]]("sh").toList,
          r.getAs[scala.collection.Seq[Long]]("sig").toList, r.getAs[Long]("sim"))))
      .toMap
    lists.foreach { case (id, toks) =>
      val (sh, sig, sim) = rows(id)
      val wantSh = naiveShingles(toks, 3).toList
      assert(sh == wantSh, s"shingles mismatch for $toks")
      assert(sig.toArray.sameElements(naiveSig(wantSh)), s"signature mismatch for $toks")
      assert(sim == naiveSimhash(toks), s"simhash mismatch for $toks")
    }
  }

  test("est_jaccard equals the equal-position fraction and brackets true Jaccard loosely") {
    import spark.implicits._
    val tokensGen = Gen.chooseNum(3, 25).flatMap(n => Gen.listOfN(n, Gen.oneOf(wordPool)))
    val pairs = samples(Gen.zip(tokensGen, tokensGen), 100, 4L).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
    val got = pairs.toDF("id", "ta", "tb")
      .select(col("id"),
        MinHashFns.word_shingles(col("ta"), 3).as("sa"),
        MinHashFns.word_shingles(col("tb"), 3).as("sb"))
      .select(col("id"),
        MinHashFns.est_jaccard(
          MinHashFns.minhash_sig(col("sa")), MinHashFns.minhash_sig(col("sb"))).as("est"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("est")).toMap
    pairs.foreach { case (id, a, b) =>
      val sa = naiveSig(naiveShingles(a, 3)); val sb = naiveSig(naiveShingles(b, 3))
      val n = math.min(sa.length, sb.length)
      val want = if (n == 0) 0.0
        else (0 until n).count(i => sa(i) == sb(i)).toDouble / n
      assert(got(id) == want, s"est_jaccard mismatch for pair $id")
    }
  }

  test("escLine/unescLine: random strings over the escape alphabet round-trip line-atomically") {
    import spark.implicits._
    import graft.operators.Pipeline.{escLine, unescLine}
    // bias the generator toward the codec's own alphabet: '%', digits,
    // the three structure bytes, and fragments that LOOK like codes
    val gen = Gen.listOf(Gen.frequency(
      4 -> Gen.asciiPrintableChar,
      2 -> Gen.const('%'),
      2 -> Gen.oneOf('0', '2', '5', '9', 'A', 'D'),
      1 -> Gen.oneOf('\n', '\r', '\t'),
      1 -> Gen.oneOf('é', '中'))).map(_.mkString)
    val texts = samples(gen, 500, 7L).distinct
    val out = texts.toDF("t")
      .select(col("t"), escLine(col("t")).as("e"))
      .select(col("t"), col("e"), unescLine(col("e")).as("back"))
      .collect()
    out.foreach { r =>
      val (t, e, back) = (r.getString(0), r.getString(1), r.getString(2))
      assert(back == t, s"codec round-trip broke on ${t.take(30).map(_.toInt)}")
      assert(!e.exists(c => c == '\n' || c == '\r' || c == '\t'),
        s"escaped form not line-atomic for ${t.take(30).map(_.toInt)}")
    }
  }

  test("p_zorder's Morton interleave is a bijection on (u8, d8) and its SQL form agrees") {
    import spark.implicits._
    // reference interleave in plain Scala
    def morton(u: Int, d: Int): Long =
      (0 until 8).map(i => (((u >> i) & 1).toLong << (2 * i + 1)) |
        (((d >> i) & 1).toLong << (2 * i))).sum
    // every 16-bit code exactly once over the full 256×256 grid
    val all = for (u <- 0 until 256; d <- 0 until 256) yield morton(u, d)
    assert(all.toSet.size == 65536 && all.min == 0L && all.max == 65535L,
      "interleave must be a bijection onto [0, 65536)")
    // the SQL expression the operator actually evaluates (through a real
    // plan, so codegen'd arithmetic) must agree with the reference on a
    // deterministic sample
    val sample = samples(Gen.zip(Gen.choose(0, 255), Gen.choose(0, 255)), 300, 7L).distinct
    val viaSql = sample.toDF("u8", "d8")
      .selectExpr("u8", "d8", s"(${graft.operators.Pipeline.zExprForTest}) AS z")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    sample.foreach { case (u, d) =>
      assert(viaSql((u, d)) == morton(u, d), s"Morton mismatch at ($u, $d)")
    }
  }

  test("FastSS k=2 neighborhoods: ed(u,v) <= 2 implies a shared deletion variant") {
    def deletions(w: String): Set[String] = {
      val d1 = (0 until w.length).map(i => w.take(i) + w.drop(i + 1)).toSet
      val d2 = d1.flatMap(x => (0 until x.length).map(i => x.take(i) + x.drop(i + 1)))
      d1 ++ d2 + w
    }
    def ed(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(identity)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = dp(i); dp(i) = cur
        }
      }
      dp(a.length)
    }
    val wordGen = Gen.choose(3, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val words = samples(wordGen, 300, 11L).distinct
    var checkedClose = 0
    for (u <- words; v <- words if u < v) {
      val d = ed(u, v)
      if (d <= 2) {
        checkedClose += 1
        assert((deletions(u) & deletions(v)).nonEmpty,
          s"blocking would LOSE the pair ($u, $v) at distance $d")
      }
    }
    // a 3-letter alphabet guarantees plenty of close pairs — the
    // property must have actually been exercised
    assert(checkedClose > 100, s"only $checkedClose close pairs generated")
  }

  test("tar/zip codecs: encode→parse recovers every member over random archives") {
    import graft.multimodal.Multimodal
    val nameGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.take(40).mkString)
    val payloadGen = Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
      .map(_.toArray)
    val archiveGen = Gen.nonEmptyListOf(Gen.zip(nameGen, payloadGen)).map { ms =>
      // unique names, archive-order deterministic
      ms.take(12).zipWithIndex.map { case ((n, p), i) => (f"$i%03d_$n", p) }
    }
    samples(archiveGen, 60, 77L).foreach { members =>
      def md5(b: Array[Byte]): String = java.security.MessageDigest
        .getInstance("MD5").digest(b).map(x => f"$x%02x").mkString
      val tar = Multimodal.parseTar(Multimodal.encodeTar(members))
      assert(tar.map(_._1) == members.map(_._1), "tar member order/name drift")
      tar.zip(members).foreach { case ((_, _, size, ok, m), (_, payload)) =>
        assert(ok && size == payload.length.toLong && m == md5(payload))
      }
      val zip = Multimodal.parseZip(Multimodal.encodeZip(members))
      assert(zip.map(_._1) == members.map(_._1), "zip member order/name drift")
      zip.zip(members).foreach { case ((_, _, size, ok, m), (_, payload)) =>
        assert(ok && size == payload.length.toLong && m == md5(payload))
      }
    }
  }
}
