package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the sketch hot loops.
  *
  * Spark's higher-order functions (`transform`/`aggregate`/`zip_with`)
  * evaluate their lambda per element, interpreted and boxed — fine for
  * presentation logic, ~10× too slow for a 128-permutation signature over
  * every shingle of a 100 TB corpus. These expressions drop the whole
  * per-document sketch into one generated static call over primitive
  * arrays: no boxing, no per-element dispatch.
  */
object MinHashImpl {
  val NumPerms = 128
  val Prime = 2147483647L // 2^31 - 1

  // deterministic affine permutation family (seeded)
  val (permA, permB) = {
    val rnd = new scala.util.Random(7)
    (Array.fill(NumPerms)(1L + rnd.nextInt(Int.MaxValue - 1).toLong),
      Array.fill(NumPerms)(rnd.nextInt(Int.MaxValue).toLong))
  }

  /** sig[p] = min over shingles of (a_p·h(s) + b_p) mod (2³¹−1), h = 31-bit
    * djb2. Products stay < 2⁶² — exact long arithmetic. */
  def signature(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray) // empty doc: empty sig, est_jaccard -> 0
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val u = shingles.getUTF8String(i) // null elements hash as empty
      hs(i) = (if (u == null) 5381L else Djb2.hash(u.getBytes)) & 0x7FFFFFFFL
      i += 1
    }
    val sig = new Array[Long](NumPerms)
    var p = 0
    while (p < NumPerms) {
      val a = permA(p); val b = permB(p)
      var m = Long.MaxValue
      var j = 0
      while (j < n) {
        val v = (a * hs(j) + b) % Prime
        if (v < m) m = v
        j += 1
      }
      sig(p) = m
      p += 1
    }
    new GenericArrayData(sig)
  }

  /** Band bucket hashes: numBands = 128/bandRows, each band's rows mixed
    * into one 64-bit bucket key. */
  def bands(sig: ArrayData, bandRows: Int): ArrayData = {
    if (sig.numElements() < NumPerms) return new GenericArrayData(Array.emptyLongArray)
    val numBands = NumPerms / bandRows
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var h = 1125899906842597L
      var j = 0
      while (j < bandRows) {
        h = (h * 31L) ^ (sig.getLong(b * bandRows + j) * 0x9E3779B97F4A7C15L)
        j += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Word k-grams joined with single spaces; `distinct` keeps
    * first-occurrence order (set semantics for Jaccard), otherwise every
    * occurrence is emitted (frequency counting). */
  def shingles(tokens: ArrayData, k: Int, distinct: Boolean = true): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[org.apache.spark.unsafe.types.UTF8String](n)
    val seen =
      if (distinct) new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]() else null
    val toks = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = tokens.getUTF8String(i); i += 1 }
    val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    i = 0
    while (i + k <= n) {
      var s = toks(i)
      var j = 1
      var hasNull = s == null
      while (j < k && !hasNull) {
        if (toks(i + j) == null) hasNull = true
        else s = org.apache.spark.unsafe.types.UTF8String.concat(s, space, toks(i + j))
        j += 1
      }
      if (!hasNull && (seen == null || seen.add(s))) out.add(s)
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** Per-element 64-bit hash of a shingle array: djb2 → avalanche
    * multiply. One generated call per document; the shuffle then carries
    * 8-byte longs instead of ~25-char strings through candidate
    * generation (see Dedup.setsimJoin). */
  def wordHashes(shingles: ArrayData): ArrayData = {
    val n = shingles.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val u = shingles.getUTF8String(i)
      out(i) = (if (u == null) 5381L else Djb2.hash(u.getBytes)) * 0x9E3779B97F4A7C15L
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Exact set Jaccard of two SORTED long arrays in one merge pass —
    * set semantics throughout (duplicate neighbors skipped on both
    * sides, so the value is bit-identical to
    * size(array_intersect)/size(array_union) on the same inputs: the
    * same two exact integers enter the same one IEEE division). The
    * r12 stage probe measured WHY this exists: array_intersect +
    * array_union each build a per-row hash set AND materialize a
    * result array, ~110 µs per candidate pair at dedup verify scale —
    * the whole verify stage's cost; a merge over doc-sorted arrays is
    * ~|A|+|B| long comparisons with zero allocation. Callers sort
    * ONCE per document (sort_array before the candidate fan-out),
    * never per pair. */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0
    var da = 0L; var db = 0L; var isz = 0L // distinct counts + intersection
    var lastA = 0L; var haveA = false
    var lastB = 0L; var haveB = false
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) {
        if (!haveA || lastA != x) { da += 1; isz += 1 }
        if (!haveB || lastB != y) db += 1
        lastA = x; haveA = true; lastB = y; haveB = true
        i += 1; j += 1
      } else if (x < y) {
        if (!haveA || lastA != x) da += 1
        lastA = x; haveA = true; i += 1
      } else {
        if (!haveB || lastB != y) db += 1
        lastB = y; haveB = true; j += 1
      }
    }
    while (i < na) {
      val x = a.getLong(i)
      if (!haveA || lastA != x) da += 1
      lastA = x; haveA = true; i += 1
    }
    while (j < nb) {
      val y = b.getLong(j)
      if (!haveB || lastB != y) db += 1
      lastB = y; haveB = true; j += 1
    }
    val union = da + db - isz
    if (union == 0) 0.0 else isz.toDouble / union
  }

  /** Distinct-intersection COUNT of two SORTED long arrays — the same
    * merge pass as [[jaccardSorted]] when the caller needs the raw
    * overlap (containment denominators differ from Jaccard's union);
    * bit-identical to size(array_intersect) on the same inputs. */
  def overlapSorted(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0
    var isz = 0L
    var last = 0L; var have = false
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) {
        if (!have || last != x) { isz += 1 }
        last = x; have = true
        i += 1; j += 1
      } else if (x < y) i += 1
      else j += 1
    }
    isz
  }

  /** Fraction of equal signature positions — the MinHash Jaccard estimate.
    * Compares over the common prefix so short/mismatched arrays degrade
    * rather than index out of bounds. */
  def estJaccard(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    if (n == 0) return 0.0
    var eq = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  /** 64-bit SimHash over the token multiset: each token's 64-bit hash
    * votes ±1 per bit, sign of the tally sets the output bit. */
  def simhash(tokens: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val u = tokens.getUTF8String(i)
      val h = (if (u == null) 5381L else Djb2.hash(u.getBytes)) * 0x9E3779B97F4A7C15L // avalanche
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

private[graft] trait ArrayInputCheck { self: UnaryExpression =>
  def expectedElement: DataType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(e, _) if e == expectedElement => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"${self.prettyName} expects array<$expectedElement>, got $other")
  }
}

/** array<string> tokens → array<string> distinct word k-gram shingles
  * (first-occurrence order). The interpreted transform+element_at+
  * concat_ws+array_distinct chain measured ~1.6 ms per document. */
case class WordShingles(child: Expression, k: Int, distinct: Boolean = true)
    extends UnaryExpression with ArrayInputCheck {
  override def expectedElement: DataType = StringType
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    MinHashImpl.shingles(input.asInstanceOf[ArrayData], k, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashImpl.shingles($c, $k, $distinct)")
  override protected def withNewChildInternal(newChild: Expression): WordShingles = copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

/** array<string> shingles → array<long> 128-perm MinHash signature. */
case class MinHashSig(child: Expression) extends UnaryExpression with ArrayInputCheck {
  override def expectedElement: DataType = StringType
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    MinHashImpl.signature(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashImpl.signature($c)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig = copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

/** array<long> signature → array<long> band bucket hashes. */
case class BandHashes(child: Expression, bandRows: Int) extends UnaryExpression with ArrayInputCheck {
  override def expectedElement: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base != TypeCheckResult.TypeCheckSuccess) base
    else if (bandRows > 0 && MinHashImpl.NumPerms % bandRows == 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"band_hashes: bandRows must be a positive divisor of ${MinHashImpl.NumPerms}, got $bandRows")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    MinHashImpl.bands(input.asInstanceOf[ArrayData], bandRows)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashImpl.bands($c, $bandRows)")
  override protected def withNewChildInternal(newChild: Expression): BandHashes = copy(child = newChild)
  override def prettyName: String = "band_hashes"
}

/** THE 64-BIT-COLLISION ARGUMENT — single source of truth (r14).
  *
  * Every verify site that computes an "exact" set measure over
  * [[WordHashes]] / hashed chunk fingerprints instead of the strings
  * themselves — [[SortedJaccard]], [[SortedOverlap]], the hashed
  * distinct/frequency counts in `widthSweep` — is exact UP TO 64-BIT
  * HASH COLLISIONS, and leans on this one argument:
  *
  *  1. Equal strings always hash equal, so a collision can only MERGE
  *     two distinct elements — it can inflate an intersection or
  *     deflate a union/count, never the reverse; the failure mode is a
  *     perturbed ratio, not a missed/phantom row class.
  *  2. The collision probability is birthday-bounded: for a pair with
  *     n_A, n_B elements it is ≈ n_A·n_B·2⁻⁶⁴ (< 10⁻⁹ even at
  *     million-element documents), and across a corpus with V distinct
  *     shingles ≈ V²·2⁻⁶⁵ — at 100 TB (V ~ 10¹²) that is ~3%, which is
  *     why production at that scale would widen to 128-bit hashes
  *     (same merge-pass code, two longs per element); at every tested
  *     SF it is vanishing.
  *  3. The DuckDB oracle twins re-derive the same measures from the
  *     STRINGS, so any collision that perturbed a result would fail
  *     the hash gate — the approximation is continuously audited, not
  *     assumed.
  *
  * Sites that cite this anchor: Dedup.ngramJaccardBuild, d_lsh_tune,
  * d_overcollapse, d_contamination, d_incremental_minhash and
  * widthSweep (Dedup.scala), t_cdc_minhash (TextAnalysis.scala). */
object Hash64Collision

/** array<string> shingles → array<long> per-element 64-bit hashes. */
case class WordHashes(child: Expression) extends UnaryExpression with ArrayInputCheck {
  override def expectedElement: DataType = StringType
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    MinHashImpl.wordHashes(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashImpl.wordHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): WordHashes = copy(child = newChild)
  override def prettyName: String = "word_hashes"
}

/** (array<long> SORTED, array<long> SORTED) → exact set Jaccard as one
  * codegen'd merge pass — see [[MinHashImpl.jaccardSorted]] for the
  * measured rationale (the r12 d_setsim_join verify-stage fix). */
case class SortedJaccard(left: Expression, right: Expression) extends BinaryExpression {
  private def isLongArray(t: DataType) = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_jaccard expects two array<long>, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    MinHashImpl.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.MinHashImpl.jaccardSorted($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedJaccard = copy(l, r)
  override def prettyName: String = "sorted_jaccard"
}

/** (array<long> SORTED, array<long> SORTED) → distinct-intersection
  * count, one codegen'd merge pass ([[MinHashImpl.overlapSorted]]). */
case class SortedOverlap(left: Expression, right: Expression) extends BinaryExpression {
  private def isLongArray(t: DataType) = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_overlap expects two array<long>, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    MinHashImpl.overlapSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.MinHashImpl.overlapSorted($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedOverlap = copy(l, r)
  override def prettyName: String = "sorted_overlap"
}

/** array<string> tokens → 64-bit SimHash. */
case class SimHash64(child: Expression) extends UnaryExpression with ArrayInputCheck {
  override def expectedElement: DataType = StringType
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    MinHashImpl.simhash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashImpl.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(child = newChild)
  override def prettyName: String = "simhash64"
}

object MinHashFns {
  def word_shingles(c: Column, k: Int, distinct: Boolean = true): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(c), k, distinct))
  def minhash_sig(c: Column): Column = ColumnBridge.column(MinHashSig(ColumnBridge.expression(c)))
  def band_hashes(c: Column, bandRows: Int): Column =
    ColumnBridge.column(BandHashes(ColumnBridge.expression(c), bandRows))
  def word_hashes(c: Column): Column = ColumnBridge.column(WordHashes(ColumnBridge.expression(c)))
  def sorted_jaccard(a: Column, b: Column): Column =
    ColumnBridge.column(SortedJaccard(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def sorted_overlap(a: Column, b: Column): Column =
    ColumnBridge.column(SortedOverlap(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def simhash64(c: Column): Column = ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
  def est_jaccard(a: Column, b: Column): Column =
    ColumnBridge.column(EstJaccard(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** (sig_a, sig_b) → fraction of equal positions. */
case class EstJaccard(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  private def isLongArray(t: DataType) = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"est_jaccard expects two array<bigint>, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    MinHashImpl.estJaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.MinHashImpl.estJaccard($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): EstJaccard = copy(l, r)
  override def prettyName: String = "est_jaccard"
}
