package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Delta-varint-packed sorted-set signatures for the AllPairs verify
  * stage (r12 verdict item 1).
  *
  * The set-similarity / containment verify ships each candidate pair's
  * token-id set through the second doc join's shuffle — at 100× that
  * stream measured ~25 GB, bytes-linear in candidates, the dedup
  * family's dominant scale cost. An `array<long>` of 64-bit shingle
  * HASHES cannot compress (sorted uniform 64-bit values have ~2⁵⁷
  * average gaps — 9-byte varints, WORSE than raw); but after remapping
  * hashes to DENSE VOCABULARY IDS (rank of the hash in the sorted
  * vocabulary — a bijection, so every set size, intersection, union
  * and therefore every Jaccard/containment VALUE is unchanged
  * bit-for-bit), the per-document sorted id list has average gap
  * |vocab| / |doc| and delta-varint packs it at ~2–3 bytes per token
  * instead of 8 (plus Spark's array-element overhead) — measured ~4×
  * fewer verify-stage shuffle bytes on the documents corpus.
  *
  * The alternative the r12 verdict priced — counting shared hashes
  * through the (h, doc) posting lists semi-joined to candidates —
  * ships ONE ROW PER SHARED TOKEN PER CANDIDATE (≥ 16 B each, so
  * ~|doc| × 16 B per candidate pair against ~|doc| × 2.5 B packed)
  * and re-explodes hot tokens quadratically; the packed form is
  * cheaper by ~6× on the census arithmetic and has no skew regime.
  *
  * Format: unsigned LEB128 varints — `[n][v₀][v₁−v₀]…[vₙ₋₁−vₙ₋₂]` over
  * a NON-DECREASING non-negative long array. Duplicates (delta 0) are
  * preserved and skipped set-semantically by the merge passes, exactly
  * like [[MinHashImpl.jaccardSorted]].
  */
object PackedSetImpl {

  private def writeVarint(out: Array[Byte], pos0: Int, value0: Long): Int = {
    var pos = pos0; var v = value0
    while ((v & ~0x7FL) != 0L) {
      out(pos) = ((v & 0x7F) | 0x80).toByte
      pos += 1
      v >>>= 7
    }
    out(pos) = v.toByte
    pos + 1
  }

  /** SORTED (non-decreasing, non-negative) long array → packed bytes.
    * Fails loud on unsorted or negative input — a silently mis-packed
    * signature would corrupt every downstream Jaccard. */
  def pack(ids: ArrayData): Array[Byte] = {
    val n = ids.numElements()
    val buf = new Array[Byte](10 * (n + 1)) // varint worst case
    var pos = writeVarint(buf, 0, n.toLong)
    var prev = 0L
    var i = 0
    while (i < n) {
      val v = ids.getLong(i)
      if (v < 0L) throw new IllegalArgumentException(
        s"pack_sorted: negative id $v at index $i — ids must be dense non-negative ranks")
      if (i > 0 && v < prev) throw new IllegalArgumentException(
        s"pack_sorted: input not sorted ($prev then $v at index $i)")
      pos = writeVarint(buf, pos, if (i == 0) v else v - prev)
      prev = v
      i += 1
    }
    java.util.Arrays.copyOf(buf, pos)
  }

  // varint readers split into value + length so the merge loops keep
  // their cursors in locals and allocate nothing per candidate

  private def readVarint(a: Array[Byte], pos0: Int): Long = {
    var pos = pos0; var shift = 0; var v = 0L
    var b = a(pos)
    while ((b & 0x80) != 0) {
      v |= (b & 0x7FL) << shift
      shift += 7; pos += 1; b = a(pos)
    }
    v | ((b & 0x7FL) << shift)
  }

  private def varintLen(a: Array[Byte], pos0: Int): Int = {
    var pos = pos0
    while ((a(pos) & 0x80) != 0) pos += 1
    pos - pos0 + 1
  }

  /** Decoded element count (the leading varint). */
  def size(a: Array[Byte]): Long = readVarint(a, 0)

  /** Packed bytes → the original sorted long array (spec/debug surface;
    * the hot path never unpacks). */
  def unpack(a: Array[Byte]): ArrayData = {
    var pos = varintLen(a, 0)
    val n = readVarint(a, 0).toInt
    val out = new Array[Long](n)
    var prev = 0L
    var i = 0
    while (i < n) {
      val d = readVarint(a, pos); pos += varintLen(a, pos)
      prev = (if (i == 0) d else prev + d)
      out(i) = prev
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Exact set Jaccard of two packed sorted sets — the same distinct
    * counting as [[MinHashImpl.jaccardSorted]] (da, db, isz; union =
    * da + db − isz; one IEEE division), walked directly over the two
    * varint streams with zero allocation. Bit-identical to
    * sorted_jaccard over the unpacked arrays. */
  def jaccardPacked(a: Array[Byte], b: Array[Byte]): Double = {
    val na = readVarint(a, 0).toInt; var pa = varintLen(a, 0)
    val nb = readVarint(b, 0).toInt; var pb = varintLen(b, 0)
    var i = 0; var j = 0
    var va = 0L; var vb = 0L
    var haveVa = false; var haveVb = false // cursor holds an undrained value
    var da = 0L; var db = 0L; var isz = 0L
    var lastA = 0L; var haveA = false
    var lastB = 0L; var haveB = false
    while (i < na && j < nb) {
      if (!haveVa) {
        val d = readVarint(a, pa); pa += varintLen(a, pa)
        va = (if (i == 0) d else va + d); haveVa = true
      }
      if (!haveVb) {
        val d = readVarint(b, pb); pb += varintLen(b, pb)
        vb = (if (j == 0) d else vb + d); haveVb = true
      }
      if (va == vb) {
        if (!haveA || lastA != va) { da += 1; isz += 1 }
        if (!haveB || lastB != vb) db += 1
        lastA = va; haveA = true; lastB = vb; haveB = true
        i += 1; j += 1; haveVa = false; haveVb = false
      } else if (va < vb) {
        if (!haveA || lastA != va) da += 1
        lastA = va; haveA = true; i += 1; haveVa = false
      } else {
        if (!haveB || lastB != vb) db += 1
        lastB = vb; haveB = true; j += 1; haveVb = false
      }
    }
    // drain: the main loop may exit with one side's CURRENT value
    // already decoded but uncounted (haveVa/haveVb) — count it before
    // reading further varints, or the cursor runs past the stream
    while (i < na) {
      if (!haveVa) {
        val d = readVarint(a, pa); pa += varintLen(a, pa)
        va = (if (i == 0) d else va + d)
      }
      haveVa = false
      if (!haveA || lastA != va) da += 1
      lastA = va; haveA = true; i += 1
    }
    while (j < nb) {
      if (!haveVb) {
        val d = readVarint(b, pb); pb += varintLen(b, pb)
        vb = (if (j == 0) d else vb + d)
      }
      haveVb = false
      if (!haveB || lastB != vb) db += 1
      lastB = vb; haveB = true; j += 1
    }
    val union = da + db - isz
    if (union == 0) 0.0 else isz.toDouble / union
  }

  /** Distinct-intersection count of two packed sorted sets —
    * [[MinHashImpl.overlapSorted]] over the varint streams. */
  def overlapPacked(a: Array[Byte], b: Array[Byte]): Long = {
    val na = readVarint(a, 0).toInt; var pa = varintLen(a, 0)
    val nb = readVarint(b, 0).toInt; var pb = varintLen(b, 0)
    var i = 0; var j = 0
    var va = 0L; var vb = 0L
    var haveVa = false; var haveVb = false
    var isz = 0L
    var last = 0L; var have = false
    while (i < na && j < nb) {
      if (!haveVa) {
        val d = readVarint(a, pa); pa += varintLen(a, pa)
        va = (if (i == 0) d else va + d); haveVa = true
      }
      if (!haveVb) {
        val d = readVarint(b, pb); pb += varintLen(b, pb)
        vb = (if (j == 0) d else vb + d); haveVb = true
      }
      if (va == vb) {
        if (!have || last != va) isz += 1
        last = va; have = true
        i += 1; j += 1; haveVa = false; haveVb = false
      } else if (va < vb) { i += 1; haveVa = false }
      else { j += 1; haveVb = false }
    }
    isz
  }
}

/** array<long> (SORTED dense ids) → packed delta-varint binary. Runs
  * once per DOCUMENT on the build side, not per candidate. */
case class PackSorted(child: Expression) extends UnaryExpression with ArrayInputCheck {
  override def expectedElement: DataType = LongType
  override def dataType: DataType = BinaryType
  override def nullSafeEval(input: Any): Any =
    PackedSetImpl.pack(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PackedSetImpl.pack($c)")
  override protected def withNewChildInternal(newChild: Expression): PackSorted = copy(child = newChild)
  override def prettyName: String = "pack_sorted"
}

private[graft] trait BinaryPairInputCheck { self: BinaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${self.prettyName} expects two binary packed sets, got ${left.dataType}, ${right.dataType}")
}

/** (packed, packed) → exact set Jaccard, one codegen'd varint merge
  * pass ([[PackedSetImpl.jaccardPacked]]). */
case class PackedJaccard(left: Expression, right: Expression)
    extends BinaryExpression with BinaryPairInputCheck {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    PackedSetImpl.jaccardPacked(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.PackedSetImpl.jaccardPacked($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PackedJaccard = copy(l, r)
  override def prettyName: String = "packed_jaccard"
}

/** (packed, packed) → distinct-intersection count
  * ([[PackedSetImpl.overlapPacked]]). */
case class PackedOverlap(left: Expression, right: Expression)
    extends BinaryExpression with BinaryPairInputCheck {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    PackedSetImpl.overlapPacked(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.PackedSetImpl.overlapPacked($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PackedOverlap = copy(l, r)
  override def prettyName: String = "packed_overlap"
}

object PackedSetFns {
  def pack_sorted(c: Column): Column = ColumnBridge.column(PackSorted(ColumnBridge.expression(c)))
  def packed_jaccard(a: Column, b: Column): Column =
    ColumnBridge.column(PackedJaccard(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def packed_overlap(a: Column, b: Column): Column =
    ColumnBridge.column(PackedOverlap(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
