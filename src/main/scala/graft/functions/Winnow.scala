package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03)
  * for exact shared-substring detection — the character-level dedup signal
  * of "Deduplicating Training Data Makes Language Models Better"
  * (Lee et al., 2022), re-expressed as one codegen'd O(n) pass per doc.
  *
  * Pipeline: K-char polynomial rolling hashes (base B, mod 2⁶⁴ via native
  * long wrap) → every window of W consecutive gram hashes selects its
  * minimum VALUE (monotone deque, O(n) total) → distinct selected values.
  *
  * Guarantee (winnowing theorem): two documents sharing any exact
  * substring of length ≥ K+W−1 share at least one fingerprint value —
  * the shared region contains a full window of identical gram hashes,
  * whose minimum is selected in both documents. Density is ~2/(W+1), so
  * the shuffle carries ~25% of the per-character gram volume.
  */
object WinnowImpl {
  val K = 16 // gram length (chars)
  val W = 8 // winnow window (grams); detection guarantee = K+W-1 = 23 chars
  val B = 257L // polynomial base

  /** B^j mod 2⁶⁴ (natural long wrap), j = 0..K-1. */
  val bpow: Array[Long] = {
    val a = new Array[Long](K)
    a(0) = 1L
    var j = 1
    while (j < K) { a(j) = a(j - 1) * B; j += 1 }
    a
  }

  /** Distinct winnowed fingerprint values of `text` (empty when the doc
    * has fewer than W grams, i.e. length < K+W-1). Hash values compare as
    * SIGNED longs — the SQL oracle twin converts its HUGEINT mod-2⁶⁴
    * values to signed BIGINT before its window min for bit parity. */
  def fingerprints(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length
    val m = n - K + 1
    if (m < W) return new GenericArrayData(Array.emptyLongArray)
    val hs = new Array[Long](m)
    var h = 0L
    var j = 0
    while (j < K) { h = h * B + s.charAt(j); j += 1 }
    hs(0) = h
    var i = 1
    while (i < m) {
      h = (h - s.charAt(i - 1) * bpow(K - 1)) * B + s.charAt(i + K - 1)
      hs(i) = h
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new java.util.ArrayDeque[Int]()
    i = 0
    while (i < m) {
      while (!deque.isEmpty && deque.peekFirst() <= i - W) deque.pollFirst()
      while (!deque.isEmpty && hs(deque.peekLast()) >= hs(i)) deque.pollLast()
      deque.addLast(i)
      if (i >= W - 1) out.add(hs(deque.peekFirst()))
      i += 1
    }
    val arr = new Array[Long](out.size)
    val it = out.iterator()
    i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr)
  }
}

/** string → array<long> distinct winnowed fingerprints. */
case class WinnowFingerprints(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"winnow_fingerprints expects string, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    WinnowImpl.fingerprints(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowImpl.fingerprints($c)")
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
  override def prettyName: String = "winnow_fingerprints"
}

object WinnowFns {
  def winnow_fingerprints(c: Column): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(c)))
}
