package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (CDC) boundaries — the rolling-hash split
  * rule behind dedup storage (LBFS/rsync lineage: chunk where the local
  * content hash matches a mask, so an insertion early in a blob shifts
  * at most one chunk boundary instead of re-aligning every fixed-size
  * block). Shares [[WinnowImpl]]'s K=16 polynomial gram hash (mod 2⁶⁴
  * via native long wrap); a position starts a new chunk when the gram
  * hash's low 6 bits are zero → expected chunk length 64 bytes.
  *
  * One codegen'd O(n) pass per blob returning the boundary offsets;
  * chunk extraction/hashing composes declaratively on top (substr +
  * md5), so everything downstream of this expression stays in
  * whole-stage codegen.
  */
object CdcImpl {
  val K: Int = WinnowImpl.K
  val B: Long = WinnowImpl.B
  val Mask: Long = 63L

  /** 0-based chunk-start offsets (excluding 0 — the first chunk always
    * starts there). Blobs shorter than K+1 chars have no boundaries. */
  def boundaries(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length
    val m = n - K + 1
    if (m <= 1) return new GenericArrayData(Array.emptyIntArray)
    var buf = new Array[Int](8)
    var cnt = 0
    var h = 0L
    var j = 0
    while (j < K) { h = h * B + s.charAt(j); j += 1 }
    var i = 1
    while (i < m) {
      h = (h - s.charAt(i - 1) * WinnowImpl.bpow(K - 1)) * B + s.charAt(i + K - 1)
      if ((h & Mask) == 0L) {
        if (cnt == buf.length) buf = java.util.Arrays.copyOf(buf, cnt * 2)
        buf(cnt) = i
        cnt += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, cnt))
  }
}

/** string → array<int> of CDC chunk-start offsets. */
case class CdcBoundaries(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"cdc_boundaries expects string, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    CdcImpl.boundaries(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcImpl.boundaries($c)")
  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
  override def prettyName: String = "cdc_boundaries"
}

object CdcFns {
  def cdc_boundaries(c: Column): Column =
    ColumnBridge.column(CdcBoundaries(ColumnBridge.expression(c)))
}
