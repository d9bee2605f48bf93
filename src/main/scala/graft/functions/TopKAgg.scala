package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Exact top-k values per group as a custom `TypedImperativeAggregate` —
  * the aggregate extension point (mutable out-of-codegen buffer, like
  * HLL/sketch aggregates).
  *
  * A bounded min-heap of size k per group replaces the window-function
  * formulation (`rank() <= k`), which must shuffle AND sort every row of
  * each group; this carries at most k doubles per partition-group through
  * the partial/final aggregation path — the difference between sorting
  * 100 TB and heap-sifting it.
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType && k > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"topk expects (double, k>0), got ${child.dataType}, $k")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeWith(other); buffer
  }

  /** Values sorted descending. */
  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(buffer.sortedDesc)

  override def serialize(buffer: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val vs = buffer.values
    out.writeInt(vs.length)
    vs.foreach(out.writeDouble)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new TopKBuffer(k)
    val n = in.readInt()
    var i = 0
    while (i < n) { b.add(in.readDouble()); i += 1 }
    b
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKAgg =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): TopKAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg = copy(inputAggBufferOffset = o)
  override def prettyName: String = "topk"
}

/** Bounded min-heap: keeps the k largest doubles seen. */
final class TopKBuffer(k: Int) {
  private val heap = new java.util.PriorityQueue[java.lang.Double](math.max(k, 1))

  def add(v: Double): Unit = {
    if (heap.size < k) heap.add(v)
    else if (heap.peek() < v) { heap.poll(); heap.add(v) }
  }

  def mergeWith(other: TopKBuffer): Unit = other.values.foreach(add)

  def values: Array[Double] = {
    val out = new Array[Double](heap.size)
    val it = heap.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  def sortedDesc: Array[Double] = values.sorted(Ordering[Double].reverse)
}

object TopKAgg {
  /** Aggregate column: top-k values of `c` per group, descending. */
  def topk(c: Column, k: Int): Column =
    ColumnBridge.column(TopKAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}
