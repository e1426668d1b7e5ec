package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bottom-k-by-key aggregate: keeps the `k` (key, value) pairs with
  * the smallest keys per group — a native `TypedImperativeAggregate`
  * with map-side combine, so every partition contributes at most `k`
  * rows to the shuffle regardless of group size.
  *
  * With `key = md5(value || salt)` this is a deterministic,
  * order-independent, MERGEABLE fixed-size uniform sample per group
  * (a bottom-k sketch): the declarative alternative — a row_number
  * window over the hash — must shuffle EVERY row to sort it, which
  * is exactly the per-group-sampling bottleneck at 100 TB. Ties on
  * key break by value, so results are exactly reproducible and
  * SQL-oracle-checkable.
  *
  * Returns the selected values as array<bigint> sorted ascending.
  */
case class BottomKByKey(
    keyExpr: Expression,
    valueExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(String, Long)]] {

  require(k > 0, s"bottom_k_by_key: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(keyExpr, valueExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (keyExpr.dataType, valueExpr.dataType) match {
      case (StringType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (kt, vt) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bottom_k_by_key requires (string key, bigint value), got ${kt.catalogString}, ${vt.catalogString}")
    }

  // Max-heap on (key, value): the LARGEST retained pair sits on top
  // and is evicted first, keeping the k smallest.
  private val ord: Ordering[(String, Long)] = Ordering.Tuple2[String, Long]

  override def createAggregationBuffer(): mutable.PriorityQueue[(String, Long)] =
    mutable.PriorityQueue.empty[(String, Long)](ord)

  private def insert(buf: mutable.PriorityQueue[(String, Long)],
      entry: (String, Long)): Unit = {
    if (buf.size < k) buf.enqueue(entry)
    else if (ord.lt(entry, buf.head)) { buf.dequeue(); buf.enqueue(entry) }
  }

  override def update(buf: mutable.PriorityQueue[(String, Long)],
      input: InternalRow): mutable.PriorityQueue[(String, Long)] = {
    val kEval = keyExpr.eval(input)
    val vEval = valueExpr.eval(input)
    if (kEval != null && vEval != null)
      insert(buf, (kEval.asInstanceOf[UTF8String].toString, vEval.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(String, Long)],
      other: mutable.PriorityQueue[(String, Long)]): mutable.PriorityQueue[(String, Long)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(String, Long)]): Any =
    new GenericArrayData(buf.toArray.map(_._2).sorted)

  override def serialize(buf: mutable.PriorityQueue[(String, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, value) =>
      val kb = key.getBytes("UTF-8")
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(value)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(String, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      val v = in.readLong()
      insert(buf, (new String(kb, "UTF-8"), v))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKByKey =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKByKey =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKByKey =
    copy(keyExpr = newChildren(0), valueExpr = newChildren(1))
}

object BottomK {
  import org.apache.spark.sql.graft.shim

  /** Column API: bottom-k values by smallest key per group. */
  def bottom_k_by_key(key: Column, value: Column, k: Int): Column =
    shim.column(BottomKByKey(shim.expression(key), shim.expression(value), k)
      .toAggregateExpression())
}
