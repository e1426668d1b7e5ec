package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructField, StructType}

/** Top-k (id, score) pairs per group by (score DESC, id ASC) — the
  * native map-side-combining replacement for the
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC, id ASC)
  * <= k` shortlist windows on the similarity hot paths (round 20,
  * guide §2.3 "aggregate before you shuffle"): the window must
  * EXCHANGE AND SORT every scored candidate row (all n·cand pairs —
  * the dominant shuffle of the kNN builds at 262k vectors), while
  * this aggregate's partial buffers cap each partition's contribution
  * at k rows per group before the exchange.
  *
  * Result-identical to the window by construction: the comparator is
  * the same total order — score descending with
  * `java.lang.Double.compare` semantics (NaN greatest, exactly
  * Spark's sort order for DESC), ties broken by ascending id (the
  * callers' unique-sort-key convention) — and the evaluated array is
  * sorted best-first, so `posexplode` position + 1 IS the window's
  * row_number. Null scores are skipped (the callers' scored pairs are
  * non-null by construction; a window would sort them last).
  *
  * Returns array<struct<nb:bigint, sim:double>> sorted best-first.
  */
case class TopKBySim(
    idExpr: Expression,
    simExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Double)]] {

  require(k > 0, s"top_k_by_sim: k must be positive, got $k")

  override def children: Seq[Expression] = Seq(idExpr, simExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("nb", LongType, nullable = false),
      StructField("sim", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (idExpr.dataType, simExpr.dataType) match {
      case (LongType, DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (it, st) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"top_k_by_sim requires (bigint id, double score), got ${it.catalogString}, ${st.catalogString}")
    }

  // Max-heap on WORSENESS: the worst retained pair sits on top and is
  // evicted first. Worse = smaller sim (Double.compare: NaN greatest,
  // matching Spark's DESC sort), then larger id.
  private val ord: Ordering[(Long, Double)] = new Ordering[(Long, Double)] {
    def compare(a: (Long, Double), b: (Long, Double)): Int = {
      val c = java.lang.Double.compare(b._2, a._2)
      if (c != 0) c else java.lang.Long.compare(a._1, b._1)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Double)] =
    mutable.PriorityQueue.empty[(Long, Double)](ord)

  private def insert(buf: mutable.PriorityQueue[(Long, Double)],
      entry: (Long, Double)): Unit = {
    if (buf.size < k) buf.enqueue(entry)
    else if (ord.lt(entry, buf.head)) { buf.dequeue(); buf.enqueue(entry) }
  }

  override def update(buf: mutable.PriorityQueue[(Long, Double)],
      input: InternalRow): mutable.PriorityQueue[(Long, Double)] = {
    val idEval = idExpr.eval(input)
    val simEval = simExpr.eval(input)
    if (idEval != null && simEval != null)
      insert(buf, (idEval.asInstanceOf[Long], simEval.asInstanceOf[Double]))
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Long, Double)],
      other: mutable.PriorityQueue[(Long, Double)]): mutable.PriorityQueue[(Long, Double)] = {
    other.foreach(insert(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Double)]): Any =
    new GenericArrayData(buf.toArray.sorted(ord)
      .map { case (id, sim) => InternalRow(id, sim): AnyRef })

  override def serialize(buf: mutable.PriorityQueue[(Long, Double)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (id, sim) =>
      out.writeLong(id)
      out.writeDouble(sim)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Double)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val id = in.readLong()
      val sim = in.readDouble()
      insert(buf, (id, sim))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBySim =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKBySim =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKBySim =
    copy(idExpr = newChildren(0), simExpr = newChildren(1))
}

object TopKBySim {
  import org.apache.spark.sql.graft.shim

  /** Column API: top-k (id, score) structs per group by
    * (score DESC, id ASC), array sorted best-first. */
  def top_k_by_sim(id: Column, sim: Column, k: Int): Column =
    shim.column(TopKBySim(shim.expression(id), shim.expression(sim), k)
      .toAggregateExpression())
}
