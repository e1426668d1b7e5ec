package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Native merge-intersect over sorted adjacency arrays — the
  * dense-graph fast path for neighborhood statistics (Adamic–Adar).
  *
  * Inputs: `ka`/`va` are parallel arrays (one vertex's neighbor ids
  * ascending + a value per neighbor, e.g. its e4 Adamic–Adar term)
  * and `kb` is another vertex's ascending neighbor-id array. Output:
  * struct(common, vsum) = |ka ∩ kb| and Σ va over the intersection.
  *
  * A builtin composition (`array_intersect` + `aggregate` over a
  * lookup) evaluates an interpreted lambda per element — the round-1
  * lesson (SURVEY §8) that cost two orders of magnitude on MinHash.
  * One native two-pointer loop per pair keeps the per-candidate cost
  * at ~(deg_a + deg_b) long comparisons with zero allocation. */
case class SortedKvIntersectStats(ka: Expression, va: Expression, kb: Expression)
    extends TernaryExpression with CodegenFallback {
  override def first: Expression = ka
  override def second: Expression = va
  override def third: Expression = kb

  override def dataType: DataType = StructType(Seq(
    StructField("common", LongType, nullable = false),
    StructField("vsum", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (ka.dataType, va.dataType, kb.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "sorted_kv_intersect_stats requires three array<bigint> inputs, got " +
          s"${a.catalogString} / ${b.catalogString} / ${c.catalogString}")
    }

  override def nullSafeEval(kaAny: Any, vaAny: Any, kbAny: Any): Any = {
    val a = kaAny.asInstanceOf[ArrayData]
    val v = vaAny.asInstanceOf[ArrayData]
    val b = kbAny.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), v.numElements())
    val m = b.numElements()
    var i = 0; var j = 0
    var common = 0L; var vsum = 0L
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { common += 1L; vsum += v.getLong(i); i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](common, vsum)): InternalRow
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SortedKvIntersectStats =
    copy(ka = f, va = s, kb = t)
}

object CatalystGraph {
  import org.apache.spark.sql.graft.shim
  def sorted_kv_intersect_stats(ka: Column, va: Column, kb: Column): Column =
    shim.column(SortedKvIntersectStats(
      shim.expression(ka), shim.expression(va), shim.expression(kb)))
}
