package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Membership probe against a driver-built Bloom filter
  * (`org.apache.spark.util.sketch.BloomFilter`, the same sketch
  * `DataFrame.stat.bloomFilter` builds): `true` = might contain
  * (false positives at the configured fpp), `false` = DEFINITELY
  * absent — the one-sided guarantee incremental dedup rides. The
  * serialized filter travels once per task via the codegen reference
  * object (the broadcast-literal class, like the PQ codebooks); the
  * probe itself is two xxhash128 passes over the value's UTF-8
  * bytes — no string materialization, no shuffle, scan-side.
  *
  * Equality with the builder's `putString` path is spec-pinned
  * (put/probe both hash raw UTF-8 bytes; BloomDedupSpec).
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain requires a string column, got ${other.catalogString}")
    }

  @transient private lazy val bloom: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[org.apache.spark.util.sketch.BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}

object BloomMightContain {
  import org.apache.spark.sql.graft.shim
  def apply(c: Column, bloom: org.apache.spark.util.sketch.BloomFilter): Column = {
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    shim.column(BloomMightContain(shim.expression(c), bos.toByteArray))
  }
}
