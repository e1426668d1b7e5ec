package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, DecimalType, FloatType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** The SURVEY §6 emitted-type hash-stability rule, pinned for every
  * query: intermediates may ride DECIMAL(38,0), but an EMITTED
  * decimal column is a driver hash-fail even when every value
  * matches (the round-14 e_drift/q_ks_test/q_mann_whitney incident —
  * compare.py normalizes DECIMAL vs HUGEINT, the driver's hasher
  * does not, so the regression is invisible to every local gate
  * except a schema scan). This spec IS that schema scan, run at
  * sf0.001 so the whole suite stays cheap: building each query's
  * DataFrame is enough to resolve its output schema.
  */
class EmittedTypesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.graph.SparkTestSession.spark

  // The full §6 hash-unstable list (round 16 — the round-15 sweep
  // banned only decimals):
  //  - DECIMAL: the driver hasher does not normalize DECIMAL(38,0)
  //    vs DuckDB HUGEINT (the round-14 incident);
  //  - FLOAT: single-precision round-trips differently through the
  //    two engines' value formatting (DOUBLE is allowed only under
  //    the identical-expression-tree rule);
  //  - TIMESTAMP (non-NTZ): hashes through the SESSION timezone —
  //    stable today only because every builder pins UTC, which is
  //    one forgotten conf away from a silent full-suite hash drift
  //    (TIMESTAMP_NTZ and DATE carry no zone and stay allowed).
  // Nested types are scanned recursively — an array<float> is as
  // unstable as a float.
  private def banned(dt: DataType): Option[String] = dt match {
    case _: DecimalType => Some("decimal")
    case FloatType => Some("float")
    case TimestampType => Some("timestamp(ltz)")
    case t: org.apache.spark.sql.types.ArrayType => banned(t.elementType)
    case t: org.apache.spark.sql.types.MapType =>
      banned(t.keyType).orElse(banned(t.valueType))
    case t: org.apache.spark.sql.types.StructType =>
      t.fields.iterator.flatMap(f => banned(f.dataType)).nextOption()
    case _ => None
  }

  test("no query emits a hash-unstable column type (SURVEY §6 emitted-type rule)") {
    val dir = "/root/testdata/sf0.001"
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val schema = fn(spark, dir).schema
        schema.fields.foreach { f =>
          banned(f.dataType).foreach(why =>
            offenders += s"$name.${f.name}: ${f.dataType.simpleString} ($why)")
        }
      } catch {
        // A query that cannot even build at sf0.001 is a separate
        // failure class — report it rather than skipping silently.
        case e: Throwable => failures += s"$name: ${e.getClass.getSimpleName}"
      }
    }
    assert(failures.isEmpty, s"queries failed to build at sf0.001: $failures")
    assert(offenders.isEmpty,
      s"emitted hash-unstable columns: $offenders — keep wide/zoned/" +
        "single-precision ledgers internal; emit BIGINT, e-scaled " +
        "integers, strings, identical-tree doubles, NTZ or DATE")
  }
}
