package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.DecimalType
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

  test("no query emits a decimal column (SURVEY §6 emitted-type rule)") {
    val dir = "/root/testdata/sf0.001"
    val offenders = scala.collection.mutable.ArrayBuffer.empty[String]
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val schema = fn(spark, dir).schema
        schema.fields.foreach { f =>
          if (f.dataType.isInstanceOf[DecimalType])
            offenders += s"$name.${f.name}: ${f.dataType.simpleString}"
        }
      } catch {
        // A query that cannot even build at sf0.001 is a separate
        // failure class — report it rather than skipping silently.
        case e: Throwable => failures += s"$name: ${e.getClass.getSimpleName}"
      }
    }
    assert(failures.isEmpty, s"queries failed to build at sf0.001: $failures")
    assert(offenders.isEmpty,
      s"emitted decimal columns (driver hash-unstable): $offenders — " +
        "keep the wide ledger internal and emit a bounded BIGINT readout")
  }
}
