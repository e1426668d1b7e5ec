package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** The Poisson-bootstrap CI's contract: hash-derived weights make the
  * whole readout deterministic (bit-identical under repartitioning),
  * constant data degenerates to a zero-width interval at the exact
  * value, and on varied data the interval brackets the point
  * estimate with lo < hi. */
class BootstrapSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("constant data gives a zero-width CI at the exact mean") {
    import spark.implicits._
    val o = (1L to 500L).map(k => (k, 700L)).toDF("o_orderkey", "cents")
    val r = Relational.bootstrapCiOf(o, reps = 100).collect().head
    assert(r.getLong(0) == 500L)
    assert(r.getLong(2) == 700L) // point mean
    assert(r.getLong(3) == 700L && r.getLong(4) == 700L)
  }

  test("varied data: CI brackets the point estimate, lo < hi") {
    import spark.implicits._
    val o = (1L to 2000L).map(k => (k, 100L + (k * 37L) % 900L))
      .toDF("o_orderkey", "cents")
    val r = Relational.bootstrapCiOf(o, reps = 200).collect().head
    val (mean, lo, hi) = (r.getLong(2), r.getLong(3), r.getLong(4))
    assert(lo < hi, s"lo=$lo hi=$hi")
    assert(lo <= mean && mean <= hi, s"mean=$mean not in [$lo, $hi]")
  }

  test("bit-identical under any partitioning") {
    import spark.implicits._
    val base = (1L to 1000L).map(k => (k, (k * 13L) % 500L))
    val a = Relational.bootstrapCiOf(
      base.toDF("o_orderkey", "cents").repartition(3), 150)
      .collect().head.toSeq
    val b = Relational.bootstrapCiOf(
      base.toDF("o_orderkey", "cents").repartition(11), 150)
      .collect().head.toSeq
    assert(a == b)
  }
}
