package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** The linear-probe contract: planted exactly-linear labels are
  * recovered (R² ≈ 1, the true dims lead, per-unit weights match the
  * planted coefficients), and the integer sufficient statistics make
  * the whole readout bit-identical under any partitioning. */
class LinearProbeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  // 1000 rows, entries in multiples of 1/256 (exact under e16
  // quantization); y = 768·x₁ − 512·x₇ + 5, an exact integer.
  private lazy val planted = {
    import spark.implicits._
    (0 until 1000).map { id =>
      val x = Array.tabulate(Similarity.EmbeddingDim) { i =>
        ((((id * 31 + i * 17) % 512) - 256).toFloat / 256.0f)
      }
      val y = math.round(768.0 * x(1) - 512.0 * x(7) + 5.0)
      (x.toSeq, y)
    }.toDF("embedding", "y")
  }

  test("recovers a planted exact linear relation") {
    val row = Similarity.linearProbeOf(spark, planted).collect().head
    assert(row.getLong(0) == 1000L)
    assert(row.getLong(2) >= 999990L, s"r2_e6=${row.getLong(2)}")
    val dims = row.getString(3).split(",").take(2).toSeq
    assert(dims == Seq("1", "7"), s"top_dims=${row.getString(3)}")
    val ws = row.getString(4).split(",").take(2).map(_.toLong)
    assert(math.abs(ws(0) - 7680000L) <= 200L, s"w1=${ws(0)}")
    assert(math.abs(ws(1) + 5120000L) <= 200L, s"w7=${ws(1)}")
  }

  test("bit-identical under any partitioning") {
    val a = Similarity.linearProbeOf(spark, planted.repartition(3))
      .collect().head.toSeq
    val b = Similarity.linearProbeOf(spark, planted.repartition(7))
      .collect().head.toSeq
    assert(a == b)
  }
}
