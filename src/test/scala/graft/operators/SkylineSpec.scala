package graft.operators

import java.sql.Date
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** Skyline: planted dominance geometry plus the independent O(n²)
  * brute-force equivalence the oracle can't afford at sf0.1.
  */
class SkylineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  test("planted geometry: ties survive, dominated points drop") {
    val rows = Seq(
      (1L, 10.0, d("2024-01-05")), // skyline (cheapest)
      (2L, 10.0, d("2024-01-05")), // identical twin: neither dominates
      (3L, 10.0, d("2024-01-07")), // same price, later date: dominated by 1
      (4L, 20.0, d("2024-01-02")), // pricier but earlier: skyline
      (5L, 20.0, d("2024-01-05")), // dominated by 1 (cheaper, same date)
      (6L, 30.0, d("2024-01-01")), // earliest: skyline
      (7L, 40.0, d("2024-01-03"))  // dominated by 4 and 6
    ).toDF("k", "price", "date")
    val got = Relational.skylineOf(rows).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L, 4L, 6L))
  }

  test("matches the O(n²) NOT-EXISTS definition on real orders at sf0.001") {
    import org.apache.spark.sql.functions._
    val o = graft.Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate"))
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getAs[java.time.LocalDateTime](2)))
    val brute = o.filter { case (_, pq, dq) =>
      !o.exists { case (_, pp, dp) =>
        pp <= pq && !dp.isAfter(dq) && (pp < pq || dp.isBefore(dq))
      }
    }.map(_._1).sorted.toSeq
    val got = Relational.qSkyline(spark, "/root/testdata/sf0.001")
      .collect().map(_.getLong(0)).toSeq
    assert(got == brute, s"windowed ${got.length} vs brute ${brute.length}")
  }
}
