package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** The dedup-threshold sweep's contract on real testdata: the curve
  * is monotone non-increasing in the threshold, the 0.5 point equals
  * minhashPairs' production count (same machinery, same filter
  * value), and the grid is the full 0..1.0 e4 spine. */
class ThresholdSweepSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("sweep is monotone, grid-complete, and agrees with minhashPairs at 0.5") {
    val rows = Dedup.thresholdSweep(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(_._1).toSeq == (0L to 10000L by 500L).toSeq)
    rows.sliding(2).foreach { case Array((ta, ca), (tb, cb)) =>
      assert(ca >= cb, s"non-monotone at $ta->$tb: $ca < $cb")
    }
    val at5000 = rows.toMap.apply(5000L)
    val prod = Dedup.minhashPairs(spark, sf).count()
    assert(at5000 == prod,
      s"sweep(0.5)=$at5000 != minhashPairs count $prod")
  }
}
