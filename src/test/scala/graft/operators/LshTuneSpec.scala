package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** Independent recomputation contract for the analytic LSH tuning
  * table: every cell re-derived in plain Scala from the same
  * S-curve (Math.pow IS Spark's pow), plus the shape facts a
  * practitioner reads off the table — threshold s* falls as bands
  * multiply, the single-band scheme misses almost everything below
  * t, the all-rows scheme candidates almost everything.
  */
class LshTuneSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val brs = Seq((128, 1), (64, 2), (32, 4), (16, 8), (8, 16),
    (4, 32), (2, 64), (1, 128))

  private def p(b: Int, r: Int, s: Double): Double =
    1.0 - math.pow(1.0 - math.pow(s, r.toDouble), b.toDouble)

  test("lsh tune: every cell equals the plain-Scala recomputation") {
    val expected = brs.map { case (b, r) =>
      val pe6 = (0 to 20).map(i => math.round(p(b, r, i / 20.0) * 1e6))
      (b, r,
        math.round(math.pow(1.0 / b, 1.0 / r) * 1e6),
        pe6(10),
        pe6.take(10).sum,
        (10 to 20).map(i => 1000000L - pe6(i)).sum)
    }
    val got = Dedup.lshTune(spark, "unused").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSeq == expected.sortBy(-_._1))
  }

  test("lsh tune: the table reads like the textbook S-curve") {
    val got = Dedup.lshTune(spark, "unused").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    // s* strictly rises as rows deepen (bands shrink): the scheme's
    // effective bar moves from ~0 (128 bands of 1) toward 1.
    val stars = got.map(_._3)
    assert(stars == stars.sorted, s"s* not monotone: $stars")
    // 128 bands × 1 row candidates nearly everything (fp mass high,
    // fn ~0); 1 band × 128 rows the reverse.
    assert(got.head._5 > got.last._5, "fp mass must fall with rows")
    assert(got.head._6 < got.last._6, "fn mass must rise with rows")
  }
}
