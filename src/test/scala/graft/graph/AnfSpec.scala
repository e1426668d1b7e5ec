package graft.graph

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** HyperANF neighborhood function: on graphs whose ball sizes stay
  * inside DataSketches HLL's exact (coupon) regime, the estimates ARE
  * exact, so the spec pins exact equality with hand-computed BFS
  * neighborhood functions — not a tolerance band.
  */
class AnfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def anfRows(pairs: (Long, Long)*): Seq[(Int, Long, Int)] =
    GraphOps.anf(spark, pairs.map(p => (p._1, p._2, 1.0)).toDF("src", "dst", "weight"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2)))
      .sortBy(_._1).toSeq

  test("path P4: neighborhood function grows to n^2 at the diameter") {
    // balls: r=0 → 4; r=1 → 2+3+3+2 = 10; r=2 → 3+4+4+3 = 14; r=3 → 16
    val rows = anfRows((1L, 2L), (2L, 3L), (3L, 4L))
    assert(rows.map(r => (r._1, r._2)) == Seq((0, 4L), (1, 10L), (2, 14L), (3, 16L)))
    // 0.9 * 16 = 14.4 → first round reaching it is the true diameter 3
    assert(rows.forall(_._3 == 3))
  }

  test("star: one hub hop closes every ball at r=2") {
    // r=0 → 5; r=1 → center 5 + four leaves at 2 = 13; r=2 → 25
    val rows = anfRows((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    assert(rows.map(r => (r._1, r._2)) == Seq((0, 5L), (1, 13L), (2, 25L)))
    assert(rows.forall(_._3 == 2))
  }

  test("disconnected components stop at the per-component fixpoint") {
    // two disjoint edges: r=0 → 4; r=1 → 8; never reaches 16
    val rows = anfRows((1L, 2L), (3L, 4L))
    assert(rows.map(r => (r._1, r._2)) == Seq((0, 4L), (1, 8L)))
    assert(rows.forall(_._3 == 1))
  }

  test("isolated self-fixpoint: single edge converges in one round") {
    val rows = anfRows((7L, 9L))
    assert(rows.map(r => (r._1, r._2)) == Seq((0, 2L), (1, 4L)))
  }
}
