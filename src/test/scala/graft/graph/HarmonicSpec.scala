package graft.graph

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HyperBall harmonic centrality vs driver-side BFS ground truth on
  * planted graphs — coupon-mode sketches are exact at this size, so
  * equality is EXACT (same 720720ths integer formula), including a
  * disconnected component (unreachable vertices contribute 0). */
class HarmonicSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val L = 720720L

  private def bfsHarmonicE6(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSet }
    val verts = adj.keySet
    verts.map { s =>
      var dist = Map(s -> 0)
      var frontier = Set(s)
      var d = 0
      while (frontier.nonEmpty) {
        d += 1
        frontier = frontier.flatMap(adj(_)).diff(dist.keySet)
        dist ++= frontier.map(_ -> d)
      }
      val h = dist.collect { case (v, dd) if v != s => L / dd }.sum
      s -> h * 1000000L / L
    }.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    GraphOps.harmonicApprox(spark, edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("path graph matches BFS harmonic exactly") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(run(edges) == bfsHarmonicE6(edges))
  }

  test("star plus disconnected pair: component boundaries respected") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (8L, 9L))
    val got = run(edges)
    val want = bfsHarmonicE6(edges)
    assert(got == want, s"got=$got want=$want")
    // The isolated pair only sees each other: harmonic = 1.
    assert(got(8L) == 1000000L && got(9L) == 1000000L)
  }
}
