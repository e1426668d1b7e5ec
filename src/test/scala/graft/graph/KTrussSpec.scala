package graft.graph

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** k-truss semantics on planted graphs: clique survival, star
  * elimination (the truss-vs-core distinction), multi-round peel
  * cascades, and the convergence contract (one more support round is
  * a no-op on the returned subgraph).
  */
class KTrussSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("src", "dst")
  }

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("4-truss keeps the 4-clique, peels a pendant triangle and a star") {
    // 4-clique on 1-4 (every edge in 2 triangles), a triangle (5,6,7)
    // attached at 5 (each edge in 1 triangle), and a star at 10
    // (support-0 edges; high degree but no interlinked neighbors —
    // the case degree-based k-core cannot separate).
    val g = edges(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (5L, 7L), (6L, 7L),
      (10L, 11L), (10L, 12L), (10L, 13L), (10L, 14L))
    val t4 = collect(GraphOps.kTruss(spark, g, k = 4))
    assert(t4 == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    // 3-truss (support ≥ 1) keeps every triangle, still drops the star
    val t3 = collect(GraphOps.kTruss(spark, g, k = 3))
    assert(t3 == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (5L, 7L), (6L, 7L)))
  }

  test("triangle strip cascades to empty over multiple peel rounds") {
    // Strip of triangles (i, i+1, i+2) for i = 1..6: end edges have
    // support 1, interior support 2; at k = 4 the ends peel first and
    // the hole propagates inward — each round only removes the current
    // boundary, so a one-round peel would NOT reach the fixpoint.
    val strip = (1L to 6L).flatMap(i => Seq((i, i + 1), (i, i + 2))) :+ (7L -> 8L)
    val g = edges(strip: _*)
    assert(collect(GraphOps.kTruss(spark, g, k = 4)).isEmpty)
    // sanity: a single support round keeps the interior (non-empty)
    val afterOne = GraphOps.kTruss(spark, g, k = 4, rounds = 1)
    assert(collect(afterOne).nonEmpty)
  }

  test("returned subgraph is a fixpoint: one more support round is a no-op") {
    val e = GraphOps.decileTies(
      GraphBuilder.supplierCoEdges(spark, "/root/testdata/sf0.001"))
    val t = GraphOps.kTruss(spark, e, k = 4)
    val again = collect(GraphOps.kTruss(spark, t, k = 4, rounds = 1))
    assert(collect(t) == again)
  }
}
