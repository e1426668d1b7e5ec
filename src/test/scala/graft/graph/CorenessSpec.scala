package graft.graph

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** H-index coreness fixpoint: planted graphs with known core numbers,
  * plus the kCore-consistency audit on the real graph.
  */
class CorenessSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.coreness(spark,
        edges.map { case (a, b) => (a, b, 1.0) }.toDF("src", "dst", "weight"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangle with a tail: triangle vertices 2, tail 1") {
    assert(core(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
      == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("star: every vertex coreness 1") {
    assert(core(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L)))
      .values.toSet == Set(1L))
  }

  test("complete K5: all coreness 4") {
    val e = for (a <- 0L until 5L; b <- (a + 1) until 5L) yield (a, b)
    assert(core(e).values.toSet == Set(4L))
  }

  test("two cliques joined by one edge keep their own core numbers") {
    // K4 {0..3} and triangle {10,11,12}, bridge 3-10
    val k4 = for (a <- 0L until 4L; b <- (a + 1) until 4L) yield (a, b)
    val tri = Seq((10L, 11L), (11L, 12L), (10L, 12L))
    val got = core(k4 ++ tri ++ Seq((3L, 10L)))
    assert((0L until 4L).forall(got(_) == 3L))
    assert(Seq(10L, 11L, 12L).forall(got(_) == 2L))
  }

  test("real-graph audit: {coreness >= k} equals kCore(k)'s vertex set") {
    val edges = GraphBuilder.supplierCoEdges(spark, "/root/testdata/sf0.001")
    val cn = GraphOps.coreness(spark, edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val k = 10
    val fromCoreness = cn.filter(_._2 >= k).map(_._1).toSet
    val fromKcore = GraphOps.kCore(spark, edges, k).collect()
      .map(_.getLong(0)).toSet
    assert(fromCoreness == fromKcore)
  }
}
