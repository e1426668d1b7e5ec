package graft.graph

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic-walk contracts: every hop follows a real edge, walk
  * shape is exact (one walk per vertex, steps+1 positions), forced
  * hops are taken (degree-1 vertices), and the whole corpus is
  * bit-identical across runs and repartitionings.
  */
class RandomWalksSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.map { case (a, b) => (a, b, 1.0) }.toDF("src", "dst", "weight")
  }

  test("walks follow edges, have exact shape, and take forced hops") {
    // path 1—2—3 plus spur 3—4: vertices 1 and 4 have one neighbor.
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L))
    val rows = GraphOps.randomWalks(spark, g, steps = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // 4 walks × 4 positions
    assert(rows.length == 16)
    assert(rows.groupBy(_._1).forall(_._2.map(_._2).sorted.toSeq == Seq(0, 1, 2, 3)))
    // step 0 is the start vertex
    assert(rows.filter(_._2 == 0).forall(r => r._1 == r._3))
    // every consecutive hop is an edge of the symmetrized graph
    val adj = Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L))
    rows.groupBy(_._1).values.foreach { w =>
      val path = w.sortBy(_._2).map(_._3)
      path.sliding(2).foreach { case Array(a, b) =>
        assert(adj.contains((a, b)), s"hop $a→$b is not an edge")
      }
    }
    // degree-1 starts are forced onto their only neighbor
    assert(rows.find(r => r._1 == 1L && r._2 == 1).get._3 == 2L)
    assert(rows.find(r => r._1 == 4L && r._2 == 1).get._3 == 3L)
  }

  test("walk corpus is deterministic across runs and partitionings") {
    val g = GraphBuilder.supplierCoEdges(spark, "/root/testdata/sf0.001")
    val a = GraphOps.randomWalks(spark, g).collect().map(_.toString).toSeq
    val b = GraphOps.randomWalks(spark, g.repartition(7)).collect()
      .map(_.toString).toSeq
    assert(a.nonEmpty && a == b)
  }
}
