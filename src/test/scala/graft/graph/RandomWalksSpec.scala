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

  test("node2vec with equal weights IS the uniform walk") {
    // The weighted-interval pick degenerates to the rank pick when all
    // classes weigh 1 — one semantics, two parameterizations.
    val g = edges((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (2L, 4L))
    val uni = GraphOps.randomWalks(spark, g, steps = 4).collect()
      .map(_.toString).sorted.toSeq
    val n2v = GraphOps.node2vecWalks(spark, g, steps = 4,
      wReturn = 1, wCommon = 1, wOut = 1).collect()
      .map(_.toString).sorted.toSeq
    assert(uni == n2v)
  }

  test("node2vec zero-weight classes force the walk deterministically") {
    // Only the return class has mass -> the walk must oscillate:
    // v_t == v_{t-2} for every t >= 2, regardless of the hash draws.
    val path = edges((1L, 2L), (2L, 3L), (3L, 4L))
    val osc = GraphOps.node2vecWalks(spark, path, steps = 5,
      wReturn = 1, wCommon = 0, wOut = 0).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    osc.groupBy(_._1).values.foreach { w =>
      val p = w.sortBy(_._2).map(_._3)
      assert(p.length == 6)
      (2 until p.length).foreach(t => assert(p(t) == p(t - 2), p.mkString("→")))
    }
    // Only the distance-1 class has mass on a triangle -> never
    // return, always close: the walk cycles through all three
    // vertices (period 3), from every start.
    val tri = edges((1L, 2L), (2L, 3L), (1L, 3L))
    val cyc = GraphOps.node2vecWalks(spark, tri, steps = 6,
      wReturn = 0, wCommon = 1, wOut = 0).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    cyc.groupBy(_._1).values.foreach { w =>
      val p = w.sortBy(_._2).map(_._3)
      assert(p.length == 7)
      (2 until p.length).foreach { t =>
        assert(p(t) != p(t - 1) && p(t) != p(t - 2), p.mkString("→"))
      }
    }
  }

  test("node2vec with no candidate mass terminates the walk") {
    // Single edge: from the far end every candidate is the return
    // vertex; with wReturn=0 the interval is empty and the walk dies
    // after step 1 instead of emitting an invalid hop.
    val g = edges((1L, 2L))
    val rows = GraphOps.node2vecWalks(spark, g, steps = 3,
      wReturn = 0, wCommon = 0, wOut = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // steps 0 and 1 exist for both walks; steps 2+ are gone
    assert(rows.count(_._2 == 0) == 2 && rows.count(_._2 == 1) == 2)
    assert(rows.forall(_._2 <= 1))
  }
}
