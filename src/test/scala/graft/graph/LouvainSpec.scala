package graft.graph

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

class LouvainSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  /** Unweighted undirected graph from pairs. */
  private def graphOf(pairs: Seq[(Long, Long)]): Graph[Double, Double] = {
    val sc = spark.sparkContext
    Graph.fromEdges(sc.parallelize(pairs.map { case (a, b) => Edge(a, b, 1.0) }), 0.0)
  }

  /** Brute-force modularity by definition:
    * Q = (1/2m) Σ_ij [A_ij − k_i k_j / 2m] δ(c_i, c_j). */
  private def bruteQ(pairs: Seq[(Long, Long)], comm: Map[Long, Long]): Double = {
    val verts = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val w = scala.collection.mutable.Map[(Long, Long), Double]().withDefaultValue(0.0)
    pairs.foreach { case (a, b) => w((a, b)) += 1.0; w((b, a)) += 1.0 }
    val k = verts.map(v => v -> verts.map(u => w((v, u))).sum).toMap
    val m2 = k.values.sum
    val terms = for (i <- verts; j <- verts if comm(i) == comm(j))
      yield w((i, j)) - k(i) * k(j) / m2
    terms.sum / m2
  }

  // Two K4 cliques bridged by a single edge.
  private val twoCliques: Seq[(Long, Long)] =
    Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L), (11L, 13L), (12L, 13L),
      (3L, 10L))

  test("louvain separates two bridged cliques") {
    val (assignment, levels) = Louvain.run(graphOf(twoCliques))
    val comm = assignment.collect().toMap
    val c1 = Set(0L, 1L, 2L, 3L).map(comm)
    val c2 = Set(10L, 11L, 12L, 13L).map(comm)
    assert(c1.size == 1, s"clique 1 split: $comm")
    assert(c2.size == 1, s"clique 2 split: $comm")
    assert(c1 != c2, s"cliques merged: $comm")
    assert(levels.nonEmpty)
    val got = levels.last.modularity
    val expected = bruteQ(twoCliques, comm)
    assert(math.abs(got - expected) < 1e-9,
      s"engine Q=$got, brute-force Q=$expected")
    assert(got > 0.3, s"Q too low: $got")
  }

  test("louvain on weighted ring of cliques improves modularity per level") {
    // 4 triangles connected in a ring by weak edges.
    val cliques = (0 until 4).flatMap { c =>
      val base = c * 3L
      Seq((base, base + 1), (base, base + 2), (base + 1, base + 2))
    }
    val ring = (0 until 4).map(c => (c * 3L + 2, ((c + 1) % 4) * 3L))
    val (assignment, levels) = Louvain.run(graphOf(cliques ++ ring))
    val comm = assignment.collect().toMap
    // each triangle ends up in one community
    (0 until 4).foreach { c =>
      val base = c * 3L
      assert(Set(base, base + 1, base + 2).map(comm).size == 1,
        s"triangle $c split: $comm")
    }
    assert(levels.map(_.modularity) == levels.map(_.modularity).sorted,
      s"modularity not monotone: $levels")
    val expected = bruteQ(cliques ++ ring, comm)
    assert(math.abs(levels.last.modularity - expected) < 1e-9)
  }

  test("louvain handles isolated vertices and singleton graph") {
    val g = graphOf(Seq((1L, 2L)))
    val (assignment, levels) = Louvain.run(g)
    val comm = assignment.collect().toMap
    assert(comm(1L) == comm(2L))
    assert(levels.nonEmpty)
  }

  test("modularity of the known two-clique partition matches brute force") {
    val g = graphOf(twoCliques)
    val partition = Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      10L -> 1L, 11L -> 1L, 12L -> 1L, 13L -> 1L)
    // build a LouvainState graph representing this fixed partition
    val init = g.aggregateMessages[Double](
      ctx => { ctx.sendToSrc(ctx.attr); ctx.sendToDst(ctx.attr) }, _ + _)
    val stateGraph = g.outerJoinVertices(init) { (id, _, wOpt) =>
      val w = wOpt.getOrElse(0.0)
      LouvainState(partition(id), 0.0, 0.0, w, changed = false)
    }
    val m2 = stateGraph.vertices.map { case (_, st) => st.nodeWeight }.sum()
    val got = Louvain.modularity(stateGraph, m2)
    val expected = bruteQ(twoCliques, partition)
    assert(math.abs(got - expected) < 1e-9, s"got $got expected $expected")
  }
}
