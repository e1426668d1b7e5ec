package graft.graph

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftGraphSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("facade wires every operator over one canonical edge set") {
    val raw = Seq((1L, 2L), (2L, 1L), (2L, 3L), (4L, 5L))
      .toDF("src", "dst")
    val g = GraftGraph(spark, raw, weightCol = None)
    assert(g.edges.count() == 3) // (1,2) merged
    assert(g.degrees().count() == 5)
    assert(g.triangleCount().collect()(0).getLong(0) == 0L)
    val cc = g.connectedComponents().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cc(4L) == cc(5L) && cc(1L) != cc(4L))
    assert(g.louvain().count() == 5)
    assert(g.pageRank().count() == 5)
  }

  test("louvain recovers 50 planted cliques in a 250-vertex ring") {
    // 50 cliques of 5, ring-linked by single weak edges — planted
    // community structure at a size where multi-level compression
    // actually engages.
    val k = 50
    val size = 5
    val cliques = (0 until k).flatMap { c =>
      val base = c * size
      for (i <- 0 until size; j <- i + 1 until size)
        yield (base + i.toLong, base + j.toLong)
    }
    val ring = (0 until k).map { c =>
      ((c * size + size - 1).toLong, (((c + 1) % k) * size).toLong)
    }
    val edges = (cliques ++ ring).map { case (a, b) => (a, b, 1.0) }
      .toDF("src", "dst", "weight")
    val g = GraftGraph(spark, edges)
    val comm = g.louvain().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // every planted clique must be assigned a single community
    (0 until k).foreach { c =>
      val ids = (0 until size).map(i => comm((c * size + i).toLong)).toSet
      assert(ids.size == 1, s"clique $c split across $ids")
    }
    val levels = g.louvainLevels().collect()
    val finalQ = levels.map(_.getLong(1)).max / 1e6
    // ideal partition Q for ring-of-cliques ≈ 1 - 1/k - m_inter/m; loose floor:
    assert(finalQ > 0.8, s"modularity $finalQ too low: $levels")
  }
}
