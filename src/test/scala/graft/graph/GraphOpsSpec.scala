package graft.graph

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraphOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def edgesDf(pairs: (Long, Long, Double)*) =
    pairs.toDF("src", "dst", "weight")

  test("degrees on a path graph") {
    val e = edgesDf((1L, 2L, 1.0), (2L, 3L, 2.0))
    val d = GraphOps.degrees(e).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(d.toSeq == Seq((1L, 1L, 1.0), (2L, 2L, 3.0), (3L, 1L, 2.0)))
  }

  test("triangle count: K4 has 4 triangles") {
    val k4 = edgesDf((0L, 1L, 1.0), (0L, 2L, 1.0), (0L, 3L, 1.0),
      (1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0))
    assert(GraphOps.triangleCount(k4).collect()(0).getLong(0) == 4L)
  }

  test("triangle count: bridged cliques have 8 triangles") {
    val g = edgesDf((0L, 1L, 1.0), (0L, 2L, 1.0), (0L, 3L, 1.0),
      (1L, 2L, 1.0), (1L, 3L, 1.0), (2L, 3L, 1.0),
      (10L, 11L, 1.0), (10L, 12L, 1.0), (10L, 13L, 1.0),
      (11L, 12L, 1.0), (11L, 13L, 1.0), (12L, 13L, 1.0),
      (3L, 10L, 1.0))
    assert(GraphOps.triangleCount(g).collect()(0).getLong(0) == 8L)
  }

  test("connected components finds two components") {
    val e = edgesDf((1L, 2L, 1.0), (2L, 3L, 1.0), (10L, 11L, 1.0))
    val cc = GraphOps.connectedComponents(spark, e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cc(1L) == cc(2L) && cc(2L) == cc(3L))
    assert(cc(10L) == cc(11L))
    assert(cc(1L) != cc(10L))
  }

  test("pagerank: hub of a star ranks highest") {
    val star = edgesDf((0L, 1L, 1.0), (0L, 2L, 1.0), (0L, 3L, 1.0), (0L, 4L, 1.0))
    val pr = GraphOps.pageRank(spark, star).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pr(0L) > pr(1L))
    assert(pr(1L) == pr(2L) && pr(2L) == pr(3L) && pr(3L) == pr(4L))
  }

  test("label propagation groups a clique together") {
    val e = edgesDf((0L, 1L, 1.0), (0L, 2L, 1.0), (1L, 2L, 1.0))
    val lpa = GraphOps.labelPropagation(spark, e).collect()
    assert(lpa.length == 3)
  }

  test("canonicalEdges dedupes direction and sums weights") {
    val raw = Seq((2L, 1L, 1.0), (1L, 2L, 2.0), (3L, 3L, 9.0), (1L, 3L, 1.0))
      .toDF("a", "b", "w")
    val canon = GraphBuilder.canonicalEdges(raw, "a", "b", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._2))
    assert(canon.toSeq == Seq((1L, 2L, 3.0), (1L, 3L, 1.0)))
  }
}
