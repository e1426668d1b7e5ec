package graft.graph

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-community conductance: planted graphs with hand-computed cuts
  * and volumes, plus a real-graph range audit over Louvain labels.
  */
class ConductanceSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("two triangles joined by a bridge: phi = cut/min(vol, 2m-vol) exactly") {
    // triangles {1,2,3} and {4,5,6}, unit weights, bridge 3-4
    val edges = Seq(
      (1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 1.0),
      (4L, 5L, 1.0), (5L, 6L, 1.0), (4L, 6L, 1.0),
      (3L, 4L, 1.0)).toDF("src", "dst", "weight")
    val assign = Seq((1L, 0L), (2L, 0L), (3L, 0L),
      (4L, 1L), (5L, 1L), (6L, 1L)).toDF("vertex", "label")
    val out = GraphOps.conductanceOf(edges, assign)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    // vol(C) = 2+2+3 = 7 each, 2m = 14, cut = 1 both sides
    // phi_e6 = 1000000 div 7 = 142857 (integral divide truncates)
    assert(out.toSeq == Seq((0L, 7L, 1L, 142857L), (1L, 7L, 1L, 142857L)))
  }

  test("weighted bridge credits its full weight to both sides' cuts") {
    val edges = Seq(
      (1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 1.0),
      (4L, 5L, 1.0), (5L, 6L, 1.0), (4L, 6L, 1.0),
      (3L, 4L, 3.0)).toDF("src", "dst", "weight")
    val assign = Seq((1L, 0L), (2L, 0L), (3L, 0L),
      (4L, 1L), (5L, 1L), (6L, 1L)).toDF("vertex", "label")
    val out = GraphOps.conductanceOf(edges, assign)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    // m = 9, 2m = 18, vol = 6 + 3 = 9 each, cut = 3
    // phi_e6 = 3000000 div 9 = 333333
    assert(out.toSeq == Seq((0L, 9L, 3L, 333333L), (1L, 9L, 3L, 333333L)))
  }

  test("a single community holding the whole volume has null conductance") {
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0)).toDF("src", "dst", "weight")
    val assign = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("vertex", "label")
    val rows = GraphOps.conductanceOf(edges, assign).collect()
    assert(rows.length == 1 && rows(0).getLong(1) == 4L
      && rows(0).getLong(2) == 0L && rows(0).isNullAt(3))
  }

  test("real-graph audit: volumes sum to 2m, cuts bounded, phi in [0, 1e6]") {
    val edges = GraphBuilder.supplierCoEdges(spark, "/root/testdata/sf0.001")
    val m = edges.agg(sum(col("weight").cast("long"))).head.getLong(0)
    val verts = edges.select(col("src").as("vertex"))
      .unionAll(edges.select(col("dst").as("vertex"))).distinct()
    // residue partition: guaranteed multi-community on this graph
    val rows = GraphOps.conductanceOf(edges,
        verts.select(col("vertex"), pmod(col("vertex"), lit(8L)).as("label")))
      .collect()
    assert(rows.length == 8)
    assert(rows.map(_.getLong(1)).sum == 2 * m)          // Σvol = 2m
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1))) // cut ≤ vol
    val phis = rows.filter(!_.isNullAt(3)).map(_.getLong(3))
    assert(phis.nonEmpty && phis.forall(p => p >= 0L && p <= 1000000L))
    // Louvain labels score too — at sf0.001 the near-complete graph may
    // collapse to one community (all-null phi); any non-null phi must
    // still be in range.
    val labels = GraftGraph(spark, edges).louvain()
      .select(col("vertex"), col("community").as("label"))
    val lphis = GraphOps.conductanceOf(edges, labels)
      .collect().filter(!_.isNullAt(3)).map(_.getLong(3))
    assert(lphis.forall(p => p >= 0L && p <= 1000000L))
  }
}
