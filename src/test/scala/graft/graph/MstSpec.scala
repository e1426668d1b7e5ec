package graft.graph

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Borůvka minimum spanning forest: exact planted forests, and an
  * optimality audit of the distributed result against driver-side
  * Prim on the real (collected, 100-vertex) graph.
  */
class MstSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def mst(pairs: (Long, Long, Double)*): Set[(Long, Long, Double)] =
    GraphOps.minimumSpanningForest(spark, pairs.toDF("src", "dst", "weight"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("cycle drops its heaviest edge; path keeps everything") {
    assert(mst((1L, 2L, 1.0), (2L, 3L, 2.0), (1L, 3L, 3.0))
      == Set((1L, 2L, 1.0), (2L, 3L, 2.0)))
    assert(mst((1L, 2L, 5.0), (2L, 3L, 1.0))
      == Set((1L, 2L, 5.0), (2L, 3L, 1.0)))
  }

  test("forest on disconnected components; ties resolve by (w, src, dst)") {
    // two triangles, all weights equal: the consistent total order
    // keeps exactly 2 edges per component, deterministically
    val f = mst((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 1.0),
      (7L, 8L, 1.0), (8L, 9L, 1.0), (7L, 9L, 1.0))
    assert(f == Set((1L, 2L, 1.0), (1L, 3L, 1.0), (7L, 8L, 1.0), (7L, 9L, 1.0)))
  }

  test("K4 with distinct weights matches the unique MST") {
    val f = mst((1L, 2L, 1.0), (1L, 3L, 4.0), (1L, 4L, 3.0),
      (2L, 3L, 2.0), (2L, 4L, 6.0), (3L, 4L, 5.0))
    assert(f == Set((1L, 2L, 1.0), (2L, 3L, 2.0), (1L, 4L, 3.0)))
  }

  test("mstWeight scalar readout matches the forest it summarizes") {
    val e = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 1.0),
      (7L, 8L, 2.0), (8L, 9L, 5.0), (7L, 9L, 1.0)).toDF("src", "dst", "weight")
    val r = GraphOps.mstWeight(spark, e).collect().head
    // two components: triangle keeps (1,2)+(1,3) = 2; second keeps
    // (7,9,1)+(7,8,2) = 3 → total 5, 4 edges, 6 − 4 = 2 components.
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((5L, 4L, 2L)))
  }

  test("forest memo: same input is one build, in-place regeneration is a miss") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mstmemo").toString
    def plant(rows: Seq[(Long, Long, Double)]): Unit = {
      rows.toDF("src", "dst", "weight").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/edges.parquet")
      val f = new java.io.File(s"$dir/edges.parquet")
      f.setLastModified(f.lastModified() + 2000L)
    }
    def run(): Set[(Long, Long)] =
      GraphOps.minimumSpanningForest(spark,
        spark.read.parquet(s"$dir/edges.parquet"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    plant(Seq((1L, 2L, 1.0), (2L, 3L, 2.0), (1L, 3L, 3.0)))
    assert(run() == Set((1L, 2L), (2L, 3L)))
    // Regenerate IN PLACE with a different graph: the (mtime, length)
    // key must miss and rebuild — stale forests are the bug class the
    // invalidation contract exists for.
    plant(Seq((1L, 2L, 9.0), (2L, 3L, 2.0), (1L, 3L, 3.0)))
    assert(run() == Set((2L, 3L), (1L, 3L)),
      "regenerated edges must re-run Borůvka, not serve the memo")
  }

  test("real graph: spanning, acyclic, and Prim-optimal total weight") {
    val e = GraphBuilder.supplierCoEdges(spark, "/root/testdata/sf0.001")
      .localCheckpoint(true)
    val edges = e.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val verts = edges.flatMap(x => Seq(x._1, x._2)).distinct
    val forest = GraphOps.minimumSpanningForest(spark, e).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))

    // spanning forest shape: |F| = V - #components
    val nComp = GraphOps.connectedComponents(spark, e)
      .select("component").distinct().count()
    assert(forest.length == verts.length - nComp.toInt)

    // driver-side Prim per component for the optimal total weight
    val adj = edges.flatMap(x => Seq((x._1, (x._2, x._3)), (x._2, (x._1, x._3))))
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2) }
    var total = 0.0
    val seen = scala.collection.mutable.Set[Long]()
    for (start <- verts if !seen.contains(start)) {
      seen += start
      val pq = scala.collection.mutable.PriorityQueue[(Double, Long)]()(
        Ordering.by(-_._1))
      adj.getOrElse(start, Array.empty[(Long, Double)]).foreach { case (n, w) => pq.enqueue((w, n)) }
      while (pq.nonEmpty) {
        val (w, v) = pq.dequeue()
        if (!seen.contains(v)) {
          seen += v; total += w
          adj.getOrElse(v, Array.empty[(Long, Double)]).foreach { case (n, nw) =>
            if (!seen.contains(n)) pq.enqueue((nw, n))
          }
        }
      }
    }
    val got = forest.map(_._3).sum
    assert(math.abs(got - total) < 1e-6, s"forest weight $got != Prim $total")
  }
}
