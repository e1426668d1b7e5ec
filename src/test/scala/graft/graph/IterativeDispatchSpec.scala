package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** The round-14 measured driver dispatch contract: every integer-
  * exact iterative operator's driver twin is BIT-IDENTICAL to the
  * DataFrame loop it stands in for — not approximately, not up to
  * ordering: the same rows. Pinned on the real sf0.001 co-occurrence
  * graph (complete-ish, weighted, the shape the queries run), using
  * the test-only forceDistributed escape hatch to reach the at-scale
  * path on a small input. */
class IterativeDispatchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def edges = GraphBuilder.supplierCoEdges(spark, "/root/testdata/sf0.001")

  private def rowsOf(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toVector).toVector

  private def bothPaths(f: => DataFrame): (Seq[Seq[Any]], Seq[Seq[Any]]) = {
    val drv = rowsOf(f)
    GraphOps.forceDistributed = true
    try {
      val dist = rowsOf(f)
      (drv, dist)
    } finally GraphOps.forceDistributed = false
  }

  test("pageRankInteger: driver twin == DataFrame loop, bit for bit") {
    val (d, x) = bothPaths(GraphOps.pageRankInteger(spark, edges))
    assert(d == x)
    assert(d.nonEmpty)
  }

  test("personalizedPageRank: driver twin == DataFrame loop") {
    val (d, x) = bothPaths(GraphOps.personalizedPageRank(spark, edges))
    assert(d == x)
  }

  test("katzCentrality: driver twin == DataFrame loop") {
    val (d, x) = bothPaths(GraphOps.katzCentrality(spark, edges))
    assert(d == x)
  }

  test("spectralCut: driver twin == DataFrame loop (md5 start included)") {
    val (d, x) = bothPaths(GraphOps.spectralCut(spark, edges))
    assert(d == x)
  }

  test("weightedShortestPaths: driver twin == DataFrame loop") {
    val (d, x) = bothPaths(
      GraphOps.weightedShortestPaths(spark, edges)
        .orderBy(org.apache.spark.sql.functions.col("vertex"),
          org.apache.spark.sql.functions.col("landmark")))
    assert(d == x)
    assert(d.nonEmpty)
  }

  test("shortestPaths: driver BFS == Pregel ShortestPaths") {
    val o = org.apache.spark.sql.functions.col _
    val (d, x) = bothPaths(
      GraphOps.shortestPaths(spark, edges).orderBy(o("vertex"), o("landmark")))
    assert(d == x)
    assert(d.nonEmpty)
  }

  test("betweennessCentrality: driver twin == DataFrame loop") {
    val (d, x) = bothPaths(GraphOps.betweennessCentrality(spark, edges))
    assert(d == x)
    assert(d.nonEmpty)
  }

  test("temporalReach: driver twin == DataFrame loop") {
    val t = GraphBuilder.supplierTemporalEdges(spark, "/root/testdata/sf0.001")
    val o = org.apache.spark.sql.functions.col _
    val drv = rowsOf(GraphOps.temporalReach(spark, t).orderBy(o("vertex")))
    GraphOps.forceDistributed = true
    val dist =
      try rowsOf(GraphOps.temporalReach(spark, t).orderBy(o("vertex")))
      finally GraphOps.forceDistributed = false
    assert(drv == dist)
    assert(drv.nonEmpty)
  }

  test("coreness: driver twin == DataFrame loop") {
    val (d, x) = bothPaths(GraphOps.coreness(spark, edges))
    assert(d == x)
    assert(d.nonEmpty)
  }

  test("labelPropagation: driver twin == DataFrame loop") {
    val (d, x) = bothPaths(
      GraphOps.labelPropagation(spark, edges)
        .orderBy(org.apache.spark.sql.functions.col("vertex")))
    assert(d == x)
    assert(d.nonEmpty)
  }

  test("non-Long vertex keys fall back to the type-generic DataFrame loop") {
    // textRank runs PageRank over STRING tokens — the driver twin
    // reads keys with getLong and must decline (caught live in the
    // round-14 full gate: t_textrank threw ClassCastException until
    // the longKeyed guard landed).
    import spark.implicits._
    val e = Seq(("a", "b", 1.0), ("b", "c", 2.0)).toDF("src", "dst", "weight")
    val r = GraphOps.pageRankInteger(spark, e).collect()
    assert(r.length == 3)
    assert(GraphOps.katzCentrality(spark, e).collect().length == 3)
  }

  test("louvain family: driver dispatch partitions match the GraphX engine") {
    // Louvain labels are path-specific (min-member canonical vs
    // Pregel ids); the contract is the PARTITION and the level-Q
    // ledger's monotonicity, both of which the dispatch must keep.
    def partOf(df: DataFrame): Set[Set[Long]] = df.collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    val drv = partOf(GraphOps.louvain(spark, edges))
    GraphOps.forceDistributed = true
    val dist =
      try partOf(GraphOps.louvain(spark, edges.limit(edges.count().toInt)))
      finally GraphOps.forceDistributed = false
    // The sf0.001 co-occurrence graph is complete (K10 suppliers) —
    // both engines must agree on the one-community optimum; richer
    // planted agreement lives in IncrementalLouvainSpec.
    assert(drv == dist, s"driver $drv != graphx $dist")
  }
}
