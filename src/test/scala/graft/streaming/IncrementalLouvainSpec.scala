package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** s_stream_louvain is rows-only (an iterative multi-level fold has
  * no SQL form): these pin the three contract properties on planted
  * graphs plus the corpus-level Q bound the query itself reports.
  */
class IncrementalLouvainSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def sink() =
    java.nio.file.Files.createTempDirectory("graft_lv_spec").toString

  /** Two 4-cliques (0-3, 10-13) plus one cross edge; weights 1. */
  private def clique(ids: Seq[Long]): Seq[(Long, Long, Double)] =
    for { a <- ids; b <- ids if a < b } yield (a, b, 1.0)

  private def labelsOf(s: String, v: Long): Map[Long, Long] =
    spark.read.parquet(s"$s/v$v/labels").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Partition as a set of member sets (label values are arbitrary). */
  private def partition(m: Map[Long, Long]): Set[Set[Long]] =
    m.groupBy(_._2).values.map(_.keySet).toSet

  test("cross-batch edges merge communities no single batch can see") {
    import spark.implicits._
    val s = sink()
    // Batch 0: clique A and HALF of clique B's edges (B not yet dense).
    val b0 = (clique(Seq(0L, 1L, 2L, 3L)) ++
      Seq((10L, 11L, 1.0), (11L, 12L, 1.0))).toDF("src", "dst", "weight")
    // Batch 1: the rest of B, plus the A-B bridge.
    val b1 = (Seq((10L, 12L, 1.0), (10L, 13L, 1.0), (11L, 13L, 1.0),
      (12L, 13L, 1.0), (3L, 10L, 1.0))).toDF("src", "dst", "weight")
    StreamingOps.mergeLouvain(s)(b0, 0L)
    StreamingOps.mergeLouvain(s)(b1, 1L)
    val streamed = partition(labelsOf(s, 1L))
    // Batch Louvain over the full edge set finds the two cliques.
    val all = b0.unionByName(b1)
    val batch = graft.graph.GraphOps.louvain(spark, all).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == partition(batch),
      s"streamed $streamed != batch ${partition(batch)}")
    assert(streamed == Set(Set(0L, 1L, 2L, 3L), Set(10L, 11L, 12L, 13L)))
  }

  test("replaying a batch id overwrites to the identical state") {
    import spark.implicits._
    val s = sink()
    val b0 = clique(Seq(0L, 1L, 2L, 3L)).toDF("src", "dst", "weight")
    val b1 = clique(Seq(10L, 11L, 12L, 13L)).toDF("src", "dst", "weight")
    StreamingOps.mergeLouvain(s)(b0, 0L)
    StreamingOps.mergeLouvain(s)(b1, 1L)
    val first = labelsOf(s, 1L)
    StreamingOps.mergeLouvain(s)(b1, 1L) // replay after failure-recovery
    assert(labelsOf(s, 1L) == first)
    val sup = spark.read.parquet(s"$s/v1/super").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // Super-graph state stayed two compressed self-loops (one per
    // clique, internal weight 6 = the clique's 6 edges).
    assert(sup.map { case (a, b, w) => (a == b, w) } == Set((true, 6.0)))
  }

  test("corpus fold: streamed labels' Q within tolerance of batch Louvain Q") {
    // sf0.01: the sf0.001 co-occurrence graph is complete (K10), so
    // both sides correctly report Q = 0 and prove nothing.
    val row = StreamingOps.streamLouvainIncremental(spark, "/root/testdata/sf0.01")
      .collect().head
    val qs = row.getAs[Long]("q_e6_streamed")
    val qb = row.getAs[Long]("q_e6_batch")
    // The fold may even beat one batch run (both are heuristics);
    // bound the GAP, not the sign: within 0.05 modularity.
    assert(qb - qs <= 50000L, s"streamed Q $qs vs batch $qb")
  }
}
