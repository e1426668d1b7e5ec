package graft.graph

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two halves of `g_bipartite_proj`'s scale contract
  * (round-13 fix of the suite's one scale-killer):
  *
  *  - the RECURRENT cut — [[GraphBuilder.recurrentPurchaseEdges]]
  *    keeps a customer→supplier tie iff it appears in ≥ minOrders
  *    DISTINCT orders (repeats within one order don't count), which
  *    is what collapses the projection's Σdeg² wedge stream from
  *    quadratic-in-SF (345M rows at sf0.1 raw) to ~151k rows;
  *  - the AQE pin — both wedge self-join inputs carry a NUMBERED
  *    repartition AFTER the checkpoint, so it survives into the
  *    executed plan (a pre-checkpoint repartition pins nothing: the
  *    join re-plans around the LogicalRDD and AQE coalesces the
  *    exploded stream onto ~2 tasks, the measured 78s-vs-26s trap).
  */
class BipartiteProjSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("projection: hand-computed shared-supplier counts, unique top order") {
    // Suppliers: 10 ← {1,2,3}; 20 ← {1,2}; 30 ← {2,3}; 40 ← {1}.
    // Pairs: (1,2) share {10,20}=2; (1,3) share {10}=1; (2,3) share
    // {10,30}=2. Order: shared DESC, then (c1,c2) ascending.
    val edges = Seq(
      (1L, 10L), (2L, 10L), (3L, 10L),
      (1L, 20L), (2L, 20L),
      (2L, 30L), (3L, 30L),
      (1L, 40L)).toDF("src", "dst")
    val got = GraphOps.bipartiteProjection(spark, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 2L), (2L, 3L, 2L), (1L, 3L, 1L)))
  }

  test("projection: minShared threshold drops singleton co-purchases") {
    val edges = Seq(
      (1L, 10L), (2L, 10L), (3L, 10L),
      (1L, 20L), (2L, 20L)).toDF("src", "dst")
    val got = GraphOps.bipartiteProjection(spark, edges, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 2L)))
  }

  test("recurrent cut: >= 2 DISTINCT orders; repeats within one order don't count") {
    val dir = tempDir("graft_bip_rec")
    // Customer 1 buys from supplier 10 in orders 100 and 101 (kept);
    // customer 2 buys from supplier 10 twice WITHIN order 102 only
    // (dropped — one order, however many lineitems); customer 3 buys
    // from supplier 20 once (dropped).
    Seq((100L, 1L), (101L, 1L), (102L, 2L), (103L, 3L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((100L, 10L), (101L, 10L), (102L, 10L), (102L, 10L), (103L, 20L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = GraphBuilder.recurrentPurchaseEdges(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L)))
  }

  test("plan pin: both wedge join inputs keep their numbered repartition") {
    val edges = Seq((1L, 10L), (2L, 10L)).toDF("src", "dst")
    val plan = GraphOps.bipartiteProjection(spark, edges)
      .queryExecution.executedPlan.toString
    val pins = "REPARTITION_BY_NUM".r.findAllIn(plan).length
    assert(pins >= 2,
      s"expected 2 post-checkpoint numbered repartitions, saw $pins:\n" +
        plan.take(3000))
  }
}
