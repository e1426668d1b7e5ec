package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** Hand-computed planted chains pin the removal-effect model: the
  * transition counts, base conversion probability, per-channel
  * removal effects and normalized credit are all worked by hand
  * below (same-formula engine bugs pass an oracle, not hand
  * numbers); the converted-without-journey edge feeds START→CONV;
  * the readout is partitioning-invariant. */
class MarkovAttributionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def events(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, t, us), i) => (u, t, us, i.toLong) }
      .toDF("user_id", "event_type", "us", "event_id")
  }

  // Journeys:
  //   u1: view → purchase            (START→view, view→CONV)
  //   u2: view → click → purchase    (START→view, view→click, click→CONV)
  //   u3: view                       (START→view, view→DROP)
  //   u4: click                      (START→click, click→DROP)
  // Chain rows: START: view 3/4, click 1/4
  //             view:  click 1/3, CONV 1/3, DROP 1/3
  //             click: CONV 1/2, DROP 1/2
  // base = 3/4·(1/3 + 1/3·1/2) + 1/4·1/2 = 3/8 + 1/8 = 1/2.
  // remove view:  START→view redirects to DROP → base' = 1/4·1/2 = 1/8
  //   → effect 3/8.
  // remove click: view→click and START→click → DROP
  //   → base' = 3/4·1/3 = 1/4 → effect 1/4.
  private val planted = events(Seq(
    (1L, "view", 10L), (1L, "purchase", 20L),
    (2L, "view", 10L), (2L, "click", 20L), (2L, "purchase", 30L),
    (3L, "view", 10L),
    (4L, "click", 10L)))

  test("hand-computed chain: base, removal effects, normalized credit") {
    val out = Relational.markovAttributionOf(spark, planted)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.keySet == Set("click", "error", "signup", "view"))
    assert(out("view") == (500000L, 375000L, 600000L), out("view"))
    assert(out("click") == (500000L, 250000L, 400000L), out("click"))
    assert(out("error") == (500000L, 0L, 0L))
    assert(out("signup") == (500000L, 0L, 0L))
  }

  test("converted-without-journey user feeds START→CONV") {
    // u5 purchases with no prior events: base rises, no channel
    // credit moves — removal effects on a direct conversion are 0.
    val withDirect = events(Seq((5L, "purchase", 5L)))
    val all = planted.unionByName(withDirect)
    val out = Relational.markovAttributionOf(spark, all)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // START: view 3/5, click 1/5, CONV 1/5 →
    // base = 1/5 + 3/5·(1/2... recompute: view absorbs as before (1/3
    // + 1/6 = 1/2), click 1/2 → base = 1/5 + 3/5·1/2 + 1/5·1/2 = 3/5.
    assert(out("view") == 600000L, out)
  }

  test("bit-identical under any partitioning") {
    val a = Relational.markovAttributionOf(spark, planted.repartition(2))
      .collect().map(_.toSeq).toSeq
    val b = Relational.markovAttributionOf(spark, planted.repartition(7))
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
