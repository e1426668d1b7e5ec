package graft.graph

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed temporal-reachability chains: structural paths with
  * descending times are NOT time-respecting; waiting is free (equal
  * times chain); multiple contacts pick the earliest feasible; the
  * undirected contact works both ways from the min-id source. */
class TemporalReachSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def edges(rows: (Long, Long, Long)*) = {
    import spark.implicits._
    rows.toSeq.toDF("src", "dst", "t")
  }

  private def arrivals(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
    df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap

  test("descending-time chain breaks temporal reachability") {
    // 1 reaches 2 at t=10; the 2–3 contact happened at t=5 < 10 —
    // structurally connected, temporally unreachable.
    val got = arrivals(GraphOps.temporalReach(spark,
      edges((1L, 2L, 10L), (2L, 3L, 5L))))
    assert(got == Map(1L -> Some(0L), 2L -> Some(10L), 3L -> None))
  }

  test("ascending chain, free waiting, earliest-contact choice") {
    // 1–2 contacts at t=8 and t=3 → arrive 2 at 3; 2–3 at t=3 (equal
    // time chains — waiting is free) → arrive 3 at 3; 3–4 at t=7.
    val got = arrivals(GraphOps.temporalReach(spark,
      edges((1L, 2L, 8L), (1L, 2L, 3L), (2L, 3L, 3L), (3L, 4L, 7L))))
    assert(got == Map(1L -> Some(0L), 2L -> Some(3L),
      3L -> Some(3L), 4L -> Some(7L)))
  }

  test("contacts are undirected from the min-id source") {
    // Edge stated as (5 → 1, t=4): source 1 still crosses it.
    val got = arrivals(GraphOps.temporalReach(spark,
      edges((5L, 1L, 4L), (5L, 6L, 9L))))
    assert(got == Map(1L -> Some(0L), 5L -> Some(4L), 6L -> Some(9L)))
  }
}
