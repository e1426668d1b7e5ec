package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession
import graft.sources.MaterializedView

/** The streaming MV's exactly-once contract: a re-delivered batch id
  * is a no-op (state byte-equal), merges accumulate algebraically
  * across batch ids, and versions never skip state. */
class StreamMvSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_smv_$tag").toString

  private val keys = Seq("k")
  private val sums = Seq("n", "s")

  private def delta(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("k", "n", "s")
  }

  private def state(dir: String, v: Long): Set[(Long, Long, Long)] =
    MaterializedView.asOf(spark, dir, v)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("re-delivered batch id is a no-op; merges accumulate by key") {
    val mv = tmp("replay")
    assert(MaterializedView.mergeDelta(spark, mv, keys, sums,
      delta(Seq((1L, 2L, 10L), (2L, 1L, 5L))), version = 0L))
    assert(state(mv, 0) == Set((1L, 2L, 10L), (2L, 1L, 5L)))
    // Replay of batch 0 (restart mid-stream): refused, state intact.
    assert(!MaterializedView.mergeDelta(spark, mv, keys, sums,
      delta(Seq((1L, 99L, 99L))), version = 0L))
    assert(MaterializedView.versions(mv) == Seq(0L))
    assert(state(mv, 0) == Set((1L, 2L, 10L), (2L, 1L, 5L)))
    // Next batch merges algebraically.
    assert(MaterializedView.mergeDelta(spark, mv, keys, sums,
      delta(Seq((1L, 1L, 1L), (3L, 4L, 40L))), version = 1L))
    assert(state(mv, 1) == Set((1L, 3L, 11L), (2L, 1L, 5L), (3L, 4L, 40L)))
    // And batch 1's replay is also refused after the fact.
    assert(!MaterializedView.mergeDelta(spark, mv, keys, sums,
      delta(Seq((9L, 9L, 9L))), version = 1L))
    assert(state(mv, 1) == Set((1L, 3L, 11L), (2L, 1L, 5L), (3L, 4L, 40L)))
  }
}
