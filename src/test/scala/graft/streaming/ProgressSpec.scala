package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** Progress-API state metrics: complete-mode windowed aggregation
  * holds exactly one state row per (window, event_type) group, so
  * state_rows must equal the batch group count — and rows_updated
  * across the run covers every group at least once.
  */
class ProgressSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("state rows equal the batch (window, type) group count at sf0.001") {
    val got = StreamingOps.streamProgressStats(spark, "/root/testdata/sf0.001")
      .collect()
    assert(got.nonEmpty, "no stateful operator reported progress")
    val stateRows = got.map(_.getLong(1)).max
    val want = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .count().count()
    assert(stateRows == want,
      s"state_rows $stateRows != batch group count $want")
    assert(got.map(_.getLong(2)).max >= want)
  }
}
