package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** transformWithState counter: the update-mode emission trail must
  * show genuinely multi-batch cumulative state (not one batch that
  * happened to equal the final answer), and per-user emissions must
  * be monotone — the property the max-readout relies on.
  */
class TwsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("multi-batch monotone cumulative emissions at sf0.001") {
    // The raw emission trail (the memory sink now lives in the
    // cloned session's isolated catalog — the round-16 concurrency
    // fix — so the op exposes its checkpointed trail directly).
    val trail = StreamingOps.streamTwsTrail(spark, "/root/testdata/sf0.001")
    val perUser = trail.groupBy(col("user_id"))
      .agg(count(lit(1)).as("emissions"),
        max(col("n_events")).as("mx"), min(col("n_events")).as("mn"))
    // 4-file source with maxFilesPerTrigger=1: at least one user must
    // appear in more than one micro-batch, with strictly growing
    // totals (cumulative, not per-batch deltas).
    val multi = perUser.filter(col("emissions") >= 2)
    assert(multi.count() > 0, "no user emitted in more than one batch")
    assert(multi.filter(col("mx") <= col("mn")).count() == 0,
      "cumulative totals must strictly grow across batches")
    // Emission count per user is bounded by the batch count (4).
    assert(perUser.agg(max(col("emissions"))).first().getLong(0) <= 4)
    // And the readout totals equal the batch aggregate.
    val got = StreamingOps.streamTwsCounter(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val want = graft.Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("e"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (u, (e, p)) => assert(got(u) == ((e, p))) }
  }
}
