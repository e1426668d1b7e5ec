package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** The streaming RESTART/RECOVERY contract — the production property
  * the rest of the streaming surface only implies: every stateful
  * query runs against a DURABLE `checkpointLocation` and a durable
  * (parquet) sink, is stopped mid-stream with state in flight, and
  * restarted as a NEW query execution over the same checkpoint. The
  * specs then prove, from the sink alone:
  *
  *  - EXACTLY-ONCE append output: rows emitted before the stop are
  *    not re-emitted after restart (the checkpoint's commit log plus
  *    the file sink's metadata log make replayed work idempotent);
  *  - STATE RESTORATION: aggregation buffers, join buffers and
  *    session-merge state written before the stop combine with
  *    post-restart input — counts spanning both phases can only come
  *    from the state store, never from any single batch;
  *  - WATERMARK RESTORATION: input older than the pre-stop watermark
  *    is dropped after restart (a reset watermark would instead
  *    re-open and eventually re-emit the closed window).
  *
  * The stop lands between micro-batches (graceful `stop()`), which is
  * how a planned redeploy restarts; the mid-write crash case (a batch
  * replayed into the sink) is pinned separately by the foreachBatch
  * replay-idempotence spec in [[StreamingSpec]].
  */
class StreamingRecoverySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // Hour-aligned, ms-exact base second: windows and watermarks land
  // on closed-form boundaries.
  private val Base = 472000L * 3600L

  test("watermarked agg restarts exactly-once with state and watermark restored") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, Double)]
    val agg = input.toDF().toDF("sec", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_seconds(col("window.start")).as("win_s"), col("event_type"),
        col("n"), col("sum_value"))
    val out = tmp("graft_rec_agg_out")
    val ckpt = tmp("graft_rec_agg_ckpt")
    def start() = agg.writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()

    // Phase 1: two W1 events, one W2 event, and a driver advancing
    // the watermark to Base+4400 — past W1's end (Base+3600), short
    // of W2's (Base+7200). W1 finalizes and lands in the sink; W2
    // exists only as state-store rows when the query is stopped.
    val q1 = start()
    try {
      input.addData((Base + 10, "a", 1.0), (Base + 20, "a", 2.0),
        (Base + 3700, "a", 5.0), (Base + 8000, "z", 0.0))
      q1.processAllAvailable()
    } finally q1.stop()
    val afterPhase1 = spark.read.parquet(out)
      .select(col("win_s"), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(afterPhase1.toSet == Set((Base, "a", 2L, 3.0)),
      s"phase 1 sink: ${afterPhase1.toSeq}")

    // Phase 2: a NEW query over the same checkpoint. One more W2
    // event, one event BELOW the restored watermark (must be
    // dropped), and a driver closing W2. The emitted W2 row counts
    // events from BOTH phases — only restored state can produce it —
    // and W1 is not re-emitted.
    val q2 = start()
    try {
      input.addData((Base + 5000, "a", 7.0), (Base + 100, "a", 100.0),
        (Base + 12000, "z", 0.0))
      q2.processAllAvailable()
    } finally q2.stop()
    val afterPhase2 = spark.read.parquet(out)
      .select(col("win_s"), col("event_type"), col("n"), col("sum_value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(afterPhase2.toSet == Set(
      (Base, "a", 2L, 3.0), (Base + 3600, "a", 2L, 12.0)),
      s"phase 2 sink: ${afterPhase2.toSeq}")
    assert(afterPhase2.length == 2, s"duplicate append rows: ${afterPhase2.toSeq}")
  }

  test("stream-stream join restarts with the buffered side restored") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val views = MemoryStream[(Long, Long, Long)] // (sec, view_id, user)
    val purchases = MemoryStream[(Long, Long, Long)]
    val v = views.toDF().toDF("sec", "view_id", "v_user")
      .withColumn("v_ts", timestamp_seconds(col("sec"))).drop("sec")
      .withWatermark("v_ts", "1 hour")
    val p = purchases.toDF().toDF("sec", "p_id", "user_id")
      .withColumn("p_ts", timestamp_seconds(col("sec"))).drop("sec")
      .withWatermark("p_ts", "1 hour")
    val joined = p.join(v,
      col("user_id") === col("v_user") &&
        col("v_ts") <= col("p_ts") &&
        col("v_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("p_id"), col("view_id"), col("user_id"))
    val out = tmp("graft_rec_join_out")
    val ckpt = tmp("graft_rec_join_ckpt")
    def start() = joined.writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()

    // Phase 1: only the view arrives; it can match nothing yet, so
    // it exists solely as a state-store buffer row at the stop.
    val q1 = start()
    try {
      views.addData((Base, 500L, 1L))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.read.parquet(out).count() == 0)

    // Phase 2: the matching purchase arrives 10 minutes later (well
    // inside the 30-minute range) at a NEW query execution. The pair
    // can only form against the RESTORED view buffer. Emitted once.
    val q2 = start()
    try {
      purchases.addData((Base + 600, 900L, 1L))
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((900L, 500L, 1L)), s"sink: ${rows.toSeq}")
  }

  test("session window restarts by merging new events into restored session state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long)] // (sec, user)
    val sessions = input.toDF().toDF("sec", "user_id")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_seconds(col("session_window.start")).as("start_s"),
        col("n_events"))
    val out = tmp("graft_rec_sess_out")
    val ckpt = tmp("graft_rec_sess_ckpt")
    def start() = sessions.writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()

    // Phase 1: two user-1 events open a session; the driver's small
    // advance leaves it open, so it is pure state at the stop.
    val q1 = start()
    try {
      input.addData((Base, 1L), (Base + 60, 1L), (Base + 1000, 9L))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.read.parquet(out).count() == 0)

    // Phase 2: a third event 15 minutes in merges into the RESTORED
    // session (within the 30-minute gap of Base+60), and the driver
    // pushes the watermark one second past the merged session's end
    // (Base+900+1800). Exactly one session row emits, spanning both
    // phases: n_events = 3 requires the restored merge state.
    val q2 = start()
    try {
      input.addData((Base + 900, 1L), (Base + 900 + 1800 + 3600 + 1, 9L))
      q2.processAllAvailable()
    } finally q2.stop()
    val rows = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, Base, 3L)), s"sink: ${rows.toSeq}")
  }
}
