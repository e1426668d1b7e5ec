package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession
import graft.operators.Relational

class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streaming hourly agg equals the batch aggregation") {
    import org.apache.spark.sql.functions._
    val streamed = StreamingOps.streamHourlyAgg(spark, sf).collect()
    val batch = graft.Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      // The op emits the window start as NTZ (the §6 no-emitted-LTZ
      // rule); the batch twin states the same cast.
      .select(col("window.start").cast("timestamp_ntz").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("hour"), col("event_type"))
      .collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("watermarked append agg drops late rows and evicts closed-window state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String, Double)]
    val agg = input.toDF().toDF("sec", "event_type", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))
    val name = "graft_wm_eviction"
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      val H = 3600L
      // Batch 1: two rows in hour 10 — nothing finalized yet.
      input.addData((10 * H, "a", 1.0), (10 * H + 300, "a", 2.0))
      q.processAllAvailable()
      // Batch 2: hour 13 advances the watermark to 12:00 — the hour-10
      // window finalizes (emitted once) and its state is evicted.
      input.addData((13 * H, "a", 5.0))
      q.processAllAvailable()
      val afterFinalize = spark.table(name).collect()
      assert(afterFinalize.length == 1, afterFinalize.mkString(";"))
      assert(afterFinalize(0).getLong(2) == 2L)
      assert(afterFinalize(0).getDouble(3) == 3.0)
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows == 1L, s"closed-window state not evicted: $stateRows rows")
      // Batch 3: a row in hour 10 is now LATE (beyond the watermark)
      // and must be dropped, not re-opened.
      input.addData((10 * H + 600, "a", 100.0))
      q.processAllAvailable()
      val afterLate = spark.table(name).collect()
      assert(afterLate.toSeq == afterFinalize.toSeq,
        "late row beyond the watermark changed emitted results")
    } finally q.stop()
  }

  test("watermarked append agg equals batch agg restricted to finalized windows") {
    import org.apache.spark.sql.functions._
    val streamed = StreamingOps.streamWatermarkedAgg(spark, sf).collect()
    val ev = graft.Tables.events(spark, sf)
    val maxMs = ev.agg((max(unix_micros(col("ts"))) / lit(1000L)).cast("long"))
      .head().getLong(0)
    val wmMs = maxMs - 3600000L
    val batch = ev
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .filter(unix_millis(col("window.end")) <= wmMs)
      .select(col("window.start").cast("timestamp_ntz").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("hour"), col("event_type"))
      .collect()
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("durable parquet sink + checkpoint persists the watermarked agg") {
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    val out = Files.createTempDirectory("graft_sink_out").toString
    val ckpt = Files.createTempDirectory("graft_sink_ckpt").toString
    val q = StreamingOps.watermarkedAggPlan(spark, sf)
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    // The raw plan sinks the LTZ window start; the memory-sink op
    // casts its readout to NTZ (§6) — state the same cast here.
    val persisted = spark.read.parquet(out)
      .withColumn("hour", col("hour").cast("timestamp_ntz"))
      .orderBy(col("hour"), col("event_type")).collect()
    val viaMemory = StreamingOps.streamWatermarkedAgg(spark, sf).collect()
    assert(persisted.nonEmpty && persisted.toSeq == viaMemory.toSeq)
    // the checkpoint recorded committed batches — restart-safe state
    assert(new java.io.File(s"$ckpt/commits").listFiles().nonEmpty)
  }

  test("stream-stream interval join equals the batch interval join") {
    import org.apache.spark.sql.functions._
    val streamed = StreamingOps.streamStreamJoin(spark, sf).collect()
    val ev = graft.Tables.events(spark, sf)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("vu"), col("event_id").as("view_id"),
        col("ts").as("vts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("pts"))
    val batch = p.join(v,
        col("user_id") === col("vu") &&
          col("vts") <= col("pts") &&
          col("vts") >= col("pts") - expr("INTERVAL 30 MINUTES"))
      .select(col("p_id"), col("view_id"), col("user_id"))
      .orderBy(col("p_id"), col("view_id"))
      .collect()
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
  }

  test("incremental CC merge: cross-batch bridge, singletons, replay idempotence") {
    import spark.implicits._
    val sink = java.nio.file.Files.createTempDirectory("graft_ccmerge").toString
    def labels(v: Int): Map[Long, Long] =
      spark.read.parquet(s"$sink/v$v").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Batch 0: {1,2} and {5,6} — no connection between them.
    StreamingOps.mergeCc(sink)(Seq((1L, 2L), (5L, 6L)).toDF("src", "dst"), 0L)
    assert(labels(0) == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L))
    // Batch 1: the 2—5 bridge exists ONLY here — the merged state must
    // fuse components no single batch connects; vertex 7 rides in as a
    // new pair. State self-pairs (1,1)/(5,5) must keep singleton-rooted
    // vertices alive through the fold.
    StreamingOps.mergeCc(sink)(Seq((2L, 5L), (7L, 8L)).toDF("src", "dst"), 1L)
    val v1 = labels(1)
    assert(v1 == Map(1L -> 1L, 2L -> 1L, 5L -> 1L, 6L -> 1L, 7L -> 7L, 8L -> 7L), v1.toString)
    // Equals batch CC over the union of all edges (associativity).
    val batch = graft.graph.ConnectedComponentsDF.run(spark,
        Seq((1L, 2L), (5L, 6L), (2L, 5L), (7L, 8L)).toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v1 == batch)
    // Replaying batch 1 (restart mid-write) rewrites v1 from v0 — the
    // labels must be unchanged, not re-merged into nonsense.
    StreamingOps.mergeCc(sink)(Seq((2L, 5L), (7L, 8L)).toDF("src", "dst"), 1L)
    assert(labels(1) == v1)
  }

  test("streamed incremental CC equals the batch computation at sf0.001") {
    val streamed = StreamingOps.streamCcIncremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val batch = graft.graph.GraphOps.connectedComponents(spark,
        graft.graph.GraphBuilder.supplierCoEdges(spark, sf))
      .orderBy(org.apache.spark.sql.functions.col("vertex")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("stateful streaming sessionization equals batch sessionization") {
    val streamed = StreamingOps.streamSessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val batch = Relational.qEventsSessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("session-window eviction compares the session end at µs precision") {
    // Planted sub-ms boundary: the watermark is millisecond-valued
    // (wm_ms = max event ms − 1 h) but session ends are unaligned µs.
    // A session ending 500 µs PAST wm_ms·1000 must be withheld; one
    // ending exactly AT wm_ms·1000 must be emitted (≤ predicate).
    // This pins the precision the SQL oracle must replicate — an
    // ms-floored compare would wrongly emit the 500 µs straggler.
    import spark.implicits._
    // driver event fixing the watermark: max ts = 1.7e15 µs (ms-aligned)
    val driverUs = 1_700_000_000_000_000L
    val wmUs = driverUs - 3_600_000_000L // wm_ms·1000 = (max_ms − 1 h)·1000
    val gapUs = 1_800_000_000L // 30 min session extension
    val rows = Seq(
      (1L, (wmUs + 500L - gapUs) * 1000L, 101L), // end = wm + 500 µs → withheld
      (2L, (wmUs - gapUs) * 1000L, 102L), // end = wm exactly → emitted
      (3L, (wmUs - 5_000_000L - gapUs) * 1000L, 103L), // end 5 s early → emitted
      (9L, driverUs * 1000L, 104L)) // watermark driver; own session open
    // events.parquet must be a single FILE (as in the testdata dirs):
    // the stream's pathGlobFilter matches file names, not directories.
    val dir = java.nio.file.Files.createTempDirectory("graft_sesswm").toString
    rows.toDF("user_id", "ts", "event_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/out")
    val part = new java.io.File(s"$dir/out").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val got = StreamingOps.streamSessionWindow(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((2L, wmUs - gapUs), (3L, wmUs - 5_000_000L - gapUs)),
      s"emitted $got — eviction precision differs from µs-≤")
  }

  test("outer join null-emission compares the purchase time at µs precision") {
    // Planted sub-ms boundary for the LEFT-OUTER stream-stream join:
    // an unmatched purchase's null row emits iff no future view can
    // match, i.e. p_us < wm_ms·1000 (strict — a purchase AT the
    // watermark could still tie a view with v_ts = p_ts). P1 sits
    // 500 µs past the watermark (withheld), P2 exactly at it
    // (withheld under strict-<), P3 five seconds before (emitted);
    // user 4's view+purchase pair emits matched regardless.
    import spark.implicits._
    val driverUs = 1_700_000_000_000_000L // ms-aligned driver events
    val wmUs = driverUs - 3_600_000_000L
    val rows = Seq(
      (1L, "purchase", (wmUs + 500L) * 1000L, 11L),
      (2L, "purchase", wmUs * 1000L, 12L),
      (3L, "purchase", (wmUs - 5_000_000L) * 1000L, 13L),
      (4L, "view", (wmUs - 20_000_000L) * 1000L, 14L),
      (4L, "purchase", (wmUs - 10_000_000L) * 1000L, 15L),
      (9L, "view", driverUs * 1000L, 16L), // right-stream wm driver
      (8L, "purchase", driverUs * 1000L, 17L)) // left-stream wm driver
    val dir = java.nio.file.Files.createTempDirectory("graft_outerwm").toString
    rows.toDF("user_id", "event_type", "ts", "event_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/out")
    val part = new java.io.File(s"$dir/out").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val got = StreamingOps.streamStreamOuterJoin(spark, dir).collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.toString).orNull,
        r.getLong(2))).toSet
    assert(got == Set((15L, "14", 4L), (13L, null, 3L)),
      s"emitted $got — null-emission precision differs from strict µs-<")
  }

  test("right-outer null-emission waits out the join-range allowance") {
    // The mirror bound: a view's candidate purchases extend to
    // v_ts + 30 min, so its null row emits iff
    // v_us + 30 min < wm_µs (strict). V1 is 500 µs inside the
    // allowance and V2 exactly at it (both withheld); V3 cleared it
    // by 5 s (emitted); user 4's pair emits matched.
    import spark.implicits._
    val driverUs = 1_700_000_000_000_000L
    val wmUs = driverUs - 3_600_000_000L
    val rangeUs = 1_800_000_000L
    val rows = Seq(
      (1L, "view", (wmUs - rangeUs + 500L) * 1000L, 11L),
      (2L, "view", (wmUs - rangeUs) * 1000L, 12L),
      (3L, "view", (wmUs - rangeUs - 5_000_000L) * 1000L, 13L),
      (4L, "view", (wmUs - rangeUs - 20_000_000L) * 1000L, 14L),
      (4L, "purchase", (wmUs - rangeUs - 10_000_000L) * 1000L, 15L),
      (9L, "view", driverUs * 1000L, 16L),
      (8L, "purchase", driverUs * 1000L, 17L))
    val dir = java.nio.file.Files.createTempDirectory("graft_routerwm").toString
    rows.toDF("user_id", "event_type", "ts", "event_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/out")
    val part = new java.io.File(s"$dir/out").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val got = StreamingOps.streamStreamRightOuterJoin(spark, dir).collect()
      .map(r => (Option(r.get(0)).map(_.toString).orNull, r.getLong(1),
        r.getLong(2))).toSet
    assert(got == Set(("15", 14L, 4L), (null, 13L, 3L)),
      s"emitted $got — right-side allowance differs from strict µs-<")
  }

  test("full-outer join applies both null-emission bounds in one query") {
    // Both boundary fixtures merged (disjoint user ids so the planted
    // rows never cross-match): the purchase side emits its null row
    // under the LEFT bound (p_us < wm_µs, strict — P3 only), the view
    // side under the RIGHT bound (v_us + 30 min < wm_µs, strict — V3
    // only), and the user-4 pair emits matched. P1/V1 sit 500 µs
    // inside their bounds, P2/V2 exactly at them — all withheld.
    import spark.implicits._
    val driverUs = 1_700_000_000_000_000L // ms-aligned driver events
    val wmUs = driverUs - 3_600_000_000L
    val rangeUs = 1_800_000_000L
    val rows = Seq(
      (1L, "purchase", (wmUs + 500L) * 1000L, 21L),
      (2L, "purchase", wmUs * 1000L, 22L),
      (3L, "purchase", (wmUs - 5_000_000L) * 1000L, 23L),
      (5L, "view", (wmUs - rangeUs + 500L) * 1000L, 31L),
      (6L, "view", (wmUs - rangeUs) * 1000L, 32L),
      (7L, "view", (wmUs - rangeUs - 5_000_000L) * 1000L, 33L),
      (4L, "view", (wmUs - 20_000_000L) * 1000L, 14L),
      (4L, "purchase", (wmUs - 10_000_000L) * 1000L, 15L),
      (9L, "view", driverUs * 1000L, 16L),
      (8L, "purchase", driverUs * 1000L, 17L))
    val dir = java.nio.file.Files.createTempDirectory("graft_fullouterwm").toString
    rows.toDF("user_id", "event_type", "ts", "event_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/out")
    val part = new java.io.File(s"$dir/out").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val got = StreamingOps.streamStreamFullOuterJoin(spark, dir).collect()
      .map(r => (Option(r.get(0)).map(_.toString).orNull,
        Option(r.get(1)).map(_.toString).orNull, r.getLong(2))).toSet
    assert(got == Set(("15", "14", 4L), ("23", null, 3L), (null, "33", 7L)),
      s"emitted $got — full-outer bounds differ from the strict µs-< pair")
  }

  test("hopping-window agg equals batch events replicated into 4 windows") {
    import org.apache.spark.sql.functions._
    val streamed = StreamingOps.streamHoppingAgg(spark, sf).collect()
    val batch = graft.Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").cast("timestamp_ntz").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("win_start"), col("event_type"))
      .collect()
    assert(streamed.nonEmpty && streamed.toSeq == batch.toSeq)
    // every event lands in exactly len/slide = 4 windows
    val nEvents = graft.Tables.events(spark, sf).count()
    assert(streamed.map(_.getLong(2)).sum == 4 * nEvents)
  }

  test("dropDuplicatesWithinWatermark bounds state: evicts, then re-emits") {
    // The semantic contract that separates the state-bounded dedup
    // from plain dropDuplicates: (a) a duplicate arriving within the
    // watermark delay is suppressed; (b) once the watermark passes a
    // key's event time + delay, its state is EVICTED (numRowsTotal
    // drops); (c) a later re-arrival of the same key re-emits — plain
    // dropDuplicates would hold state forever and never re-emit.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Long)] // (sec, key)
    val deduped = input.toDF().toDF("sec", "k")
      .withColumn("ts", timestamp_seconds(col("sec")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("k")
      .select(col("k"), col("sec"))
    val name = "graft_dedup_wm_eviction"
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    try {
      def emitted() = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // Batch 1: key 42 first seen at t=1000 → emitted once.
      input.addData((1000L, 42L))
      q.processAllAvailable()
      assert(emitted() == Set((42L, 1000L)))
      // Batch 2: duplicate of 42 at t=1100 (within the 600 s delay of
      // the stored state) → suppressed. Key 7 at t=5000 emits and
      // advances the watermark to 4400 s, past 42's expiry (1000+600)
      // → 42's state is evicted; only key 7 remains stored.
      input.addData((1100L, 42L), (5000L, 7L))
      q.processAllAvailable()
      assert(emitted() == Set((42L, 1000L), (7L, 5000L)),
        s"within-watermark duplicate not suppressed: ${emitted()}")
      val stateRows = q.lastProgress.stateOperators.head.numRowsTotal
      assert(stateRows == 1L, s"expired dedup state not evicted: $stateRows rows")
      // Batch 3: key 42 re-arrives at t=5200 — after eviction, so it
      // MUST re-emit (the documented semantic difference from the
      // unbounded streamDedup).
      input.addData((5200L, 42L))
      q.processAllAvailable()
      assert(emitted() == Set((42L, 1000L), (7L, 5000L), (42L, 5200L)),
        s"post-eviction re-arrival did not re-emit: ${emitted()}")
    } finally q.stop()
  }

  test("streamDedupWithinWatermark equals batch distinct keys on one micro-batch") {
    import org.apache.spark.sql.functions._
    val streamed = StreamingOps.streamDedupWithinWatermark(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val batch = graft.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type")).distinct()
      .orderBy(col("user_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("foreachBatch landing is idempotent under batch replay") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sink = java.nio.file.Files.createTempDirectory("graft_fb_replay_").toString
    try {
      val b0 = Seq((1L, "en", 10L), (2L, "de", 20L))
        .toDF("doc_id", "lang", "n_chars")
      val b1 = Seq((3L, "en", 30L)).toDF("doc_id", "lang", "n_chars")
      StreamingOps.landBatch(sink)(b0, 0L)
      StreamingOps.landBatch(sink)(b1, 1L)
      def agg() = spark.read.parquet(sink)
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
        .first()
      val before = agg()
      // Restart replay: the source re-delivers batch 0 with the same
      // rows. An append sink would double-count; the per-batch
      // overwrite must leave the landed table identical.
      StreamingOps.landBatch(sink)(b0, 0L)
      assert(agg() == before && before.getLong(0) == 3L
        && before.getLong(1) == 60L)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(sink)).deleteRecursively()
    }
  }

  test("CDC merge: out-of-order events never clobber, replay is idempotent") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sink = java.nio.file.Files.createTempDirectory("graft_cdc_spec").toString
    def batch(rows: (Long, Long, Long, String, Double)*) =
      rows.toDF("user_id", "event_id", "ts_us", "event_type", "value")
        .select(col("user_id"), col("event_id"),
          expr("timestamp_micros(ts_us)").as("ts"),
          col("event_type"), col("value"))
    def snapshot(v: Long) = spark.read.parquet(s"$sink/v$v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    try {
      // batch 0: user 1 at t=100, user 2 at t=200
      StreamingOps.mergeCdc(sink)(batch(
        (1L, 10L, 100L, "view", 1.0), (2L, 20L, 200L, "view", 2.0)), 0L)
      assert(snapshot(0L) == Map(1L -> 10L, 2L -> 20L))
      // batch 1: newer event for user 1, plus a LATE event for user 2
      // (older ts) — the late row must NOT clobber the snapshot.
      StreamingOps.mergeCdc(sink)(batch(
        (1L, 30L, 300L, "purchase", 3.0), (2L, 5L, 50L, "view", 9.0)), 1L)
      assert(snapshot(1L) == Map(1L -> 30L, 2L -> 20L))
      // replay batch 1 (the restart case): v1 is rewritten identically
      StreamingOps.mergeCdc(sink)(batch(
        (1L, 30L, 300L, "purchase", 3.0), (2L, 5L, 50L, "view", 9.0)), 1L)
      assert(snapshot(1L) == Map(1L -> 30L, 2L -> 20L))
      // same-ts tie breaks by event_id (the unique composite order)
      StreamingOps.mergeCdc(sink)(batch((1L, 29L, 300L, "view", 4.0)), 2L)
      assert(snapshot(2L) == Map(1L -> 30L, 2L -> 20L))
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(sink)).deleteRecursively()
    }
  }

  test("streamed CDC snapshot equals the batch latest-row-per-key") {
    import org.apache.spark.sql.functions._
    val streamed = StreamingOps.streamCdcSnapshot(spark, sf).collect()
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val batch = graft.Tables.events(spark, sf)
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"),
        round(col("value"), 2).as("last_value"))
      .orderBy(col("user_id")).collect()
    assert(streamed.nonEmpty)
    assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
  }

  test("streaming file source reads mixed parquet vintages under one widened schema") {
    // Streams REQUIRE a user schema (no inference pass) — the same
    // explicit-widened-schema discipline src_schema_evolution uses for
    // batch is therefore the only correct posture for a drifting
    // stream directory: INT32 ids widen, absent columns null-fill,
    // per micro-batch, per file.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_svint").toString
    Seq(1, 2).toDF("id").select(col("id").cast("int").as("id"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/in")
    Seq((10L, "new"), (11L, "new")).toDF("id", "tag")
      .coalesce(1).write.mode("append").parquet(s"$dir/in")
    val q = spark.readStream
      .schema("id long, tag string")
      .option("maxFilesPerTrigger", "1") // one vintage per micro-batch
      .parquet(s"$dir/in")
      .writeStream.outputMode("append").format("memory")
      .queryName("svint").start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.table("svint").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, None), (2L, None),
      (10L, Some("new")), (11L, Some("new"))))
  }

  test("file-sink streaming resumes from its checkpoint exactly once") {
    // The durability contract memory-sink entries can't show: a
    // parquet-sink query with a checkpointLocation processes batch 1,
    // stops, and a RESTARTED query picks up from the committed offset
    // — new files process once, already-committed files never replay.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val ck = s"$dir/ck"
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
      .coalesce(1).write.mode("append").parquet(in)
    def run(): Unit = {
      val q = spark.readStream.schema("id long, tag string").parquet(in)
        .writeStream.outputMode("append").format("parquet")
        .option("path", out).option("checkpointLocation", ck).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(out).count() == 2)
    Seq((3L, "c")).toDF("id", "tag")
      .coalesce(1).write.mode("append").parquet(in)
    run()
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")),
      s"restart replayed or dropped rows: ${got.mkString(",")}")
  }

  test("stream anomaly flags exactly the planted spike hour") {
    // Type "a": hours 0..9 carry 5 events each except hour 5 with 40
    // (z = 3 exactly clears the integer z² > 4 gate; the flat hours
    // sit at z ≈ −0.33). A type-"b" driver event 13 hours in advances
    // the watermark so all ten "a" windows finalize while its own
    // window stays open — output is exactly the ten "a" hours.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = 472_222L * 3600L // hour-aligned epoch seconds
    def ns(h: Long, j: Long): Long = (base + h * 3600L + j * 60L) * 1_000_000_000L
    val rows = (0L until 10L).flatMap { h =>
      val n = if (h == 5L) 40L else 5L
      (0L until n).map(j => (h * 100 + j, h, "a", 1.0, ns(h, j)))
    } :+ ((9999L, 13L, "b", 1.0, ns(13L, 0L)))
    val dir = java.nio.file.Files.createTempDirectory("graft_anom").toString
    rows.toDF("event_id", "user_id", "event_type", "value", "ts")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/out")
    val part = new java.io.File(s"$dir/out").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val got = StreamingOps.streamAnomaly(spark, dir).collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0)
          .toEpochSecond(java.time.ZoneOffset.UTC), r.getString(1),
        r.getLong(2), r.getBoolean(3)))
    assert(got.length == 10 && got.forall(_._2 == "a"))
    val flagged = got.filter(_._4)
    assert(flagged.toSeq == Seq(((base + 5 * 3600), "a", 40L, true)),
      got.mkString(";"))
  }

  test("stream drift: hand-computed PSI per finalized window") {
    // Hour A: values in bins {0, 1, 9}; hour B: two in bin 2. A
    // driver event 3 hours later (bin 0) advances the watermark so A
    // and B finalize while its own window is withheld. The GLOBAL
    // reference includes the driver row — expected PSI is recomputed
    // here with the identical smoothing/round tree (HALF_UP, the
    // Spark/DuckDB positive-round rule).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = 472_333L * 3600L // hour-aligned epoch seconds
    def ns(h: Long, j: Long): Long = (base + h * 3600L + j * 60L) * 1_000_000_000L
    val rows = Seq(
      (1L, 1L, "a", 5.0, ns(0L, 0L)),   // A: bin 0
      (2L, 1L, "a", 15.0, ns(0L, 1L)),  // A: bin 1
      (3L, 1L, "a", 950.0, ns(0L, 2L)), // A: capped to bin 9
      (4L, 1L, "a", 25.0, ns(1L, 0L)),  // B: bin 2
      (5L, 1L, "a", 29.9, ns(1L, 1L)),  // B: bin 2
      (9L, 9L, "a", 5.0, ns(3L, 0L)))   // watermark driver: bin 0
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    rows.toDF("event_id", "user_id", "event_type", "value", "ts")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/out")
    val part = new java.io.File(s"$dir/out").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val g = Map(0 -> 2L, 1 -> 1L, 2 -> 2L, 9 -> 1L)
    val gTot = 6L
    def psi(c: Map[Int, Long], n: Long): Long = (0 until 10).map { i =>
      val p = (c.getOrElse(i, 0L) + 1).toDouble / (n + 10)
      val q = (g.getOrElse(i, 0L) + 1).toDouble / (gTot + 10)
      BigDecimal((p - q) * math.log(p / q) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.sum
    val got = StreamingOps.streamDrift(spark, dir).collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0)
        .toEpochSecond(java.time.ZoneOffset.UTC), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (base, 3L, psi(Map(0 -> 1L, 1 -> 1L, 9 -> 1L), 3L)),
      (base + 3600, 2L, psi(Map(2 -> 2L), 2L))),
      s"got ${got.mkString(";")}")
    assert(got.forall(_._3 >= 0L), "PSI must be non-negative")
  }
}
