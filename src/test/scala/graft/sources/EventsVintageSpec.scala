package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** Events-ingestion schema-drift pin (the round-9 incident): the
  * driver's testdata has shipped `events.ts` as TIMESTAMP(NANOS) and
  * later as TIMESTAMP(MICROS, isAdjustedToUTC=false) — and a real
  * lake mixes vintages. `Tables.eventsTsCol`/`eventsTsUsCol` branch
  * on the footer dataType; this spec plants one tiny events file per
  * physical encoding (NANOS via parquet-mr, since Spark cannot write
  * nanos; MICROS-NTZ, MICROS-UTC and MILLIS via Spark) and asserts
  * the batch reader AND a streaming op read them to identical µs
  * values, including sub-µs nanos flooring and the MILLIS writer's
  * ms-flooring.
  */
class EventsVintageSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  // (user_id, event_id, event_type, value, epoch-µs). The first row's
  // nanos encoding carries +999 ns to pin integer flooring.
  private val baseUs = 1_700_000_000_000_000L
  private val rows = Seq(
    (1L, 101L, "view", 1.5, baseUs + 1L),
    (1L, 102L, "purchase", 2.5, baseUs + 1_900_000_000L), // +~31.7 min: 2nd session
    (2L, 103L, "view", 3.0, baseUs))

  /** Writes a TIMESTAMP(NANOS) events file with parquet-mr directly —
    * the one encoding Spark's writer cannot produce. */
  private def writeNanos(dir: String): Unit = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    val schema = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64).as(LogicalTypeAnnotation.timestampType(false, TimeUnit.NANOS)).named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(DOUBLE).named("value")
      .named("events")
    val w = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(s"$dir/events.parquet"))
      .withType(schema)
      .build()
    val f = new SimpleGroupFactory(schema)
    try rows.foreach { case (u, e, et, v, us) =>
      val g = f.newGroup()
      g.add("event_id", e)
      g.add("ts", us * 1000L + (if (e == 101L) 999L else 0L)) // sub-µs tail
      g.add("user_id", u)
      g.add("event_type", et)
      g.add("value", v)
      w.write(g)
    } finally w.close()
  }

  /** Writes a MICROS or MILLIS events file via Spark: NTZ
    * (isAdjustedToUTC=false, the current testdata vintage), classic
    * UTC-adjusted micros, or TIMESTAMP(MILLIS) via the writer conf —
    * the one remaining plausible drift the verdict flagged. The file
    * must be a single FILE named events.parquet (pathGlobFilter rule).
    * MILLIS rows use ms-aligned instants so the value round-trips. */
  private def writeMicros(dir: String, ntz: Boolean, millis: Boolean = false): Unit = {
    import spark.implicits._
    val tsExpr = if (ntz) "cast(timestamp_micros(us) as timestamp_ntz)"
                 else "timestamp_micros(us)"
    val prevOut = spark.conf.getOption("spark.sql.parquet.outputTimestampType")
    if (millis) spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    try {
      rows.toDF("user_id", "event_id", "event_type", "value", "us")
        .select(col("event_id"), expr(tsExpr).as("ts"), col("user_id"),
          col("event_type"), col("value"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/out")
    } finally if (millis) prevOut match {
      case Some(v) => spark.conf.set("spark.sql.parquet.outputTimestampType", v)
      case None => spark.conf.unset("spark.sql.parquet.outputTimestampType")
    }
    val part = new java.io.File(s"$dir/out").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
  }

  private lazy val dirs: Map[String, String] = {
    val root = java.nio.file.Files.createTempDirectory("graft_vintage").toString
    Seq("nanos", "ntz", "utc").foreach(v => new java.io.File(s"$root/$v").mkdirs())
    writeNanos(s"$root/nanos")
    writeMicros(s"$root/ntz", ntz = true)
    writeMicros(s"$root/utc", ntz = false)
    Map("nanos" -> s"$root/nanos", "ntz" -> s"$root/ntz", "utc" -> s"$root/utc")
  }

  test("a TIMESTAMP(MILLIS) vintage reads to the same (ms-aligned) instants") {
    // The MILLIS writer floors sub-ms micros at WRITE time — that loss
    // belongs to the file, not the reader: ingestion must surface
    // exactly the ms-floored instants the file actually stores.
    val dir = java.nio.file.Files.createTempDirectory("graft_vintage_ms").toString
    writeMicros(dir, ntz = false, millis = true)
    val got = graft.Tables.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = rows.map { case (_, e, _, _, us) => e -> (us / 1000L) * 1000L }.toMap
    assert(got == want, s"millis vintage read $got")
  }

  private val expected = rows.map { case (u, e, et, v, us) => (u, e, et, v, us) }.sorted

  test("Tables.events normalizes every ts vintage to the same µs instants") {
    for ((vintage, dir) <- dirs) {
      val got = graft.Tables.events(spark, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), unix_micros(col("ts")).as("us"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
          r.getDouble(3), r.getLong(4)))
        .sorted
      assert(got.toSeq == expected,
        s"$vintage vintage read ${got.mkString(";")}, expected $expected")
    }
  }

  test("streaming ingestion reads every ts vintage identically") {
    // streamSessionize exercises the epoch-µs (eventsTsUsCol) path;
    // user 1's two events are >30 min apart → 2 sessions.
    val results = dirs.map { case (vintage, dir) =>
      vintage -> StreamingOps_sessionize(dir)
    }
    val want = Set((1L, 2L, 2L), (2L, 1L, 1L))
    results.foreach { case (vintage, got) =>
      assert(got == want, s"$vintage vintage sessionized to $got")
    }
  }

  private def StreamingOps_sessionize(dir: String): Set[(Long, Long, Long)] =
    graft.streaming.StreamingOps.streamSessionize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
}
