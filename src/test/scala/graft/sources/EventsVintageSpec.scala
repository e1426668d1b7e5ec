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
  * nanos; MICROS-NTZ and MICROS-UTC via Spark) and asserts the batch
  * reader AND a streaming op read all of them to identical µs values,
  * including sub-µs nanos flooring.
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

  /** Writes a MICROS events file via Spark: NTZ (isAdjustedToUTC=false,
    * the current testdata vintage) or classic UTC-adjusted. The file
    * must be a single FILE named events.parquet (pathGlobFilter rule). */
  private def writeMicros(dir: String, ntz: Boolean): Unit = {
    import spark.implicits._
    val tsExpr = if (ntz) "cast(timestamp_micros(us) as timestamp_ntz)"
                 else "timestamp_micros(us)"
    rows.toDF("user_id", "event_id", "event_type", "value", "us")
      .select(col("event_id"), expr(tsExpr).as("ts"), col("user_id"),
        col("event_type"), col("value"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/out")
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
