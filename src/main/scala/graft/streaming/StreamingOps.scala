package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming operators (SURVEY §2 row 35).
  *
  * The batch parquet events table drives a real streaming query
  * (file source → windowed aggregation → memory sink), proving the
  * stream pipeline produces batch-identical results. In production
  * the same plan runs on a live source with `withWatermark` +
  * append mode; complete mode + `processAllAvailable` makes the
  * local check synchronous and exhaustive.
  */
object StreamingOps {

  /** Tumbling 1-hour window count/sum per event_type, executed as a
    * streaming query. Returns the materialized (batch-equal) result. */
  def streamHourlyAgg(spark: SparkSession, dir: String): DataFrame = {
    // The stream source needs the file's raw schema (ts = INT64
    // nanos under the legacy conf); normalization to microsecond
    // TimestampType happens in the stream plan, same as Tables.events.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    // The file source wants a directory: stream the sf dir with a
    // glob filter selecting only the events file.
    val raw = spark.readStream
      .schema(rawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val agg = raw
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))
    val name = "graft_stream_agg"
    val q = agg.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
      .orderBy(col("hour"), col("event_type"))
  }
}
