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
      .select(col("window.start").as("hour"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("hour"), col("event_type"))
      .collect()
    assert(streamed.toSeq == batch.toSeq)
  }

  test("stateful streaming sessionization equals batch sessionization") {
    val streamed = StreamingOps.streamSessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val batch = Relational.qEventsSessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq)
  }
}
