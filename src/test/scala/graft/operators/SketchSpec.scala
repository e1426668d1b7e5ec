package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

class SketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("HLL union of per-day sketches equals the sketch of the union") {
    // The mergeability invariant q_sketch_union relies on: at equal
    // lgConfigK, unioning daily sketches is LOSSLESS — the estimate
    // must be bit-identical to sketching all days at once, not merely
    // close. Days overlap (users recur) to make the union non-trivial.
    import spark.implicits._
    val rows = (0 until 3).flatMap { day =>
      (0 until 800).map(i => (day, (day * 500 + i).toLong)) // 300-overlap
    }.toDF("day", "user_id")
    val daily = rows.groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    val merged = daily
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(true))).as("est"))
      .head().getLong(0)
    val global = rows
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("est"))
      .head().getLong(0)
    assert(merged == global, s"merged=$merged global=$global")
    // ...and the estimate itself is within the 5% verdict bound of the
    // exact distinct count (1800 distinct users).
    val exact = rows.select(col("user_id")).distinct().count()
    assert(math.abs(merged - exact) <= exact * 0.05, s"est=$merged exact=$exact")
  }

  test("sketches survive a parquet round-trip and still merge") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sketch").toString
    val rows = (1 to 1000).map(i => (i % 4, i.toLong)).toDF("g", "user_id")
    rows.groupBy(col("g")).agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      .write.mode("overwrite").parquet(dir)
    val est = spark.read.parquet(dir)
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(true))))
      .head().getLong(0)
    assert(math.abs(est - 1000L) <= 50L, s"round-tripped estimate $est")
  }
}
