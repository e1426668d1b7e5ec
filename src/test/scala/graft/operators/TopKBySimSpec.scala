package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** The round-20 shortlist-window → native top-k aggregate swap
  * (guide §2.3): every converted site relies on
  * `top_k_by_sim(id, sim, k)` emitting EXACTLY the rows of
  * `row_number() OVER (PARTITION BY g ORDER BY sim DESC, id ASC) <= k`
  * — same set, same ranks. Pinned here on planted ties, negatives and
  * a deterministic pseudo-random frame large enough that partial
  * buffers actually merge across partitions. */
class TopKBySimSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("g")).orderBy(col("sim").desc, col("id").asc)
    df.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("g"), col("id"), col("rank"), col("sim"))
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy(col("g"))
      .agg(graft.functions.TopKBySim
        .top_k_by_sim(col("id"), col("sim"), k).as("tops"))
      .select(col("g"), posexplode(col("tops")))
      .select(col("g"), col("col.nb").as("id"),
        (col("pos") + 1).as("rank"), col("col.sim").as("sim"))

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("g"), col("rank")).collect()
      .map(_.toSeq.toVector).toVector

  test("aggregate == window on ties, negatives and short groups") {
    import spark.implicits._
    val df = Seq(
      // group 1: a three-way sim tie (id ascending breaks it), plus
      // negatives and a group smaller than k
      (1L, 10L, 0.5), (1L, 7L, 0.5), (1L, 9L, 0.5), (1L, 3L, 0.9),
      (1L, 4L, -0.2), (1L, 5L, -0.7),
      (2L, 100L, -1.0), (2L, 42L, -1.0)
    ).toDF("g", "id", "sim")
    assert(rowsOf(aggTopK(df, 4)) == rowsOf(windowTopK(df, 4)))
    assert(rowsOf(aggTopK(df, 4)).nonEmpty)
  }

  test("aggregate == window past the sort-based fallback boundary") {
    import spark.implicits._
    // > spark.sql.objectHashAggregate.sortBased.fallbackThreshold
    // (default 128) DISTINCT groups per task: the partial aggregation
    // switches to the sort-based path mid-stream (hash the first 128
    // groups, sorter for the rest), exercising serialize/deserialize
    // + merge for buffers created on BOTH sides of the switch. This
    // is the path every at-scale shortlist takes (262k vector-id
    // groups at the ANN artifact scale) — the round-20 resumed
    // session found the 2M-threshold "optimization" OOMing that
    // artifact (boxed k-entry buffers for every group of every map
    // task resident at once) and removed it in favor of this default
    // hybrid, so the fallback path must be pinned, not assumed.
    val df = spark.range(60000)
      .select((col("id") % 3000).as("g"), col("id"),
        ((xxhash64(col("id"), lit(7)) % 1000L).cast("double") / 100.0).as("sim"))
      .repartition(4)
      .localCheckpoint(true)
    assert(rowsOf(aggTopK(df, 5)) == rowsOf(windowTopK(df, 5)))
    assert(rowsOf(aggTopK(df, 5)).size == 3000 * 5)
  }

  test("aggregate == window on a cross-partition pseudo-random frame") {
    import spark.implicits._
    // 40k rows over 64 groups, xxhash-derived sims with planted
    // duplicates, spread across many partitions so merge() runs.
    val df = spark.range(40000)
      .select((col("id") % 64).as("g"), col("id"),
        ((xxhash64(col("id")) % 1000L).cast("double") / 100.0).as("sim"))
      .repartition(16)
      .localCheckpoint(true)
    assert(rowsOf(aggTopK(df, 10)) == rowsOf(windowTopK(df, 10)))
    assert(rowsOf(aggTopK(df, 10)).size == 64 * 10)
  }
}
