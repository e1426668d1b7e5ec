package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** The incremental-MV contract: every staged refresh equals a full
  * recompute over everything landed so far; a refresh with nothing
  * new is a no-op (no version written); versions time-travel; and —
  * the incrementality proof — a batch already folded in can be
  * DELETED and later refreshes stay exact, because processed files
  * are never read again. */
class MaterializedViewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_mv_$tag").toString

  private def mkBatch(landing: String, name: String,
      rows: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("k", "v").write.parquet(s"$landing/$name")
  }

  private val keys = Seq("k")
  private val sums = Seq("n", "s")
  private def partial(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("k")).agg(count(lit(1)).as("n"), sum(col("v")).as("s"))

  private def mvRows(dir: String, v: Long): Set[(Long, Long, Long)] =
    MaterializedView.asOf(spark, dir, v)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def recompute(rows: Seq[(Long, Long)]): Set[(Long, Long, Long)] =
    rows.groupBy(_._1).map { case (k, vs) =>
      (k, vs.size.toLong, vs.map(_._2).sum)
    }.toSet

  test("each staged refresh equals a full recompute; no-op refresh writes nothing") {
    val landing = tmp("l1"); val mv = tmp("m1")
    val b0 = Seq((1L, 10L), (2L, 20L), (1L, 5L))
    val b1 = Seq((2L, 1L), (3L, 7L))
    val b2 = Seq((1L, 100L), (3L, 3L), (4L, 4L))
    mkBatch(landing, "batch0", b0)
    assert(MaterializedView.refresh(spark, landing, mv, keys, sums, partial)
      .contains(0L))
    assert(mvRows(mv, 0) == recompute(b0))
    mkBatch(landing, "batch1", b1)
    assert(MaterializedView.refresh(spark, landing, mv, keys, sums, partial)
      .contains(1L))
    assert(mvRows(mv, 1) == recompute(b0 ++ b1))
    // Idempotent no-op: nothing new → no version written.
    assert(MaterializedView.refresh(spark, landing, mv, keys, sums, partial)
      .isEmpty)
    assert(MaterializedView.versions(mv) == Seq(0L, 1L))
    mkBatch(landing, "batch2", b2)
    assert(MaterializedView.refresh(spark, landing, mv, keys, sums, partial)
      .contains(2L))
    assert(mvRows(mv, 2) == recompute(b0 ++ b1 ++ b2))
    // Earlier versions remain time-travelable and unchanged.
    assert(mvRows(mv, 0) == recompute(b0))
    assert(mvRows(mv, 1) == recompute(b0 ++ b1))
  }

  test("processed batches are never re-read: delete one, refresh stays exact") {
    val landing = tmp("l2"); val mv = tmp("m2")
    val b0 = Seq((1L, 10L), (2L, 20L))
    val b1 = Seq((1L, 1L), (3L, 30L))
    mkBatch(landing, "batch0", b0)
    MaterializedView.refresh(spark, landing, mv, keys, sums, partial)
    // Remove batch0's data entirely — a re-read would now throw or
    // silently drop rows; incremental maintenance must do neither.
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete(): Unit
    }
    rm(new java.io.File(s"$landing/batch0"))
    mkBatch(landing, "batch1", b1)
    assert(MaterializedView.refresh(spark, landing, mv, keys, sums, partial)
      .contains(1L))
    assert(mvRows(mv, 1) == recompute(b0 ++ b1))
  }
}
