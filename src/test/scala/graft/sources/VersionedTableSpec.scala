package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

class VersionedTableSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import VersionedTable._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_vtab_spec").toString

  private def rowsOf(v: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    v.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("merge upserts by key; updates win; in-batch ties break by order col") {
    import spark.implicits._
    val dir = tmp()
    val v0 = merge(spark, dir,
      Seq((1L, 10L, 1.0), (2L, 11L, 2.0)).toDF("k", "ord", "x"),
      keys = Seq("k"), orderCol = "ord")
    assert(v0 == 0L)
    // Key 1 updated (even with a SMALLER ord — updates always win);
    // key 3 inserted twice in one batch — ord 21 must win; key 2 kept.
    val v1 = merge(spark, dir,
      Seq((1L, 5L, 9.0), (3L, 20L, 3.0), (3L, 21L, 4.0)).toDF("k", "ord", "x"),
      keys = Seq("k"), orderCol = "ord")
    assert(v1 == 1L)
    assert(rowsOf(latest(spark, dir)) ==
      Set((1L, 5L, 9.0), (2L, 11L, 2.0), (3L, 21L, 4.0)))
  }

  test("time travel: earlier versions are immutable after later merges") {
    import spark.implicits._
    val dir = tmp()
    merge(spark, dir, Seq((1L, 1L, 1.0)).toDF("k", "ord", "x"), Seq("k"), "ord")
    val before = rowsOf(asOf(spark, dir, 0L))
    merge(spark, dir, Seq((1L, 2L, 99.0)).toDF("k", "ord", "x"), Seq("k"), "ord")
    assert(rowsOf(asOf(spark, dir, 0L)) == before)
    assert(rowsOf(asOf(spark, dir, 1L)) == Set((1L, 2L, 99.0)))
    assert(versions(dir) == Seq(0L, 1L))
    intercept[IllegalArgumentException](asOf(spark, dir, 7L))
  }

  test("torn writes are invisible and replay commits the same version") {
    import spark.implicits._
    val dir = tmp()
    merge(spark, dir, Seq((1L, 1L, 1.0)).toDF("k", "ord", "x"), Seq("k"), "ord")
    // Simulate a crash between snapshot write and commit: a v1
    // directory exists but carries no marker — readers must not see it
    // and the next merge must claim version 1 again (idempotent replay).
    Seq((9L, 9L, 9.0)).toDF("k", "ord", "x")
      .write.mode("overwrite").parquet(s"$dir/v1")
    assert(latestVersion(dir).contains(0L))
    val replayed = merge(spark, dir,
      Seq((2L, 2L, 2.0)).toDF("k", "ord", "x"), Seq("k"), "ord")
    assert(replayed == 1L)
    assert(rowsOf(latest(spark, dir)) == Set((1L, 1L, 1.0), (2L, 2L, 2.0)))
  }

  test("vacuum expires old versions: expired asOf fails loudly, survivors byte-identical") {
    import spark.implicits._
    val dir = tmp()
    (0 to 2).foreach { b =>
      merge(spark, dir,
        Seq((1L, b.toLong * 10, b.toDouble), (2L + b, b.toLong, 0.5)).toDF("k", "ord", "x"),
        keys = Seq("k"), orderCol = "ord")
    }
    val before = rowsOf(latest(spark, dir))
    val v2Bytes = new java.io.File(s"$dir/v2").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sorted.toSeq
    // Horizon guard: the latest version can never expire.
    intercept[IllegalArgumentException](vacuum(dir, keepLast = 0))
    // keepLast beyond history expires nothing.
    assert(vacuum(dir, keepLast = 5) == Seq.empty)
    assert(versions(dir) == Seq(0L, 1L, 2L))
    // Expire all but the newest: v0/v1 gone, loud asOf failure.
    assert(vacuum(dir, keepLast = 1) == Seq(0L, 1L))
    assert(versions(dir) == Seq(2L))
    val e = intercept[IllegalArgumentException](asOf(spark, dir, 0L))
    assert(e.getMessage.contains("expired by vacuum"))
    assert(!new java.io.File(s"$dir/v0").exists(),
      "expired snapshot directory must be removed, not just unmarked")
    // The survivor is untouched: same rows, same physical bytes.
    assert(rowsOf(latest(spark, dir)) == before)
    assert(new java.io.File(s"$dir/v2").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sorted.toSeq == v2Bytes)
    // Idempotent: a second vacuum finds nothing to do.
    assert(vacuum(dir, keepLast = 1) == Seq.empty)
  }

  test("diffCounts classifies added, changed, unchanged and deleted keys") {
    import spark.implicits._
    val old = Seq((1L, 10L, 1.0), (2L, 20L, 2.0), (3L, 30L, 3.0), (4L, 40L, 4.0))
      .toDF("k", "ord", "x")
    val now = Seq(
      (1L, 10L, 1.0),   // unchanged
      (2L, 21L, 2.0),   // changed (first value col)
      (3L, 30L, 3.5),   // changed (second value col)
      (5L, 50L, 5.0))   // added; key 4 deleted
      .toDF("k", "ord", "x")
    val r = VersionedTable.diffCounts(old, now, Seq("k"), Seq("ord", "x"))
      .collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == (1L, 2L, 1L, 1L),
      s"(added, changed, unchanged, deleted) = $r")
  }
}
