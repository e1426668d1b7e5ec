package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** The data-skipping contract on a planted 64×64 grid: pruning never
  * changes answers (residual filter is always applied), the linear
  * layout prunes only its cluster dimension, the Z-order layout
  * prunes BOTH box dimensions (strictly fewer candidate files), a
  * disjoint predicate reads zero files, and the Morton code is the
  * textbook bit interleave. */
class SkipIndexSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_skip_$tag").toString

  // 64×64 planted grid: one row per (x, y) cell.
  private lazy val grid = {
    import spark.implicits._
    (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong, (x * 64 + y).toLong))
      .toDF("x", "y", "id")
  }

  private lazy val linOut = {
    val out = tmp("lin")
    SkipIndex.writeClustered(grid, col("x"), Seq("x", "y"), out)
    out
  }
  private lazy val zOut = {
    val out = tmp("z")
    SkipIndex.writeClustered(
      grid.withColumn("__z", SkipIndex.morton16(col("x"), col("y"))),
      col("__z"), Seq("x", "y"), out)
    out
  }

  private val box = Seq(("x", lit(0L), lit(15L)), ("y", lit(0L), lit(15L)))
  private val residual = col("x").between(0, 15) && col("y").between(0, 15)

  test("morton16 interleaves bits (a odd positions, b even)") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (2L, 1L),
      (65535L, 65535L))
      .toDF("a", "b")
      .select(SkipIndex.morton16(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(rows == Seq(0L, 2L, 1L, 15L, 9L, (1L << 32) - 1))
  }

  test("pruned read equals the full-scan filter on both layouts") {
    val expected = grid.filter(residual).agg(
      count(lit(1)), sum(col("id"))).collect().head
    for (out <- Seq(linOut, zOut)) {
      val got = SkipIndex.prunedRead(spark, out, box, residual)
        .agg(count(lit(1)), sum(col("id"))).collect().head
      assert(got == expected, out)
    }
  }

  test("z-order prunes a 2-D box strictly better than linear") {
    val lin = SkipIndex.prunedFiles(spark, linOut, box)
    val z = SkipIndex.prunedFiles(spark, zOut, box)
    val total = SkipIndex.prunedFiles(spark, linOut,
      Seq(("x", lit(0L), lit(63L)))).size
    // Linear prunes on x alone (every file spans all y); the box is
    // a quarter of x-range, so some but not all files survive.
    assert(lin.nonEmpty && lin.size < total)
    // Z-order tiles are tight in BOTH dims: the quadrant touches
    // strictly fewer files than the linear strip.
    assert(z.nonEmpty && z.size < lin.size,
      s"z=${z.size} lin=${lin.size} total=$total")
  }

  test("disjoint predicate prunes to zero files and zero rows") {
    val none = Seq(("x", lit(100L), lit(200L)))
    assert(SkipIndex.prunedFiles(spark, linOut, none).isEmpty)
    val df = SkipIndex.prunedRead(spark, linOut, none,
      col("x").between(100, 200))
    assert(df.count() == 0)
    assert(df.columns.toSeq == Seq("x", "y", "id"))
  }
}
