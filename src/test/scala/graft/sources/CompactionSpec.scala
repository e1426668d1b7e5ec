package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** The compaction contract on a planted fragmented table: the file
  * count collapses to ~the bin count, every row survives byte-exact
  * (same multiset), the plan is metadata-only (greedy cumulative
  * bins), and the rewrite is layout-only (aggregates unchanged). */
class CompactionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def parquetFiles(dir: String): Seq[java.io.File] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq

  test("64 fragments compact to the planned bins, rows byte-exact") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_compact_spec").toString
    val df = (1L to 5000L).map(i => (i, i % 97, s"v$i"))
      .toDF("id", "k", "s")
    df.repartition(64).write.parquet(s"$root/small")
    val before = parquetFiles(s"$root/small")
    assert(before.size == 64)
    val total = before.map(_.length()).sum
    val (nBefore, nBins) =
      Compaction.compact(spark, s"$root/small", s"$root/out", total / 4)
    assert(nBefore == 64)
    assert(nBins >= 4 && nBins <= 6, s"nBins=$nBins")
    // ~one output file per bin (range partition on the bin id).
    val outLeaves = Option(new java.io.File(s"$root/out").listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("__bin="))
    assert(outLeaves.length == nBins)
    assert(outLeaves.forall(d => parquetFiles(d.getPath).size == 1),
      outLeaves.map(d => parquetFiles(d.getPath).size).toSeq)
    // Same multiset of rows.
    val a = df.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    val b = spark.read.parquet(s"$root/out").drop("__bin")
      .select(col("id"), col("k"), col("s"))
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(a == b)
  }

  test("bin plan is greedy cumulative on metadata only") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_compact_plan").toString
    // Plant fake "parquet" files of known sizes (plan never opens them).
    val sizes = Seq(10L, 10L, 10L, 25L, 5L, 30L)
    sizes.zipWithIndex.foreach { case (n, i) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$root/p$i.parquet"),
        Array.fill(n.toInt)(0.toByte))
    }
    val bins = Compaction.planBins(root, targetBytes = 30L)
    val byName = bins.map { case (p, b) =>
      new java.io.File(p).getName -> b
    }
    // cum before each (name order): 0,10,20,30,55,60 → bins 0,0,0,1,1,2
    assert(byName == Map("p0.parquet" -> 0, "p1.parquet" -> 0,
      "p2.parquet" -> 0, "p3.parquet" -> 1, "p4.parquet" -> 1,
      "p5.parquet" -> 2))
  }

  test("compacting a directory with no parquet files fails loudly") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_compact_empty").toString
    val e = intercept[IllegalArgumentException](
      Compaction.compact(spark, root, s"$root/out", 100L))
    assert(e.getMessage.contains("nothing to bin-pack"))
  }
}
