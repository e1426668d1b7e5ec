package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** The spec-evolution contract on a planted two-layout table: the
  * unified read equals a plain scan, and a partition predicate
  * prunes DIRECTORIES on both specs (every input file sits under a
  * matching o_year= dir, coarse and fine layouts alike). */
class PartitionEvolutionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private lazy val root = {
    import spark.implicits._
    val out = java.nio.file.Files
      .createTempDirectory("graft_pevo_spec").toString
    val rows = for (y <- 1995 to 1999; m <- 1 to 12; i <- 1 to 3)
      yield ((y.toLong * 10000 + m * 100 + i), y, m, (y + m + i).toDouble)
    val df = rows.toDF("o_orderkey", "o_year", "o_month", "o_totalprice")
    df.filter(col("o_year") < 1998).drop("o_month")
      .write.partitionBy("o_year").parquet(s"$out/v1")
    df.filter(col("o_year") >= 1998)
      .write.partitionBy("o_year", "o_month").parquet(s"$out/v2")
    out
  }

  private val common = Seq("o_orderkey", "o_totalprice", "o_year")

  private def unified(pred: org.apache.spark.sql.Column) = {
    val v1 = spark.read.parquet(s"$root/v1").filter(pred)
      .select(common.map(col): _*)
    val v2 = spark.read.parquet(s"$root/v2").filter(pred)
      .select(common.map(col): _*)
    (v1, v2, v1.unionByName(v2))
  }

  test("unified read equals a plain scan over the boundary") {
    val (_, _, u) = unified(col("o_year").isin(1997, 1998))
    val got = u.groupBy(col("o_year")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == Set((1997, 36L), (1998, 36L)))
  }

  // Files the pruned scan ACTUALLY reads (inputFiles ignores pushed
  // partition filters; input_file_name surfaces the executed scan).
  private def readFiles(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).toSeq

  test("partition predicate prunes directories on BOTH specs") {
    val (v1, v2, _) = unified(col("o_year").isin(1997, 1998))
    val f1 = readFiles(v1)
    val f2 = readFiles(v2)
    assert(f1.nonEmpty && f1.forall(_.contains("o_year=1997")), f1)
    assert(f2.nonEmpty && f2.forall(_.contains("o_year=1998")), f2)
    // The fine spec prunes at month granularity too.
    val fm = readFiles(spark.read.parquet(s"$root/v2")
      .filter(col("o_year") === 1998 && col("o_month") === 3))
    assert(fm.nonEmpty &&
      fm.forall(f => f.contains("o_year=1998") && f.contains("o_month=3")),
      fm)
  }
}
