package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

class SimhashPairsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("simhash banding finds exactly the pairs within the Hamming radius") {
    import org.apache.spark.sql.functions._
    import graft.functions.{CatalystText, TextFunctions => TF}
    // exact all-pairs Hamming ≤ 7 (500 docs → 125k pairs, fine here)
    val fps = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), CatalystText.simhash64(TF.tokens(col("text"))).as("fp"))
    val a = fps.select(col("doc_id").as("doc_a"), col("fp").as("fp_a"))
    val b = fps.select(col("doc_id").as("doc_b"), col("fp").as("fp_b"))
    val exact = a.crossJoin(b)
      .filter(col("doc_a") < col("doc_b"))
      .filter(bit_count(col("fp_a").bitwiseXOR(col("fp_b"))) <= 7)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Dedup.simhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // pigeonhole guarantees 100% recall at radius 7 with 8 bands
    assert(banded == exact, s"banded=${banded.size} exact=${exact.size}")
  }
}
