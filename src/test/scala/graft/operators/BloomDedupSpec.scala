package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession
import graft.functions.BloomMightContain

/** Bloom-filter dedup contracts: the builder's put path and the
  * native probe expression hash identically (zero false negatives,
  * exhaustively), the false-positive rate stays near the configured
  * fpp, and the driver query's ok column holds on real data.
  */
class BloomDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("every inserted value probes true (no false negatives, exhaustive)") {
    import spark.implicits._
    val base = (0 until 2000).map(i => s"base-value-$i").toDF("h")
    val bloom = base.stat.bloomFilter("h", 2000, 0.01)
    val probed = base.withColumn("might", BloomMightContain(col("h"), bloom))
      .filter(!col("might")).count()
    assert(probed == 0L,
      s"$probed inserted values probed false — put/probe paths disagree")
  }

  test("false-positive rate on absent values stays near fpp") {
    import spark.implicits._
    val base = (0 until 2000).map(i => s"base-value-$i").toDF("h")
    val bloom = base.stat.bloomFilter("h", 2000, 0.01)
    val absent = (0 until 5000).map(i => s"absent-value-$i").toDF("h")
    val fp = absent.withColumn("might", BloomMightContain(col("h"), bloom))
      .filter(col("might")).count()
    // fpp 0.01 over 5000 probes → expect ~50; allow generous slack.
    assert(fp <= 150L, s"fp rate ${fp / 5000.0} far above configured 0.01")
    assert(fp >= 1L, "zero false positives at n=5000 suggests a degenerate filter")
  }

  test("driver query: ok everywhere, exact_new matches the anti-join") {
    val rows = Dedup.bloomIncremental(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._3), "no-false-negative implication violated")
    // exact_new=false must be exactly the batch docs whose hash
    // appears in the base half (within-batch dups stay exact_new —
    // the filter only knows base; the semi-join is the ground truth).
    val byHash = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), md5(col("text")).as("h"))
    val baseH = byHash.filter(col("doc_id") < 250).select(col("h")).distinct()
    val expectDup = byHash.filter(col("doc_id") >= 250)
      .join(baseH, Seq("h"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    assert(rows.filter(!_._2).map(_._1).toSet == expectDup)
  }
}
