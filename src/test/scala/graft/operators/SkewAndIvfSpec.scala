package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

class SkewAndIvfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("salted aggregation equals plain aggregation on skewed data") {
    // 10k rows of hot key + scattered tail
    val df = ((1 to 10000).map(i => ("hot", i.toDouble)) ++
      (1 to 500).map(i => (s"k${i % 50}", i.toDouble))).toDF("k", "v")
    val plain = df.groupBy($"k").agg(sum($"v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = SkewOps.saltedSumCount(df, Seq("k"), "v")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("salted join equals plain join on skewed key") {
    val left = ((1 to 5000).map(_ => 1L) ++ (2L to 100L)).toDF("id")
    val right = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "payload")
    val plain = left.join(right, "id").groupBy($"id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = SkewOps.saltedJoin(left, right, "id").groupBy($"id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == plain)
  }

  test("keyHistogram surfaces the hot key first") {
    val df = ((1 to 100).map(_ => "hot") ++ Seq("a", "b")).toDF("k")
    val top = SkewOps.keyHistogram(df, $"k").collect()
    assert(top(0).getString(0) == "hot" && top(0).getLong(1) == 100L)
  }

  test("IVF leaves no persistent RDDs behind (training cache released)") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    Similarity.annIvfTopK(spark, sf).count()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked persistent RDDs: $leaked")
  }

  test("IVF centroid-reuse path equals the self-fitting path") {
    // Fit once, persist the (tiny) centroid array, search many times
    // — the production deployment shape. Same seed → same quantizer →
    // identical results to the self-fitting query.
    val centroids = Similarity.fitIvfCentroids(spark, sf)
    val reused = Similarity.annIvfTopK(spark, sf, centroids).collect().map(_.toSeq)
    val selfFit = Similarity.annIvfTopK(spark, sf).collect().map(_.toSeq)
    assert(reused.toSeq == selfFit.toSeq)
  }

  test("IVF ANN achieves reasonable recall of brute-force top-10") {
    val exact = Similarity.cosineTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.annIvfTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall (${(exact & ivf).size}/${exact.size})")
  }
}
