package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** Distributed PCA power iteration: a planted anisotropic cloud must
  * recover its axis, and the exact integer Gram makes the whole
  * result bit-identical under any partitioning.
  */
class PcaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def cloud = {
    // Points t·(1, 2, 0, …, 0) for t in −5..5 (plus a tiny fixed
    // off-axis pair so the matrix isn't rank-1 degenerate): variance
    // concentrates on the (1,2)/√5 axis — loadings 0.4472 / 0.8944.
    val d = Similarity.EmbeddingDim
    val onAxis = (-5 to 5).map { t =>
      val v = Array.fill(d)(0.0f)
      v(0) = 0.01f * t
      v(1) = 0.02f * t
      v
    }
    val off = Seq({
      val v = Array.fill(d)(0.0f); v(2) = 0.001f; v
    }, {
      val v = Array.fill(d)(0.0f); v(2) = -0.001f; v
    })
    (onAxis ++ off).zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("vec_id", "embedding")
  }

  test("planted anisotropic cloud recovers the (1,2)/sqrt(5) axis") {
    val r = Similarity.pcaPowerOf(spark, cloud).collect().head
    assert(r.getLong(0) == 13L)
    val dims = r.getString(3).split(",").take(2).map(_.toInt).toSeq
    assert(dims == Seq(1, 0), s"top dims ${r.getString(3)}")
    val loads = r.getString(4).split(",").take(2).map(_.toLong)
    // 0.8944 and 0.4472 at e4, ±2 for the e16 quantization.
    assert(math.abs(loads(0) - 8944L) <= 2, loads.mkString(","))
    assert(math.abs(loads(1) - 4472L) <= 2, loads.mkString(","))
    // Nearly all variance on PC1.
    assert(r.getLong(2) > 990000L)
  }

  test("bit-identical under any partitioning (exact integer Gram)") {
    val a = Similarity.pcaPowerOf(spark, cloud.repartition(16))
      .collect().head.toSeq
    val b = Similarity.pcaPowerOf(spark, cloud.coalesce(1))
      .collect().head.toSeq
    assert(a == b)
  }

  test("real embeddings: PC1 share is a proper fraction and n matches") {
    val r = Similarity.pcaPower(spark, "/root/testdata/sf0.001").collect().head
    assert(r.getLong(0) > 0)
    assert(r.getLong(2) > 0 && r.getLong(2) <= 1000000L)
  }
}
