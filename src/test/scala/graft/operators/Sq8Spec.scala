package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CatalystText
import graft.graph.SparkTestSession

/** SQ8 scalar quantization: dequantization error bounded by half a
  * step per dimension, the codegen'd scoring dot matches a driver
  * recomputation, and the shortlist + re-rank pipeline is
  * near-lossless on the real corpus.
  */
class Sq8Spec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("encode bounds the dequantization error by s/2 per dimension") {
    val mins = Array(-1.0, 0.0, 10.0)
    val scales = Array(2.0 / 255, 1.0 / 255, 0.0)
    val vecs = Seq(
      (1L, Seq(-1.0f, 0.0f, 10.0f)),
      (2L, Seq(1.0f, 1.0f, 10.0f)),
      (3L, Seq(0.123f, 0.456f, 10.0f)),
      (4L, Seq(-5.0f, 9.0f, 10.0f))) // out of fit range: clamped codes
    val out = vecs.toDF("id", "v")
      .select(col("id"), col("v"),
        CatalystText.sq8_encode(col("v"), mins, scales).as("c"))
      .collect()
    out.foreach { r =>
      val v = r.getSeq[Float](1)
      val c = r.getSeq[Int](2)
      assert(c.forall(x => x >= 0 && x <= 255))
      for (i <- 0 until 3) {
        val deq = mins(i) + c(i) * scales(i)
        val inRange = v(i) >= mins(i) && v(i) <= mins(i) + 255 * scales(i)
        if (inRange && scales(i) > 0)
          assert(math.abs(v(i) - deq) <= scales(i) / 2 + 1e-9,
            s"id ${r.getLong(0)} dim $i")
      }
    }
  }

  test("code_dot matches a driver-side recomputation") {
    val codes = Seq((1L, Seq(0, 128, 255), Seq(0.5, -1.0, 2.0)))
      .toDF("id", "c", "w")
    val got = codes.select(CatalystText.code_dot(col("c"), col("w")))
      .head().getDouble(0)
    assert(got == 0 * 0.5 + 128 * -1.0 + 255 * 2.0)
  }

  test("SQ8 shortlist + exact re-rank is near-lossless on the real corpus") {
    val out = Similarity.knnSq8WithRecall(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    val recallIdx = out.head.schema.fieldIndex("recall_e2")
    val mean = out.map(_.getLong(recallIdx).toDouble).sum / out.length
    assert(mean >= 95.0, s"mean recall_e2 $mean")
  }
}
