package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("resize shrinks payloads by the stride factor and is deterministic") {
    val a = Multimodal.resize(spark, sf, 8).collect().sortBy(_.doc_id)
    a.foreach { r =>
      assert(r.thumb_bytes == (r.orig_bytes + 7) / 8,
        s"doc ${r.doc_id}: ${r.orig_bytes} -> ${r.thumb_bytes}")
    }
    val b = Multimodal.resize(spark, sf, 8).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
  }

  test("feature extraction yields sane byte statistics") {
    val feats = Multimodal.extractFeatures(spark, sf).collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.mean_byte > 0 && f.mean_byte < 255)
      assert(f.distinct_bytes > 0 && f.distinct_bytes <= 256)
      // entropy of text bytes: 0 < H <= log2(256) = 8
      assert(f.entropy_e4 > 0 && f.entropy_e4 <= 80000)
    }
  }
}
