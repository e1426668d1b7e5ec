package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** Contracts for the two round-11 compression audits: binary
  * quantization's exact re-rank can only help (and recovers planted
  * sign-separable geometry perfectly), and BPE fertility can only
  * shrink from the character baseline as merges train. */
class QuantFertilitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val D = Similarity.EmbeddingDim

  test("binary quant: planted sign-separable clusters → perfect re-rank recall") {
    import spark.implicits._
    // Three clusters with DISTINCT sign patterns (dims 0-2 carry the
    // pattern, small positive jitter elsewhere keeps signs stable).
    val rows = (for (c <- 0 until 3; j <- 0 until 6) yield {
      val v = Array.tabulate(D) { i =>
        if (i < 3) (if (((c >> (i % 2)) & 1) == 1) 1.0f else -1.0f)
        else 0.001f * ((c * 7 + j + i) % 5 + 1)
      }
      v(3 + c) = 0.01f * (j + 1)
      ((c * 10 + j).toLong, v.toSeq)
    }).toDF("vec_id", "embedding")
    val queries = rows.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val out = Similarity.binaryQuantOf(rows, queries, k = 3, shortlist = 8)
      .collect().head
    val (ham, rr) = (out.getLong(1), out.getLong(2))
    assert(rr >= ham, s"rerank=$rr < hamming=$ham")
    assert(rr == 1000000L, s"rerank recall $rr")
  }

  test("fertility: trained merges only shrink from the char baseline") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the the the the quick quick brown fox", "a"),
      (2L, "the quick quick the the jumps over dog", "b"))
      .toDF("doc_id", "text", "source")
    val trained = TextAnalysis.fertilityOf(spark, docs, rounds = 8)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4))).toMap
    for ((src, (nWords, fert, base)) <- trained) {
      assert(nWords > 0)
      assert(fert <= base, s"$src: fert=$fert > base=$base")
      assert(fert >= 10000L, s"$src: fertility below 1 sym/word")
    }
    // Zero rounds ⇒ fertility EQUALS the character baseline.
    val untrained = TextAnalysis.fertilityOf(spark, docs, rounds = 0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4))).toMap
    for ((src, (fert, base)) <- untrained)
      assert(fert == base, s"$src untrained: $fert != $base")
    // And training strictly helps on this repetitive corpus.
    assert(trained("a")._2 < untrained("a")._1)
  }
}
