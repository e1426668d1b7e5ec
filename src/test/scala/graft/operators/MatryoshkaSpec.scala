package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** The truncation audit's contract: signal concentrated in the
  * leading dims gives perfect recall at every budget covering them;
  * signal hidden in the tail degrades truncated recall; the readout
  * is exact-integer and deterministic. */
class MatryoshkaSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val D = Similarity.EmbeddingDim

  private def frame(rows: Seq[(Long, Array[Float])]) = {
    import spark.implicits._
    rows.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
  }

  // Three tight clusters separated in the FIRST TWO dims; tail zero.
  private def headSignal: Seq[(Long, Array[Float])] =
    (for (c <- 0 until 3; j <- 0 until 6) yield {
      val v = Array.fill(D)(0.0f)
      v(0) = math.cos(c * 2.0).toFloat
      v(1) = math.sin(c * 2.0).toFloat
      v(c + 2) = 0.01f * (j + 1) // tiny within-cluster jitter
      ((c * 10 + j).toLong, v)
    })

  test("head-concentrated signal: perfect recall at every budget >= 8") {
    val emb = frame(headSignal)
    val queries = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val out = Similarity.matryoshkaOf(emb, queries, budgets = Seq(D, 16, 8))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(D.toLong) == 1000000L)
    assert(out(16L) == 1000000L, out)
    assert(out(8L) == 1000000L, out)
  }

  test("tail-hidden signal degrades truncated recall") {
    // Clusters separated ONLY in the last dims; heads identical.
    val rows = (for (c <- 0 until 3; j <- 0 until 6) yield {
      val v = Array.fill(D)(0.0f)
      v(0) = 1.0f
      v(D - 1 - c) = 2.0f
      v(D - 10 - c) = 0.01f * (j + 1)
      ((c * 10 + j).toLong, v)
    })
    val emb = frame(rows)
    val queries = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val out = Similarity.matryoshkaOf(emb, queries, budgets = Seq(D, 8))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(D.toLong) == 1000000L)
    // At 8 dims every vector looks identical (all heads equal): the
    // top-k falls back to id order and misses cluster neighbors.
    assert(out(8L) < 1000000L, out)
  }
}
