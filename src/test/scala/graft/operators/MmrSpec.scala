package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** MMR diversification: plain top-k returns redundant near-copies;
  * MMR's redundancy penalty swaps the second copy for the distinct
  * answer. Planted geometry makes the expected pick order exact.
  */
class MmrSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def vec(parts: (Int, Float)*): Seq[Float] = {
    val a = Array.fill(64)(0f)
    parts.foreach { case (i, v) => a(i) = v }
    a.toSeq
  }

  test("MMR picks the distinct answer over the duplicate; top-k does not") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mmr").toString
    // query 0 along axis 0; candidates: 100/101 near-identical high-sim
    // copies, 102 a distinct direction with moderate sim, 103 junk.
    Seq(
      (0L, vec(0 -> 1f)),
      (100L, vec(0 -> 1f, 1 -> 0.1f)),
      (101L, vec(0 -> 1f, 1 -> 0.1001f)),
      (102L, vec(0 -> 0.6f, 2 -> 0.8f)),
      (103L, vec(3 -> 1f))
    ).toDF("vec_id", "embedding")
      .transform(graft.TestFixtures.canonEmb)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // plain top-2 by cosine: the two duplicates
    val top = Similarity.cosineTopK(spark, dir)
      .filter($"query_id" === 0L).collect()
      .map(r => r.getLong(1)).take(2).toSeq
    assert(top == Seq(100L, 101L))

    // MMR top-3 with lambda=0.5: duplicate #2's redundancy penalty
    // (~1.0 vs the picked 100) drives its score negative — below even
    // the orthogonal zero-sim 103 — so the duplicate drops out of the
    // diversified list entirely.
    val mmr = Similarity.mmrTopK(spark, dir, k = 3, poolK = 4, lambdaE4 = 5000L)
      .filter($"query_id" === 0L).collect()
      .map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(mmr.map(_._2).toSeq == Seq(100L, 102L, 103L), mmr.mkString(","))
    assert(!mmr.map(_._2).contains(101L))
  }

  test("MMR at lambda=1 is exactly relevance order") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mmr1").toString
    Seq(
      (0L, vec(0 -> 1f)),
      (100L, vec(0 -> 1f, 1 -> 0.1f)),
      (101L, vec(0 -> 1f, 1 -> 0.2f)),
      (102L, vec(0 -> 0.5f, 2 -> 0.9f))
    ).toDF("vec_id", "embedding")
      .transform(graft.TestFixtures.canonEmb)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val mmr = Similarity.mmrTopK(spark, dir, k = 3, poolK = 3, lambdaE4 = 10000L)
      .filter($"query_id" === 0L).collect()
      .map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1).map(_._2)
    val top = Similarity.cosineTopK(spark, dir)
      .filter($"query_id" === 0L).collect().map(_.getLong(1)).take(3)
    assert(mmr.toSeq == top.toSeq)
  }
}
