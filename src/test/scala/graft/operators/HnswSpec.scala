package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** e_hnsw is rows-only (an iterative layer-stack descent has no SQL
  * form): these pin (1) determinism — the md5-bridge level
  * assignment plus exact integer ranks make the whole stack
  * replayable, so two cold runs must emit identical rows; (2) the
  * result contract (every query carries exactly k ranked rows); and
  * (3) the sampled-recall floor vs brute force on the real corpus —
  * the composition must not fall below the flat beam search it
  * upgrades (both end in the same layer-0 exact-rescored descent;
  * the stack only changes WHERE search enters).
  */
class HnswSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("e_hnsw: deterministic across cold runs") {
    val a = Similarity.hnswTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    graft.graph.GraphOps.clearAllMemos(spark)
    val b = Similarity.hnswTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(a.toSeq == b.toSeq)
  }

  test("e_hnsw: empty NOMINAL top layer falls back to the highest " +
      "realized level (k rows per query, never zero)") {
    // ADVICE r17: levels are hash-assigned, so the nominal top layer
    // is empty with P ≈ e^-8 per corpus — and an empty entry set used
    // to stay empty through every layer and return ZERO rows. Plant a
    // corpus whose every vertex hashes below level 1 (u ≥ 125000 ⇒
    // lvl 0 at maxLevel 1), forcing the fallback.
    def u(id: Long): Long =
      graft.functions.MinHashSig.bridge60(s"$id:hnsw") % 1000000L
    val ids = (0L until 4096L).filter(u(_) >= 125000L)
    val queryIds = ids.filter(_ < Similarity.QueryLimit).take(4)
    val corpusIds = (queryIds ++ ids.filter(_ >= Similarity.QueryLimit)
      .take(16 - queryIds.size)).distinct
    assert(queryIds.nonEmpty && corpusIds.size >= Similarity.TopK + 1)
    def vec(axis: Int): Seq[Float] =
      (0 until Similarity.EmbeddingDim).map(i => if (i == axis) 1f else 0.01f)
    val dir = java.nio.file.Files.createTempDirectory("graft_hnswtop").toString
    import spark.implicits._
    graft.TestFixtures.canonEmb(
      corpusIds.zipWithIndex.map { case (id, i) => (id, vec(i % 32)) }
        .toDF("vec_id", "embedding")).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Similarity.hnswTopK(spark, dir).collect()
    val perQuery = rows.groupBy(_.getLong(0))
    assert(perQuery.keySet == queryIds.toSet,
      s"queries answered: ${perQuery.keySet} != planted $queryIds")
    perQuery.foreach { case (_, rs) =>
      assert(rs.length == Similarity.TopK, s"expected k rows, got ${rs.length}")
    }
  }

  test("e_hnsw: k ranked rows per query and the recall floor") {
    val rows = Similarity.hnswTopK(spark, sf).collect()
    val perQuery = rows.groupBy(_.getLong(0))
    assert(perQuery.nonEmpty)
    perQuery.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(2)).sorted.toSeq == (1 to Similarity.TopK))
    }
    // recall_e2 is constant per query (withRecall); average it once
    // per query. The sign-LSH base gets ~0.9 on this corpus and one
    // NN-descent round plus exact-rescored descent must not drop the
    // composition below the flat-search floor.
    val recalls = perQuery.map { case (_, rs) => rs.head.getLong(4) }
    val mean = recalls.sum.toDouble / recalls.size
    assert(mean >= 70.0, s"mean recall_e2 $mean below floor")
  }
}
