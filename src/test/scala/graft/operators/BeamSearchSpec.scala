package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** e_beam_search is rows-only (an iterative beam has no SQL form):
  * these pin (1) exact-recovery on planted geometry even from a BAD
  * entry point — the descent property that makes graph search work —
  * and (2) the sampled-recall floor vs the IVF path on the real
  * corpus (the VERDICT-r10 "done =" bar).
  */
class BeamSearchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("planted geometry: beam from a far entry point recovers the exact top-k") {
    import spark.implicits._
    // Two well-separated unit clusters in 64-d plus a deterministic
    // in-cluster spread: exact kNN is unambiguous, and the kNN graph
    // is connected within each cluster with a few cross links.
    val dim = 64
    def vec(center: Int, j: Int): Array[Float] = {
      val a = Array.fill(dim)(0.001f * ((center * 31 + j * 7) % 17))
      a(center) = 1f
      a(10 + (j % 5)) = 0.2f
      a
    }
    val rows = (0 until 20).map(j => (j.toLong, vec(0, j))) ++
      (20 until 40).map(j => (j.toLong, vec(40, j)))
    val emb = rows.toDF("vec_id", "embedding")
    val edges = Similarity.knnGraphOf(emb, 5)
      .select(col("vec_id"), col("neighbor_id"))
    val queries = emb.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val exact = Similarity.cosineTopKOf(emb, queries, 5)
      .orderBy(col("rank"))
      .collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Long]("sim_e4")))
    // Seed from the WORST in-cluster entry (the exact bottom-ranked
    // cluster-0 member for query 0): the beam's graph descent alone
    // must walk to the true top-k. This is the production contract —
    // IVF probing puts a seed in each candidate REGION; the graph
    // walk does the rest within it.
    val worst = Similarity.cosineTopKOf(emb, queries, 40)
      .filter(col("neighbor_id") < 20L)
      .orderBy(col("rank").desc).limit(1)
      .collect().head.getAs[Long]("neighbor_id")
    val seeds = Seq((0L, worst)).toDF("query_id", "vec_id")
    val got = Similarity.beamSearchFrom(emb, edges, queries, seeds,
        k = 5, beamWidth = 8, rounds = 5)
      .orderBy(col("rank"))
      .collect().map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Long]("sim_e4")))
    assert(got.toSeq == exact.toSeq)
    // And the flat-graph failure mode stays pinned: the two planted
    // clusters are so separated that the kNN graph keeps NO cross
    // links, so a wrong-cluster seed CANNOT reach the true top-k —
    // the measured reason entry points must come per probed region
    // (multi-cell IVF seeding), not from one global entry.
    val wrongSeed = Seq((0L, 39L)).toDF("query_id", "vec_id")
    val stuck = Similarity.beamSearchFrom(emb, edges, queries, wrongSeed,
        k = 5, beamWidth = 8, rounds = 5)
      .agg(max(col("sim_e4"))).head().getLong(0)
    assert(stuck < 5000L,
      s"clusters unexpectedly linked (max sim_e4 $stuck) — planted geometry drifted")
  }

  test("real-corpus sampled recall >= the IVF path at the same query budget") {
    def avgRecall(df: org.apache.spark.sql.DataFrame): Double = {
      val r = df.select(col("query_id"), col("recall_e2")).distinct()
        .agg(avg(col("recall_e2"))).head().getDouble(0)
      r
    }
    val beam = avgRecall(Similarity.beamSearchTopK(spark, sf))
    val ivf = avgRecall(Similarity.annIvfTopK(spark, sf))
    assert(beam >= ivf,
      s"beam recall $beam fell below the IVF path's $ivf")
    assert(beam >= 50.0, s"beam recall $beam below the 0.5 floor")
  }
}
