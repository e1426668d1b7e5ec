package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.Tables
import graft.graph.SparkTestSession
import graft.functions.VectorFunctions.cosine

/** Range-search semantics: the result is EXACTLY the brute-force
  * threshold set — nothing below τ admitted, nothing at/above τ
  * dropped — with the τ compare on the e4-rounded integer so the
  * boundary is engine-exact.
  */
class RangeSearchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("range search equals the brute-force threshold set at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val tau = 3000L
    val got = Similarity.rangeSearch(spark, dir, tau).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap

    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val q = emb.filter(col("vec_id") < Similarity.QueryLimit)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val want = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(cosine(col("qe"), col("embedding")) * 1e4).cast("long").as("s"))
      .filter(col("s") >= tau)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap

    assert(got.nonEmpty)
    assert(got == want,
      s"range set mismatch: extra=${got.keySet -- want.keySet} missing=${want.keySet -- got.keySet}")
  }

  test("boundary is inclusive on the rounded integer") {
    import spark.implicits._
    // Hand-planted pair whose e4-rounded similarity is EXACTLY τ:
    // cos((1,0),(0.3,√(1-0.09))) = 0.3 → sim_e4 = 3000 — must be kept.
    val a = Seq(1.0f, 0.0f)
    val b = Seq(0.3f, math.sqrt(1 - 0.09).toFloat)
    val df = Seq((0L, a), (100L, b)).toDF("vec_id", "embedding")
    val kept = df.as("e").crossJoin(
        df.filter(col("vec_id") === 0L).select(col("vec_id").as("qid"),
          col("embedding").as("qe")))
      .filter(col("vec_id") =!= col("qid"))
      .select(round(cosine(col("qe"), col("embedding")) * 1e4).cast("long").as("s"))
      .filter(col("s") >= 3000L)
      .count()
    assert(kept == 1L)
  }
}
