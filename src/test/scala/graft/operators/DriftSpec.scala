package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession
import java.sql.Timestamp

/** Hand-computed PSI contracts for the round-13 drift monitors:
  * parity-half token drift with add-one smoothing, and calendar-
  * cohort spend drift over the fixed 10-bin spine (empty bins emit
  * the smoothing floor, one-sided bins the large terms).
  */
class DriftSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("token drift: hand-computed PSI terms on the parity halves") {
    // ref (doc 0): "a a b"; cur (doc 1): "a b b b" → a: (2,1),
    // b: (1,3); denominators 3+50 / 4+50. Terms: a = 8299,
    // b = 24508 (both ≥ 0; b moved more → ranks first).
    val dir = java.nio.file.Files.createTempDirectory("graft_tdrift").toString
    graft.TestFixtures.canonDocs(Seq(
      (0L, "a a b"), (1L, "a b b b")).toDF("doc_id", "text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.tokenDrift(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(("b", 1L, 3L, 24508L), ("a", 2L, 1L, 8299L)))
  }

  test("embed drift: cross-multiplied shift exact on planted halves") {
    // ref (vec 0, 2): dim0 = 1.0, 0.5; cur (vec 1, 3): dim0 = -0.5,
    // -1.0 → q sums (e16): ref 98304, cur -98304, shift =
    // |98304·2 − (−98304)·2| = 393216. dim1 matches across halves
    // (shift 0) — negative per-half sums are exactly the case the
    // division-free form exists for.
    val D = Similarity.EmbeddingDim
    def vec(x0: Float, x1: Float): Seq[Float] = {
      val v = Array.fill(D)(0.0f); v(0) = x0; v(1) = x1; v.toSeq
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_edrift").toString
    graft.TestFixtures.canonEmb(Seq(
      (0L, vec(1.0f, -0.25f)), (2L, vec(0.5f, -0.25f)),
      (1L, vec(-0.5f, -0.25f)), (3L, vec(-1.0f, -0.25f)))
      .toDF("vec_id", "embedding"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    // The DECIMAL(38,0) cross-multiply is internal since round 15
    // (SURVEY §6 emitted-type rule); emitted is the bounded
    // shift_e6q = shift_x·1e6 div (n_ref·n_cur) = 393216e6 div 4.
    val got = Similarity.embedDrift(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.head == ((0L, 98304L, -98304L, 2L, 2L, 98304000000L)))
    // dim 1: both halves sum 2·round(−0.25·65536) = −32768 → shift 0
    val d1 = got.find(_._1 == 1L).get
    assert(d1 == ((1L, -32768L, -32768L, 2L, 2L, 0L)))
    // every other dim is all-zero; output is all 64 dims
    assert(got.length == D && got.count(_._6 == 0L) == D - 1)
  }

  test("spend drift: cohort split, fixed bins, smoothing on empty bins") {
    // ref (1997): bins 0 and 1; cur (1999): bin 0 once, bin 9 twice.
    // Empty-both bins emit the smoothing floor 513; the one-sided
    // bins emit the large terms (bin1 = 69389 ref-only, bin9 =
    // 150174 cur-only).
    val dir = java.nio.file.Files.createTempDirectory("graft_qpsi").toString
    def ts(s: String) = Timestamp.valueOf(s)
    Seq(
      (1L, 1L, "O", 10000.0, ts("1997-01-01 00:00:00"), "P"),
      (2L, 1L, "O", 60000.0, ts("1997-06-01 00:00:00"), "P"),
      (3L, 2L, "O", 10000.0, ts("1999-01-01 00:00:00"), "P"),
      (4L, 2L, "O", 460000.0, ts("1999-06-01 00:00:00"), "P"),
      (5L, 2L, "O", 499000.0, ts("1999-07-01 00:00:00"), "P"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Relational.qPsiDrift(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = Seq(
      (0L, 1L, 1L, 1026L), (1L, 1L, 0L, 69389L)) ++
      (2L to 8L).map(b => (b, 0L, 0L, 513L)) :+ (9L, 0L, 2L, 150174L)
    assert(got.toSeq == expected)
  }

  test("jsd: identical sources score exactly zero; skew matches the" +
      " plain-Scala recomputation") {
    // X and Y carry identical token counts → every p = q, every
    // ln(1) = 0 term rounds to exactly 0. Z is all-b, so the (X,Z)
    // and (Y,Z) rows equal each other and the closed-form terms.
    val dir = java.nio.file.Files.createTempDirectory("graft_jsd").toString
    graft.TestFixtures.canonDocs(Seq(
      (0L, "a a b", "X"), (1L, "a a b", "Y"), (2L, "b b b b", "Z"))
      .toDF("doc_id", "text", "source"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.jsdMatrix(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    def term(ca: Long, na: Long, cb: Long, nb: Long): Long = {
      val p = (ca + 1).toDouble / (na + 50)
      val q = (cb + 1).toDouble / (nb + 50)
      val m = (p + q) / 2
      math.round((p * math.log(p / m) + q * math.log(q / m)) / 2 * 1e6)
    }
    val xz = term(2, 3, 0, 4) + term(1, 3, 4, 4)
    assert(got == Seq(("X", "Y", 2L, 0L), ("X", "Z", 2L, xz),
      ("Y", "Z", 2L, xz)))
    assert(xz > 0L)
  }

  test("textrank: the co-occurrence hub outranks its spokes") {
    // "hub a hub b hub c": every adjacency involves hub — spokes a/b
    // sit in two windows (weight 2), the sentence-final c in one
    // (weight 1). Integer PageRank must rank hub strictly first,
    // a = b by symmetry, c strictly last, bit-stable across runs.
    val dir = java.nio.file.Files.createTempDirectory("graft_trank").toString
    graft.TestFixtures.canonDocs(Seq(
      (0L, "hub a hub b hub c"), (1L, "hub a hub b hub c"))
      .toDF("doc_id", "text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.textRank(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.length == 4 && got.head._1 == "hub")
    val byTok = got.toMap
    assert(byTok("a") == byTok("b"))
    assert(got.head._2 > byTok("a") && byTok("a") > byTok("c"))
    val again = TextAnalysis.textRank(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(again == got)
  }
}
