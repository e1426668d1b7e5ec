package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** Contracts of the round-12 embedding audits:
  *  - recall curve: complete candidates reproduce the exact answer at
  *    every k; cluster-restricted candidates stay perfect while truth
  *    is in-cluster and can only lose recall past it.
  *  - isotropy: identical vectors → the mean explains ~everything;
  *    a symmetric ±v corpus → the mean explains ~nothing.
  */
class EmbedAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val D = Similarity.EmbeddingDim

  private def frame(rows: Seq[(Long, Array[Float])]) = {
    import spark.implicits._
    rows.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
  }

  // Three tight clusters (ids c*10+j): unit direction along dim c,
  // member-unique tiny jitter — in-cluster cosine ≈ 1, cross ≈ 0.
  private def clustered: Seq[(Long, Array[Float])] =
    for (c <- 0 until 3; j <- 0 until 10) yield {
      val v = Array.fill(D)(0.0f)
      v(c) = 1.0f
      v(10 + j) = 0.05f * (j + 1)
      ((c * 10 + j).toLong, v)
    }

  test("recall curve: complete candidates give exact recall at every k") {
    val emb = frame(clustered)
    val all = emb.select(col("vec_id"))
      .crossJoin(emb.select(col("vec_id").as("candidate_id")))
      .filter(col("vec_id") =!= col("candidate_id"))
    val out = Similarity.recallCurveOf(emb, all, ks = Seq(1, 5, 9))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 1000000L, 5L -> 1000000L, 9L -> 1000000L), out)
  }

  test("recall curve: tiny corpus (< kMax+1 vectors) still reports perfect recall") {
    // 5 vectors → every query has only 4 truth neighbors at k = 10;
    // the denominator must come from the ACTUAL truth rows (4), not
    // nq·k (10), or perfect candidates would read as recall 0.4.
    val emb = frame(clustered.take(5))
    val all = emb.select(col("vec_id"))
      .crossJoin(emb.select(col("vec_id").as("candidate_id")))
      .filter(col("vec_id") =!= col("candidate_id"))
    val out = Similarity.recallCurveOf(emb, all, ks = Seq(1, 4, 10))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
    // n_truth caps at 4 per query past k = 4; recall perfect at all k.
    assert(out == Seq((1L, 5L, 1000000L), (4L, 20L, 1000000L),
      (10L, 20L, 1000000L)), out)
  }

  test("recall curve: cluster-blocked candidates perfect in-cluster, lossy past it") {
    val emb = frame(clustered)
    val withC = emb.select(col("vec_id"), (col("vec_id") / 10).cast("int").as("c"))
    val blocked = withC.join(
        withC.select(col("vec_id").as("candidate_id"), col("c")), Seq("c"))
      .filter(col("vec_id") =!= col("candidate_id"))
      .select(col("vec_id"), col("candidate_id"))
    val out = Similarity.recallCurveOf(emb, blocked, ks = Seq(5, 9, 10))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // 9 in-cluster neighbors and in-cluster cosine dominates: truth
    // top-9 is exactly the cluster, so blocking is lossless to k=9.
    assert(out(5L) == 1000000L, out)
    assert(out(9L) == 1000000L, out)
    // The 10th truth neighbor is cross-cluster — unreachable.
    assert(out(10L) < 1000000L, out)
  }

  test("isotropy: identical vectors → mean explains ~all; ±v corpus → ~none") {
    val one = Array.fill(D)(0.0f); one(0) = 1.0f; one(1) = 0.5f
    val same = frame((0L until 8L).map(i => (i, one)))
    val hi = Similarity.isotropyOf(same).collect().head.getLong(3)
    assert(hi > 999000L && hi <= 1000000L, hi)
    val neg = one.map(x => -x)
    val sym = frame((0L until 8L).map(i => (i, if (i % 2 == 0) one else neg)))
    val lo = Similarity.isotropyOf(sym).collect().head.getLong(3)
    assert(lo < 1000L, lo)
  }

  test("abtt whitening: planted common direction removed, mean zeroed") {
    // Every vector spreads WIDELY along e0 (0.5·i — PC1 of the
    // centered Gram is ~e0 and dominates the variance) over a flat
    // per-vector noise floor; after mean+PC1 removal only the noise
    // spectrum remains.
    val rows = (0 until 16).map { i =>
      val v = Array.fill(D)(0.0f)
      v(0) = 0.5f * i
      v(8 + i) = 0.5f
      (i.toLong, v)
    }
    val out = Similarity.abttWhitenOf(spark, frame(rows)).collect().head
    val (before, after) = (out.getLong(1), out.getLong(2))
    val (muB, muA) = (out.getLong(3), out.getLong(4))
    // The jitter variance along e0 plus the mean-heavy direction
    // dominate pass 1; pass 2 must collapse to the flat noise floor.
    assert(after < before / 2, s"$before -> $after")
    // Mean energy: huge before (2·65536² along dim 0 alone), ≤ d + a
    // rounding margin after (floor-div + per-row re-quantization).
    assert(muB > 1000000000L && muA <= 4L * D, s"$muB -> $muA")
  }

  test("twonn intrinsic dimension: exact ledger on a planted 1-D grid") {
    // Ten points on the dim-0 integer grid: interior points have
    // r1 = r2 (ln μ = 0); only the two endpoints contribute
    // ln(4)/2·1e6 = 693147 each → sum 1386294, d̂ = 10e6/1386294
    // → id_e4 = 72135. (TwoNN assumes Poisson spacing, so a rigid
    // grid UNDER-estimates — the spec pins the ledger, not the
    // asymptotic claim.)
    val rows = (0 until 10).map { i =>
      val v = Array.fill(D)(0.0f); v(0) = i.toFloat; (i.toLong, v)
    }
    val r = Similarity.intrinsicDimOf(frame(rows)).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2))
      == ((10L, 1386294L, 72135L)))
    // Exact duplicates have r1 = 0 and undefined μ: both members
    // drop out (the paper's own preprocessing), everyone else's
    // two-NN ledger is unchanged except the absorbed endpoint.
    val dup = rows :+ (10L, rows.head._2)
    val r2 = Similarity.intrinsicDimOf(frame(dup)).collect().head
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2))
      == ((9L, 693147L, 129843L)))
  }

  test("twonn dispatch: LSH-shortlist branch matches exact on scaled clusters") {
    // Four clusters of three positively-scaled copies of a unit
    // direction: sign-LSH keys are scale-invariant, so every cluster
    // member shares ALL band keys with its true 1-NN and 2-NN (both
    // in-cluster — cross-cluster squared distances are ≥ 2·65536²
    // vs ≤ (0.5·65536)² within). The shortlist therefore CONTAINS
    // the exact 2-NN and both dispatch branches must agree
    // bit-for-bit — the knnGraphOf both-branches discipline applied
    // to the round-15 e_intrinsic_dim dispatch.
    val rows = for (c <- 0 until 4; s <- 0 until 3) yield {
      val v = Array.fill(D)(0.0f)
      v(c) = 1.0f + 0.25f * s
      ((c * 3 + s).toLong, v)
    }
    val exact = Similarity.intrinsicDimOf(frame(rows)).collect().head
    val short = Similarity.intrinsicDimOf(frame(rows), exactMaxRows = 0L)
      .collect().head
    assert((exact.getLong(0), exact.getLong(1), exact.getLong(2))
      == ((short.getLong(0), short.getLong(1), short.getLong(2))))
    assert(exact.getLong(0) == 12L)
  }
}
