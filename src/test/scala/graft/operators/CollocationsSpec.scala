package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** PMI collocation semantics on a planted corpus: an always-together
  * pair outranks frequent-but-promiscuous pairs, hapax pairs are
  * gated out by min count, and equal-PMI ties break alphabetically
  * (the deterministic-ranking contract).
  */
class CollocationsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def planted = {
    import spark.implicits._
    // N = 41 bigram positions: "san francisco" ×10 (exclusive pair),
    // "the aaa" ×5 / "the bbb" ×5 / "the ccc" ×20 (shared first
    // word), "zzz qqq" ×1 (hapax — below min count).
    val texts = Seq.fill(10)("san francisco") ++
      Seq.fill(5)("the aaa") ++ Seq.fill(5)("the bbb") ++
      Seq.fill(20)("the ccc") ++ Seq("zzz qqq")
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("exclusive pair ranks first, hapax gated, ties alphabetical") {
    val rows = TextAnalysis.collocationsOf(planted, k = 25, minCount = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // pmi(san francisco) = ln(10·41/(10·10)) = ln 4.1 — the top pair.
    assert(rows.head._1 == "san francisco")
    assert(rows.head._2 == 10L)
    assert(rows.head._3 == math.round(math.log(4.1) * 1e4))
    assert(!rows.exists(_._1 == "zzz qqq"), "hapax must be min-count gated")
    // "the aaa" (5·41/(30·5)) and "the ccc" (20·41/(30·20)) tie at
    // ln(41/30); the ranking breaks the tie by bigram ascending.
    val aaa = rows.find(_._1 == "the aaa").get
    val ccc = rows.find(_._1 == "the ccc").get
    assert(aaa._3 == ccc._3)
    assert(rows.indexWhere(_._1 == "the aaa") < rows.indexWhere(_._1 == "the ccc"))
    assert(aaa._3 == math.round(math.log(41.0 / 30.0) * 1e4))
  }

  test("corpus run emits a full deterministic top-k") {
    val a = TextAnalysis.collocations(spark, "/root/testdata/sf0.001").collect()
    val b = TextAnalysis.collocations(spark, "/root/testdata/sf0.001").collect()
    assert(a.nonEmpty && a.length <= 25)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }
}
