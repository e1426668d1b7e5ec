package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** Planted layouts for the exact-substring span dedup: shared spans
  * mid-doc / at-edges / whole-doc, adjacent shared spans merging into
  * one maximal span, a 6-token span covered by a 2-shingle chain,
  * and the two keep cases (unique text; WITHIN-doc repetition, which
  * cross-doc dedup must not touch). */
class SpanDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("cross-doc spans are struck, maximal and merged; unique and within-doc kept") {
    import spark.implicits._
    val S = (1 to 7).map(i => s"s$i").mkString(" ")  // 7-token shared span
    val T1 = (1 to 5).map(i => s"t$i").mkString(" ") // 5-token spans,
    val T2 = (1 to 5).map(i => s"u$i").mkString(" ") // adjacent in doc 5
    val V = (1 to 6).map(i => s"v$i").mkString(" ")  // 6 tokens = 2-shingle chain
    val docs = Seq(
      1L -> s"a1 a2 $S a3",   // span mid-doc
      2L -> s"b1 $S",         // span at the tail
      3L -> "c1 c2 c3 c4 c5 c6", // unique — untouched
      4L -> S,                // whole doc covered
      5L -> s"$T1 $T2",       // two adjacent shared spans → ONE span
      6L -> s"f1 $T1",
      7L -> s"$T2 g1",
      8L -> "r1 r2 r3 r4 r5 r1 r2 r3 r4 r5", // within-doc repeat only
      9L -> V,
      10L -> s"h1 $V"
    ).toDF("doc_id", "text")
    val got = Pipeline.spanDedupOf(docs, minTokens = 5).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))).toMap
    assert(got(1L) == ((10L, 1L, 7L, md5hex("a1 a2 a3"))), got(1L).toString)
    assert(got(2L) == ((8L, 1L, 7L, md5hex("b1"))), got(2L).toString)
    assert(got(3L) == ((6L, 0L, 0L, md5hex("c1 c2 c3 c4 c5 c6"))))
    assert(got(4L) == ((7L, 1L, 7L, md5hex(""))), got(4L).toString)
    assert(got(5L) == ((10L, 1L, 10L, md5hex(""))),
      s"adjacent spans must merge into one: ${got(5L)}")
    assert(got(6L) == ((6L, 1L, 5L, md5hex("f1"))))
    assert(got(7L) == ((6L, 1L, 5L, md5hex("g1"))))
    assert(got(8L) == ((10L, 0L, 0L,
      md5hex("r1 r2 r3 r4 r5 r1 r2 r3 r4 r5"))),
      s"within-doc repetition is not cross-doc duplication: ${got(8L)}")
    assert(got(9L) == ((6L, 1L, 6L, md5hex(""))),
      s"6-token span = 2-shingle chain must cover all 6: ${got(9L)}")
    assert(got(10L) == ((7L, 1L, 6L, md5hex("h1"))))
  }

  test("a doc shorter than one shingle is kept verbatim") {
    import spark.implicits._
    val docs = Seq(1L -> "x1 x2 x3", 2L -> "x1 x2 x3").toDF("doc_id", "text")
    // identical 3-token docs, but no 5-shingle exists → nothing marked
    val got = Pipeline.spanDedupOf(docs, minTokens = 5).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(1L) == ((0L, 0L, md5hex("x1 x2 x3"))))
    assert(got(2L) == ((0L, 0L, md5hex("x1 x2 x3"))))
  }
}
