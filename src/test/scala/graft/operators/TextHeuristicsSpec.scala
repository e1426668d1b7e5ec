package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** Planted code-vs-prose routing cases: both verdict clauses (symbol
  * density, keyword-kind votes) fire independently, prose stays cold,
  * and counts are exact.
  */
class TextHeuristicsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def detect(docs: (Long, String)*): Map[Long, (Long, Long, Long, Boolean)] =
    TextAnalysis.codeDetectOf(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap

  test("symbol-dense text trips the density clause alone") {
    val got = detect((1L, "x = (a); y = f(b[0]);"))
    val (nSym, ratio, kw, isCode) = got(1L)
    assert(nSym == 10L) // two each of = ( ) ; plus [ ]
    assert(ratio >= 300 && isCode && kw == 0)
  }

  test("keyword kinds vote without any symbols") {
    val got = detect((1L, "def foo return bar import baz plain words"))
    val (nSym, _, kw, isCode) = got(1L)
    assert(nSym == 0L && kw == 3L && isCode)
    // presence not frequency: repeating one keyword is a single kind
    val rep = detect((2L, "if if if if if"))
    assert(rep(2L)._3 == 1L && !rep(2L)._4)
  }

  test("prose stays cold on both clauses") {
    val got = detect((1L, "the quick brown fox jumps over the lazy dog"))
    assert(got(1L) == ((0L, 0L, 0L, false)))
  }
}
