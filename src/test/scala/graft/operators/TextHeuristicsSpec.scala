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

  test("charset: \\x0B is ASCII whitespace on BOTH regex engines (planted)") {
    // Java's \s includes \x0B, RE2's does not — the t_charset class
    // therefore spells its whitespace out explicitly. This fixture
    // pins the intended semantics: vertical tab and the other four
    // whitespace members count as ASCII; real non-ASCII letters
    // count once per char.
    val vt = 11.toChar // literal \x0B in source trips binary-file grep
    val dir = java.nio.file.Files.createTempDirectory("graft_charset").toString
    graft.TestFixtures.canonDocs(Seq(
      (1L, s"ab${vt}cd\tx\n \f\r"), // all five whitespace flavors: na = 0
      (2L, "café è!"))        // two non-ASCII letters: na = 2
      .toDF("doc_id", "text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.charsetProfile(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("n_docs") == 2L)
    assert(r.getAs[Long]("n_nonascii") == 2L,
      s"expected only the 2 accented letters non-ASCII, got ${r.getAs[Long]("n_nonascii")}")
  }
}
