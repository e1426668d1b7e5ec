package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** Flesch readability: hand-computed counters and score on planted
  * docs, including the empty-text floor conventions.
  */
class ReadabilitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("counters and score match hand computation") {
    val docs = Seq(
      (1L, "The cat. It sat!"),
      (2L, ""),
      (3L, "strength")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.readabilityOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    // doc 1: words 4, sentence runs "." "!" = 2, vowel groups e/a/i/a = 4
    //   flesch = 206.835 - 1.015*(4/2) - 84.6*(4/4) = 120.205
    // doc 2: empty -> w=1 (the "" token), s floor 1, sy 0 -> 205.82
    // doc 3: one word, vowel group "e" = 1 -> 206.835-1.015-84.6 = 121.22
    assert(out == Seq(
      (1L, 4L, 2L, 4L, 1202050L),
      (2L, 1L, 1L, 0L, 2058200L),
      (3L, 1L, 1L, 1L, 1212200L)))
  }

  test("more syllable-dense text scores lower") {
    val docs = Seq(
      (1L, "a big red dog ran far"),
      (2L, "extraordinarily incomprehensible organizational responsibilities")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.readabilityOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(4))).toMap
    assert(out(1L) > out(2L))
  }
}
