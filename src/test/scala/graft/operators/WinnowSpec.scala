package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** The winnowing contract (Schleimer–Wilkerson–Aiken 2003): a shared
  * token run of ≥ w+k−1 tokens always yields a shared fingerprint
  * (the no-miss guarantee), disjoint documents share nothing,
  * selection density is bounded (≤ full-window count, ≥ count/w for
  * long docs), short documents fingerprint to nothing, and the
  * selection is partitioning-invariant. */
class WinnowSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("doc_id", "text")
  }

  // k=3, w=4 ⇒ guarantee threshold w+k−1 = 6 shared tokens.
  private val shared = "alpha beta gamma delta epsilon zeta eta theta"

  test("a shared run >= w+k-1 tokens yields a shared fingerprint") {
    val d = docs(
      1L -> s"one two three $shared four five six seven eight nine",
      2L -> s"red green blue $shared yellow purple orange pink brown")
    val prints = Dedup.winnowPrints(d)
    val a = prints.filter(col("doc_id") === 1).select("print")
      .collect().map(_.getLong(0)).toSet
    val b = prints.filter(col("doc_id") === 2).select("print")
      .collect().map(_.getLong(0)).toSet
    assert((a & b).nonEmpty, s"no shared print: a=$a b=$b")
  }

  test("disjoint documents share no fingerprints") {
    val d = docs(
      1L -> "aa bb cc dd ee ff gg hh ii jj kk ll",
      2L -> "mm nn oo pp qq rr ss tt uu vv ww xx")
    val prints = Dedup.winnowPrints(d)
    val a = prints.filter(col("doc_id") === 1).select("print")
      .collect().map(_.getLong(0)).toSet
    val b = prints.filter(col("doc_id") === 2).select("print")
      .collect().map(_.getLong(0)).toSet
    assert((a & b).isEmpty)
  }

  test("density bounds and short-doc degeneracy") {
    val longText = (1 to 100).map(i => s"w${i * 7 % 97}x$i").mkString(" ")
    val d = docs(1L -> longText, 2L -> "only four tokens here",
      3L -> "tiny one")
    val prints = Dedup.winnowPrints(d)
    val n1 = prints.filter(col("doc_id") === 1).count()
    // 100 tokens → 98 3-gram hashes → 95 full windows; distinct mins
    // within [95/4, 95].
    assert(n1 <= 95L && n1 >= 95L / 4, s"n1=$n1")
    // 4 tokens → 2 hashes → no full 4-hash window → no prints.
    assert(prints.filter(col("doc_id") === 2).count() == 0L)
    assert(prints.filter(col("doc_id") === 3).count() == 0L)
  }

  test("selection is partitioning-invariant") {
    val d = (1L to 20L).map(i =>
      (i, (1 to 30).map(j => s"t${(i * 31 + j * 7) % 53}").mkString(" ")))
    val a = Dedup.winnowPrints(docs(d: _*).repartition(2))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Dedup.winnowPrints(docs(d: _*).repartition(9))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }
}
