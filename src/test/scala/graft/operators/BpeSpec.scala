package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** BPE merge learning: the Sennrich et al. (2016) hand-computed
  * corpus, leftmost-greedy overlap handling, and the deterministic
  * (freq DESC, left, right) tie order.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def run(text: String, rounds: Int) =
    TextAnalysis.bpeMergesOf(spark, Seq((1L, text)).toDF("doc_id", "text"), rounds)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .toSeq

  test("Sennrich corpus: first five merges, hand-computed") {
    // low:5 lower:2 newest:6 widest:3
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val got = run(corpus, 5)
    // Round 1 is a 9-way tie between (e,s), (s,t), (t,</w>) — the
    // (left, right) tiebreak must pick (e,s); rounds then cascade.
    assert(got == Seq(
      (1L, "e", "s", "es", 9L),
      (2L, "es", "t", "est", 9L),
      (3L, "est", "</w>", "est</w>", 9L),
      (4L, "l", "o", "lo", 7L),
      (5L, "lo", "w", "low", 7L)))
  }

  test("leftmost-greedy non-overlapping merge: 'aaa' folds to [aa, a]") {
    // R1: (a,a) occurs at two overlapping positions -> pair_freq 2,
    // greedy fold gives [aa, a, </w>] (NOT [a, aa, </w>]).
    // R2 then sees (aa,a) and (a,</w>) at freq 1 -> the left-asc
    // tiebreak picks (a,</w>) -- a rightmost fold would have offered
    // (a,aa) and merged that instead, so the round-2 row pins
    // greediness through the public output alone.
    val got = run("aaa", 3)
    assert(got == Seq(
      (1L, "a", "a", "aa", 2L),
      (2L, "a", "</w>", "a</w>", 1L),
      (3L, "aa", "a</w>", "aaa</w>", 1L)))
  }

  test("Sennrich corpus: encoded vocabulary frequencies, hand-computed") {
    // After the five merges: low -> [low, </w>], lower ->
    // [low, e, r, </w>], newest -> [n, e, w, est</w>],
    // widest -> [w, i, d, est</w>]; frequencies weight by word counts.
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val got = TextAnalysis
      .bpeVocabOf(spark, Seq((1L, corpus)).toDF("doc_id", "text"), 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(
      ("est</w>", 9L), ("w", 9L), ("e", 8L), ("</w>", 7L), ("low", 7L),
      ("n", 6L), ("d", 3L), ("i", 3L), ("r", 2L)))
  }

  test("merge loop stops when no pairs remain") {
    // Single char word: syms [a, </w>] -> one pair, then a single
    // merged symbol and an empty pair stream ends the loop early.
    val got = run("a", 10)
    assert(got == Seq((1L, "a", "</w>", "a</w>", 1L)))
  }

  test("BPE memo refreshes when a file is regenerated at the same path") {
    import java.nio.file.{Files, StandardCopyOption}
    val dir = Files.createTempDirectory("graft_bpe_memo")
    val stable = dir.resolve("docs.parquet")
    def writeAs(text: String): Unit = {
      val tmp = dir.resolve("stage").toString
      Seq((1L, text)).toDF("doc_id", "text")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.copy(part.toPath, stable, StandardCopyOption.REPLACE_EXISTING)
    }
    writeAs("ab ab")
    def firstMerge() = TextAnalysis
      .bpeMergesOf(spark, spark.read.parquet(stable.toString), 1)
      .collect().map(r => (r.getString(1), r.getString(2))).head
    assert(firstMerge() == (("a", "b")))
    Thread.sleep(20)
    // Same path, different corpus: the memo must miss (mtime/length
    // key), not serve the stale merge table.
    writeAs("cd cd cd")
    assert(firstMerge() == (("c", "d")))
  }

  test("partitioning-invariant: repartitioned corpus, identical merges") {
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = (1L to 8L).map(i => (i, corpus)).toDF("doc_id", "text")
    val a = TextAnalysis.bpeMergesOf(spark, docs.repartition(16), 4)
      .collect().map(_.toSeq).toSeq
    val b = TextAnalysis.bpeMergesOf(spark, docs.coalesce(1), 4)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
