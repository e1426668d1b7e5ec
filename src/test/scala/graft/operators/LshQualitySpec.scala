package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** LSH blocking quality: planted near-dup families must be recalled
  * at a high rate; disjoint-vocabulary docs yield no false candidates
  * and exact verification confirms every candidate.
  */
class LshQualitySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val base = (1 to 100).map(i => s"base$i").mkString(" ")

  test("planted families are recalled >= 0.9; random docs add no candidates") {
    val family = (0 until 10).map(i => (i.toLong, s"$base tail$i"))
    val noise = (100 until 110).map(i =>
      (i.toLong, (1 to 50).map(j => s"n${i}w$j").mkString(" ")))
    val docs = (family ++ noise).toDF("doc_id", "text")
    val truth = (for {
      a <- 0 until 10; b <- (a + 1) until 10
    } yield (a.toLong, b.toLong)).toDF("src", "dst")
    val r = Dedup.lshQualityOf(docs, truth).head()
    assert(r.getLong(0) == 45L)                        // n_truth
    assert(r.getLong(4) >= 9000L, s"recall_e4 ${r.getLong(4)}")
    // every candidate is a planted pair: disjoint noise vocabularies
    // can't collide a full band, and exact verification confirms all
    assert(r.getLong(2) == r.getLong(1), "false-positive candidates")
    assert(r.getLong(3) == r.getLong(1), "verification rejected a planted pair")
    assert(r.getLong(5) == 10000L)
  }

  test("empty truth yields null recall, not a division error") {
    val docs = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
    val truth = Seq.empty[(Long, Long)].toDF("src", "dst")
    val r = Dedup.lshQualityOf(docs, truth).head()
    assert(r.getLong(0) == 0L && r.isNullAt(4))
  }
}
