package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** Content-defined chunking: the property under test is boundary
  * LOCALITY — boundaries depend only on the trailing token window, so
  * a prefix insertion re-chunks at most the window-adjacent region and
  * the shared suffix still deduplicates. Fixed-width chunking (the
  * counterfactual) would shift every downstream boundary.
  */
class CdcChunksSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // Deterministic token soup — md5-driven boundaries land wherever
  // they land, but identically on identical windows.
  private def words(n: Int, salt: String): String =
    (0 until n).map(i => s"w$salt${i * 7 % 97}x$i").mkString(" ")

  private def chunkStats(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] =
    Dedup.cdcChunksOf(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("exact duplicate docs: every chunk is a duplicate chunk") {
    val t = words(120, "a")
    val st = chunkStats(Seq((1L, t), (2L, t)))
    assert(st(1L) == st(2L))
    val (n, dup) = st(1L)
    assert(n >= 2, s"expected multiple chunks, got $n") // 120 tokens, p=1/16
    assert(dup == n, s"all $n chunks should be shared, got $dup")
  }

  test("prefix insertion: shared suffix chunks still deduplicate") {
    val t = words(200, "b")
    val st = chunkStats(Seq((1L, t), (2L, "zz0 zz1 zz2 " + t)))
    val (n1, dup1) = st(1L)
    // The boundary rule sees only the trailing 3-gram, so every
    // boundary strictly inside the shared region survives the shift;
    // only the first shared chunk (whose start moved) can differ.
    assert(dup1 >= n1 - 1 && dup1 >= 1,
      s"prefix shift broke CDC re-alignment: $dup1 of $n1 chunks shared")
  }

  test("disjoint docs share nothing; single-token doc is one chunk") {
    val st = chunkStats(Seq((1L, words(80, "c")), (2L, words(80, "d")), (3L, "solo")))
    assert(st(1L)._2 == 0 && st(2L)._2 == 0)
    assert(st(3L) == (1L, 0L))
  }
}
