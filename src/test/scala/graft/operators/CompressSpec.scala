package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** The compression-quality contract: degenerate repetition deflates
  * to a tiny ratio and is flagged low-entropy, diverse prose does
  * not, and the exact-integer readout is bit-identical under any
  * partitioning. */
class CompressSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def frame(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }

  private val degenerate = "spam spam spam " * 200
  private val diverse = (1 to 400)
    .map(i => java.lang.Long.toHexString(i * 2654435761L)).mkString(" ")

  test("repetition is flagged low-entropy, diverse text is not") {
    val out = TextAnalysis.compressionRatioOf(spark, frame(Seq(
      (1L, "rep", degenerate), (2L, "rep", degenerate),
      (3L, "div", diverse))))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(4), r.getLong(5))).toMap
    val (nRep, ratioRep, lowRep) = out("rep")
    val (nDiv, ratioDiv, lowDiv) = out("div")
    assert(nRep == 2L && lowRep == 2L)
    assert(ratioRep < 1000L, s"degenerate ratio_e4=$ratioRep")
    assert(nDiv == 1L && lowDiv == 0L)
    assert(ratioDiv > 3000L, s"diverse ratio_e4=$ratioDiv")
  }

  test("bit-identical under any partitioning") {
    val rows = (1L to 60L).map(i => (i, s"s${i % 3}",
      if (i % 2 == 0) degenerate else diverse + s" tail$i"))
    val a = TextAnalysis.compressionRatioOf(spark,
      frame(rows).repartition(2)).collect().map(_.toSeq).toSeq
    val b = TextAnalysis.compressionRatioOf(spark,
      frame(rows).repartition(13)).collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
