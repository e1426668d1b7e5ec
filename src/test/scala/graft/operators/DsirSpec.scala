package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** DSIR importance weights: target-vocabulary documents must outscore
  * off-target ones, selection is a per-source top half, and the score
  * is layout-stable.
  */
class DsirSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // Distinct vocabularies: the en grams dominate the target slice, so
  // their buckets carry positive delta; de grams appear only in raw.
  private def corpus = Seq(
    (1L, "en", "web", "the cat sat on the mat"),
    (2L, "en", "web", "the dog sat on the rug"),
    (3L, "en", "books", "a cat and a dog sat here"),
    (4L, "de", "web", "der hund lief durch den wald"),
    (5L, "de", "books", "die katze schlief auf dem sofa"),
    (6L, "de", "books", "der wald war dunkel und still"),
    (7L, "en", "books", "the cat and the dog sat on the mat"),
    (8L, "de", "web", "der hund und die katze im wald")
  ).toDF("doc_id", "lang", "source", "text")

  test("target-vocabulary docs outscore off-target docs") {
    val out = Pipeline.dsirWeightsOf(corpus).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(4))).toSeq
    val enScores = out.filter(_._2 == "en").map(_._3)
    val deScores = out.filter(_._2 == "de").map(_._3)
    assert(enScores.min > deScores.max,
      s"en ${enScores.sorted} vs de ${deScores.sorted}")
  }

  test("selection keeps exactly the top half per source by (score, doc_id)") {
    val out = Pipeline.dsirWeightsOf(corpus).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(4), r.getBoolean(5)))
    out.groupBy(_._2).foreach { case (_, rows) =>
      val kept = rows.filter(_._4)
      assert(kept.length == rows.length / 2)
      val cutoff = kept.map(r => (r._3, -r._1)).min
      val dropped = rows.filter(!_._4).map(r => (r._3, -r._1))
      // every kept (score, -id) sorts strictly above every dropped one
      assert(dropped.forall(d =>
        Ordering[(Long, Long)].lt(d, cutoff) || dropped.isEmpty))
    }
  }

  test("scores are partitioning-independent (layout-stable hash + integer sums)") {
    val a = Pipeline.dsirWeightsOf(corpus.repartition(1)).collect()
      .map(r => (r.getLong(0), r.getLong(4))).sortBy(_._1).toSeq
    val b = Pipeline.dsirWeightsOf(corpus.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(4))).sortBy(_._1).toSeq
    assert(a == b)
  }
}
