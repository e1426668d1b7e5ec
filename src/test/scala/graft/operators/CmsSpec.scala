package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** Independent-simulation contract for the count-min-sketch audit:
  * a plain-Scala CMS built from the same md5 bucket hash must agree
  * cell-for-cell with the distributed sketch, and the one-sided
  * guarantee (estimate ≥ truth, equality iff no colliding token in
  * some row) must hold under forced collisions (200 distinct tokens
  * into 16 buckets — pigeonhole guarantees collisions in every
  * row).
  */
class CmsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def bucket(seed: Int, token: String, w: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"cms$seed$token".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % w
  }

  /** Plain-Scala CMS simulation from exact token counts. */
  private def simulate(counts: Map[String, Long], d: Int, w: Int)
      : Map[String, Long] = {
    val cells = scala.collection.mutable.Map.empty[(Int, Long), Long]
    for ((tok, c) <- counts; s <- 0 until d)
      cells.updateWith((s, bucket(s, tok, w)))(v => Some(v.getOrElse(0L) + c))
    counts.map { case (tok, _) =>
      tok -> (0 until d).map(s => cells((s, bucket(s, tok, w)))).min
    }
  }

  test("cms: distributed sketch equals the plain-Scala simulation") {
    // 200 distinct tokens, counts 1..200 → collisions certain in
    // every 16-bucket row; heavy hitters are t191..t200.
    val docs = (1 to 200).map(i => (i.toLong, (s"t$i " * i).trim))
    val dir = java.nio.file.Files.createTempDirectory("graft_cms").toString
    graft.TestFixtures.canonDocs(docs.toDF("doc_id", "text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val counts = (1 to 200).map(i => s"t$i" -> i.toLong).toMap
    val est = simulate(counts, d = 4, w = 16)
    val got = TextAnalysis.cmsTopK(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == 20)
    // top-20 by (true count DESC, token): t200 .. t181
    assert(got.head._1 == "t200" && got.last._1 == "t181")
    got.foreach { case (tok, tc, ce, over) =>
      assert(tc == counts(tok), s"$tok true count")
      assert(ce == est(tok), s"$tok estimate: got $ce want ${est(tok)}")
      assert(over == ce - tc && over >= 0L, s"$tok one-sided guarantee")
    }
    // the forced-collision corpus must actually overestimate
    // somewhere, or the fixture stopped exercising the min-over-rows
    assert((1 to 200).exists(i => est(s"t$i") > counts(s"t$i")),
      "no token collided — fixture no longer forces collisions")
  }
}
