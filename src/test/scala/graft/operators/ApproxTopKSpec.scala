package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** Sketch-quality contract of the count-min heavy hitters: the CMS
  * point estimate of every audited token obeys est ∈ [n, n + ⌈ε·N⌉]
  * (overcount-only, bounded), and the emitted top-k ranking equals
  * the exact one. */
class ApproxTopKSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("CMS top-k equals exact top-k with every verdict true") {
    val approx = TextAnalysis.approxTopTokens(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val exact = TextAnalysis.topTokens(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(approx.nonEmpty)
    assert(approx.map(t => (t._1, t._2)).toSeq == exact.toSeq,
      "the audited ranking must be the exact ranking")
    assert(approx.forall(_._3), s"CMS bound violated: ${approx.filterNot(_._3).toSeq}")
  }

  test("raw sketch estimates overcount-only within eps*N on a planted corpus") {
    import spark.implicits._
    // 400 'alpha', 100 'beta', 3900 distinct fillers: N = 4400,
    // eps = 0.001 → bound = ceil(4.4) = 5.
    val words = Seq.fill(400)("alpha") ++ Seq.fill(100)("beta") ++
      (0 until 3900).map(i => s"filler$i")
    val df = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      .toDF("id", "token")
    val row = df.agg(
      expr("count_min_sketch(token, 0.001d, 0.99d, 42)").as("sk"),
      count(lit(1)).as("total")).head()
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](0)))
    assert(row.getLong(1) == 4400L)
    val bound = 5L
    val exact = Map("alpha" -> 400L, "beta" -> 100L, "filler7" -> 1L,
      "filler3899" -> 1L)
    exact.foreach { case (tok, n) =>
      val est = sketch.estimateCount(tok)
      assert(est >= n && est <= n + bound,
        s"$tok: est $est outside [$n, ${n + bound}]")
    }
    // absent tokens estimate at most the error bound
    assert(sketch.estimateCount("never-seen") <= bound)
  }
}
