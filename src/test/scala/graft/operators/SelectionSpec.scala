package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

class SelectionSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def dfOf(xs: Seq[Double]) = {
    import spark.implicits._
    xs.toDF("x").repartition(7) // scatter so no partition is sorted
  }

  private def groundTruth(xs: Seq[Double], k: Long): Double =
    xs.sorted.apply((k - 1).toInt)

  test("bisection selection matches the sorted ground truth on random data") {
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(10000)(rnd.nextDouble() * 2000 - 1000)
    val df = dfOf(xs)
    // Tiny exactBound + few buckets force several bisection rounds.
    for (k <- Seq(1L, 17L, 5000L, 9999L, 10000L))
      assert(Selection.kthSmallest(df, k, buckets = 8, exactBound = 100L)
        == groundTruth(xs, k), s"rank $k")
  }

  test("heavy duplicates and all-equal columns select exactly") {
    val xs = Seq.fill(5000)(7.25) ++ Seq.fill(3000)(1.5) ++ Seq.fill(2000)(9.0)
    val df = dfOf(xs)
    for (k <- Seq(1L, 3000L, 3001L, 8000L, 8001L, 10000L))
      assert(Selection.kthSmallest(df, k, buckets = 8, exactBound = 100L)
        == groundTruth(xs, k), s"rank $k")
    val equal = dfOf(Seq.fill(4000)(42.0))
    assert(Selection.kthSmallest(equal, 1L, 8, 100L) == 42.0)
    assert(Selection.kthSmallest(equal, 4000L, 8, 100L) == 42.0)
  }

  test("ulp-adjacent values resolve through the collapsed-range path") {
    // Three doubles within a few ulps: the equi-width histogram
    // underflows (lo + width == lo) long before exactBound is reached,
    // which must fall through to the bounded per-value count — and
    // still be EXACT at every rank.
    val a = 1.0
    val b = java.lang.Math.nextUp(a)
    val c = java.lang.Math.nextUp(b)
    val xs = Seq.fill(400)(a) ++ Seq.fill(300)(b) ++ Seq.fill(300)(c)
    val df = dfOf(xs)
    for (k <- Seq(1L, 400L, 401L, 700L, 701L, 1000L))
      assert(Selection.kthSmallest(df, k, buckets = 8, exactBound = 10L)
        == groundTruth(xs, k), s"rank $k")
  }

  test("materialized and scan-per-round postures select identically") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(5000)(rnd.nextDouble() * 100).toDF("v")
    val a = Selection.exactPercentiles(df, "v", Seq(50, 99)).collect().toSeq
    spark.conf.set("graft.selection.materialize", "false")
    try {
      val b = Selection.exactPercentiles(df, "v", Seq(50, 99)).collect().toSeq
      assert(a == b)
    } finally spark.conf.unset("graft.selection.materialize")
  }

  test("group percentiles: bisection and window dispatch paths agree") {
    import spark.implicits._
    val df = ((1 to 100).map(i => ("a", i.toDouble)) ++
      Seq(("b", 10.0), ("b", 20.0), ("b", 30.0))).toDF("g", "v")
    val want = Set(("a", 50L, 50.0), ("a", 90L, 90.0), ("a", 99L, 99.0),
      ("b", 50L, 20.0), ("b", 90L, 30.0), ("b", 99L, 30.0))
    def got() = Selection.groupPercentiles(df, "g", "v", Seq(50, 90, 99))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got() == want) // 2 groups ≤ 8 → per-group bisection path
    spark.conf.set("graft.selection.maxBisectGroups", "1") // force window path
    try assert(got() == want)
    finally spark.conf.unset("graft.selection.maxBisectGroups")
  }

  test("withGlobalRank + ntileOfRank equal the single-window formulation") {
    // The distributed rank must be BIT-identical to
    // row_number()/sum().over(Window.orderBy(...)) under the same
    // unique total order — ranks are defined by the order alone, so
    // range-boundary placement must not matter. Includes ties in the
    // primary key (broken by id) and enough rows to span partitions.
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val df = (1 to 500).map(i => (i.toLong, rnd.nextInt(40).toLong)).toDF("id", "x")
    val w = Window.orderBy(col("x"), col("id"))
    val viaWindow = df
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("x")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("t", ntile(7).over(w).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    val viaRank = Selection.withGlobalRank(df,
        Seq(col("x"), col("id")), "i", cumSumOf = Some("x"))
      .crossJoin(broadcast(df.agg(count(lit(1)).as("nn"))))
      .withColumn("t", Selection.ntileOfRank("i", "nn", 7))
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("i"),
        r.getAs[Long]("cum"), r.getAs[Long]("t")))
      .sortBy(_._1).toSeq
    assert(viaRank == viaWindow)
  }

  test("exactPercentiles uses the ceil(p*n) discrete convention") {
    // n = 10 values 10..100: p50 → rank 5 → 50; p90 → rank 9 → 90;
    // p99 → rank ceil(9.9) = 10 → 100; p1 → rank ceil(0.1) = 1 → 10.
    import spark.implicits._
    val df = (1 to 10).map(_ * 10.0).toDF("v")
    val got = Selection.exactPercentiles(df, "v", Seq(50, 90, 99, 1))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(1L -> 10.0, 50L -> 50.0, 90L -> 90.0, 99L -> 100.0))
  }
}
