package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** Hand-computed planted fixtures for the round-10 analytics
  * operators. The DuckDB oracle re-states each formula independently
  * but identically — a shared semantic mistake passes it; these
  * fixtures pin the intended semantics against numbers computed by
  * hand.
  */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def ts(s: String) = Timestamp.valueOf(s)

  test("attribution: hand-computed first/last/linear credits") {
    // Purchase e3 at 12:00; touches inside the 24 h lookback are
    // view e1 (10:00) and click e2 (11:00) -> n = 2: first = view,
    // last = click, linear = 500000 each. View e4 two days earlier is
    // outside the window and must contribute nothing.
    val dir = tempDir("graft_attr")
    Seq(
      (1L, ts("2024-01-10 10:00:00"), 7L, "view", 1.0, "{}"),
      (2L, ts("2024-01-10 11:00:00"), 7L, "click", 1.0, "{}"),
      (3L, ts("2024-01-10 12:00:00"), 7L, "purchase", 1.0, "{}"),
      (4L, ts("2024-01-08 09:00:00"), 7L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.qAttribution(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq(("click", 0L, 1L, 500000L), ("view", 1L, 0L, 500000L)))
  }

  test("attribution: linear remainder drops deterministically on 3 touches") {
    val dir = tempDir("graft_attr3")
    Seq(
      (1L, ts("2024-01-10 10:00:00"), 7L, "view", 1.0, "{}"),
      (2L, ts("2024-01-10 10:30:00"), 7L, "view", 1.0, "{}"),
      (3L, ts("2024-01-10 11:00:00"), 7L, "click", 1.0, "{}"),
      (4L, ts("2024-01-10 12:00:00"), 7L, "purchase", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Relational.qAttribution(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // 1000000 div 3 = 333333 per touch; two views accumulate 666666.
    assert(got == Seq(("click", 0L, 1L, 333333L), ("view", 1L, 0L, 666666L)))
  }

  test("gini: spends (100, 300) score exactly 0.25") {
    val dir = tempDir("graft_gini")
    Seq(
      (1L, 10L, "O", 1.00, ts("2024-01-01 00:00:00"), "P"),
      (2L, 20L, "O", 3.00, ts("2024-01-02 00:00:00"), "P"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Relational.qGini(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 400L, 250000L)))
  }

  test("pareto: spends 1..10 give the hand-computed decile shares") {
    val dir = tempDir("graft_pareto")
    (1L to 10L).map(i =>
      (i, i, "O", i.toDouble, ts("2024-01-01 00:00:00"), "P"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Relational.qPareto(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // total 5500 cents; top-1 = 1000 -> 1000*1e6 // 5500 = 181818.
    assert(got(1L) == ((1L, 181818L)))
    // top-5 = 1000+900+800+700+600 = 4000 -> 727272.
    assert(got(5L) == ((5L, 727272L)))
    assert(got(10L) == ((10L, 1000000L)))
  }

  test("assoc rules: planted baskets give lift exactly 1e6") {
    // Orders 1..4 hold {1,2}; order 5 holds {1,3}: pair (1,2) has
    // cnt_ab=4 (>= minsup), (1,3) cnt=1 drops. cnt_1=5, cnt_2=4, N=5:
    // support = 800000, conf(1->2) = 800000, lift = 4*5e6/(5*4) = 1e6.
    val dir = tempDir("graft_assoc")
    ((1L to 4L).flatMap(o => Seq((o, 1L), (o, 2L))) ++ Seq((5L, 1L), (5L, 3L)))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Relational.qAssocRules(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == Seq((1L, 2L, 4L, 800000L, 800000L, 1000000L)))
  }

  test("mad outliers: planted level shift flags exactly the spike days") {
    // Type X: counts 5,5,5,5,50 across five days -> med 5, mad 0,
    // |50-5| > 0 -> exactly one outlier day.
    val dir = tempDir("graft_mad")
    val rows = (1 to 4).flatMap { d =>
      (1 to 5).map(i => ((d * 10 + i).toLong,
        ts(f"2024-01-0$d%d 10:00:00"), 1L, "X", 1.0, "{}"))
    } ++ (1 to 50).map(i => ((50 + i).toLong,
      ts("2024-01-05 10:00:00"), 1L, "X", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Relational.qMadOutliers(spark, dir).collect().head
    assert((r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == (("X", 5L, 5L, 0L, 1L)))
  }
}
