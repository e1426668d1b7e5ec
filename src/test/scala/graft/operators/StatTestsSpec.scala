package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession
import java.sql.Timestamp

/** Hand-computed contracts for the round-13 hypothesis-test pack:
  * two-sample KS on planted cohorts, tie-exact Mann–Whitney, the
  * Theil–Sen outlier-immunity property, and the CUPED adjustment
  * algebra.
  */
class StatTestsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def plantOrders(rows: Seq[(Double, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stats").toString
    rows.zipWithIndex.map { case ((price, date), i) =>
      (i.toLong, i.toLong, "O", price, ts(s"$date 00:00:00"), "P")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("ks: planted cohorts give the hand-computed cross-multiplied D") {
    // 1997 cohort {1.00, 2.00, 3.00}, 1998 cohort {2.00, 3.00, 4.00}.
    // ECDF ledger at v=100: |1·3 − 0·3| = 3 (= every later value's
    // num too, but the argmax tiebreak picks the EARLIEST v).
    // D = 3/9 → 333333.
    val dir = plantOrders(Seq(
      (1.00, "1997-03-01"), (2.00, "1997-03-02"), (3.00, "1997-03-03"),
      (2.00, "1998-03-01"), (3.00, "1998-03-02"), (4.00, "1998-03-03")))
    val r = Relational.qKsTest(spark, dir).collect().head
    // The DECIMAL(38,0) cross-multiply is internal since round 15
    // (SURVEY §6 emitted-type rule); only bounded BIGINTs emit.
    assert((r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3)) == ((3L, 3L, 100L, 333333L)))
  }

  test("mann-whitney: doubled ranks stay exact under ties") {
    // A = {100, 200}, B = {200, 300} cents. Ranks 1, 2.5, 2.5, 4 →
    // R1 = 3.5, so 2R1 = 7 (integer by construction), 2U1 = 1.
    // Effect size U1/(n1·n2) = 0.5/4 → auc_e6 = 2U1·1e6 div 2n1n2
    // = 1000000 div 8 = 125000 (the DECIMAL ledger is internal
    // since round 15 — SURVEY §6 emitted-type rule).
    // Ties: one group of 2 → Σ(t³−t) = 6. varU = (4/12)(5 − 6/12)
    // = 1.5; z = (0.5 − 2)/√1.5 = −1.224745 → −12247.
    val dir = plantOrders(Seq(
      (1.00, "1997-03-01"), (2.00, "1997-03-02"),
      (2.00, "1998-03-01"), (3.00, "1998-03-02")))
    val r = Relational.qMannWhitney(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((2L, 2L, 125000L, 6L, -12247L)))
  }

  private def plantEvents(counts: Seq[(String, Int, Int)],
      values: Seq[(Long, Int, Double)] = Nil): String = {
    // counts: (event_type, day_index, n_events); values:
    // (user_id, day_index, value) one event each. Base day pinned
    // so CAST(ts AS DATE) is stable under the UTC session.
    val base = 472222L * 3600L
    def tsOf(d: Int, j: Int) = (base + d * 86400L + j) * 1_000_000_000L
    val cRows = counts.flatMap { case (t, d, n) =>
      (0 until n).map(j => (d * 10000L + j, 1L, t, 1.0, tsOf(d, j)))
    }
    val vRows = values.zipWithIndex.map { case ((u, d, v), i) =>
      (900000L + i, u, "purchase", v, tsOf(d, 0))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_stats").toString
    (cRows ++ vRows)
      .toDF("event_id", "user_id", "event_type", "value", "ts")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/out")
    val part = new java.io.File(s"$dir/out").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    dir
  }

  test("theil-sen: one wild day cannot move the median slope") {
    // Days 0–3 grow by exactly 2/day; day 4 explodes to 100. Six of
    // the ten pairwise slopes are exactly 2e6, so the lower median
    // (rank 5 of 10) is 2e6 — OLS would be dragged far above it.
    val dir = plantEvents(Seq(("a", 0, 10), ("a", 1, 12), ("a", 2, 14),
      ("a", 3, 16), ("a", 4, 100)))
    val r = Relational.qTheilSen(spark, dir).collect()
    assert(r.length == 1)
    assert((r.head.getString(0), r.head.getLong(1), r.head.getLong(2))
      == (("a", 10L, 2000000L)))
  }

  test("bayes rank: a 1-for-1 user cannot outrank 90-for-100") {
    // Users: 1 → 1 purchase / 1 event (raw share 1.0), 2 → 90/100
    // (0.9), 3 → 0/19. Global C = 91/120; m = 25. Hand-computed:
    // WR₂ = 871667 > WR₁ = 767628 > WR₃ = 430871 — the whole point
    // of the prior: the perfect-but-tiny sample ranks SECOND.
    val base = 472222L * 3600L
    val rows =
      Seq((1L, "purchase")) ++
      (0 until 90).map(i => (2L, "purchase")) ++
      (0 until 10).map(i => (2L, "view")) ++
      (0 until 19).map(i => (3L, "view"))
    val dir = java.nio.file.Files.createTempDirectory("graft_bayes").toString
    rows.zipWithIndex.map { case ((u, t), i) =>
      (i.toLong, u, t, 1.0, (base + i) * 1_000_000_000L)
    }.toDF("event_id", "user_id", "event_type", "value", "ts")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/out")
    val part = new java.io.File(s"$dir/out").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val got = Relational.qBayesRank(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((2L, 100L, 90L, 871667L),
      (1L, 1L, 1L, 767628L), (3L, 19L, 0L, 430871L)), s"${got.toSeq}")
  }

  test("mann-kendall: monotone rise scores the closed form; flat ties kill the variance") {
    // "up" counts 1..5: every pair concordant → S = 10, no ties,
    // Var = 5·4·15/18, z = 9/√(300/18) = 2.20454 → 22045.
    // "fl" flat 3,3,3,3: S = 0 and ONE tie group of 4 → tie_term =
    // 4·3·13 = 156 = n(n−1)(2n+5) exactly, Var = 0 → z NULL.
    val dir = plantEvents(Seq(
      ("fl", 0, 3), ("fl", 1, 3), ("fl", 2, 3), ("fl", 3, 3),
      ("up", 0, 1), ("up", 1, 2), ("up", 2, 3), ("up", 3, 4), ("up", 4, 5)))
    val r = Relational.qMannKendall(spark, dir).collect()
      .map(x => x.getString(0) -> x).toMap
    val up = r("up")
    assert((up.getLong(1), up.getLong(2), up.getLong(3), up.getLong(4))
      == ((5L, 10L, 0L, 22045L)))
    val fl = r("fl")
    assert((fl.getLong(1), fl.getLong(2), fl.getLong(3)) == ((4L, 0L, 156L)))
    assert(fl.isNullAt(4), "zero variance must guard z to NULL")
  }

  test("runs test: oscillation scores high, monotone trend low") {
    // counts 1,10,2,20,3,30 → med 3 drops one day; kept b =
    // 0,1,0,1,1 → r = 4, n1 = 3, n2 = 2, z = +0.6547.
    val osc = plantEvents(Seq(("a", 0, 1), ("a", 1, 10), ("a", 2, 2),
      ("a", 3, 20), ("a", 4, 3), ("a", 5, 30)))
    val rO = Relational.qRunsTest(spark, osc).collect().head
    assert((rO.getLong(1), rO.getLong(2), rO.getLong(3), rO.getLong(4))
      == ((3L, 2L, 4L, 6547L)))
    // counts 1..6 → med 3 drops one day; kept b = 0,0,1,1,1 →
    // r = 2 (too FEW runs = trend), z = −1.5275.
    val mono = plantEvents((0 to 5).map(d => ("a", d, d + 1)))
    val rM = Relational.qRunsTest(spark, mono).collect().head
    assert((rM.getLong(1), rM.getLong(2), rM.getLong(3), rM.getLong(4))
      == ((3L, 2L, 2L, -15275L)))
  }

  test("forecast skill: seasonal-naive wins exactly on a weekly series") {
    // 14 days of (1..7)(1..7): naive one-step errors are twelve 1s
    // plus one 6 (the week wrap) → MAE 18·100 // 13 = 138; the
    // seasonal-naive errors are all 0.
    val dir = plantEvents((0 until 14).map(d => ("a", d, d % 7 + 1)))
    val r = Relational.qForecastSkill(spark, dir).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3))
      == ((14L, 138L, 0L)))
    assert(!r.isNullAt(4))
  }

  test("rolling corr: identical series pin +1, mirrored series -1") {
    val same = plantEvents((0 until 10).flatMap(d =>
      Seq(("view", d, d + 1), ("purchase", d, d + 1))))
    val rs = Relational.qRollingCorr(spark, same).collect()
    assert(rs.forall(r => r.getLong(2) == 10000L))
    val anti = plantEvents((0 until 10).flatMap(d =>
      Seq(("view", d, d + 1), ("purchase", d, 11 - d))))
    val ra = Relational.qRollingCorr(spark, anti).collect()
    assert(ra.forall(r => r.getLong(2) == -10000L))
  }

  test("retention decay: halving cohort recovers -ln2 per day") {
    // Cohort 8 on day 0; actives halve each day (8, 4, 2, 1). The
    // log points are −d·ln2, e6-rounded per point; expected
    // slope/intercept recomputed with the identical OLS arithmetic.
    val dir = plantEvents(Nil,
      (0L until 8L).map(u => (u, 0, 1.0)) ++
        (0L until 4L).map(u => (u, 1, 1.0)) ++
        (0L until 2L).map(u => (u, 2, 1.0)) :+ (0L, 3, 1.0))
    val r = Relational.qRetentionDecay(spark, dir).collect().head
    val ys = Seq(8L, 4L, 2L, 1L).map(a =>
      math.round(math.log(a.toDouble / 8L) * 1e6))
    val xs = Seq(0L, 1L, 2L, 3L)
    val (k, sx, sy) = (4L, xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val slope = math.round(
      (k * sxy - sx * sy).toDouble / (k * sxx - sx * sx))
    val icept = math.round(
      (sy.toDouble - (k * sxy - sx * sy).toDouble /
        (k * sxx - sx * sx) * sx) / k)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((4L, 8L, slope, icept)))
    assert(slope < -690000L && slope > -696000L)
  }

  test("srm: balanced split passes, 60/40 of 100 flags") {
    val bal = plantEvents(Nil,
      (0L until 100L).map(u => (u, 0, 1.0)))
    val rB = Relational.qSrm(spark, bal).collect().head
    assert((rB.getLong(0), rB.getLong(1), rB.getLong(2), rB.getLong(3))
      == ((50L, 50L, 0L, 0L)))
    // 60 even, 40 odd users: chi2 = 20²/100 = 4.0 > 3.8415 → flag.
    val skew = plantEvents(Nil,
      ((0L until 120L by 2) ++ (1L until 80L by 2)).map(u => (u, 0, 1.0)))
    val rS = Relational.qSrm(spark, skew).collect().head
    assert((rS.getLong(0), rS.getLong(1), rS.getLong(2), rS.getLong(3))
      == ((60L, 40L, 40000L, 1L)))
  }

  test("seasonality: pure weekly pattern scores eta2 = 1e6; flat NULL") {
    // 14 days of (1..7)(1..7): zero within-weekday variance → the
    // weekday factor explains everything.
    val weekly = plantEvents((0 until 14).map(d => ("w", d, d % 7 + 1)))
    val rW = Relational.qSeasonality(spark, weekly).collect().head
    assert((rW.getLong(1), rW.getLong(2), rW.getLong(3))
      == ((14L, 7L, 1000000L)))
    val flat = plantEvents((0 until 14).map(d => ("f", d, 5)))
    val rF = Relational.qSeasonality(spark, flat).collect().head
    assert(rF.isNullAt(3))
  }

  test("cuped: hand-computed theta and adjusted means") {
    // pre (day 0) / post (day 20) cents per user:
    //   arm 0: (100, 110), (300, 310); arm 1: (200, 230), (400, 430).
    // Pooled: n=4, Σp=1000, Σo=1080, Σp²=300000, Σpo=322000 →
    // var = 4·3e5 − 1e6 = 2e5; θ = (4·322000 − 1000·1080)/2e5 = 1.04.
    // adj(arm0) = 210 − 1.04·(200−250) = 262; adj(arm1) = 330 −
    // 1.04·(300−250) = 278 — the raw 120-cent gap shrinks to 16.
    val dir = plantEvents(Nil, Seq(
      (0L, 0, 1.00), (0L, 20, 1.10), (2L, 0, 3.00), (2L, 20, 3.10),
      (1L, 0, 2.00), (1L, 20, 2.30), (3L, 0, 4.00), (3L, 20, 4.30)))
    val got = Relational.qCuped(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == Seq(
      (0L, 2L, 200L, 210L, 1040000L, 262L),
      (1L, 2L, 300L, 330L, 1040000L, 278L)))
  }

  test("anova: hand-computed F; zero within-variance guards to NULL") {
    // a = (1, 3), b = (5, 7): SSB-part = 80 − 64 = 16, msb = 16;
    // SSW = 84 − 80 = 4, msw = 2 → F = 8.
    val dir = plantEvents(Seq(("a", 0, 1), ("a", 1, 3),
      ("b", 0, 5), ("b", 1, 7)))
    val r = Relational.qAnova(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((2L, 4L, 160000L, 20000L, 80000L)))
    // constant-within groups: SSW = 0 → msw 0, F NULL
    val dir2 = plantEvents(Seq(("a", 0, 2), ("a", 1, 2), ("a", 2, 2),
      ("b", 0, 4), ("b", 1, 4), ("b", 2, 4)))
    val r2 = Relational.qAnova(spark, dir2).collect().head
    assert((r2.getLong(2), r2.getLong(3)) == ((60000L, 0L)))
    assert(r2.isNullAt(4))
  }

  test("burstiness: hand-computed two-doc VMRs") {
    // doc0 = "a a a a", doc1 = "b": a → 16/4 − 4/2 = 2 (2e6);
    // b → 1/1 − 1/2 = 0.5 (5e5).
    val dir = java.nio.file.Files.createTempDirectory("graft_burst").toString
    graft.TestFixtures.canonDocs(Seq((0L, "a a a a"), (1L, "b"))
      .toDF("doc_id", "text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.tokenBurstiness(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == Seq(("a", 4L, 1L, 16L, 2000000L),
      ("b", 1L, 1L, 1L, 500000L)))
  }

  test("dq audit: every planted violation class fires exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dq").toString
    Seq(1L, 2L).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((10L, 1L, 5.0, "O"), (10L, 2L, 6.0, "F"),
      (11L, 99L, -2.0, "X"))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, 1.0, Some(10.0)), (99L, 99.0, None), (11L, 0.0, Some(5.0)))
      .toDF("l_orderkey", "l_quantity", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Relational.qDqAudit(spark, dir).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3)))).toMap
    assert(got(("pk_unique", "orders.o_orderkey")) == ((3L, 1L)))
    assert(got(("pk_unique", "customer.c_custkey")) == ((2L, 0L)))
    assert(got(("fk_orphans", "orders.o_custkey->customer"))._2 == 1L)
    assert(got(("fk_orphans", "lineitem.l_orderkey->orders"))._2 == 1L)
    assert(got(("row_rules", "orders")) == ((3L, 1L)))
    assert(got(("row_rules", "lineitem")) == ((3L, 2L)))
  }

  test("bollinger: flat series never breaches; a spike fires +1 exactly once") {
    // 7 flat days of 10 → at day 7 (first full window) t = 7·10 − 70
    // = 0, no breach. Day 8 spikes to 30: s1 = 90, s2 = 1500,
    // t = 7·30 − 90 = 120, t² = 14400 > 4·(7·1500 − 8100) = 9600 →
    // breach +1. All-integer, hand-exact.
    val dir = plantEvents(
      (0 until 7).map(d => ("a", d, 10)) :+ (("a", 7, 30)))
    val got = Relational.qBollinger(spark, dir).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.length == 2, s"warmup rows must drop: ${got.toSeq}")
    assert(got(0) == ((10L, 70L, 0L, 0L)))
    assert(got(1) == ((30L, 90L, 120L, 1L)))
  }

  test("cuped: zero pre-variance guards to NULL") {
    val dir = plantEvents(Nil, Seq(
      (0L, 0, 1.00), (0L, 20, 1.10), (1L, 0, 1.00), (1L, 20, 2.30)))
    val got = Relational.qCuped(spark, dir).collect()
    assert(got.forall(r => r.isNullAt(4) && r.isNullAt(5)))
  }
}
