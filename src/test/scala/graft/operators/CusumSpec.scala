package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** CUSUM changepoint: a planted level shift peaks exactly where the
  * hand-computed statistic says; a flat series peaks at zero.
  */
class CusumSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def run(counts: Seq[(String, Int, Int)]) = {
    // (type, dayIdx, count) -> planted single-file events dir
    val base = 472222L * 3600L
    val rows = counts.flatMap { case (t, d, n) =>
      (0 until n).map(j =>
        (d * 1000L + j, 1L, t, 1.0, (base + d * 86400L + j) * 1_000_000_000L))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_cusum").toString
    rows.toDF("event_id", "user_id", "event_type", "value", "ts")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/out")
    val part = new java.io.File(s"$dir/out").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    Relational.qCusum(spark, dir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3), r.getLong(4)))
  }

  test("a planted level shift peaks at the end of the raised run") {
    // type a: days 0-5 at 10/day, days 6-9 at 30/day. D=10, Σx=180;
    // y = 10x−180 is −80 on flat days, +120 raised. cum runs to 0 at
    // day 9 with running min −480 at day 5, so CUSUM climbs through
    // the raised run and peaks at 480 on the last day.
    val out = run((0 to 5).map(d => ("a", d, 10)) ++ (6 to 9).map(d => ("a", d, 30)))
    assert(out.length == 1)
    val (_, _, x, cusum, dd) = out.head
    assert(dd == 10L && x == 30L)
    assert(cusum == 480L, s"cusum $cusum")
  }

  test("a flat series has zero CUSUM everywhere (earliest day wins)") {
    val out = run((0 to 4).map(d => ("b", d, 7)))
    assert(out.length == 1 && out.head._4 == 0L)
  }

  test("two types locate their own independent changepoints") {
    val out = run(
      (0 to 3).map(d => ("a", d, 5)) ++ (4 to 7).map(d => ("a", d, 20)) ++
      (0 to 7).map(d => ("b", d, 9)))
    val byType = out.map(r => r._1 -> r._4).toMap
    assert(byType("a") > 0L && byType("b") == 0L)
  }

  private def runCp(counts: Seq[(String, Int, Int)]) = {
    val base = 472222L * 3600L
    val rows = counts.flatMap { case (t, d, n) =>
      (0 until n).map(j =>
        (d * 1000L + j, 1L, t, 1.0, (base + d * 86400L + j) * 1_000_000_000L))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_cp").toString
    rows.toDF("event_id", "user_id", "event_type", "value", "ts")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/out")
    val part = new java.io.File(s"$dir/out").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    Relational.qChangepoint(spark, dir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
  }

  test("binary segmentation splits a clean level shift exactly") {
    // type a: days 0-4 at 2/day, days 5-9 at 10/day. At i=5:
    // gain = 10²/5 + 50²/5 − 60²/10 = 20 + 500 − 360 = 160 → e6.
    // The split day is the LAST day of the left segment (day 4).
    val out = runCp((0 to 4).map(d => ("a", d, 2)) ++
      (5 to 9).map(d => ("a", d, 10)))
    assert(out.length == 1)
    val (_, day, nDays, gain, ml, mr) = out.head
    assert(nDays == 10L && gain == 160000000L, s"gain $gain")
    assert(ml == 200L && mr == 1000L)
    // the argmax index is day 4 of the planted grid (5th day)
    val epoch = java.time.LocalDate.ofEpochDay(472222L * 3600L / 86400L + 4)
    assert(day == epoch.toString, s"split day $day vs $epoch")
  }

  test("a flat series yields zero gain (earliest split wins)") {
    val out = runCp((0 to 4).map(d => ("b", d, 7)))
    assert(out.length == 1 && out.head._4 == 0L)
    val epoch = java.time.LocalDate.ofEpochDay(472222L * 3600L / 86400L)
    assert(out.head._2 == epoch.toString)
  }

  test("holt-winters: a perfectly weekly series is an exact fixpoint") {
    // Two weeks of (1..7): init level = 4e6 (28·1e6/7), seasonals
    // x·1e6 − l. Week 2 reproduces the pattern exactly, so every
    // update is an integer fixpoint (10l//10 = l, (2s+8s)//10 = s):
    // trend 0, forecasts = the continuing pattern 1, 2, 3.
    val counts = (0 until 14).map(d => ("w", d, d % 7 + 1))
    val dir = java.nio.file.Files.createTempDirectory("graft_hw").toString
    val base = 472222L * 3600L
    counts.flatMap { case (t, d, n) =>
      (0 until n).map(j =>
        (d * 1000L + j, 1L, t, 1.0, (base + d * 86400L + j) * 1_000_000_000L))
    }.toDF("event_id", "user_id", "event_type", "value", "ts")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/out")
    val part = new java.io.File(s"$dir/out").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val r = Relational.qHoltWinters(spark, dir).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6)) ==
      ((14L, 4000000L, 0L, 1000000L, 2000000L, 3000000L)))
  }

  test("holt fits refit the trailing 30-day window on a longer lake") {
    // 45 observed days (round 13 threw here): both fits must consume
    // exactly the LAST 30 days — bit-identical to a grid that never
    // contained the first 15 — and report n_days = 30.
    def grid(days: Int): Seq[(String, Long)] =
      (0 until days).map(d => ("t", (d % 7 + 1) * 10L + d / 7))
    val full = Relational.holtForecastOf(grid(45))
    val tail30 = Relational.holtForecastOf(grid(45).takeRight(30))
    assert(full == tail30, s"$full vs $tail30")
    assert(full.head._2 == 30L)
    val fullW = Relational.holtWintersOf(grid(45))
    val tailW = Relational.holtWintersOf(grid(45).takeRight(30))
    assert(fullW == tailW, s"$fullW vs $tailW")
    assert(fullW.head._2 == 30L)
    // shorter-than-a-season series still fails loudly (no seasonal
    // init exists at all) — the one require that remains.
    intercept[IllegalArgumentException] {
      Relational.holtWintersOf(grid(5))
    }
  }

  test("stream cusum withholds the open trailing day and scans the rest") {
    // Day-aligned plant: days 0–2 carry 2, 2, 8 events; day 3 has one
    // event at 02:00, putting the watermark at day3 01:00 — day 2's
    // window (end = day3 00:00) finalizes, day 3 stays open and MUST
    // NOT enter the scan. CUSUM over (2,2,8): terms −6,−6,+12 →
    // cusum 0,0,12 → peak day 2, n_days = 3 (not 4 — the online
    // semantics that distinguish this from batch q_cusum).
    val base = 19700L * 86400L
    val rows = (Seq((0, 2), (1, 2), (2, 8)).flatMap { case (d, n) =>
      (0 until n).map(j =>
        (d * 100L + j, 1L, "a", 1.0, (base + d * 86400L + j) * 1_000_000_000L))
    }) :+ (999L, 1L, "a", 1.0, (base + 3 * 86400L + 7200L) * 1_000_000_000L)
    val dir = java.nio.file.Files.createTempDirectory("graft_scusum").toString
    rows.toDF("event_id", "user_id", "event_type", "value", "ts")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/out")
    val part = new java.io.File(s"$dir/out").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val out = graft.streaming.StreamingOps.streamCusum(spark, dir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val peakDay = java.time.LocalDate.ofEpochDay(19700L + 2).toString
    assert(out.toSeq == Seq(("a", peakDay, 8L, 12L, 3L)))
  }
}
