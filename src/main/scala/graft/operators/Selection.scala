package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed selection (k-th order statistic) — the missing
  * piece between `q_percentiles` (exact, but per-group over small
  * integer domains) and `q_approx_pct` (approximate): EXACT arbitrary
  * percentiles over a column too large to sort globally or collect.
  *
  * Algorithm: histogram bisection (the classic distributed-selection
  * shape). Each round builds a B-bucket equi-width histogram of the
  * candidate value range — one filtered scan + one ≤B-row aggregate —
  * locates the bucket containing the target rank, and recurses into
  * it. The range shrinks B× per round, so rounds are
  * O(log_B(range/gap)) — in practice 2-4 for doubles. When the
  * candidate set is small (≤ `exactBound` rows) the remaining rows
  * are sorted DISTRIBUTED and the answer read by `limit(k).max` — no
  * `collect()` of data rows anywhere; the only driver-side state is
  * the ≤B-row histogram per round (bounded-by-construction, the CMS
  * top-k precedent).
  *
  * 100 TB shape: every round is a parquet scan with a pushed-down
  * BETWEEN filter + a map-side-combined aggregate; no shuffle ever
  * exceeds B rows, no executor holds more than a partition's worth of
  * candidates, and the final exact sort touches ≤ exactBound rows.
  * Skew is immune by construction (equal values collapse the range to
  * width 0, answered directly).
  */
object Selection {

  /** EXACT global row_number (1-indexed under `sortCols`, which must
    * be a unique total order) WITHOUT a single-reducer window — the
    * distributed replacement for `row_number().over(Window.orderBy(…))`,
    * whose empty partition spec funnels every row through one task.
    *
    * Shape: range-partition on the sort key (a NUMBERED repartition,
    * so AQE cannot coalesce it), rank locally per partition under a
    * pid-partitioned window, and lift local ranks to global ones by
    * adding per-partition row-count offsets. The offsets come from a
    * ≤`shuffle.partitions`-row aggregate read on the driver — the
    * bounded-histogram precedent, never data rows. Rank values are
    * defined purely by the total order, so they are independent of
    * where the range sampler happens to place partition boundaries.
    *
    * With `cumSumOf = Some(c)` the running sum of BIGINT column `c`
    * in rank order is appended as `cumName` the same way (local
    * running sum + per-partition sum offsets).
    *
    * 100 TB shape: two narrow shuffles (range + pid hash) over rows
    * that should already be reduced to (key, metric) width; no stage
    * sees more than one partition's rows, no executor sorts more
    * than a partition. */
  def withGlobalRank(input: DataFrame, sortCols: Seq[Column], rankName: String,
      cumSumOf: Option[String] = None, cumName: String = "cum"): DataFrame =
    withGlobalCumsums(input, sortCols, rankName,
      cumSumOf.map(c => c -> cumName).toSeq)

  /** [[withGlobalRank]] generalized to ANY number of running sums in
    * one pass: `cums` maps source BIGINT column → output cumulative
    * column. Same shape — one range repartition, per-partition local
    * windows, and a single ≤`shuffle.partitions`-row offset read per
    * summed column (still bounded driver state, never data rows).
    * Multi-statistic rank passes (ECDF pairs for the KS/rank-sum
    * tests) pay one shuffle instead of one per statistic. */
  def withGlobalCumsums(input: DataFrame, sortCols: Seq[Column],
      rankName: String, cums: Seq[(String, String)]): DataFrame = {
    val spark = input.sparkSession
    import spark.implicits._
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = input.repartitionByRange(parts, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val aggCols = Seq(count(lit(1)).as("c")) ++
      cums.map { case (c, _) => sum(col(c)).as(s"__s_$c") }
    val stats = ranged.groupBy(col("__pid")).agg(aggCols.head, aggCols.tail: _*)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        cums.indices.map(i => r.getLong(2 + i))))
      .sortBy(_._1)
    var cOff = 0L
    val sOffs = Array.fill(cums.size)(0L)
    val offs = stats.toSeq.map { case (p, c, ss) =>
      val row = (p, cOff, sOffs.toSeq)
      cOff += c
      ss.zipWithIndex.foreach { case (s, i) => sOffs(i) += s }
      row
    }
    val offsets = broadcast(offs.toDF("__pid", "__coff", "__soffs"))
    val w = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    val cumW = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRank = ranged.join(offsets, Seq("__pid"))
      .withColumn(rankName, row_number().over(w).cast("long") + col("__coff"))
    val out = cums.zipWithIndex.foldLeft(withRank) {
      case (df, ((c, name), i)) => df.withColumn(name,
        sum(col(c)).over(cumW) + element_at(col("__soffs"), i + 1))
    }
    out.drop("__pid", "__coff", "__soffs")
  }

  /** `ntile(t)` of 1-indexed rank column `i` over `n` total rows, in
    * closed form (SQL NTILE: n mod t front tiles take ⌈n/t⌉ rows,
    * the rest ⌊n/t⌋) — so the tile assignment composes with
    * [[withGlobalRank]] instead of needing its own global window.
    * `i`/`n` are column NAMES of BIGINT columns in scope. */
  def ntileOfRank(i: String, n: String, t: Int): Column = expr(
    s"CASE WHEN ($i - 1) < ($n % $t) * ($n div $t + 1) " +
    s"THEN ($i - 1) div ($n div $t + 1) + 1 " +
    s"ELSE ($n % $t) + (($i - 1) - ($n % $t) * ($n div $t + 1)) div ($n div $t) + 1 END")

  /** Value at ascending rank `k` (1-indexed) of `df`'s single numeric
    * column `x`. */
  private[operators] def kthSmallest(df: DataFrame, k: Long,
      buckets: Int = 1024, exactBound: Long = 65536L): Double = {
    require(k >= 1, s"rank $k out of range")
    val head = df.agg(
      count(lit(1)).as("n"),
      min(col("x")).as("lo"),
      max(col("x")).as("hi")).head()
    var n = head.getLong(0)
    require(k <= n, s"rank $k out of range (n=$n)")
    var lo = head.getDouble(1)
    var hi = head.getDouble(2)
    var kRem = k
    var cand = df
    while (n > exactBound && hi > lo) {
      val width = (hi - lo) / buckets
      if (width <= 0 || width.isNaN || (lo + width) == lo) {
        // Range collapsed below double resolution: [lo, hi] spans
        // < `buckets` ulps, so at most ~`buckets` DISTINCT doubles
        // remain — a per-value count is bounded like the histogram
        // and resolves the rank exactly.
        val byVal = cand.groupBy(col("x")).agg(count(lit(1)).as("c"))
          .collect().map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
        var cum = 0L
        for ((v, c) <- byVal) { cum += c; if (cum >= kRem) return v }
        return byVal.last._1
      }
      // Bucket index, clamped so x == hi lands in the last bucket.
      val hist = cand
        .select(least(floor((col("x") - lit(lo)) / lit(width)),
          lit(buckets - 1L)).cast("long").as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      var cum = 0L
      var chosen = -1L
      var inBucket = 0L
      for ((b, c) <- hist if chosen < 0) {
        if (cum + c >= kRem) { chosen = b; inBucket = c; kRem -= cum }
        else cum += c
      }
      val newLo = lo + chosen * width
      val newHi = if (chosen == buckets - 1L) hi else lo + (chosen + 1L) * width
      val lastBucket = chosen == buckets - 1L
      cand = cand.filter(col("x") >= newLo &&
        (if (lastBucket) col("x") <= newHi else col("x") < newHi))
      lo = newLo; hi = newHi; n = inBucket
    }
    // Exact finish on the ≤exactBound candidate set: k-th smallest =
    // max of the k ascending-smallest rows. sort + limit + max is
    // fully distributed (TakeOrdered), no row ever reaches the driver.
    require(kRem <= Int.MaxValue, "exact-finish rank overflows limit()")
    cand.orderBy(col("x")).limit(kRem.toInt)
      .agg(max(col("x"))).head().getDouble(0)
  }

  /** Exact percentiles (discrete: value at rank ⌈p·n⌉, the
    * percentile_disc/quantile_disc convention) of `valueCol`.
    * Output: (pct: BIGINT, value) one row per requested percentile. */
  def exactPercentiles(input: DataFrame, valueCol: String,
      pcts: Seq[Int]): DataFrame = {
    val spark = input.sparkSession
    import spark.implicits._
    val base = input.select(col(valueCol).cast("double").as("x"))
      .filter(col("x").isNotNull)
    // Two at-scale postures, same algorithm (spec-pinned equal):
    // materialized (default) extracts the single column ONCE to a
    // localCheckpoint and every round filters it in memory — right
    // when the projected column fits cluster storage, which a
    // column-pruned extract of even a very large table usually does.
    // graft.selection.materialize=false keeps rounds on the source
    // scan instead, so each round's narrowing range reaches parquet
    // as PushedFilters — right when even one column is too large to
    // pin, at the price of one pruned scan per round.
    val materialize = spark.conf
      .getOption("graft.selection.materialize").forall(_.toBoolean)
    val df = if (materialize) base.localCheckpoint(true) else base
    val n = df.count()
    val rows = pcts.sorted.map { p =>
      require(p >= 1 && p <= 100, s"percentile $p out of range")
      val k = math.max(1L, math.ceil(p / 100.0 * n).toLong)
      (p.toLong, kthSmallest(df, k))
    }
    rows.toDF("pct", "value")
      .select(col("pct"), round(col("value"), 2).as("value"))
  }

  /** Query entry: exact global p50/p90/p99 of lineitem extendedprice. */
  def qPercentileSelect(spark: SparkSession, dir: String): DataFrame =
    exactPercentiles(graft.Tables.lineitem(spark, dir), "l_extendedprice",
      Seq(50, 90, 99)).orderBy(col("pct"))

  /** PER-GROUP exact percentiles, dispatched on the measured group
    * count — the two scale regimes need opposite plans:
    *   - FEW groups (≤ `graft.selection.maxBisectGroups`, default 8):
    *     each group is huge, so a per-group window sort would funnel
    *     it through one reducer; instead bisect — but BATCHED: all
    *     (group, percentile) cells advance through ONE shared
    *     histogram job per round instead of one [[kthSmallest]] run
    *     per cell (round 16 measured 9 sequential bisections =
    *     ~30 tiny sequential jobs, 3.86 s of pure scheduling — the
    *     k-means-fleet lesson class). No sort of any group, ever.
    *   - MANY groups: groups are individually modest and the shuffle
    *     spreads them, so the classic rank-window shape (row_number +
    *     group count, pick rank ⌈p·n⌉ by equi-joining precomputed
    *     rank targets) sorts all groups in parallel.
    * Both paths are exact under duplicates and spec-pinned equal.
    * Output: (grp: STRING, pct: BIGINT, value). */
  def groupPercentiles(input: DataFrame, groupCol: String, valueCol: String,
      pcts: Seq[Int]): DataFrame = {
    val spark = input.sparkSession
    import spark.implicits._
    val maxBisect = spark.conf.getOption("graft.selection.maxBisectGroups")
      .map(_.toInt).getOrElse(8)
    val base = input
      .select(col(groupCol).cast("string").as("grp"),
        col(valueCol).cast("double").as("x"))
      .filter(col("grp").isNotNull && col("x").isNotNull)
    // Bounded probe — and the probe IS the stats pass (round 17):
    // the per-group (n, lo, hi) aggregate the bisection needs anyway
    // doubles as the group-count dispatch probe under a limit, so
    // the few-groups branch starts with its stats in hand (one job
    // instead of probe + stats; only ever maxBisect+1 rows collect).
    val stats = base.groupBy(col("grp")).agg(
        count(lit(1)).as("n"), min(col("x")).as("lo"), max(col("x")).as("hi"))
      .limit(maxBisect + 1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    if (stats.length <= maxBisect) {
      batchedGroupKth(base.localCheckpoint(true), pcts, stats.sortBy(_._1))
    } else {
      import org.apache.spark.sql.expressions.Window
      val ranked = base
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("grp")).orderBy(col("x"))))
      val targets = base.groupBy(col("grp")).agg(count(lit(1)).as("n"))
        .crossJoin(pcts.sorted.map(_.toLong).toDF("pct"))
        .select(col("grp"), col("pct"),
          greatest(lit(1L), ceil(col("pct") / 100.0 * col("n")).cast("long")).as("rk"))
      ranked.join(targets, Seq("grp", "rk"))
        .select(col("grp"), col("pct"), round(col("x"), 2).as("value"))
    }
  }

  /** All (group, percentile) cells bisected TOGETHER (round 17):
    * per round ONE shared histogram job advances every still-wide
    * cell, then the exact finish for all cells rides the returned
    * DataFrame itself (duplicate-collapsing per-value counts + one
    * cumsum window per cell — the coreness collapse lesson, so a
    * skewed all-equal bucket never funnels raw rows through a
    * sort). Candidate membership is the CONJUNCTION of each past
    * round's bucket assignment — the same expression that counted
    * the row — never a reconstructed float range, so an FP boundary
    * row cannot be counted into one bucket and filtered into
    * another. Exactness needs no path identity with the sequential
    * bisection: the k-th smallest VALUE is algorithm-independent.
    * Jobs: 1 stats + ~1 histogram round (1024 buckets cut any
    * realistic group below the 64k exact bound in one round) +
    * the caller's action, vs ~30 sequential micro-jobs before
    * (measured 3.86 s of scheduling at sf0.1). */
  private def batchedGroupKth(df: DataFrame, pcts: Seq[Int],
      stats: Seq[(String, Long, Double, Double)],
      buckets: Int = 1024, exactBound: Long = 65536L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    case class Cell(id: Int, grp: String, pct: Int, kRem: Long, nRem: Long,
      lo: Double, hi: Double, cond: Column)
    var wide = Seq.empty[Cell]
    var done = Seq.empty[Cell]
    for {
      ((g, n, lo, hi), gi) <- stats.zipWithIndex
      (p, pi) <- pcts.sorted.zipWithIndex
    } {
      // Cell id stride = pcts.length, not a fixed 128: a fixed
      // stride collides (merging two cells' histograms) as soon as a
      // caller passes more than 128 percentiles, and the public API
      // does not bound pcts.length (ADVICE r17).
      val c = Cell(gi * math.max(pcts.length, 1) + pi, g, p,
        math.max(1L, math.ceil(p / 100.0 * n).toLong), n, lo, hi,
        col("grp") === g)
      if (c.nRem > exactBound && c.hi > c.lo) wide +:= c else done +:= c
    }
    var rounds = 0
    while (wide.nonEmpty && rounds < 64) {
      rounds += 1
      // Width collapse below double resolution leaves ≤ ~buckets
      // DISTINCT values — the value-collapsed finish is bounded by
      // distincts, not rows, so the cell is finish-ready regardless
      // of its remaining count.
      val (collapsed, active) = wide.map { c =>
        (c, (c.hi - c.lo) / buckets)
      }.partition { case (c, w) => w <= 0 || w.isNaN || (c.lo + w) == c.lo }
      done ++= collapsed.map(_._1)
      if (active.isEmpty) { wide = Seq.empty }
      else {
        def bucketOf(c: Cell, width: Double) =
          least(greatest(floor((col("x") - lit(c.lo)) / lit(width)), lit(0L)),
            lit(buckets - 1L)).cast("long")
        // ONE job: every active cell's histogram in a single union —
        // each branch re-reads the shared checkpoint's blocks.
        val hist = active.map { case (c, width) =>
          df.filter(c.cond)
            .select(lit(c.id).as("cell"), bucketOf(c, width).as("b"))
        }.reduce(_ unionAll _)
          .groupBy(col("cell"), col("b")).agg(count(lit(1)).as("c"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (id, rows) =>
            id -> rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
          }
        val next = active.map { case (c, width) =>
          val hs = hist(c.id)
          var cum = 0L; var chosen = -1L; var inBucket = 0L; var kRem = c.kRem
          for ((b, n) <- hs if chosen < 0) {
            if (cum + n >= kRem) { chosen = b; inBucket = n; kRem -= cum }
            else cum += n
          }
          val width0 = width
          c.copy(
            kRem = kRem, nRem = inBucket,
            lo = c.lo + chosen * width0,
            hi = if (chosen == buckets - 1L) c.hi
                 else c.lo + (chosen + 1L) * width0,
            cond = c.cond && (bucketOf(c, width0) === chosen))
        }
        val (fin, still) = next.partition(c => c.nRem <= exactBound || c.hi <= c.lo)
        done ++= fin
        wide = still
      }
    }
    // Round-cap stragglers finish EXACTLY too, never vanish: a cell
    // still wide at the cap (needs >64 rounds ⇔ >64k duplicates near
    // the kth value across ~the full double range) has a correct —
    // just larger — value-collapsed exact finish, same as every done
    // cell (ADVICE r17: the old frame was built from `done` only, so
    // a capped cell silently dropped its (grp, pct) output row).
    done ++= wide
    // Exact finish, all cells in the RETURNED frame (no extra
    // driver action): per-(cell, value) counts combine duplicates
    // map-side, the cumsum window runs over collapsed rows, and the
    // first value whose cumulative count reaches kRem IS the k-th
    // smallest.
    import org.apache.spark.sql.expressions.Window
    val kDf = done.map(c => (c.id, c.grp, c.pct.toLong, c.kRem))
      .toDF("cell", "grp", "pct", "k")
    val w = Window.partitionBy(col("cell")).orderBy(col("x"))
    done.map { c =>
      df.filter(c.cond).select(lit(c.id).as("cell"), col("x"))
    }.reduce(_ unionAll _)
      .groupBy(col("cell"), col("x")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(w))
      .join(broadcast(kDf), Seq("cell"))
      .filter(col("cum") >= col("k") && col("cum") - col("c") < col("k"))
      .select(col("grp"), col("pct"), round(col("x"), 2).as("value"))
  }

  /** Query entry: exact per-returnflag p50/p90/p99 of extendedprice. */
  def qGroupPercentile(spark: SparkSession, dir: String): DataFrame =
    groupPercentiles(graft.Tables.lineitem(spark, dir), "l_returnflag",
      "l_extendedprice", Seq(50, 90, 99))
      .orderBy(col("grp"), col("pct"))
}
