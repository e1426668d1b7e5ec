package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational query surface (SURVEY §2 rows 9–21).
  *
  * All queries are declarative DataFrame plans: Catalyst handles
  * predicate/projection pushdown, join reordering and (with AQE)
  * runtime re-planning. Join-side hint discipline (round 18):
  * `broadcast()` stays unconditional ONLY for frames whose
  * cardinality is bounded independent of data scale — nation/region
  * (25/5 rows), one-row scalar aggregates, per-event-type /
  * per-segment / per-day grids. Every frame that GROWS with scale
  * factor (customer/supplier/part projections, per-partkey /
  * per-user aggregates) routes through [[Joins.maybeBroadcast]],
  * which keeps the hint under a byte budget and otherwise defers to
  * AQE — a hint Spark never demotes is an OOM at the 100 TB design
  * point. Money aggregates are rounded to 2 decimals for bit-stable
  * oracle comparison.
  */
object Relational {

  /** Single source of truth for the Holt oracle's unroll depth AND
    * the fits' trailing refit window — SparkEntry.holtOracleSql
    * generates exactly this many recursion steps, and both fits
    * consume exactly the most recent this-many observed days per
    * type (round 14: a longer lake refits the trailing window
    * instead of throwing — the round-13 data-span ceiling). */
  val HoltOracleRounds = 30

  /** TPC-H Q1 family: scan → filter → groupBy → multi-agg.
    * Single shuffle (the groupBy); map-side partial aggregation is
    * automatic for sum/count/avg.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Predicate + projection pushdown: both the filter and the 3-column
    * read schema must reach the parquet scan. */
  def q2FilterProj(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > lit(45.0) && col("l_discount") >= lit(0.05))
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
      .orderBy(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
  }

  /** customer ⋈ orders ⋈ lineitem, grouped revenue, deterministic
    * top-10. customer is small relative to the facts → broadcast. */
  def q3TopnJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === lit("BUILDING"))
      .select(col("c_custkey"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(Joins.maybeBroadcast(cust), ord("o_custkey") === cust("c_custkey"))
      .groupBy(col("o_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey").asc)
      .limit(10)
  }

  /** 6-table star join: region ⋈ nation ⋈ customer ⋈ orders ⋈
    * lineitem ⋈ supplier; revenue per nation. All dims broadcast —
    * only orders⋈lineitem shuffles. */
  def q5Multijoin(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") =!= lit(""))
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(Joins.maybeBroadcast(supp), li("l_suppkey") === supp("s_suppkey"))
      .join(Joins.maybeBroadcast(cust), ord("o_custkey") === cust("c_custkey"))
      // TPC-H Q5 requires customer and supplier in the same nation
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("n_name"))
  }

  /** EXISTS via left_semi: customers having at least one order above
    * the price threshold. The semi-join shuffles only the keys. */
  def qSemijoin(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > lit(450000.0))
      .select(col("o_custkey"))
    Tables.customer(spark, dir)
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** NOT EXISTS via left_anti: customers with no high-value orders. */
  def qAntijoin(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > lit(450000.0))
      .select(col("o_custkey"))
    Tables.customer(spark, dir)
      .join(ord, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Window rank: top-3 orders per customer by totalprice,
    * deterministic tiebreak on orderkey. */
  def qWindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .orderBy(col("o_custkey"), col("rk"))
  }

  /** Running sum of quantity per supplier in deterministic ship
    * order. One shuffle (the window partitioning). */
  def qWindowRunning(spark: SparkSession, dir: String): DataFrame = {
    // quantity breaks ties: the synthetic data can repeat
    // (orderkey, linenumber) pairs, and a non-unique sort key makes
    // running sums engine-order-dependent.
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_shipdate"))
      .withColumn("running_qty", round(sum(col("l_quantity")).over(w), 2))
      .drop("l_shipdate")
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** count(DISTINCT) per group — expands to a two-phase aggregate. */
  def qDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir).select(col("o_custkey"), col("o_orderkey"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
    ord.join(Joins.maybeBroadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment"))
  }

  /** HLL approximate distinct — sketch-based, constant memory per
    * group at any scale. The sketch estimate itself isn't
    * bit-reproducible across engines, so the query emits the exact
    * count plus an in-query 5%-error-bound verdict: the DuckDB
    * oracle pins the exact values and expects `approx_ok = true`,
    * putting sketch QUALITY (not its exact bits) under the driver's
    * hash check. */
  def qApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts"))
          <= col("exact_parts") * lit(0.05)).as("approx_ok"))
      .orderBy(col("l_returnflag"))
  }

  /** MERGEABLE persisted sketches — the incremental-analytics shape
    * [[qApproxDistinct]] only gestures at: at 100 TB you do NOT
    * rescan history to count distincts over a widening window; you
    * persist one tiny HLL sketch per (group, day) as data arrives and
    * UNION sketches at query time. This operator materializes the
    * per-(event_type, day) sketch table to parquet once per SF dir
    * (binary sketch column — proving the artifact round-trips
    * storage), reads it back, merges with `hll_union_agg` per
    * event_type, and audits the estimate against the exact distinct
    * with the 5% verdict convention (sketch QUALITY under the oracle,
    * not its bits). lgConfigK=12 → ~1.6% standard error. */
  def qSketchUnion(spark: SparkSession, dir: String): DataFrame = {
    val src = new java.io.File(s"$dir/events.parquet")
    val key = java.lang.Long.toHexString(src.length() ^ src.lastModified())
    val stem = dir.replaceAll("[^A-Za-z0-9]", "_")
    val skDir = s"/tmp/graft_hll_${stem}_$key"
    if (!new java.io.File(s"$skDir/_SUCCESS").exists()) {
      Tables.events(spark, dir)
        .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
        .groupBy(col("event_type"), col("day"))
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
        .write.mode("overwrite").parquet(skDir)
    }
    val merged = spark.read.parquet(skDir)
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(true)))
        .as("approx_users"))
    val exact = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    exact.join(merged, Seq("event_type"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users"))
          <= col("exact_users") * lit(0.05)).as("approx_ok"))
      .orderBy(col("event_type"))
  }

  /** Approximate percentile (GK sketch) next to the exact median —
    * the mergeable single-pass form used when exact per-group sorts
    * are too expensive. As with [[qApproxDistinct]], the sketch value
    * isn't cross-engine-stable, so the query emits the exact median
    * plus an in-query error-bound verdict (|approx − exact| ≤ 1.0 —
    * quantities are small integers, and at accuracy 10000 the rank
    * error is far below one value step) that the oracle pins to
    * true. */
  def qApproxPercentile(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_quantity"), lit(0.5), lit(10000))
        .as("approx_median"),
        expr("percentile(l_quantity, 0.5)").as("exact_median"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("exact_median"), col("n"),
        (abs(col("approx_median") - col("exact_median")) <= lit(1.0))
          .as("approx_ok"))
      .orderBy(col("l_returnflag"))

  /** ROLLUP over (segment, orderstatus): 3 grouping levels in one
    * pass. */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir).select(col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
    ord.join(Joins.maybeBroadcast(cust), col("o_custkey") === col("c_custkey"))
      .rollup(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("c_mktsegment").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
  }

  /** As-of join: for each 'purchase' event, the user's latest 'view'
    * event at or before the purchase. Composed as equi-join on the
    * key + range filter + row_number — a hash join Catalyst executes
    * distributed (never a nested-loop join), which is the scalable
    * as-of pattern. */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val purchases = ev.filter(col("event_type") === lit("purchase"))
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("event_id").as("p_event_id"))
    val views = ev.filter(col("event_type") === lit("view"))
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"), col("event_id").as("v_event_id"))
    val joined = purchases.join(views,
      col("p_user") === col("v_user") && col("v_ts") <= col("p_ts"))
    val w = Window.partitionBy(col("p_event_id"))
      .orderBy(col("v_ts").desc, col("v_event_id").desc)
    joined.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("p_event_id"), col("p_user").as("user_id"), col("v_event_id").as("last_view_id"))
      .orderBy(col("p_event_id"))
  }

  /** Nearest-in-time as-of join, both directions — the sensor/label
    * alignment variant [[qAsofJoin]]'s backward-only rule can't
    * answer. Deliberately NOT the pair join: interleave both event
    * kinds into ONE per-user stream ordered by (ts, event_id) and
    * read the nearest view off two conditional windows (running last
    * view ≤ here, running first view ≥ here) — a single sort where
    * the inequality-join shape explodes |purchases|×|views| rows per
    * user. Ties: equal |Δt| prefers the backward view; views sharing
    * the purchase's timestamp fall backward/forward by event_id order
    * (the stream's tiebreak), documented-deterministic. Purchases
    * with no view at all drop (inner semantics). */
  def qAsofNearest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val vUs = when(col("event_type") === "view", col("us"))
    val vId = when(col("event_type") === "view", col("event_id"))
    val ob = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val wb = ob.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = ob.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pickBack = col("back_us").isNotNull &&
      (col("fwd_us").isNull || col("us") - col("back_us") <= col("fwd_us") - col("us"))
    ev
      .withColumn("back_us", last(vUs, ignoreNulls = true).over(wb))
      .withColumn("back_id", last(vId, ignoreNulls = true).over(wb))
      .withColumn("fwd_us", first(vUs, ignoreNulls = true).over(wf))
      .withColumn("fwd_id", first(vId, ignoreNulls = true).over(wf))
      .filter(col("event_type") === "purchase"
        && (col("back_us").isNotNull || col("fwd_us").isNotNull))
      .select(col("event_id").as("p_event_id"), col("user_id"),
        when(pickBack, col("back_id")).otherwise(col("fwd_id")).as("nearest_view_id"),
        when(pickBack, col("us") - col("back_us"))
          .otherwise(col("fwd_us") - col("us")).as("delta_us"))
      .orderBy(col("p_event_id"))
  }

  /** Event-flow transition matrix — the Markov-chain readout of user
    * journeys (what follows what): consecutive event pairs per user
    * under the deterministic (ts, event_id) stream order, counted per
    * (from, to). One window on the user partitioning + one map-side
    * combined count; event-type domains are small so the result is a
    * bounded matrix at any corpus size. */
  def qTransitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    ev.withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Exact median per group. Restricted to p=0.5 over integer-valued
    * quantities on purpose: both engines' interpolation formulas
    * (`lo + f·(hi−lo)` vs `(1−f)·lo + f·hi`) are bit-exact there,
    * while fractional percentiles over decimal data differ in the
    * last ulp and fail hash comparison — measured, not theoretical.
    * Scale boundary: exact `percentile` accumulates a per-VALUE
    * counts map per group — bounded here by the ~50 distinct integer
    * quantities at any row count, but arbitrary-cardinality columns
    * belong on [[qApproxPercentile]]'s GK sketch (whose in-query
    * error verdict is the accuracy contract). Internal thresholds
    * never use the exact form (see GraphOps.strongTies). */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("median_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** Histogram binning: order counts per 50k price bucket. */
  def qHistogram(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir)
      .select(floor(col("o_totalprice") / lit(50000.0)).cast("long").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))
  }

  /** Trailing-1-hour rolling event count per user: a RANGE window
    * over epoch seconds (time-series shape; rows with equal frame
    * bounds share results, so no uniqueness tiebreak is needed
    * beyond the output sort). */
  def qRangeWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_sec"))
      .rangeBetween(-3600L, 0L)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("ts_sec"))
      .withColumn("n_last_hour", count(lit(1)).over(w))
      .orderBy(col("user_id"), col("ts_sec"), col("event_id"))
      .select(col("user_id"), col("event_id"), col("n_last_hour"))
  }

  /** Set operations: high-value customers UNION distinct with
    * BUILDING-segment customers, then EXCEPT the machinery segment. */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val highValue = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > lit(400000.0))
      .select(col("o_custkey").as("c_custkey"))
    val building = cust.filter(col("c_mktsegment") === lit("BUILDING"))
      .select(col("c_custkey"))
    val machinery = cust.filter(col("c_mktsegment") === lit("MACHINERY"))
      .select(col("c_custkey"))
    highValue.union(building).distinct()
      .except(machinery)
      .orderBy(col("c_custkey"))
  }

  /** Pivot via conditional aggregation: order counts per customer
    * segment × order status as columns. */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir).select(col("o_custkey"), col("o_orderstatus"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
    ord.join(Joins.maybeBroadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p"))
      .orderBy(col("c_mktsegment"))
  }

  /** Unpivot (wide → long): melt the status × segment count matrix
    * of [[qPivot]] back to (segment, status, n) rows via
    * `Dataset.unpivot` — the relational MELT/UNPIVOT operator. The
    * wide side is tiny (one row per segment), so the unpivot is a
    * driver-free narrow Expand; zeros for absent combinations are
    * preserved (unlike a plain group-by, which would drop them). */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame = {
    val wide = qPivot(spark, dir)
    wide.unpivot(
        Array(col("c_mktsegment")),
        Array(col("n_f"), col("n_o"), col("n_p")),
        "status_col", "n")
      .select(col("c_mktsegment"),
        upper(substring(col("status_col"), 3, 1)).as("o_orderstatus"),
        col("n").cast("long").as("n"))
      .orderBy(col("c_mktsegment"), col("o_orderstatus"))
  }

  /** Latest-row-per-key snapshot (the QUALIFY / "current state of
    * each entity" pattern): each customer's most recent order via
    * row_number over a descending (date, orderkey) window —
    * deterministic tiebreak, one shuffle on the partition key. */
  def qLatestSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("last_price"))
      .orderBy(col("o_custkey"))
  }

  /** GROUPING SETS: ((returnflag, linestatus), (returnflag), ()) in
    * one pass. */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .createOrReplaceTempView("graft_lineitem_gs")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM graft_lineitem_gs
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  /** CUBE: all 2^2 grouping combinations of (segment, status) in one
    * pass — same partial-aggregate expansion as ROLLUP/GROUPING SETS,
    * Catalyst plans a single shuffle. */
  def qCube(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir).select(col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"))
    val cust = Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
    ord.join(Joins.maybeBroadcast(cust), col("o_custkey") === col("c_custkey"))
      .cube(col("c_mktsegment"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("c_mktsegment").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
  }

  /** Correlated-subquery pattern: each customer's most expensive
    * order — decorrelated as a max-aggregate joined back (the shape
    * Catalyst rewrites correlated subqueries into). */
  def qCorrelated(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val maxPrice = ord.groupBy(col("o_custkey").as("mk"))
      .agg(max(col("o_totalprice")).as("max_price"))
    ord.join(maxPrice,
        col("o_custkey") === col("mk") && col("o_totalprice") === col("max_price"))
      // price ties within a customer: keep the smallest orderkey
      .groupBy(col("o_custkey"))
      .agg(min(col("o_orderkey")).as("o_orderkey"),
        round(max(col("o_totalprice")), 2).as("max_price"))
      .orderBy(col("o_custkey"))
  }

  /** Raw SQL entry point: TPC-H Q1 family through spark.sql over a
    * registered view — same answer as the DataFrame plan (Catalyst
    * compiles both to the same physical query). */
  def qSqlQ1(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_lineitem_sql")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM graft_lineitem_sql
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** (Re)write orders + customer as bucketed-and-sorted tables on
    * the join key. Separate from [[qBucketJoin]] so the spec can
    * inspect the join plan without paying the write. */
  def writeBucketedTables(spark: SparkSession, dir: String, buckets: Int = 8): Unit = {
    // A fresh session's in-memory catalog doesn't know tables a prior
    // JVM wrote, but their warehouse directories survive — clear both
    // or the managed-table CREATE fails with LOCATION_ALREADY_EXISTS.
    Seq("graft_orders_b", "graft_customer_b").foreach { name =>
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val path = new org.apache.hadoop.fs.Path(wh, name)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) fs.delete(path, true)
    }
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.mode("overwrite")
      .bucketBy(buckets, "o_custkey").sortBy("o_custkey")
      .saveAsTable("graft_orders_b")
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
      .write.mode("overwrite")
      .bucketBy(buckets, "c_custkey").sortBy("c_custkey")
      .saveAsTable("graft_customer_b")
  }

  /** The bucketed join itself: both scans expose the same hash
    * partitioning on custkey, so the sort-merge join runs with ZERO
    * shuffle exchanges on either side (spec-asserted). The merge hint
    * pins SMJ — at test scale AQE would broadcast the small side,
    * which hides whether bucketing actually removed the shuffle; at
    * 100 TB neither side broadcasts and SMJ-over-buckets is the plan
    * you want. */
  def bucketedJoin(spark: SparkSession): DataFrame =
    spark.table("graft_orders_b").hint("merge")
      .join(spark.table("graft_customer_b"),
        col("o_custkey") === col("c_custkey"))

  /** Bucket-co-located join — the 100 TB repeated-join shape: pay one
    * bucketed write, then every subsequent join on the key is
    * shuffle-free because the table layout IS the shuffle output.
    * Returns per-segment order counts + revenue; the oracle is the
    * plain (shuffled) join, so the result also proves bucketing does
    * not change semantics. */
  def qBucketJoin(spark: SparkSession, dir: String): DataFrame = {
    writeBucketedTables(spark, dir)
    bucketedJoin(spark)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("c_mktsegment"))
  }

  /** Lag window: whole seconds since the user's previous event (0
    * for the first). One window shuffle on user_id; epoch-floored
    * arithmetic keeps the delta integer-stable across engines. */
  def qLagDelta(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_id"),
        coalesce(unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")), lit(0L))
          .as("gap_s"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Set aggregation: the sorted distinct order statuses per market
    * segment, joined to one string — `collect_set` + `sort_array`
    * makes the inherently unordered set deterministic for compare. */
  def qCollectSet(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(array_join(sort_array(collect_set(col("o_orderstatus"))), ",")
        .as("statuses"))
      .orderBy(col("c_mktsegment"))

  /** Multiple count(DISTINCT) over different columns in one
    * aggregation — Catalyst compiles this to an Expand (one replica
    * per distinct set) + two-phase aggregate, the plan shape that
    * keeps multi-distinct single-pass instead of self-joining. */
  def qMultiDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderstatus")).as("n_status"),
        countDistinct(year(col("o_orderdate"))).as("n_years"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment"))

  /** GROUP BY + HAVING (post-aggregation filter). */
  def qHaving(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .filter(col("n") >= 10)
      .orderBy(col("o_custkey"))

  /** Outer join with null accounting: every customer kept, orders
    * optional — count(order) skips nulls, the conditional sum counts
    * order-less customers. The unmatched-row semantics are exactly
    * what the oracle pins. */
  def qOuterJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("c_custkey")).as("n_cust"),
        count(col("o_orderkey")).as("n_orders"),
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("n_orderless"))
      .orderBy(col("c_mktsegment"))

  /** INTERSECT (distinct) — the remaining set operation next to
    * q_setops' UNION + EXCEPT. */
  def qIntersect(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_custkey").as("c_custkey"))
      .intersect(Tables.customer(spark, dir)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey")))
      .orderBy(col("c_custkey"))

  /** ntile + percent_rank windows: orders bucketed into price
    * quartiles per segment (unique (price, orderkey) sort key keeps
    * tile edges deterministic), then per-quartile totals with the
    * max e4-scaled percent_rank as a cross-engine float check. */
  def qNtile(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pr_e4", round(percent_rank().over(w) * 1e4).cast("long"))
      .groupBy(col("c_mktsegment"), col("quartile"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"),
        max(col("pr_e4")).as("max_pr_e4"))
      .orderBy(col("c_mktsegment"), col("quartile"))
  }

  /** Temporal extraction: order counts + revenue per (year, month)
    * of the order date — calendar functions under the oracle. */
  def qDateparts(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).as("o_year"),
        month(col("o_orderdate")).as("o_month"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("o_year"), col("o_month"))

  /** Interval join WITHOUT a nested loop: each purchase joins every
    * same-user view in its trailing 30-minute window. A bare
    * range-condition join plans as BroadcastNestedLoop — the classic
    * time-series scale-killer — so the window is banded onto a
    * 30-minute bucket grid: each purchase probes the (exactly two)
    * buckets its window can span, the join becomes a shuffle-parallel
    * (user, bucket) hash equi-join, and the exact range predicate
    * refines the candidates. Fan-out is bounded by
    * ⌈window/bucket⌉ + 1 probe rows regardless of data volume.
    * Batch twin of s_stream_join (same match semantics, second-floored
    * timestamps). */
  def qIntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"))
    val views = ev.filter(col("event_type") === lit("view"))
      .select(col("user_id").as("v_user"), col("sec").as("v_sec"),
        col("event_id").as("view_id"),
        floor(col("sec") / lit(1800L)).as("bucket"))
    val probes = ev.filter(col("event_type") === lit("purchase"))
      .select(col("user_id").as("p_user"), col("sec").as("p_sec"),
        col("event_id").as("p_id"),
        explode(array(floor((col("sec") - lit(1800L)) / lit(1800L)),
          floor(col("sec") / lit(1800L)))).as("bucket"))
    probes.join(views,
        col("p_user") === col("v_user") && probes("bucket") === views("bucket"))
      .filter(col("v_sec") >= col("p_sec") - lit(1800L) &&
        col("v_sec") <= col("p_sec"))
      .select(col("p_id"), col("view_id"), col("p_user").as("user_id"))
      .orderBy(col("p_id"), col("view_id"))
  }

  /** Date-spine gap fill: monthly order counts per market segment
    * INCLUDING zero months — the time-series completeness shape a
    * plain group-by can't produce. The spine is generated
    * distributed-side from a one-row min/max aggregate (no driver
    * collect) and cross-joined with the distinct segments — both tiny
    * — then the fact counts left-join on. At 100 TB the fact
    * aggregation is the only real work; the spine build is
    * metadata-sized. */
  def qDateSpine(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .select(col("o_custkey"), date_trunc("month", col("o_orderdate")).as("mo"))
    val bounds = ord.agg(min(col("mo")).as("mn"), max(col("mo")).as("mx"))
    val months = bounds.select(
      explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 MONTH"))).as("mo"))
    val segs = Tables.customer(spark, dir)
      .select(col("c_mktsegment")).distinct()
    val counts = Tables.orders(spark, dir)
      .join(Joins.maybeBroadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"),
        date_trunc("month", col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("cnt"))
    months.crossJoin(segs)
      .join(counts, Seq("c_mktsegment", "mo"), "left")
      .select(col("c_mktsegment"),
        year(col("mo")).as("o_year"), month(col("mo")).as("o_month"),
        coalesce(col("cnt"), lit(0L)).as("n"))
      .orderBy(col("c_mktsegment"), col("o_year"), col("o_month"))
  }

  /** Semi-structured extraction: parse the `events.props` JSON column
    * with an explicit schema — `from_json` with a fixed schema stays a
    * scan-side codegen'd projection (no per-row schema inference), so
    * the JSON never reaches a shuffle; only the extracted integer
    * does. Aggregates the extracted field per event type. */
  def qJsonProps(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    Tables.events(spark, dir)
      .select(col("event_type"),
        from_json(col("props"), StructType(Seq(StructField("k", LongType))))
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  /** Schema-FREE semi-structured extraction through Spark 4's
    * VARIANT type: `parse_json` decodes props into the binary
    * variant encoding once at the scan, `variant_get` path-extracts
    * with a type cast — no StructType declared anywhere, the
    * schema-on-read path for props whose shape drifts (vs
    * [[qJsonProps]]' fixed-schema `from_json`, which is the faster
    * plan when the shape IS known). Same aggregate as q_json_props,
    * so the two paths are mutually checking; JSON text still never
    * shuffles (parse + extract are scan-side projections). */
  def qVariantExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        variant_get(parse_json(col("props")), "$.k", "bigint").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** Gaps-and-islands: per-user runs of CONSECUTIVE active days (the
    * retention/streak query): group key = day − row_number over the
    * per-user day sequence (constant within a consecutive run — the
    * classic integer-date trick, exact arithmetic end to end). One
    * distinct + two windows/aggregations, all shuffling on user_id;
    * emitted per user: active days, island count, longest and
    * latest streak lengths. */
  def qGapIslands(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val grouped = days
      .withColumn("grp",
        datediff(col("day"), lit("1970-01-01").cast("date"))
          - row_number().over(w))
    val islands = grouped.groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"), max(col("day")).as("island_end"))
    islands.groupBy(col("user_id"))
      .agg(sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_islands"),
        max(col("len")).as("longest_streak"),
        max_by(col("len"), col("island_end")).as("latest_streak"))
      .orderBy(col("user_id"))
  }

  /** Time-weighted average over irregular samples (the metering /
    * billing integral — a plain avg over-weights burst periods):
    * each observation holds its value until the next one, so
    * TWA = Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_last − t_first) per user. Exact
    * integer arithmetic end to end: µs timestamps, cent values, one
    * BIGINT floor division at the end (positive operands — Spark
    * `div` ≡ DuckDB `//` there); the (ts_us, event_id) window order
    * is unique. Users with a single event (zero span) are excluded
    * — the integral is undefined, not zero. */
  def qTimeWeighted(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), round(col("value") * 100).cast("long").as("v2"))
      .withColumn("next_us", lead(col("ts_us"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("t0"), max(col("ts_us")).as("t1"),
        sum(when(col("next_us").isNotNull,
          col("v2") * (col("next_us") - col("ts_us")))).as("wsum"))
      .filter(col("t1") > col("t0"))
      .select(col("user_id"), col("n_events"),
        (col("t1") - col("t0")).as("span_us"),
        expr("wsum div (t1 - t0)").as("twa_e2"))
      .orderBy(col("user_id"))
  }

  /** Ordered event-sequence funnel (the windowFunnel staple):
    * how deep did each user get through view → click → purchase in
    * STRICT temporal order? Computed as the greedy earliest chain —
    * first view, first click after it, first purchase after that —
    * which is EXACT for pure ordering: any valid chain (v, c, p)
    * dominates the greedy one step-wise (v₀ ≤ v ⇒ the first click
    * after v₀ is ≤ c ⇒ …), so a chain exists iff the greedy chain
    * completes. Three narrow min-aggregations chained by equi-joins —
    * per-user event lists never materialize as arrays; µs-integer
    * timestamps end to end so the emitted chain is engine-exact.
    * Depth counts stages reached; users with events but no view sit
    * at depth 0 (they are part of the funnel's denominator). */
  def qEventFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val users = e.select(col("user_id")).distinct()
    val t1 = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t1_us"))
    val t2 = e.filter(col("event_type") === "click")
      .join(t1, Seq("user_id")).filter(col("us") > col("t1_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t2_us"))
    val t3 = e.filter(col("event_type") === "purchase")
      .join(t2, Seq("user_id")).filter(col("us") > col("t2_us"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t3_us"))
    users
      .join(t1, Seq("user_id"), "left")
      .join(t2, Seq("user_id"), "left")
      .join(t3, Seq("user_id"), "left")
      .select(col("user_id"), col("t1_us"), col("t2_us"), col("t3_us"),
        when(col("t3_us").isNotNull, 3L)
          .when(col("t2_us").isNotNull, 2L)
          .when(col("t1_us").isNotNull, 1L)
          .otherwise(0L).as("depth"))
      .orderBy(col("user_id"))
  }

  /** Cohort retention matrix — the growth-analytics staple: users
    * grouped by their FIRST active day (the cohort), then counted by
    * how many days after joining they were active again. Exact
    * integer date arithmetic (calendar-day truncation, day-diff
    * offsets) so the matrix is engine-deterministic; the (user, day)
    * activity set is distinct-ed BEFORE the join so each user counts
    * once per (cohort, offset) cell. Two narrow shuffles (distinct,
    * min-per-user) + one count aggregation — every row is (user_id,
    * date), no event payload moves. Daily grain because the synthetic
    * corpus spans one month; the month/week variant is the same plan
    * with a different truncation. */
  def qRetentionCohort(spark: SparkSession, dir: String): DataFrame = {
    val m = Tables.events(spark, dir)
      .select(col("user_id"), col("ts").cast("date").as("day"))
      .distinct()
    val cohort = m.groupBy(col("user_id")).agg(min(col("day")).as("c0"))
    m.join(cohort, Seq("user_id"))
      .groupBy(col("c0").as("cohort_day"),
        datediff(col("day"), col("c0")).cast("long").as("offset_d"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("offset_d"))
  }

  /** Sliding ROWS window: trailing-3-order spend per customer, in
    * exact cents (BIGINT) so the frame accumulation is order-immune
    * across engines. Complements q_range_window (RANGE frame) and
    * q_window_running (unbounded frame); the sort key
    * (o_orderdate, o_orderkey) is unique per partition. */
  def qRowsWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-2, 0)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .withColumn("trail3_cents", sum(col("cents")).over(w))
      .withColumn("n_frame", count(lit(1)).over(w))
      .select(col("o_custkey"), col("o_orderkey"),
        col("trail3_cents"), col("n_frame"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Sessionization: 30-minute-gap sessions per user via lag window,
    * then sessions-per-user counts. */
  def qEventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapped = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
          .otherwise(0))
    gapped
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** Cumulative-distinct growth curve — the standard audience
    * dashboard (DAU + new users + running total of EVER-seen users
    * per day) computed without any running count-distinct state: a
    * user's contribution to the cumulative curve is fully determined
    * by their FIRST-seen day, so one user-keyed min-agg (map-side
    * combinable) plus one distinct (day, user) agg reduce the stream
    * to per-day rows, and the cumulative sum runs over the tiny day
    * table — the at-scale shape for running-distinct questions
    * (windowed count-distinct over the raw stream funnels everything
    * through one reducer and holds per-key sets in state). */
  def qCumulativeDistinct(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val dau = ev.distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val firstSeen = ev.groupBy(col("user_id")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    dau.join(firstSeen, Seq("day"), "left")
      .select(col("day"), col("dau"),
        coalesce(col("new_users"), lit(0L)).as("new_users"))
      .withColumn("cum_users",
        sum(col("new_users")).over(Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(col("day"))
  }

  /** Skyline (Pareto frontier) of orders under (minimize price,
    * minimize date) — the classic multi-criteria operator (Börzsönyi
    * et al., ICDE 2001): keep every order no other order beats on
    * both axes (strictly on at least one). The 2-D closed form needs
    * no pairwise work: group to per-price min dates (map-side
    * combinable), one running-min window over the distinct-price
    * spine, and a broadcast join back — q survives iff no
    * strictly-cheaper group reaches a date ≤ q's AND no price-≤
    * group beats q's date strictly. The orders stream is never
    * self-joined (the textbook NOT-EXISTS is O(n²) — stated instead
    * by the brute-force spec at sf0.001). The spine is |distinct
    * prices| rows; where that itself is huge, the 100 TB refinement
    * is price-range bucketing with per-bucket local skylines merged
    * through bucket-boundary minima — same algebra, one more level. */
  def qSkyline(spark: SparkSession, dir: String): DataFrame =
    skylineOf(Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate")))

  /** [[qSkyline]] over any (key, price, date)-shaped frame (minimize
    * both value columns). The running-min spine is DISTRIBUTED: the
    * per-price min dates range-partition on price, each partition
    * computes its local running min under a pid-partitioned window,
    * and the cross-partition carry is the exclusive prefix min over
    * the ≤`shuffle.partitions`-row per-partition minima (a bounded
    * self-join, never data rows) — `least` lifts local to global
    * running mins, `lag` + the prefix min gives each row its global
    * predecessor's value. No unpartitioned window (PlanAuditSpec);
    * identical algebra to the single-window form. */
  def skylineOf(o: DataFrame): DataFrame = {
    val Seq(key, price, date) = o.columns.toSeq
    val parts = o.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = o.groupBy(col(price))
      .agg(min(col(date)).as("dmin"))
      .repartitionByRange(parts, col(price))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    // ≤parts rows: per-partition minima → exclusive prefix min per pid.
    val pm = ranged.groupBy(col("__pid")).agg(min(col("dmin")).as("m"))
      .localCheckpoint(true)
    val prefix = pm.as("a")
      .join(pm.as("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid")).agg(min(col("b.m")).as("__pmin"))
    val wp = Window.partitionBy(col("__pid")).orderBy(col(price))
    val spine = ranged.join(broadcast(prefix), Seq("__pid"))
      .withColumn("rm", least(min(col("dmin")).over(
        wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        col("__pmin")))
      .withColumn("prev_rm", coalesce(lag(col("rm"), 1).over(wp), col("__pmin")))
      .select(col(price), col("rm"), col("prev_rm"))
    o.join(Joins.maybeBroadcast(spine), Seq(price))
      .filter(!(coalesce(col("prev_rm") <= col(date), lit(false))
        || col("rm") < col(date)))
      .select(col(key), col(price), col(date))
      .orderBy(col(key))
  }

  /** Time-to-convert distribution — the funnel-latency readout next
    * to the step-count funnels: per user, the first view and the
    * FIRST purchase strictly after it give an exact µs delta; the
    * p50/p90/p99 of those deltas come from
    * [[Selection.exactPercentiles]]' histogram-bisection selection
    * (no global sort, no collect), the discrete ⌈p·n⌉ convention.
    * Two user-keyed min-aggs + one equi-join reduce the stream to one
    * row per converting user before any percentile work. */
  def qFunnelTime(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("v_us"))
    val deltas = ev.filter(col("event_type") === "purchase")
      .join(v, Seq("user_id"))
      .filter(col("us") > col("v_us"))
      .groupBy(col("user_id")).agg(min(col("us") - col("v_us")).as("delta_us"))
    val n = deltas.agg(count(lit(1)).as("n_converts"))
    Selection.exactPercentiles(deltas, "delta_us", Seq(50, 90, 99))
      .crossJoin(broadcast(n))
      .select(col("pct"), col("value").as("delta_us"), col("n_converts"))
      .orderBy(col("pct"))
  }

  /** CUSUM changepoint location per event type — the retrospective
    * "when did the level shift" readout (Page 1954), the batch
    * complement of the streaming per-hour z-flags: CUSUM accumulates
    * small persistent drifts a pointwise outlier test never sees.
    * Over the daily count series x_i, S_i = max(0, S_{i-1} + x_i − μ)
    * has the closed form C_i − min_{j≤i} C_j with C the running sum
    * of (x_i − μ) — two stacked windows, no recursion. Everything is
    * scaled by D (= day count) so the statistic stays in exact
    * integers: y_i = D·x_i − Σx. The most likely changepoint is the
    * argmax day (peak CUSUM, earliest day on ties, unique-ranked).
    * Shape: one (day, type) count agg, a broadcast per-type moment
    * join, and windows over the bounded day grid. */
  def qCusum(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("event_type"))
      .groupBy(col("day"), col("event_type")).agg(count(lit(1)).as("x"))
    val s = d.groupBy(col("event_type"))
      .agg(count(lit(1)).as("dd"), sum(col("x")).as("sx"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val c = d.join(broadcast(s), Seq("event_type"))
      .withColumn("cum", sum(col("dd") * col("x") - col("sx")).over(wOrd))
      .withColumn("cusum", col("cum") - min(col("cum")).over(wOrd))
    c.withColumn("rk", row_number().over(Window.partitionBy(col("event_type"))
        .orderBy(col("cusum").desc, col("day"))))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("day").as("peak_day"),
        col("x").as("peak_x"), col("cusum").as("peak_cusum_num"),
        col("dd").as("n_days"))
      .orderBy(col("event_type"))
  }

  /** Pre-join skew profile (round 13) — the DIAGNOSIS behind the
    * repo's salting/wedge lessons (`q_skew_join` is the fix, the
    * CLAUDE.md Σdeg² wedge rule the scar): for the supplier-keyed
    * lineitem self-join, the per-key row count n, its wedge product
    * n², and each key's share of the total Σn² output — the number
    * that says whether the join needs a numbered repartition,
    * salting, or an input cut BEFORE anyone pays for it. One
    * map-side-combinable count + a 1-row broadcast total; top-5
    * keys under the unique (n DESC, key) order. */
  def qSkewProfile(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val counts = Tables.lineitem(spark, dir)
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val tot = counts.agg(sum(col("n") * col("n")).as("tot_n2"))
    counts.crossJoin(broadcast(tot))
      .orderBy(col("n").desc, col("l_suppkey").asc)
      .limit(k)
      .select(col("l_suppkey"), col("n"), (col("n") * col("n")).as("n2"),
        expr("n * n * 1000000 div tot_n2").as("share_e6"),
        col("tot_n2"))
      .orderBy(col("n").desc, col("l_suppkey").asc)
  }

  /** Single-changepoint detection by binary segmentation (round 13)
    * — `q_cusum`'s sibling for LOCATING a level shift, the first
    * step of the standard recursive changepoint search: per
    * event_type over the daily count series, the split maximizing
    * the between-segment variance explained,
    * gain = s_l²/n_l + s_r²/n_r − s²/n ≥ 0, evaluated at every
    * prefix boundary from one running-sum window (prefix sums are
    * the sufficient statistics — no per-split rescan). All inputs
    * are exact integers; gain is the series' ONE double expression,
    * stated with the identical tree both sides (the q_autocorr
    * convention), e6-rounded, argmax under the unique
    * (gain DESC, day) order. Work: one bounded (day, type) agg +
    * one window over ~30-row series per type. */
  def qChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("event_type"))
      .groupBy(col("day"), col("event_type")).agg(count(lit(1)).as("x"))
    val tot = d.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wIdx = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val pre = d.join(broadcast(tot), Seq("event_type"))
      .withColumn("cs", sum(col("x")).over(wOrd))
      .withColumn("i", row_number().over(wIdx).cast("long"))
      .filter(col("i") < col("n"))
      .withColumn("gain_e6",
        expr("CAST(round((CAST(cs * cs AS DOUBLE) / i" +
          " + CAST((s - cs) * (s - cs) AS DOUBLE) / (n - i)" +
          " - CAST(s * s AS DOUBLE) / n) * 1000000) AS BIGINT)"))
    val wRk = Window.partitionBy(col("event_type"))
      .orderBy(col("gain_e6").desc, col("day").asc)
    pre.withColumn("rk", row_number().over(wRk))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("day").as("change_day"),
        col("n").as("n_days"), col("gain_e6"),
        expr("CAST(round(CAST(cs AS DOUBLE) / i * 100) AS BIGINT)")
          .as("mean_left_e2"),
        expr("CAST(round(CAST(s - cs AS DOUBLE) / (n - i) * 100) AS BIGINT)")
          .as("mean_right_e2"))
      .orderBy(col("event_type"))
  }

  /** Daily OHLC-style resample — the time-series downsampling shape
    * (tick stream → bar table): per (day, event_type), count, min and
    * max, plus deterministic OPEN/CLOSE values picked by the total
    * (ts, event_id) stream order via struct-ordered min/max — an
    * associative, map-side-combinable argmin/argmax, no rank window
    * over the raw stream (the unique event_id tiebreak is the
    * SURVEY §6 rule: same-timestamp ticks would otherwise make
    * open/close partition-order-dependent). One shuffle keyed by the
    * bounded (day, type) grid; money rounds once at the end. */
  def qResample(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
    e.groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(min(col("value")), 2).as("lo"),
        round(max(col("value")), 2).as("hi"),
        round(min(struct(col("us"), col("event_id"), col("value")))
          .getField("value"), 2).as("open"),
        round(max(struct(col("us"), col("event_id"), col("value")))
          .getField("value"), 2).as("close"))
      .orderBy(col("day"), col("event_type"))
  }

  /** Native `session_window` sessionization — Spark's built-in
    * merging session operator (one groupBy, no lag window or custom
    * state): windows extend 30 min past each event and overlapping
    * windows merge, so a NEW session starts when the gap is ≥ 30 min
    * (the lag formulation in [[qEventsSessionize]] uses strictly >;
    * the oracle mirrors the ≥ semantics). Session starts are emitted
    * as epoch MICROS BIGINTs — raw timestamps would differ between
    * Spark's µs and the parquet file's ns precision. */
  def qSessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        col("n_events"))
      .orderBy(col("user_id"), col("start_us"))

  /** Time-series gap fill with LINEAR interpolation: each user's
    * hourly spend series is completed over its [min, max] hour spine
    * (generated distributed-side per user, like q_date_spine), and
    * missing hours take the straight line between the surrounding
    * observed points. The carry of previous/next observations is two
    * running `last(_, ignoreNulls)` windows (one per direction) — no
    * self-join against the observed set, no per-gap scan. Money flows
    * as exact integer cents; the single interpolation division runs
    * in double over exact integers with an identical expression tree
    * on both engines, so the e0 rounding is deterministic
    * (SURVEY §6). */
  def qInterpolate(spark: SparkSession, dir: String, maxUser: Long = 20L): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .filter(col("user_id") < maxUser)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(round(round(sum(col("value")), 2) * 100).cast("long").as("cents"))
    val spine = hourly.groupBy(col("user_id"))
      .agg(min(col("hour")).as("mn"), max(col("hour")).as("mx"))
      .select(col("user_id"),
        explode(sequence(col("mn"), col("mx"), expr("interval 1 hour"))).as("hour"))
    val joined = spine.join(hourly, Seq("user_id", "hour"), "left")
    val asc = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val desc = Window.partitionBy(col("user_id")).orderBy(col("hour").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("prev_c", last(col("cents"), ignoreNulls = true).over(asc))
      .withColumn("prev_h",
        last(when(col("cents").isNotNull, col("hour")), ignoreNulls = true).over(asc))
      .withColumn("next_c", last(col("cents"), ignoreNulls = true).over(desc))
      .withColumn("next_h",
        last(when(col("cents").isNotNull, col("hour")), ignoreNulls = true).over(desc))
      // Emit the hour as NTZ: LTZ hashes through the session zone —
      // value-identical under the pinned UTC session, but one
      // forgotten conf from a silent hash drift (SURVEY §6;
      // EmittedTypesSpec bans emitted LTZ).
      .select(col("user_id"), col("hour").cast("timestamp_ntz").as("hour"),
        when(col("cents").isNotNull, col("cents"))
          .otherwise(round(col("prev_c")
            + (col("next_c") - col("prev_c")).cast("double")
              * (unix_timestamp(col("hour")) - unix_timestamp(col("prev_h")))
              / (unix_timestamp(col("next_h")) - unix_timestamp(col("prev_h"))))
            .cast("long"))
          .as("cents"),
        col("cents").isNotNull.as("observed"))
      .orderBy(col("user_id"), col("hour"))
  }

  /** Approximate string join (Levenshtein ≤ 1) via one-deletion
    * neighborhoods — the FastSS technique: two strings within edit
    * distance 1 necessarily share a member of {s} ∪ deletions₁(s)
    * (substitution: delete the edited position from both; insert/
    * delete: the longer's deletion IS the shorter), so candidates
    * come from an EQUI-join on md5(variant) — never an O(n²) cross
    * join with a distance predicate, which is the nested-loop trap
    * fuzzy joins fall into at scale. Candidates then verify with the
    * exact codegen'd `levenshtein`. The oracle is the brute-force
    * cross join in DuckDB — tractable there at test scale, and the
    * completeness proof for the neighborhood join. Variant generation
    * is the native [[graft.functions.DeletionVariants]] expression
    * (one pass, no interpreted lambda), so the technique holds when
    * either join side is corpus-sized, not just a dim table. */
  def qFuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    val names = Tables.supplier(spark, dir)
      .select(col("s_suppkey").as("k"), col("s_name").as("name"))
    val variants = names
      .select(col("k"), col("name"),
        explode(graft.functions.CatalystText.deletion_variants(col("name"))).as("v"))
      .select(col("k"), col("name"), md5(col("v")).as("h"))
      .distinct()
    variants.select(col("h"), col("k").as("ka"), col("name").as("name_a"))
      .join(variants.select(col("h"), col("k").as("kb"), col("name").as("name_b")),
        Seq("h"))
      .filter(col("ka") < col("kb"))
      .select(col("name_a"), col("name_b")).distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 1)
      .orderBy(col("name_a"), col("name_b"))
  }

  /** Selective aggregation (max_by / min_by): per order status, the
    * order id holding the extreme price — the "which row is the
    * argmax" ask that otherwise costs a window + filter pass. Ties on
    * price are broken by orderkey via a composite struct ordering, so
    * the winner is deterministic cross-engine (a bare max_by(price)
    * picks an arbitrary row among equal prices). One map-side-combined
    * aggregation, no window, no second scan. */
  def qArgmax(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        max_by(col("o_orderkey"),
          struct(col("o_totalprice"), col("o_orderkey"))).as("max_order"),
        min_by(col("o_orderkey"),
          struct(col("o_totalprice"), col("o_orderkey"))).as("min_order"),
        round(max(col("o_totalprice")), 2).as("max_price"),
        round(min(col("o_totalprice")), 2).as("min_price"))
      .orderBy(col("o_orderstatus"))

  /** MERGE/upsert semantics without a table format — the incremental-
    * maintenance pattern every warehouse feed runs: an updates batch
    * (matched keys get new price + status 'U') and an inserts batch
    * (fresh keys, status 'N') merge into the base via ONE left join +
    * coalesce and a union — matched rows rewritten, unmatched kept,
    * new rows appended. Both batches derive deterministically from
    * the base (o_orderkey mod 10) so the query is self-contained and
    * oracle-checkable. Money as exact cents (longs) end to end; the
    * output is the per-status aggregate of the merged table, which
    * pins every row of the merge result under the hash compare. At
    * scale the join shuffles on the key both sides already share —
    * the same shape a MERGE INTO compiles to. */
  def qMergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderstatus"))
    val upd = t.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"),
        // +10% in integer cents: floor division, reduction-order free
        expr("cents * 110 div 100").as("u_cents"), lit("U").as("u_status"))
    // Insert keys offset by the base table's max key: synthesized
    // keys stay out of the base domain at ANY scale factor (a fixed
    // +1e9 offset would collide once orderkeys pass 1e9, sf ≳ 170).
    // The max is a one-row aggregate, broadcast by the cross join.
    val ins = t.filter(col("o_orderkey") % 10 === 3)
      .crossJoin(t.agg(max(col("o_orderkey")).as("max_key")))
      .select((col("o_orderkey") + col("max_key")).as("o_orderkey"),
        col("cents").as("u_cents"), lit("N").as("u_status"))
    val merged = t.join(upd, Seq("o_orderkey"), "left")
      .select(col("o_orderkey"),
        coalesce(col("u_cents"), col("cents")).as("cents"),
        coalesce(col("u_status"), col("o_orderstatus")).as("status"))
      .unionAll(ins.select(col("o_orderkey"), col("u_cents").as("cents"),
        col("u_status").as("status")))
    merged.groupBy(col("status"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("cents")).cast("double") / 100.0, 2).as("sum_price"))
      .orderBy(col("status"))
  }

  /** Grouped statistical aggregates — Pearson correlation between
    * quantity and price, and quantity's population stddev — via
    * EXACT integer sufficient statistics (the [[graft.graph.GraphOps
    * .assortativity]] cross-engine pattern): builtin `corr`/`stddev`
    * stream float partial states whose accumulation order varies per
    * run, so their low bits are not reproducible, let alone
    * oracle-matchable. Here every sum is exact (quantities as longs,
    * prices as cents; squares summed as DECIMAL(38,0) — sum(y²)
    * overflows BIGINT at sf ≥ 0.1) and the single float expression
    * is stated with the same operand casts in the DuckDB oracle, so
    * the e4 rounding is deterministic. One map-side-combined
    * aggregation; the zero-variance guard compares exact integers. */
  def qStats(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val stats = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        col("l_quantity").cast("long").as("x"),
        round(col("l_extendedprice") * 100).cast("long").as("y"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(d38)).as("sx"), sum(col("y").cast(d38)).as("sy"),
        sum((col("x") * col("y")).cast(d38)).as("sxy"),
        sum((col("x") * col("x")).cast(d38)).as("sxx"),
        sum((col("y") * col("y")).cast(d38)).as("syy"))
    def dbl(c: String) = col(c).cast("double")
    val varx = col("n").cast(d38) * col("sxx") - col("sx") * col("sx")
    val vary = col("n").cast(d38) * col("syy") - col("sy") * col("sy")
    stats.select(col("l_returnflag"), col("n"),
        when(varx === lit(0) || vary === lit(0), lit(null).cast("long"))
          .otherwise(round((dbl("n") * dbl("sxy") - dbl("sx") * dbl("sy"))
            / (sqrt(dbl("n") * dbl("sxx") - dbl("sx") * dbl("sx"))
              * sqrt(dbl("n") * dbl("syy") - dbl("sy") * dbl("sy")))
            * 1e4).cast("long"))
          .as("corr_e4"),
        round(sqrt(dbl("n") * dbl("sxx") - dbl("sx") * dbl("sx"))
          / dbl("n") * 1e4).cast("long").as("stddev_q_e4"))
      .orderBy(col("l_returnflag"))
  }

  /** Multi-touch attribution — the marketing-analytics credit split:
    * for each purchase, the touches are the user's view/click events
    * strictly before it within a 24 h lookback. Three models in one
    * pass over the joined stream: FIRST-touch and LAST-touch give the
    * whole credit to the extremal touch under the total (ts, event_id)
    * order (the SURVEY §6 unique-sort-key rule — same-µs touches
    * would otherwise make credit partition-order dependent), LINEAR
    * splits 1e6 credit units per purchase by integer floor division
    * (1000000 div n per touch — exact, reduction-order free; the
    * ≤ n−1 unit remainder is deliberately dropped, documented).
    * Shape: one user-keyed equi-join with a pushed time-range filter
    * (never a full time-theta join), one purchase-keyed rank window,
    * one bounded (|touch types| rows) aggregation. At 100 TB the join
    * explodes only per-purchase touches inside the 24 h window —
    * bounded by user activity rate, not corpus size. */
  def qAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id").as("puser"),
        unix_micros(col("ts")).as("pus"))
    val t = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id").as("tuser"), col("event_id").as("tid"),
        col("event_type").as("touch_type"), unix_micros(col("ts")).as("tus"))
    val j = p.join(t, col("puser") === col("tuser") &&
        col("tus") < col("pus") &&
        col("tus") >= col("pus") - lit(86400000000L))
      .select(col("pid"), col("touch_type"), col("tus"), col("tid"))
    val w = Window.partitionBy(col("pid")).orderBy(col("tus"), col("tid"))
    val wc = Window.partitionBy(col("pid"))
    j.withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wc))
      .groupBy(col("touch_type"))
      .agg(sum(when(col("rk") === 1, 1L).otherwise(0L)).as("first_n"),
        sum(when(col("rk") === col("n"), 1L).otherwise(0L)).as("last_n"),
        sum(expr("1000000 div n")).as("linear_e6"))
      .orderBy(col("touch_type"))
  }

  /** RFM customer segmentation — recency (days since last order at
    * the global max-orderdate anchor), frequency (order count),
    * monetary (lifetime cents, exact), each scored into quintiles by
    * `ntile(5)` under a UNIQUE total order (metric, custkey — the §6
    * tiebreak rule; equal metrics split deterministically). Smaller
    * recency ⇒ higher R; larger frequency/monetary ⇒ higher F/M;
    * segment = 100·R + 10·F + M. Each quintile rides
    * [[Selection.withGlobalRank]]'s range-partitioned distributed
    * rank + [[Selection.ntileOfRank]]'s closed-form NTILE (same tie
    * split, bit-identical scores — no single-partition ntile sort;
    * PlanAuditSpec asserts every window is partitioned). One orders
    * scan, one customer-keyed agg, three narrow rank passes. */
  def qRfm(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val anchor = o.agg(max(col("o_orderdate")).as("anchor"))
    val base = o.groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("frequency"), sum(col("cents")).as("monetary_cents"))
      .crossJoin(broadcast(anchor))
      .select(col("o_custkey"),
        datediff(col("anchor"), col("last_order")).cast("long").as("r_days"),
        col("frequency"), col("monetary_cents"))
      .localCheckpoint(true)
    val nRow = broadcast(base.agg(count(lit(1)).as("nn")))
    val ranked = Selection.withGlobalRank(
      Selection.withGlobalRank(
        Selection.withGlobalRank(base,
          Seq(col("r_days").desc, col("o_custkey")), "ri"),
        Seq(col("frequency"), col("o_custkey")), "fi"),
      Seq(col("monetary_cents"), col("o_custkey")), "mi")
    ranked.crossJoin(nRow)
      .withColumn("r_score", Selection.ntileOfRank("ri", "nn", 5))
      .withColumn("f_score", Selection.ntileOfRank("fi", "nn", 5))
      .withColumn("m_score", Selection.ntileOfRank("mi", "nn", 5))
      .withColumn("segment",
        col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
      .drop("ri", "fi", "mi", "nn")
      .orderBy(col("o_custkey"))
  }

  /** Per-type daily-volume OLS trend — slope/intercept from EXACT
    * integer sufficient statistics (n, Σx, Σy, Σxy, Σx²) with x the
    * day offset from the global min day (keeps products tiny) and y
    * the day's event count. slope_e6 = (nΣxy − ΣxΣy)·1e6 div
    * (nΣx² − Σx²), intercept_e6 = (Σy·1e6 − slope_e6·Σx) div n —
    * both single deterministic integer divisions over reduction-
    * order-free BIGINT sums (the `g_pagerank_det` contract applied
    * to regression; `regr_slope`'s float accumulation would not
    * hash-match across engines). One bounded (type, day) agg, one
    * broadcast anchor, one per-type fold. */
  def qTrend(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("y"))
    val anchor = d.agg(min(col("day")).as("d0"))
    d.crossJoin(broadcast(anchor))
      .withColumn("x", datediff(col("day"), col("d0")).cast("long"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
      .select(col("event_type"), col("n").as("n_days"),
        when(col("den") === 0, lit(null).cast("long"))
          .otherwise(expr("(n * sxy - sx * sy) * 1000000 div den"))
          .as("slope_e6"),
        when(col("den") === 0, lit(null).cast("long"))
          .otherwise(expr(
            "(sy * 1000000 - ((n * sxy - sx * sy) * 1000000 div den) * sx) div n"))
          .as("intercept_e6"))
      .orderBy(col("event_type"))
  }

  /** Median-absolute-deviation outlier summary — the robust batch
    * anomaly readout next to [[qCusum]] (MAD survives the level
    * shifts that wreck a mean/stddev z-test). Per event type over the
    * bounded day grid: med = the LOWER median of daily counts by
    * ordered selection (row_number = (n+1) div 2 under the unique
    * (value, day) order — the discrete convention, no interpolation),
    * mad = the lower median of |count − med|, outlier days flagged by
    * the exact integer test |count − med| > 3·mad. All-integer end to
    * end. Two rank windows over the bounded per-type day grid + two
    * broadcast joins back; the raw stream folds to (type, day) counts
    * map-side before any window. */
  def qMadOutliers(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c"))
    val wc = Window.partitionBy(col("event_type"))
    def lowerMedian(df: DataFrame, value: Column, as: String): DataFrame =
      df.withColumn("rk", row_number().over(
          Window.partitionBy(col("event_type")).orderBy(value, col("day"))))
        .withColumn("nn", count(lit(1)).over(wc))
        .filter(col("rk") === expr("(nn + 1) div 2"))
        .select(col("event_type"), value.as(as))
    val med = lowerMedian(d, col("c"), "med")
    val dev = d.join(broadcast(med), Seq("event_type"))
      .withColumn("a", abs(col("c") - col("med")))
    val mad = lowerMedian(dev, col("a"), "mad")
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("a") > lit(3) * col("mad"), 1L).otherwise(0L))
          .as("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** Market-basket association rules over (order, part) baskets —
    * the classic co-purchase mining surface (support, confidence,
    * lift), top-25 pairs by lift among those with pair support ≥ 3
    * orders. All-integer sufficient statistics: item counts, pair
    * counts, and the basket total N feed e6-scaled floor divisions —
    * no float path, reduction-order free. The pair stream is the
    * within-order self-join (Σ per-order-items² rows — the wedge
    * class): both join inputs carry explicit NUMBERED repartitions on
    * the basket key (AQE sizes the stage by its tiny inputs and
    * would serialize the exploded stream — the CLAUDE wedge rule),
    * and item/pair counts combine map-side before the final bounded
    * ranking. lift > 1e6 ⇔ parts co-occur more than independence
    * predicts. */
  def qAssocRules(spark: SparkSession, dir: String, minSup: Long = 3L,
      topN: Int = 25): DataFrame = {
    val shuffleP = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val items = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .localCheckpoint(true)
    val nOrders = items.select(col("l_orderkey")).distinct().count()
    val itemCnt = items.groupBy(col("l_partkey")).agg(count(lit(1)).as("cnt"))
    val a = items.select(col("l_orderkey"), col("l_partkey").as("pa"))
      .repartition(shuffleP, col("l_orderkey"))
    val b = items.select(col("l_orderkey"), col("l_partkey").as("pb"))
      .repartition(shuffleP, col("l_orderkey"))
    val pairs = a.join(b, Seq("l_orderkey"))
      .filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("cnt_ab"))
      .filter(col("cnt_ab") >= minSup)
    pairs
      .join(Joins.maybeBroadcast(itemCnt.withColumnRenamed("l_partkey", "pa")
        .withColumnRenamed("cnt", "cnt_a")), Seq("pa"))
      .join(Joins.maybeBroadcast(itemCnt.withColumnRenamed("l_partkey", "pb")
        .withColumnRenamed("cnt", "cnt_b")), Seq("pb"))
      .withColumn("n", lit(nOrders))
      .select(col("pa"), col("pb"), col("cnt_ab"), col("cnt_a"), col("cnt_b"),
        expr("cnt_ab * 1000000 div n").as("support_e6"),
        expr("cnt_ab * 1000000 div cnt_a").as("conf_e6"),
        // DECIMAL(38,0): cnt_ab·n·1e6 wraps BIGINT at catalog scale
        // while the DuckDB oracle promotes — the qGini overflow rule.
        expr("CAST(CAST(cnt_ab AS DECIMAL(38,0)) * n * 1000000" +
          " div (CAST(cnt_a AS DECIMAL(38,0)) * cnt_b) AS BIGINT)")
          .as("lift_e6"))
      .orderBy(col("lift_e6").desc, col("pa"), col("pb"))
      .limit(topN)
  }

  /** Two-sample A/B conversion read-out — users split by the
    * deterministic user_id parity, conversion = any purchase event.
    * Exact integer counts; relative lift as an e6 floor division;
    * the z statistic is the ONLY float, computed from exact integer
    * inputs through one fixed expression tree (identical doubles on
    * both engines — the §6 float rule), e4-rounded. One distinct-user
    * pass + one conversion semi-aggregation + a single-row fold. */
  def qAbLift(spark: SparkSession, dir: String): DataFrame = {
    // "Converted" = heavy buyer (≥ 14 purchases): any-purchase is
    // degenerate on this corpus (every user purchases → p̂ = 1 and the
    // pooled z denominator is exactly 0); the ≥14 cut sits near the
    // per-user purchase mean at every SF, so both groups keep real
    // variance. The degenerate case still guards to NULL.
    val u = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        >= 14L).cast("long").as("conv"))
      .select(pmod(col("user_id"), lit(2L)).as("grp"), col("conv"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
    val wide = u.groupBy()
      .agg(max(when(col("grp") === 0, col("n"))).as("n_a"),
        max(when(col("grp") === 0, col("c"))).as("c_a"),
        max(when(col("grp") === 1, col("n"))).as("n_b"),
        max(when(col("grp") === 1, col("c"))).as("c_b"))
    def d(c: String) = col(c).cast("double")
    val p = (d("c_a") + d("c_b")) / (d("n_a") + d("n_b"))
    val z = (d("c_a") / d("n_a") - d("c_b") / d("n_b")) /
      sqrt(p * (lit(1.0) - p) * (lit(1.0) / d("n_a") + lit(1.0) / d("n_b")))
    val cTot = col("c_a") + col("c_b")
    wide.select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
      expr("CASE WHEN c_b * n_a = 0 THEN NULL ELSE " +
        "CAST((CAST(c_a AS DECIMAL(38,0)) * n_b - CAST(c_b AS DECIMAL(38,0)) * n_a)" +
        " * 1000000 div (CAST(c_b AS DECIMAL(38,0)) * n_a) AS BIGINT) END")
        .as("lift_e6"),
      when(cTot > 0 && cTot < col("n_a") + col("n_b"),
        round(z * 1e4).cast("long")).as("z_e4"))
  }

  /** Gini coefficient of customer lifetime spend — the inequality
    * summary (0 = equal, 1e6 = one customer holds everything) via
    * the sorted closed form G = (2Σi·xᵢ − (n+1)Σx) / (nΣx) with i
    * the rank under the unique (cents, custkey) order. Equal spends
    * contribute identically under any tie order (equal x ⇒ same
    * Σi·x), so the statistic is deterministic; sums ride
    * DECIMAL(38,0) (Σi·x overflows BIGINT·1e6 at scale) and the
    * single G division floors to e6. Ranks come from
    * [[Selection.withGlobalRank]]'s range-partitioned distributed
    * rank (no single-reducer window — PlanAuditSpec asserts it), so
    * the customer base never funnels through one task. One customer
    * agg, two narrow rank shuffles, one fold. */
  def qGini(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val spend = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("o_custkey")).agg(sum(col("cents")).as("x"))
    val ranked = Selection.withGlobalRank(spend,
      Seq(col("x"), col("o_custkey")), "i")
    ranked.groupBy()
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(d38)).as("sx"),
        sum((col("i") * col("x")).cast(d38)).as("sixy"))
      .select(col("n"),
        col("sx").cast("long").as("total_cents"),
        expr(s"CAST((2 * sixy - (n + 1) * sx) * 1000000 div (n * sx) AS BIGINT)")
          .as("gini_e6"))
  }

  /** Benford first-digit audit of order totals — the forensic
    * distribution check: observed first-significant-digit shares vs
    * the Benford expectation log10(1+1/d), both e6-scaled integers
    * (the expectation is a constant expression evaluated identically
    * on both engines). One scan, one 9-row aggregation. */
  def qBenford(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(substring(floor(col("o_totalprice")).cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = o.agg(sum(col("n")).as("total"))
    o.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        expr("n * 1000000 div total").as("freq_e6"),
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")) * 1e6)
          .cast("long").as("benford_e6"))
      .orderBy(col("digit"))
  }

  /** Revenue concentration (Pareto) curve — at each spend decile of
    * the customer base, the cumulative share of total revenue the
    * top-ranked customers hold ("do 20% of customers drive 80% of
    * revenue"), `q_gini`'s pointwise sibling. Unique (cents DESC,
    * custkey) rank; cumulative sums ride DECIMAL(38,0) before the e6
    * floor division (cum·1e6 brushes BIGINT range past sf1 — the
    * qStats/qGini overflow rule); the 10-row decile spine equi-joins
    * the ranked table on the target rank, so only 10 rows leave the
    * rank stage. Rank AND running revenue both come from
    * [[Selection.withGlobalRank]]'s range-partitioned distributed
    * rank+cumsum (local running sums lifted by per-partition sum
    * offsets) — no single-reducer window anywhere (PlanAuditSpec). */
  def qPareto(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("o_custkey")).agg(sum(col("cents")).as("x"))
    val ranked = Selection.withGlobalRank(spend,
      Seq(col("x").desc, col("o_custkey")), "rk",
      cumSumOf = Some("x"), cumName = "cum")
      .select(col("rk"), col("cum"))
    val tot = spend.agg(count(lit(1)).as("n"), sum(col("x")).as("total"))
    val targets = spark.range(1, 11)
      .select(col("id").as("decile"))
      .crossJoin(broadcast(tot))
      .select(col("decile"), expr("decile * n div 10").as("rk"), col("total"))
    targets.join(ranked, Seq("rk"))
      .select(col("decile"), col("rk").as("n_top"),
        expr("CAST(CAST(cum AS DECIMAL(38,0)) * 1000000" +
          " div CAST(total AS DECIMAL(38,0)) AS BIGINT)").as("share_e6"))
      .orderBy(col("decile"))
  }

  /** Top user-journey prefixes — the product-analytics "what are the
    * most common first-3-event paths" readout (`q_transition_matrix`
    * gives the one-step Markov view; this keeps short full paths):
    * per user, the first three events under the deterministic
    * (ts, event_id) stream order concatenate into a path string;
    * top-10 paths by (count DESC, path). One user-keyed rank window
    * over a 3-row-per-user stream + one bounded (≤ |types|³) count
    * aggregation. Users with fewer than 3 events report their full
    * shorter path (documented). */
  def qFunnelPaths(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .groupBy(col("user_id"))
      .agg(concat_ws(">", array_sort(
        collect_list(struct(col("rk"), col("event_type"))))
        .getField("event_type")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(k)
  }

  /** Equi-depth histogram — the other half of ANALYZE statistics
    * beside [[qProfileColumns]]' NDV/modal readout: 10 buckets of
    * equal ROW count over order value with per-bucket [lo, hi]
    * boundaries — what a cost model uses for selectivity on skewed
    * columns where equi-width bins collapse. Bucket assignment is
    * closed-form from [[Selection.withGlobalRank]]'s distributed
    * rank under the unique (cents, orderkey) order — no
    * percentile-function dependence, no single-reducer sort, exact
    * integers end to end. */
  def qEquidepthHist(spark: SparkSession, dir: String,
      buckets: Int = 10): DataFrame = {
    val o = Tables.orders(spark, dir)
      .select(round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey"))
    val ranked = Selection.withGlobalRank(o,
      Seq(col("cents"), col("o_orderkey")), "rk")
    val n = broadcast(o.agg(count(lit(1)).as("nn")))
    ranked.crossJoin(n)
      .withColumn("bucket", expr(s"(rk - 1) * $buckets div nn"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), min(col("cents")).as("lo_cents"),
        max(col("cents")).as("hi_cents"))
      .orderBy(col("bucket"))
  }

  /** Markov removal-effect attribution (Anderl et al. 2016) — the
    * principled multi-touch model beyond first/last-touch
    * (`qAttribution`): pre-conversion journeys become a first-order
    * Markov chain (START + channel states, CONV/DROP absorbing), and
    * a channel's credit is its REMOVAL EFFECT — how much total
    * conversion probability disappears when every transition into it
    * is redirected to DROP. The chain is a ≤7×7 transition-count
    * matrix (bounded — the per-user journey reduction is the only
    * data-scale work, all window state per-user-partitioned); the
    * absorbing-chain solves are driver-side 5×5 Gaussian
    * eliminations over EXACT integer counts, so the whole readout is
    * deterministic. Rows-only + specs (hand-computed planted chains,
    * converted-without-journey edge, partitioning invariance). */
  def qMarkovAttribution(spark: SparkSession, dir: String): DataFrame =
    markovAttributionOf(spark, Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id")))

  def markovAttributionOf(spark: SparkSession, ev: DataFrame): DataFrame = {
    import spark.implicits._
    val conv = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("us")).as("conv_us"))
    val users = ev.select(col("user_id")).distinct()
      .join(conv, Seq("user_id"), "left")
    val journey = ev.join(users, Seq("user_id"))
      .filter(col("conv_us").isNull || col("us") < col("conv_us"))
      .filter(col("event_type") =!= "purchase")
    val wu = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val steps = journey
      .withColumn("prev", lag(col("event_type"), 1).over(wu))
      .select(coalesce(col("prev"), lit("START")).as("from"),
        col("event_type").as("to"))
    val lasts = journey
      .groupBy(col("user_id"))
      .agg(max(struct(col("us"), col("event_id"), col("event_type")))
        .getField("event_type").as("from"))
      .join(users, Seq("user_id"))
      .select(col("from"),
        when(col("conv_us").isNotNull, "CONV").otherwise("DROP").as("to"))
    val directs = users.join(journey.select(col("user_id")).distinct()
        .withColumn("has_j", lit(true)), Seq("user_id"), "left")
      .filter(col("conv_us").isNotNull && col("has_j").isNull)
      .select(lit("START").as("from"), lit("CONV").as("to"))
    val counts = steps.unionByName(lasts).unionByName(directs)
      .groupBy(col("from"), col("to")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val channels = Seq("click", "error", "signup", "view")
    val transient0 = "START" +: channels
    def convProb(removed: Option[String]): Double = {
      val idx = transient0.zipWithIndex.toMap
      val nT = transient0.size
      val q = Array.ofDim[Double](nT, nT)
      val r = Array.ofDim[Double](nT)
      val rowTot = counts.groupBy(_._1).map { case (f, cs) =>
        f -> cs.map(_._3).sum.toDouble
      }
      for ((f, t, n) <- counts if idx.contains(f)) {
        val p = n / rowTot(f)
        val tEff = if (removed.contains(t)) "DROP" else t
        tEff match {
          case "CONV" => r(idx(f)) += p
          case "DROP" => ()
          case s if idx.contains(s) => q(idx(f))(idx(s)) += p
          case _ => ()
        }
      }
      // Solve (I − Q) a = r; answer = a(START).
      val a = Array.ofDim[Double](nT, nT)
      for (i <- 0 until nT; j <- 0 until nT)
        a(i)(j) = (if (i == j) 1.0 else 0.0) - q(i)(j)
      val x = r.clone()
      for (i <- 0 until nT) {
        var p = i
        for (k <- i + 1 until nT) if (math.abs(a(k)(i)) > math.abs(a(p)(i))) p = k
        if (p != i) { val t = a(p); a(p) = a(i); a(i) = t
          val tx = x(p); x(p) = x(i); x(i) = tx }
        for (k <- i + 1 until nT) {
          val f = a(k)(i) / a(i)(i)
          for (c <- i until nT) a(k)(c) -= f * a(i)(c)
          x(k) -= f * x(i)
        }
      }
      for (i <- (nT - 1) to 0 by -1) {
        var s = x(i)
        for (c <- i + 1 until nT) s -= a(i)(c) * x(c)
        x(i) = s / a(i)(i)
      }
      x(idx("START"))
    }
    val base = convProb(None)
    val effects = channels.map(c => c -> math.max(base - convProb(Some(c)), 0.0))
    val totalRe = effects.map(_._2).sum
    effects.map { case (c, re) =>
      (c, math.round(base * 1e6), math.round(re * 1e6),
        if (totalRe <= 0) 0L else math.round(re / totalRe * 1e6))
    }.toDF("channel", "base_conv_e6", "removal_e6", "attribution_e6")
      .orderBy(col("channel"))
  }

  /** Classical weekday decomposition of per-type daily volume — the
    * seasonality readout beside the OLS trend (`qTrend`): per event
    * type, each ISO weekday's mean daily count against the overall
    * mean, exact e2 integers throughout (sum·100 div n — the
    * deterministic-mean rule), over the bounded (type × day) grid.
    * The offset column IS the seasonal component a forecaster would
    * subtract. */
  def qSeasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val overall = d.groupBy(col("event_type"))
      .agg(expr("sum(c) * 100 div count(1)").as("mean_e2"))
    d.withColumn("dow", expr("weekday(day)").cast("long"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n_days"),
        expr("sum(c) * 100 div count(1)").as("dow_mean_e2"))
      .join(broadcast(overall), Seq("event_type"))
      .select(col("event_type"), col("dow"), col("n_days"),
        col("dow_mean_e2"),
        (col("dow_mean_e2") - col("mean_e2")).as("offset_e2"))
      .orderBy(col("event_type"), col("dow"))
  }

  /** Join-cardinality forecast — the cost-based-optimizer primitive
    * run as a query: |A ⋈_k B| = Σ_k cnt_A(k)·cnt_B(k), computed
    * EXACTLY from the two per-key count tables (vocab-sized — the
    * stream reduces before anything joins), plus the top-5 heaviest
    * keys, which is precisely the skew-planning readout: a key whose
    * product dominates the sum is the key you salt. Both inputs
    * reduce map-side; the count-table join and the
    * [[Selection.withGlobalRank]] rank never touch raw rows. */
  def qJoinHeat(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("ec"))
    val o = Tables.orders(spark, dir)
      .groupBy(col("o_custkey").as("user_id")).agg(count(lit(1)).as("oc"))
    val j = e.join(o, Seq("user_id"))
      .select(col("user_id"), (col("ec") * col("oc")).as("est"))
      .localCheckpoint(true)
    val total = j.agg(sum(col("est")).as("total_est_rows"))
    Selection.withGlobalRank(j, Seq(col("est").desc, col("user_id")), "rk")
      .filter(col("rk") <= 5)
      .crossJoin(broadcast(total))
      .select(col("rk"), col("user_id"), col("est").as("est_pair_rows"),
        col("total_est_rows"))
      .orderBy(col("rk"))
  }

  /** Column profiling (ANALYZE TABLE's readout): per column — NDV,
    * null count, and the modal value with its count — computed from
    * ONE scan by stacking the table into narrow (column, value)
    * pairs and aggregating once; the modal pick is a per-column
    * ranked window under the unique (count DESC, value ASC) order
    * (the max_by-composite rule), partitioned by column name — never
    * global. The NDV here is exact from the stacked counts (the
    * stacked group-by is vocab-bounded per column); a 100 TB profile
    * swaps the exact count for the HLL path (q_approx_distinct) with
    * the same stacked shape. */
  def qProfileColumns(spark: SparkSession, dir: String): DataFrame = {
    val stacked = Tables.orders(spark, dir).select(expr(
      """stack(4,
        |  'o_custkey', cast(o_custkey as string),
        |  'o_orderstatus', o_orderstatus,
        |  'o_orderpriority', o_orderpriority,
        |  'o_year', cast(year(o_orderdate) as string)
        |) as (colname, val)""".stripMargin))
    val counts = stacked
      .groupBy(col("colname"), col("val"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("colname"))
      .orderBy(col("cnt").desc, col("val").asc)
    counts
      .withColumn("rk", row_number().over(w))
      .groupBy(col("colname"))
      .agg(sum(when(col("val").isNotNull, 1L).otherwise(0L)).as("ndv"),
        sum(when(col("val").isNull, col("cnt")).otherwise(0L))
          .as("n_nulls"),
        max(when(col("rk") === 1, col("val"))).as("top_value"),
        max(when(col("rk") === 1, col("cnt"))).as("top_count"))
      .orderBy(col("colname"))
  }

  /** Audience-overlap matrix via sketch inclusion-exclusion — the
    * "which segments share users" readout computed WITHOUT an
    * all-pairs pass over the stream: one distinct (type, user)
    * reduction feeds (a) per-type HLL sketches whose pairwise
    * |A∩B| ≈ est(A) + est(B) − est(A∪B) needs only the 5×5 sketch
    * table (`hll_union` is a scalar merge — no data re-scan per
    * pair), and (b) the exact per-pair overlap for the in-query
    * audit, under the q_approx_distinct 5% verdict convention. At
    * 100 TB the sketch path is the product: k segments cost one
    * scan + k sketches, and every pairwise/3-way overlap estimate
    * is sketch algebra on KB-sized state. */
  def qSketchIntersect(spark: SparkSession, dir: String): DataFrame = {
    val tu = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id")).distinct()
      .localCheckpoint(true)
    val sk = tu.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    val est = sk.as("a").join(sk.as("b"),
        col("a.event_type") < col("b.event_type"))
      .select(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"),
        (hll_sketch_estimate(col("a.sk")) +
          hll_sketch_estimate(col("b.sk")) -
          hll_sketch_estimate(hll_union(col("a.sk"), col("b.sk"))))
          .as("est_overlap"),
        hll_sketch_estimate(hll_union(col("a.sk"), col("b.sk")))
          .as("union_est"))
    val exact = tu.as("x").join(tu.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"),
        col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("exact_overlap"))
    // The differenced estimate carries the error of THREE sketch
    // estimates, each relative to set sizes up to |A∪B| — its error
    // scales with the UNION, not the overlap. A bound stated against
    // the overlap alone flips on a regenerated lake with smaller
    // segment intersections (the round-9 incident class); bound
    // against 5% of the union estimate plus the absolute floor.
    exact.join(broadcast(est), Seq("type_a", "type_b"))
      .select(col("type_a"), col("type_b"), col("exact_overlap"),
        (abs(col("est_overlap") - col("exact_overlap")) <=
          greatest(col("union_est") * lit(0.05), lit(2.0))).as("approx_ok"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Rolling EXACT median of the per-type daily count series (±3-day
    * window) — the robust smoother next to [[qMadOutliers]]'s level
    * test: a 7-slot sorted pick per grid cell, lower-median
    * convention (⌈n/2⌉-th of the sorted window). Runs entirely over
    * the bounded (type × day) grid — the raw stream reduces FIRST,
    * the window never sees events — so the per-type window is
    * partitioned (no global sort) and the collected window array is
    * ≤7 longs. */
  def qRollingMedian(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    daily
      .withColumn("win", sort_array(collect_list(col("cnt")).over(w)))
      .select(col("event_type"), col("day"), col("cnt"),
        expr("element_at(win, CAST((size(win) + 1) div 2 AS INT))")
          .as("med7"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Poisson-bootstrap confidence interval for mean order value —
    * the at-scale resampling shape (one pass, no per-replicate
    * shuffles of the data): every row fans out to `reps` narrow
    * (replicate, weight·cents) pairs with a DETERMINISTIC
    * pseudo-Poisson(1) weight from the md5 bridge (first 15 hex
    * chars of md5("key:bs:rep") as a long — the g_walks idiom, the
    * one 64-bit hash Spark and DuckDB state identically; xxhash64
    * was the round-16 form but has no DuckDB twin, which kept this
    * query rows-only) — inverse-CDF thresholds on the hash's
    * uniform: replayable, partitioning-independent, no RNG state.
    * Replicate means are exact integer cents, and the 2.5%/97.5% CI
    * is an ordered pick from the `reps`-length sorted array
    * (driver-bounded by construction). Exact integers end to end ⇒
    * the CI is bit-stable across any cluster layout — and since
    * round 17, full-oracle: DuckDB replays the identical fan-out.
    * Specs keep pinning coverage of the point estimate,
    * constant-data degeneracy, partitioning invariance. */
  def qBootstrapCi(spark: SparkSession, dir: String, reps: Int = 200): DataFrame =
    bootstrapCiOf(Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents")), reps)

  /** [[qBootstrapCi]] over any (o_orderkey, cents) frame. */
  def bootstrapCiOf(o: DataFrame, reps: Int): DataFrame = {
    val point = o.agg(count(lit(1)).as("n_orders"),
      expr("sum(cents) div count(1)").as("mean_cents"))
    val u = pmod(conv(substring(md5(concat(col("o_orderkey").cast("string"),
      lit(":bs:"), col("rep").cast("string"))), 1, 15), 16, 10).cast("long"),
      lit(1000000L))
    val weight = when(u < 367879L, 0L).when(u < 735758L, 1L)
      .when(u < 919698L, 2L).when(u < 980885L, 3L)
      .when(u < 996340L, 4L).otherwise(5L)
    val means = o
      .select(col("o_orderkey"), col("cents"),
        explode(sequence(lit(0), lit(reps - 1))).as("rep"))
      .withColumn("w", weight)
      .groupBy(col("rep"))
      .agg(sum(col("w") * col("cents")).as("s"), sum(col("w")).as("nw"))
      .select(expr("s div nw").as("m"))
    val lo = math.max((reps * 25 + 999) / 1000, 1) // ceil(0.025·reps)
    val hi = (reps * 975 + 999) / 1000             // ceil(0.975·reps)
    means.agg(sort_array(collect_list(col("m"))).as("ms"))
      .crossJoin(broadcast(point))
      .select(col("n_orders"), lit(reps.toLong).as("n_reps"),
        col("mean_cents"),
        element_at(col("ms"), lo).as("ci_lo_cents"),
        element_at(col("ms"), hi).as("ci_hi_cents"))
  }

  /** Sequence-pattern match (MATCH_RECOGNIZE's core) — each user's
    * FULL event history collapses to one compact string (initial
    * letter per event, ordered by the unique (µs, event_id) key) and
    * regular expressions classify whole journeys: contiguity ('vvv'),
    * exclusion-until ('e[^p]*p' — an error resolved by purchase with
    * no purchase between), anchors ('^s'). The per-user string is the
    * DFA tape a native MATCH_RECOGNIZE would stream; building it
    * once and running k patterns over it beats k separate
    * join-chains, and the shuffle moves (user, letter) pairs — never
    * event payloads. Histories are user-session-bounded (≤ thousands
    * of events), so the per-user array never approaches executor
    * memory; the pattern pass is a broadcast-free map over users. */
  def qSeqMatch(spark: SparkSession, dir: String): DataFrame = {
    val seqs = Tables.events(spark, dir)
      .select(col("user_id"), struct(unix_micros(col("ts")).as("us"),
        col("event_id").as("eid"),
        substring(col("event_type"), 1, 1).as("c")).as("ev"))
      .groupBy(col("user_id"))
      .agg(concat_ws("", array_sort(collect_list(col("ev")))
        .getField("c")).as("seq"))
      .localCheckpoint(true)
    val pats = Seq(
      ("error_resolved_by_purchase", "e[^p]*p"),
      ("purchase_before_signup", "p.*s"),
      ("signup_first", "^s"),
      ("three_views_running", "vvv"),
      ("view_purchase_adjacent", "vp"))
    pats.map { case (name, re) =>
      seqs.filter(col("seq").rlike(re))
        .agg(count(lit(1)).as("n_users"))
        .select(lit(name).as("pattern"), col("n_users"))
    }.reduce(_.unionByName(_)).orderBy(col("pattern"))
  }

  /** Running distinct-user curve via WINDOWED sketch union — the
    * at-scale form of [[qCumulativeDistinct]]'s ever-seen total when
    * the stream can't be re-folded from first-seen days (late data,
    * multiple sources): per-day HLL sketches union over the
    * cumulative day window (`hll_union_agg` as a window aggregate —
    * sketch union is associative, so the running estimate needs no
    * running SET state, just ~2^lgK bytes per day row), audited
    * against the exact cumulative distinct with the 5% verdict
    * convention (sketch bits aren't cross-engine-portable; the
    * guarantee is). The window runs over the bounded day grid —
    * never the raw stream. */
  def qSketchRunning(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val approx = daily
      .withColumn("approx_cum", hll_sketch_estimate(
        hll_union_agg(col("sk"), lit(false)).over(w)))
      .select(col("day"), col("approx_cum"))
    val exact = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy(col("user_id")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    val exactCum = daily.select(col("day"))
      .join(exact, Seq("day"), "left")
      .withColumn("exact_cum",
        sum(coalesce(col("new_users"), lit(0L))).over(w))
      .select(col("day"), col("exact_cum"))
    exactCum.join(approx, Seq("day"))
      .select(col("day"), col("exact_cum"),
        (abs(col("approx_cum") - col("exact_cum"))
          <= col("exact_cum") * lit(0.05)).as("approx_ok"))
      .orderBy(col("day"))
  }

  /** Daily new-vs-returning split — the audience dashboard's second
    * panel next to [[qCumulativeDistinct]]: per day, how many active
    * users are seen for the first time vs returning. Same
    * no-running-set shape: a user's classification on a day is fully
    * determined by their first-seen day, so one user-keyed min-agg +
    * one distinct (day, user) agg answer every day. Returning-rate
    * e4 from exact integers. */
  def qNewVsReturning(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("fday"))
    ev.join(Joins.maybeBroadcast(first), Seq("user_id"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("dau"),
        sum(when(col("day") === col("fday"), 1L).otherwise(0L)).as("new_users"),
        sum(when(col("day") =!= col("fday"), 1L).otherwise(0L))
          .as("returning_users"))
      .withColumn("returning_e4",
        expr("returning_users * 10000 div dau"))
      .orderBy(col("day"))
  }

  /** Cohort lifetime-value curve — cumulative purchase revenue per
    * signup cohort (first-seen day) by account age in days, the
    * "when does a cohort pay back" readout next to
    * [[qRetentionCohort]]'s activity matrix. Purchases key by
    * (cohort, age) — a bounded grid — then one cumulative window per
    * cohort; revenue stays integer cents until the final /100
    * display rounding. Cohorts limited to the first 7 days and ages
    * to 0..13 to keep the output a stable bounded matrix. */
  def qCohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id"),
        col("event_type"), col("value"))
    val first = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
    val anchor = first.agg(min(col("cohort")).as("day0"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(Joins.maybeBroadcast(first), Seq("user_id"))
      .crossJoin(broadcast(anchor))
      .filter(datediff(col("cohort"), col("day0")) < 7)
      .withColumn("age", datediff(col("day"), col("cohort")))
      .filter(col("age") < 14)
      // Per-EVENT cent quantization before any sum — the §6 rule
      // (a float sum's order could flip the last cent; integers
      // can't).
      .groupBy(col("cohort"), col("age"))
      .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
    val w = Window.partitionBy(col("cohort")).orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p.withColumn("cum_cents", sum(col("cents")).over(w))
      .select(col("cohort"), col("age"), col("cents"), col("cum_cents"))
      .orderBy(col("cohort"), col("age"))
  }

  /** DAU/MAU stickiness — per day, daily actives over trailing-30-day
    * monthly actives (the engagement ratio every consumer dashboard
    * leads with). Exact sliding-window distinct via the bounded day
    * grid: distinct (user, day) pairs range-join the grid (≤ 30 grid
    * rows per pair), then two distinct counts per day — right for a
    * bounded grid; at corpus scale the sliding distinct moves to
    * per-day HLL sketches unioned over the window
    * ([[qSketchRunning]]'s shape), same query surface. */
  def qStickiness(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .localCheckpoint(true)
    val grid = ev.select(col("day").as("gday")).distinct()
    val mau = ev.join(broadcast(grid),
        col("day") <= col("gday") && col("day") >= date_sub(col("gday"), 29))
      .groupBy(col("gday")).agg(countDistinct(col("user_id")).as("mau"))
    val dau = ev.groupBy(col("day").as("gday"))
      .agg(count(lit(1)).as("dau"))
    dau.join(mau, Seq("gday"))
      .select(col("gday").as("day"), col("dau"), col("mau"),
        expr("dau * 10000 div mau").as("stickiness_e4"))
      .orderBy(col("day"))
  }

  /** Holt linear exponential smoothing per event type — the
    * level+trend forecaster one step up from a moving average
    * (α = 0.3, β = 0.1 as exact rationals): all state is e6-scaled
    * BIGINT with truncating division per update, so the fit is
    * bit-identical across engines and the oracle can unroll the
    * recursion exactly (the g_pagerank_det contract applied to time
    * series; float EWMA would diverge in the last ulp). The daily
    * count grid is BOUNDED (|types|·|days|), so the sequential
    * recursion runs on the driver over one landmark read — the same
    * class as pcaPower's d×d eigen step; the corpus folds to the
    * grid map-side. The fit is a TRAILING-WINDOW refit (round 14;
    * lifts the round-13 ≤30-day ceiling): only the most recent
    * [[HoltOracleRounds]] days per type enter the recursion — the
    * right semantics for exponential smoothing anyway (0.7³⁰ ≈ 2e-5:
    * older observations are numerically invisible at e6 resolution)
    * and it keeps the oracle's unroll exact at ANY calendar span.
    * Output per type: window length, final level/trend and the
    * 1/2/3-day-ahead forecasts. */
  def qHoltForecast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    holtForecastOf(holtGrid(spark, dir))
      .toDF("event_type", "n_days", "level_e6", "trend_e6",
        "f1_e6", "f2_e6", "f3_e6").orderBy(col("event_type"))
  }

  /** The bounded per-(type, day) count grid both Holt fits consume —
    * map-side fold of the corpus to |types|·|days| rows, collected
    * in the deterministic (type, day) order. */
  private[graft] def holtGrid(spark: SparkSession,
      dir: String): Seq[(String, Long)] =
    Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("x"))
      .orderBy(col("event_type"), col("day"))
      .collect()
      .map(r => (r.getString(0), r.getLong(2))).toSeq

  private[graft] def holtForecastOf(grid: Seq[(String, Long)])
      : Seq[(String, Long, Long, Long, Long, Long, Long)] =
    grid.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rows) =>
      // Trailing-window refit: the last HoltOracleRounds observed
      // days. The oracle ranks descending and keeps the same window,
      // so both recursions unroll over identical slices no matter
      // how long the lake's calendar grows.
      val xs = rows.map(_._2).takeRight(HoltOracleRounds)
      var l = xs.head * 1000000L
      var b = 0L
      xs.tail.foreach { x =>
        val lPrev = l
        l = (3L * x * 1000000L + 7L * (l + b)) / 10L
        b = (1L * (l - lPrev) + 9L * b) / 10L
      }
      (t, xs.length.toLong, l, b,
        l + 1L * b, l + 2L * b, l + 3L * b)
    }

  /** Holt–Winters additive seasonal forecast (weekly season m = 7) —
    * [[qHoltForecast]]'s seasonal completion: level/trend/seasonal
    * recursion in EXACT e6 integer arithmetic (α=.3, β=.1, γ=.2 as
    * /10 integer divisions — plain Scala `/` TRUNCATES toward zero
    * exactly like DuckDB's integer `//` and Spark SQL's `div`, which
    * matters on the negative trend/seasonal terms; Math.floorDiv
    * would diverge — the spectral-oracle "// ≡ div, both truncate"
    * rule). Init: level = first-week
    * integer mean, seasonals = first-week deviations, trend 0; the
    * oracle unrolls the identical recursion with the 7 seasonal
    * slots as columns (only rank t's slot updates at step t).
    * Forecast f_h = l + h·b + s[(n+h−1) mod 7]. The day grid is
    * calendar-bounded and driver-folded (the qHoltForecast shape)
    * and the fit is the same TRAILING-WINDOW refit (last
    * [[HoltOracleRounds]] days; round 14 — a longer lake now refits
    * instead of throwing); a series shorter than one season still
    * fails loudly (no seasonal init exists). */
  def qHoltWinters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    holtWintersOf(holtGrid(spark, dir))
      .toDF("event_type", "n_days", "level_e6", "trend_e6",
        "f1_e6", "f2_e6", "f3_e6").orderBy(col("event_type"))
  }

  private[graft] def holtWintersOf(grid: Seq[(String, Long)])
      : Seq[(String, Long, Long, Long, Long, Long, Long)] = {
    val m = 7
    grid.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rows) =>
      val xs = rows.map(_._2).takeRight(HoltOracleRounds)
      require(xs.length >= m,
        s"holt-winters: '$t' spans ${xs.length} days < one season ($m)" +
        " — no seasonal init exists")
      var l = xs.take(m).sum * 1000000L / m
      val s = Array.tabulate(m)(i => xs(i) * 1000000L - l)
      var b = 0L
      xs.zipWithIndex.drop(m).foreach { case (x, idx) =>
        val slot = idx % m
        val lPrev = l
        l = (3L * (x * 1000000L - s(slot)) + 7L * (l + b)) / 10L
        b = (l - lPrev + 9L * b) / 10L
        s(slot) = (2L * (x * 1000000L - l) + 8L * s(slot)) / 10L
      }
      val n = xs.length
      def f(h: Int) = l + h * b + s((n + h - 1) % m)
      (t, n.toLong, l, b, f(1), f(2), f(3))
    }
  }

  /** Period-over-period movers — first-half vs second-half event
    * volumes per type with exact integer deltas and e4 relative
    * change (the "what changed this period" BI readout). The split
    * point is the midpoint of the observed day span (data-derived,
    * deterministic); one bounded aggregation, a broadcast anchor,
    * zero-denominator guarded. */
  def qTopMovers(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
    val anchor = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    ev.crossJoin(broadcast(anchor))
      .withColumn("half",
        when(datediff(col("day"), col("d0")) * 2
          <= datediff(col("d1"), col("d0")), lit(1)).otherwise(lit(2)))
      .groupBy(col("event_type"))
      .agg(sum(when(col("half") === 1, 1L).otherwise(0L)).as("n_first"),
        sum(when(col("half") === 2, 1L).otherwise(0L)).as("n_second"))
      .select(col("event_type"), col("n_first"), col("n_second"),
        (col("n_second") - col("n_first")).as("delta"),
        when(col("n_first") > 0,
          expr("(n_second - n_first) * 10000 div n_first")).as("pct_e4"))
      .orderBy(col("event_type"))
  }

  /** Herfindahl–Hirschman concentration per event type — "is this
    * segment's activity dominated by a few users": HHI_e6 =
    * Σ cnt²·10⁶ / (Σ cnt)² over per-user activity counts, plus the
    * top user's share. Pure integer sufficient statistics (two
    * map-side-combinable aggregations, the second over the bounded
    * (type, user) reduction), so the e6 values are bit-identical
    * across engines; at lake scale the same sums ride DECIMAL(38)
    * before the divide. */
  def qHhi(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("cnt")).as("n_events"),
        sum(col("cnt") * col("cnt")).as("ss"),
        max(col("cnt")).as("top_cnt"))
      .select(col("event_type"), col("n_users"), col("n_events"),
        expr("ss * 1000000 div (n_events * n_events)").as("hhi_e6"),
        expr("top_cnt * 1000000 div n_events").as("top_share_e6"))
      .orderBy(col("event_type"))
  }

  /** DAU growth accounting — the canonical product-analytics ledger:
    * each active day splits a user into new (first-ever day),
    * retained (also active the previous day) or resurrected (gap
    * > 1 day), and a user active on d-1 but not d churns ON d. One
    * distinct (user, day) reduction, one user-PARTITIONED window
    * (no global sort), bounded day-grid joins. Churn on a day with
    * zero activity at all falls outside the activity grid and is
    * dropped (documented; the left join keeps the grid stable). */
  def qGrowthAccounting(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val lagged = ud
      .withColumn("prev", lag(col("day"), 1).over(w))
      .withColumn("nxt", lead(col("day"), 1).over(w))
      .localCheckpoint(true)
    val flags = lagged.groupBy(col("day")).agg(
      sum(when(col("prev").isNull, 1L).otherwise(0L)).as("n_new"),
      sum(when(datediff(col("day"), col("prev")) === 1, 1L)
        .otherwise(0L)).as("n_retained"),
      sum(when(col("prev").isNotNull &&
        datediff(col("day"), col("prev")) > 1, 1L)
        .otherwise(0L)).as("n_resurrected"))
    val churn = lagged
      .filter(col("nxt").isNull || datediff(col("nxt"), col("day")) > 1)
      .groupBy(date_add(col("day"), 1).as("day"))
      .agg(count(lit(1)).as("churned"))
    flags.join(churn, Seq("day"), "left")
      .select(col("day"), col("n_new"), col("n_retained"),
        col("n_resurrected"),
        coalesce(col("churned"), lit(0L)).as("n_churned"))
      .orderBy(col("day"))
  }

  /** Empirical survival curve of user lifetimes (days between first
    * and last activity): S(t) = |lifetime ≥ t| / |users| on the
    * bounded t = 0..30 grid. The per-user reduction is one
    * aggregation; the curve reads off a ≤span-sized lifetime
    * histogram joined to the grid — the raw stream never meets the
    * grid. Exact integers end to end. */
  def qSurvival(spark: SparkSession, dir: String): DataFrame = {
    val life = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy(col("user_id"))
      .agg(datediff(max(col("day")), min(col("day"))).as("lt"))
    val hist = life.groupBy(col("lt")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val tot = life.agg(count(lit(1)).as("n_total"))
    spark.range(0, 31).select(col("id").as("t"))
      .join(broadcast(hist), col("lt") >= col("t"))
      .groupBy(col("t")).agg(sum(col("c")).as("n_surviving"))
      .crossJoin(broadcast(tot))
      .select(col("t"), col("n_surviving"), col("n_total"),
        expr("n_surviving * 1000000 div n_total").as("surv_e6"))
      .orderBy(col("t"))
  }

  /** Chi-square independence test of event type × ISO weekday, with
    * the squared Cramér's V effect size — "does activity mix shift
    * by weekday". The contingency table is the bounded |types|×7
    * grid; each cell's χ² term is the all-integer rational
    * (oN − r·c)²/(N·r·c), e4-floored per cell in DECIMAL(38) before
    * the sum (the documented per-term rounding rule, so distributed
    * accumulation order cannot flip a digit). V² is emitted e8 as an
    * exact integer instead of paying a float sqrt. */
  def qCramersV(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.events(spark, dir)
      .groupBy(col("event_type"), weekday(to_date(col("ts"))).as("dow"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(true)
    val rt = o.groupBy(col("event_type")).agg(sum(col("o")).as("r"))
    val ct = o.groupBy(col("dow")).agg(sum(col("o")).as("c"))
    val nAgg = o.agg(sum(col("o")).as("n"),
      countDistinct(col("event_type")).as("nr"),
      countDistinct(col("dow")).as("nc"))
    o.join(broadcast(rt), Seq("event_type"))
      .join(broadcast(ct), Seq("dow"))
      .crossJoin(broadcast(nAgg))
      .select(col("n"), col("nr"), col("nc"),
        expr("CAST((CAST(o * n - r * c AS DECIMAL(38,0)) *" +
          " CAST(o * n - r * c AS DECIMAL(38,0)) * 10000)" +
          " div (CAST(n AS DECIMAL(38,0)) * r * c) AS BIGINT)")
          .as("term_e4"))
      .groupBy(col("n"), col("nr"), col("nc"))
      .agg(sum(col("term_e4")).as("chi2_e4"))
      .select(col("n"), (least(col("nr"), col("nc")) - 1).as("dof_k"),
        col("chi2_e4"),
        expr("chi2_e4 * 10000 div (n * (least(nr, nc) - 1))").as("v2_e8"))
  }

  /** Lag-1..7 autocorrelation of the global daily event-count series
    * — the seasonality detector feeding [[qSeasonalDecompose]] (a
    * weekly cycle shows as a lag-7 peak). The series is the bounded
    * day grid, pairs come from a broadcast self-join at each lag,
    * and Pearson r is computed from exact integer sufficient sums
    * with ONE double expression stated identically in the oracle
    * (same tree → bit-identical, the calibration-curve lesson). */
  def qAutocorr(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val lags = spark.range(1, 8).select(col("id").as("lag"))
    daily.as("a")
      .crossJoin(lags)
      .join(broadcast(daily.as("b")),
        expr("b.day = date_add(a.day, CAST(lag AS INT))"))
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("a.c")).as("sx"), sum(col("b.c")).as("sy"),
        sum(col("a.c") * col("b.c")).as("sxy"),
        sum(col("a.c") * col("a.c")).as("sxx"),
        sum(col("b.c") * col("b.c")).as("syy"))
      .select(col("lag"), col("n"),
        expr("CAST(round((CAST(n * sxy - sx * sy AS DOUBLE) /" +
          " (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *" +
          " sqrt(CAST(n * syy - sy * sy AS DOUBLE)))) * 10000)" +
          " AS BIGINT)").as("r_e4"))
      .orderBy(col("lag"))
  }

  /** ABC inventory classification of parts by revenue — the
    * cumulative-share cousin of [[qPareto]]: rank parts by revenue
    * DESC (unique key tiebreak), split at 80% / 95% cumulative
    * share, report each class's size and exact e6 share. The global
    * order rides [[Selection.withGlobalRank]]'s range-partitioned
    * rank + cumsum (two narrow shuffles over (part, cents) rows —
    * never a single-reducer window; PlanAuditSpec-pinned), and the
    * share arithmetic is DECIMAL(38) exact. */
  def qAbc(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .groupBy(col("l_partkey")).agg(sum(col("cents")).as("x"))
    val ranked = Selection.withGlobalRank(rev,
      Seq(col("x").desc, col("l_partkey")), "rk",
      cumSumOf = Some("x"), cumName = "cum")
    val tot = rev.agg(sum(col("x")).as("total"))
    ranked.crossJoin(broadcast(tot))
      .withColumn("cls",
        when(col("cum") * 100 <= col("total") * 80, "A")
          .when(col("cum") * 100 <= col("total") * 95, "B")
          .otherwise("C"))
      .groupBy(col("cls"))
      .agg(count(lit(1)).as("n_parts"), sum(col("x")).as("cls_cents"))
      .crossJoin(broadcast(tot))
      .select(col("cls"), col("n_parts"),
        expr("CAST(CAST(cls_cents AS DECIMAL(38,0)) * 1000000" +
          " div CAST(total AS DECIMAL(38,0)) AS BIGINT)").as("share_e6"))
      .orderBy(col("cls"))
  }

  /** Numeric-distribution drift (round 13) — the Population
    * Stability Index between two order cohorts, the monitoring
    * readout a feature store computes before every model refresh
    * ("did the spend distribution move"). Cohorts are the calendar
    * halves (orderdate year < 1998 = reference, >= 1998 = current —
    * a fixed split, never data-dependent); spend bins are fixed
    * 50k-wide price buckets capped at bin 9, stated as the identical
    * floor tree both sides so edge values bin identically. A 10-row
    * bin spine left-joins the counts (empty bins emit 0, add-one
    * smoothing keeps their PSI term finite); per-bin PSI term
    * (p-q)*ln(p/q) e6-rounded from the identically-stated tree. One
    * aggregation over orders + 10-row math; totals are a 1-row
    * driver read. */
  def qPsiDrift(spark: SparkSession, dir: String): DataFrame = {
    val bins = 10
    val binned = Tables.orders(spark, dir)
      .select(
        expr("CAST(least(floor(o_totalprice / 50000), 9) AS BIGINT)").as("bin"),
        when(year(col("o_orderdate")) < 1998, lit(0L)).otherwise(lit(1L)).as("coh"))
      .groupBy(col("bin"))
      .agg(sum(when(col("coh") === 0L, 1L).otherwise(0L)).as("cr"),
        sum(when(col("coh") === 1L, 1L).otherwise(0L)).as("cc"))
    val spine = spark.range(0, bins).select(col("id").as("bin"))
    val full = spine.join(binned, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("cr"), lit(0L)).as("c_ref"),
        coalesce(col("cc"), lit(0L)).as("c_cur"))
      .localCheckpoint(true)
    val tots = full.agg(sum(col("c_ref")), sum(col("c_cur"))).collect().head
    val (denR, denC) = (tots.getLong(0) + bins, tots.getLong(1) + bins)
    full.select(col("bin"), col("c_ref"), col("c_cur"),
      expr(s"CAST(round((CAST(c_ref + 1 AS DOUBLE) / $denR" +
        s" - CAST(c_cur + 1 AS DOUBLE) / $denC)" +
        s" * ln((CAST(c_ref + 1 AS DOUBLE) / $denR)" +
        s" / (CAST(c_cur + 1 AS DOUBLE) / $denC))" +
        " * 1000000) AS BIGINT)").as("psi_e6"))
      .orderBy(col("bin"))
  }

  /** Two-sample Kolmogorov–Smirnov test between the [[qPsiDrift]]
    * calendar cohorts over order totals — the distribution-level
    * drift verdict next to PSI's per-bin readout (KS sees shape
    * changes that fixed bins blur). Exact and all-integer: values
    * collapse to distinct cents with per-cohort counts (map-side
    * combine), both ECDFs come from ONE
    * [[Selection.withGlobalCumsums]] pass (range-partitioned — no
    * single-reducer window over the value axis), and the statistic
    * maximizes the cross-multiplied |k₁n₂ − k₂n₁| — the products
    * themselves ride DECIMAL(38,0) (k·n is O(n²) and wrecks BIGINT
    * past ~3e9 rows, the qGini rule, applied at the multiply not
    * just the final divide). Ties are
    * handled exactly: the ECDF is evaluated after consuming each
    * whole tie group. D's argmax is unique under (num DESC, v). */
  def qKsTest(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.orders(spark, dir)
      .select(round(col("o_totalprice") * 100).cast("long").as("v"),
        when(year(col("o_orderdate")) < 1998, lit(0L)).otherwise(lit(1L))
          .as("coh"))
      .groupBy(col("v"))
      .agg(sum(when(col("coh") === 0L, 1L).otherwise(0L)).as("c1"),
        sum(when(col("coh") === 1L, 1L).otherwise(0L)).as("c2"))
    val cum = Selection.withGlobalCumsums(g, Seq(col("v")), "rk",
      Seq("c1" -> "k1", "c2" -> "k2"))
      .localCheckpoint(true)
    val tot = cum.agg(max(col("k1")).as("n1"), max(col("k2")).as("n2"))
    cum.crossJoin(broadcast(tot))
      .withColumn("num",
        abs(col("k1").cast("decimal(38,0)") * col("n2")
          - col("k2").cast("decimal(38,0)") * col("n1"))
          .cast("decimal(38,0)"))
      .orderBy(col("num").desc, col("v").asc)
      .limit(1)
      // num stays an INTERNAL decimal (it orders the argmax); only
      // the bounded d_e6 readout is emitted — the SURVEY §6
      // emitted-type rule: intermediates ride any width, emitted
      // columns must be driver-hash-stable (BIGINT / e-scaled).
      .select(col("n1"), col("n2"), col("v").as("at_v"),
        expr("CAST(CAST(num AS DECIMAL(38,0)) * 1000000" +
          " div (CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)").as("d_e6"))
  }

  /** Two-sample Mann–Whitney rank-sum test between the same calendar
    * cohorts — the nonparametric location verdict beside [[qKsTest]]
    * (KS answers "same distribution?", U answers "is one shifted?").
    * Exact under ties via the grouped closed form: per distinct
    * value with tie group size t and C values strictly below,
    * doubled-rank-sum 2R₁ = Σ c₁·(2C + t + 1) — integer by
    * construction (tied ranks average to halves, so the ×2 ledger
    * stays exact). C comes from the same single
    * [[Selection.withGlobalCumsums]] pass as the KS ECDF; 2R₁ is
    * O(n²) so each term and its sum ride DECIMAL(38) like the tie
    * correction Σ(t³−t) (cube of a tie group — or a rank-sum past
    * ~3e9 rows — overflows BIGINT exactly when it matters at scale;
    * the qGini promotion rule, applied uniformly). The
    * z statistic is the one double, from exact integer inputs
    * through a single expression tree, e4-rounded (the qAbLift
    * float rule); degenerate all-tied data guards to NULL. */
  def qMannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val g = Tables.orders(spark, dir)
      .select(round(col("o_totalprice") * 100).cast("long").as("v"),
        when(year(col("o_orderdate")) < 1998, lit(0L)).otherwise(lit(1L))
          .as("coh"))
      .groupBy(col("v"))
      .agg(sum(when(col("coh") === 0L, 1L).otherwise(0L)).as("c1"),
        sum(when(col("coh") === 1L, 1L).otherwise(0L)).as("c2"))
    val cum = Selection.withGlobalCumsums(g, Seq(col("v")), "rk",
      Seq("c1" -> "k1", "c2" -> "k2"))
      .withColumn("t", col("c1") + col("c2"))
      .withColumn("cbelow", col("k1") + col("k2") - col("t"))
    val f = cum.groupBy()
      .agg(max(col("k1")).as("n1"), max(col("k2")).as("n2"),
        sum((col("c1").cast(d38) *
          (lit(2L) * col("cbelow") + col("t") + lit(1L))).cast(d38))
          .as("r1x2"),
        sum((col("t") * col("t") * col("t") - col("t")).cast(d38))
          .as("ties"))
    def dbl(c: String) = col(c).cast("double")
    val n = col("n1") + col("n2")
    val u1x2 = (col("r1x2") -
      col("n1").cast(d38) * (col("n1") + lit(1L))).cast(d38)
    val varU = (dbl("n1") * dbl("n2") / 12.0) *
      ((n.cast("double") + 1.0) -
        col("ties").cast("double") /
          (n.cast("double") * (n.cast("double") - 1.0)))
    val z = (u1x2.cast("double") / 2.0 - dbl("n1") * dbl("n2") / 2.0) /
      sqrt(varU)
    // The 2R₁/2U₁ ledger stays an INTERNAL decimal; emitted is the
    // bounded common-language effect size U₁/(n₁n₂) e6-scaled
    // (truncating div, identical in DuckDB `//`) — the SURVEY §6
    // emitted-type rule, same shape as qKsTest's d_e6.
    f.withColumn("u1x2", u1x2)
      .select(col("n1"), col("n2"),
        expr("CAST(CAST(u1x2 AS DECIMAL(38,0)) * 1000000" +
          " div (CAST(n1 AS DECIMAL(38,0)) * n2 * 2) AS BIGINT)")
          .as("auc_e6"),
        col("ties").cast("long").as("tie_sum"),
        when(varU > 0.0, round(z * 1e4).cast("long")).as("z_e4"))
  }

  /** Theil–Sen robust trend per event type — [[qTrend]]'s
    * outlier-immune sibling (OLS moves with one bad day; the median
    * of pairwise slopes has a 29% breakdown point). The day grid is
    * calendar-bounded, so the within-type pair set is days²/2 rows
    * REGARDLESS of corpus size — the raw stream folds to (type, day)
    * counts map-side before any pairing, which is what makes the
    * quadratic enumerable at 100 TB (the dense/small-V dispatch
    * argument in closed form). Each slope is e6-rounded from the one
    * double division stated identically in the oracle; the reported
    * slope is the exact LOWER median under the unique
    * (slope, day_i, day_j) order (the qMadOutliers discrete-median
    * convention, no interpolation). */
  def qTheilSen(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("y"))
    val anchor = d.agg(min(col("day")).as("d0"))
    val idx = d.crossJoin(broadcast(anchor))
      .select(col("event_type"), col("y"),
        datediff(col("day"), col("d0")).cast("long").as("x"))
      .localCheckpoint(true)
    val pairs = idx.toDF("event_type", "yi", "xi")
      .join(idx.toDF("event_type", "yj", "xj"), Seq("event_type"))
      .filter(col("xi") < col("xj"))
      .withColumn("slope_e6", expr(
        "CAST(round(CAST(yj - yi AS DOUBLE) / (xj - xi) * 1000000)" +
          " AS BIGINT)"))
    val w = Window.partitionBy(col("event_type"))
    pairs
      .withColumn("rk", row_number().over(
        w.orderBy(col("slope_e6"), col("xi"), col("xj"))))
      .withColumn("np", count(lit(1)).over(w))
      .filter(col("rk") === expr("(np + 1) div 2"))
      .select(col("event_type"), col("np").as("n_pairs"),
        col("slope_e6"))
      .orderBy(col("event_type"))
  }

  /** Empirical-prior weighted rating (round 14) — THE small-sample
    * ranking fix every leaderboard/recommender ships (the IMDb
    * weighted-rating formula; equivalently the posterior mean of a
    * Beta prior with strength m centered on the EMPIRICAL global
    * mean — Bayesian smoothing where only the prior STRENGTH is
    * fixed): a 1-for-1 user must not outrank a 90-for-100 user on
    * purchase share. WR = n/(n+m)·R + m/(n+m)·C with R = x/n the
    * user's purchase share and C the global share. Sufficient
    * statistics are exact integers (one map-side-combinable
    * per-user aggregation); C and WR are ONE double tree stated
    * identically in the oracle, e6-rounded; top-k under the unique
    * (wr DESC, user_id) order. The global scalar broadcasts —
    * per-user state never re-shuffles for it. */
  def qBayesRank(spark: SparkSession, dir: String, m: Int = 25,
      k: Int = 25): DataFrame = {
    val u = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("x"))
    val g = u.agg((sum(col("x")).cast("double") / sum(col("n"))).as("c"))
    u.crossJoin(broadcast(g))
      .select(col("user_id"), col("n"), col("x"),
        expr(s"CAST(round((CAST(n AS DOUBLE) / (n + $m)" +
          s" * (CAST(x AS DOUBLE) / n)" +
          s" + CAST($m AS DOUBLE) / (n + $m) * c) * 1000000) AS BIGINT)")
          .as("wr_e6"))
      .orderBy(col("wr_e6").desc, col("user_id"))
      .limit(k)
  }

  /** Mann–Kendall trend test per event type (round 14) — the
    * nonparametric trend VERDICT beside [[qTheilSen]]'s slope
    * estimate (the pair every monitoring textbook ships together:
    * Theil–Sen says how steep, Mann–Kendall says whether it's
    * distinguishable from noise). S = Σ_{i<j} sign(x_j − x_i) over
    * the day-ordered pairs of the SAME calendar-bounded (type, day)
    * grid — the pair set is days²/2 regardless of corpus size, the
    * qTheilSen enumerability argument verbatim. S and the tie
    * correction Σ t(t−1)(2t+5) (t = same-count day groups) are exact
    * BIGINT on the bounded spine; Var(S) = (n(n−1)(2n+5) − ties)/18
    * and the continuity-corrected z = (S∓1)/√Var are the one double
    * tree stated identically in the oracle, e4-rounded; zero
    * variance guards to NULL. */
  def qMannKendall(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("y"))
    val anchor = d.agg(min(col("day")).as("d0"))
    val idx = d.crossJoin(broadcast(anchor))
      .select(col("event_type"), col("y"),
        datediff(col("day"), col("d0")).cast("long").as("x"))
      .localCheckpoint(true)
    val pairs = idx.toDF("event_type", "yi", "xi")
      .join(idx.toDF("event_type", "yj", "xj"), Seq("event_type"))
      .filter(col("xi") < col("xj"))
      .select(col("event_type"),
        when(col("yj") > col("yi"), 1L).when(col("yj") < col("yi"), -1L)
          .otherwise(0L).as("sgn"))
      .groupBy(col("event_type")).agg(sum(col("sgn")).as("s_stat"))
    val ties = idx.groupBy(col("event_type"), col("y"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"))
      .agg(sum(col("t")).as("n_days"),
        sum(col("t") * (col("t") - lit(1L)) * (lit(2L) * col("t") + lit(5L)))
          .as("tie_term"))
    pairs.join(ties, Seq("event_type"))
      .select(col("event_type"), col("n_days"), col("s_stat"), col("tie_term"),
        expr("CASE WHEN n_days * (n_days - 1) * (2 * n_days + 5)" +
          " - tie_term > 0 THEN CAST(round(" +
          "(CASE WHEN s_stat > 0 THEN s_stat - 1" +
          " WHEN s_stat < 0 THEN s_stat + 1 ELSE 0 END)" +
          " / sqrt((n_days * (n_days - 1) * (2 * n_days + 5) - tie_term)" +
          " / 18.0) * 10000) AS BIGINT) END").as("z_e4"))
      .orderBy(col("event_type"))
  }

  /** Data-quality constraint audit — the Deequ-style contract check a
    * pipeline runs BEFORE trusting a new drop: primary-key
    * uniqueness, referential integrity (FK orphans via broadcast
    * anti-join against the smaller side's key set), NOT NULL,
    * accepted-values and range constraints, each as ONE map-side-
    * combinable conditional aggregation per table (never a scan per
    * check — the q_funnel one-pass rule); orphan checks are
    * left_anti joins that broadcast the key dimension. Output: one
    * row per check with rows checked and violations — all-zero
    * violations IS the contract on clean data (the planted-dirty
    * spec proves each check actually fires). */
  def qDqAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    def one(check: String, target: String, df: DataFrame,
        checked: Column, viol: Column): DataFrame =
      df.agg(checked.as("n_checked"), viol.as("n_violations"))
        .select(lit(check).as("check_name"), lit(target).as("target"),
          col("n_checked"), col("n_violations"))
    val pkOrders = one("pk_unique", "orders.o_orderkey", ord,
      count(lit(1)), count(lit(1)) - count_distinct(col("o_orderkey")))
    val pkCust = one("pk_unique", "customer.c_custkey", cust,
      count(lit(1)), count(lit(1)) - count_distinct(col("c_custkey")))
    val fkOrders = one("fk_orphans", "orders.o_custkey->customer",
      ord.join(Joins.maybeBroadcast(cust.select(col("c_custkey").as("o_custkey"))),
        Seq("o_custkey"), "left_anti"),
      count(lit(1)), count(lit(1)))
      .select(col("check_name"), col("target"),
        lit(null).cast("long").as("n_checked"), col("n_violations"))
    val fkLi = one("fk_orphans", "lineitem.l_orderkey->orders",
      li.select(col("l_orderkey"))
        .join(ord.select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"), "left_anti"),
      count(lit(1)), count(lit(1)))
      .select(col("check_name"), col("target"),
        lit(null).cast("long").as("n_checked"), col("n_violations"))
    val ordScan = one("row_rules", "orders", ord, count(lit(1)),
      sum(when(col("o_totalprice").isNull ||
        col("o_totalprice") <= 0.0 ||
        !col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L)))
    val liScan = one("row_rules", "lineitem", li, count(lit(1)),
      sum(when(col("l_quantity") < 1.0 || col("l_quantity") > 50.0 ||
        col("l_extendedprice").isNull ||
        col("l_extendedprice") < 0.0, 1L).otherwise(0L)))
    Seq(pkOrders, pkCust, fkOrders, fkLi, ordScan, liScan)
      .reduce(_ unionAll _)
      .orderBy(col("check_name"), col("target"))
  }

  /** Wald–Wolfowitz runs test per event type — "is the daily series
    * RANDOM around its level, or does it trend/oscillate?": days
    * dichotomized against the exact LOWER median (the qMadOutliers
    * discrete convention; days AT the median drop, the classical
    * treatment), runs counted by lag transitions over the
    * calendar-bounded per-type day grid. Counts are exact integers;
    * z = (R − (2n₁n₂/n + 1)) / σ is the one double tree e4-rounded,
    * NULL when a side is empty or n < 2. Too FEW runs ⇒ trending
    * (the q_cusum/q_changepoint family's model check), too many ⇒
    * oscillation. */
  def qRunsTest(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c"))
    val wc = Window.partitionBy(col("event_type"))
    val med = d
      .withColumn("rk", row_number().over(
        wc.orderBy(col("c"), col("day"))))
      .withColumn("nn", count(lit(1)).over(wc))
      .filter(col("rk") === expr("(nn + 1) div 2"))
      .select(col("event_type"), col("c").as("med"))
    val kept = d.join(broadcast(med), Seq("event_type"))
      .filter(col("c") =!= col("med"))
      .withColumn("b", (col("c") > col("med")).cast("long"))
    val runs = kept
      .withColumn("pb", lag(col("b"), 1).over(wc.orderBy(col("day"))))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("b")).as("n1"),
        sum(lit(1L) - col("b")).as("n2"),
        (sum(when(col("pb").isNull || col("pb") =!= col("b"), 1L)
          .otherwise(0L))).as("r"))
    def dbl(c: String) = col(c).cast("double")
    val mu = lit(2.0) * dbl("n1") * dbl("n2") / dbl("n") + lit(1.0)
    val sig2 = (lit(2.0) * dbl("n1") * dbl("n2") *
      (lit(2.0) * dbl("n1") * dbl("n2") - dbl("n"))) /
      (dbl("n") * dbl("n") * (dbl("n") - lit(1.0)))
    runs.select(col("event_type"), col("n1"), col("n2"), col("r"),
      when(col("n1") > 0L && col("n2") > 0L && col("n") > 1L &&
          sig2 > 0.0,
        round((dbl("r") - mu) / sqrt(sig2) * 1e4).cast("long"))
        .as("z_e4"))
      .orderBy(col("event_type"))
  }

  /** Log–log power-law fit of line price against quantity — the
    * elasticity-style readout (slope = the power-law exponent; ≈1e6
    * here since extendedprice scales linearly in quantity). The
    * bit-stable shape for log regressions at scale: ln NEVER touches
    * per-row data — rows fold to the BOUNDED quantity spine (≤50
    * levels) with exact integer floor-div means first, and ln runs
    * on those ≤50 rows only, e6-quantized per point BEFORE the sums
    * (50 ln evals can't hit a rounding boundary; 600M would). OLS
    * from exact integer sufficient statistics; slope/intercept are
    * the one double tree, e6-rounded. */
  def qPowerLaw(spark: SparkSession, dir: String): DataFrame = {
    val lvl = Tables.lineitem(spark, dir)
      .select(col("l_quantity").cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .groupBy(col("qty"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"))
      .select(col("qty"), expr("sc div n").as("mean_cents"))
    lvl.select(
      expr("CAST(round(ln(CAST(qty AS DOUBLE)) * 1000000) AS BIGINT)")
        .as("x"),
      expr("CAST(round(ln(CAST(mean_cents AS DOUBLE)) * 1000000)" +
        " AS BIGINT)").as("y"))
      .groupBy()
      .agg(count(lit(1)).as("k"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("k").as("n_levels"),
        expr("CASE WHEN k * sxx - sx * sx <> 0 THEN" +
          " CAST(round(CAST(k * sxy - sx * sy AS DOUBLE)" +
          " / (k * sxx - sx * sx) * 1000000) AS BIGINT) END")
          .as("slope_e6"),
        expr("CASE WHEN k * sxx - sx * sx <> 0 THEN" +
          " CAST(round((CAST(sy AS DOUBLE)" +
          " - CAST(k * sxy - sx * sy AS DOUBLE) / (k * sxx - sx * sx)" +
          " * sx) / k) AS BIGINT) END").as("intercept_e6"))
  }

  /** Decile gains / lift table (round 16) — the model-evaluation
    * staple next to the rank-sum AUC (`q_mann_whitney`): customers
    * ranked by the stand-in model score (account balance), split
    * into deciles, and each prefix's positive rate (heavy buyer,
    * ≥ `minOrders` orders) compared to the base rate — "how much
    * better than random is targeting the top k/10". ntile(10) runs
    * under the UNIQUE (score DESC, custkey) total order (the §6
    * tiebreak rule; both engines front-load buckets — the q_rfm
    * precedent, including its documented at-scale path: distributed
    * decile cut points + broadcast join past ~10^7 rows). Cumulative
    * sums run over the 10-row decile grid; lift evaluates in double
    * from exact integers through one fixed tree, e4-rounded. */
  def qLiftCurve(spark: SparkSession, dir: String,
      minOrders: Long = 15L): DataFrame = {
    val oc = Tables.orders(spark, dir).groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
      .withColumnRenamed("o_custkey", "c_custkey")
    val scored = Tables.customer(spark, dir)
      .join(oc, Seq("c_custkey"), "left")
      .select(col("c_custkey"), col("c_acctbal"),
        when(coalesce(col("n_orders"), lit(0L)) >= minOrders, 1L)
          .otherwise(0L).as("pos"))
      .localCheckpoint(true)
    val dec = scored.withColumn("decile",
      ntile(10).over(Window.orderBy(col("c_acctbal").desc, col("c_custkey")))
        .cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("pos"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec
      .withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("cum_pos", sum(col("pos")).over(w))
      .crossJoin(broadcast(
        scored.agg(count(lit(1)).as("nt"), sum(col("pos")).as("pt"))))
      .select(col("decile"), col("n"), col("pos"), col("cum_pos"),
        expr("CASE WHEN pt > 0 THEN CAST(round(CAST(cum_pos AS DOUBLE)" +
          " * nt / (cum_n * pt) * 10000) AS BIGINT) END").as("lift_e4"))
      .orderBy(col("decile"))
  }

  /** Per-brand price-quantity elasticity (round 16) — [[qPowerLaw]]'s
    * GROUPED sibling, the "how does spend co-move with order size"
    * readout merchandising asks per brand: OLS of
    * y = ln(mean extended cents) on x = ln(quantity level) over the
    * ≤50 (brand, quantity) cells. Collapsing to the bounded level
    * grid BEFORE the fit (mean cents per level via truncating
    * integer division) keeps every OLS sufficient statistic in
    * BIGINT at ANY corpus scale — the qPowerLaw discipline applied
    * per group. The part dimension broadcasts; the level collapse is
    * one map-side-combined aggregation on the bounded
    * (brand × quantity) grid. Slope/intercept evaluate in double
    * from exact integers through the one fixed expression tree,
    * e6-rounded (§6); degenerate single-level brands emit NULL. */
  def qPriceElasticity(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"),
        col("l_quantity").cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val pt = Tables.part(spark, dir)
      .select(col("p_partkey").as("l_partkey"), col("p_brand"))
    val lvl = li.join(Joins.maybeBroadcast(pt), Seq("l_partkey"))
      .groupBy(col("p_brand"), col("qty"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"))
      .select(col("p_brand"), col("qty"), expr("sc div n").as("mean_cents"))
    lvl.select(col("p_brand"),
      expr("CAST(round(ln(CAST(qty AS DOUBLE)) * 1000000) AS BIGINT)")
        .as("x"),
      expr("CAST(round(ln(CAST(mean_cents AS DOUBLE)) * 1000000)" +
        " AS BIGINT)").as("y"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("k"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("p_brand"), col("k").as("n_levels"),
        expr("CASE WHEN k * sxx - sx * sx <> 0 THEN" +
          " CAST(round(CAST(k * sxy - sx * sy AS DOUBLE)" +
          " / (k * sxx - sx * sx) * 1000000) AS BIGINT) END")
          .as("slope_e6"),
        expr("CASE WHEN k * sxx - sx * sx <> 0 THEN" +
          " CAST(round((CAST(sy AS DOUBLE)" +
          " - CAST(k * sxy - sx * sy AS DOUBLE) / (k * sxx - sx * sx)" +
          " * sx) / k) AS BIGINT) END").as("intercept_e6"))
      .orderBy(col("p_brand"))
  }

  /** Exponential retention-decay fit — the day-0 cohort's survival
    * curve reduced to one rate: share of the cohort still active at
    * age d, fit log-linearly (ln r_d ~ d, slope = the daily decay
    * exponent the LTV models consume). The [[qPowerLaw]] bit-stable
    * log-regression shape: counts are exact integers, ln runs ONLY
    * on the calendar-bounded age spine (≤ day-span points),
    * e6-quantized per point before the exact integer OLS sums; slope
    * and intercept are the one double tree e6-rounded. One cohort
    * semi-join + one bounded distinct-user-per-age aggregation. */
  def qRetentionDecay(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val d0 = ev.agg(min(col("day")).as("day0"))
    val withAge = ev.crossJoin(broadcast(d0))
    val coh = withAge.filter(col("day") === col("day0"))
      .select(col("user_id")).distinct()
      .localCheckpoint(true)
    val nc = coh.count()
    val pts = withAge
      .join(coh, Seq("user_id"), "left_semi")
      .select(datediff(col("day"), col("day0")).cast("long").as("age"),
        col("user_id"))
      .groupBy(col("age"))
      .agg(count_distinct(col("user_id")).as("a"))
      .filter(col("a") > 0L)
      .select(col("age").as("x"),
        expr(s"CAST(round(ln(CAST(a AS DOUBLE) / ${nc}L) * 1000000)" +
          " AS BIGINT)").as("y"))
    pts.groupBy()
      .agg(count(lit(1)).as("k"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("k").as("n_ages"), lit(nc).as("cohort_n"),
        // y is already e6-scaled and x is the natural age, so the
        // ratio IS the e6 slope — no further scaling.
        expr("CASE WHEN k * sxx - sx * sx <> 0 THEN" +
          " CAST(round(CAST(k * sxy - sx * sy AS DOUBLE)" +
          " / (k * sxx - sx * sx)) AS BIGINT) END")
          .as("decay_e6"),
        expr("CASE WHEN k * sxx - sx * sx <> 0 THEN" +
          " CAST(round((CAST(sy AS DOUBLE)" +
          " - CAST(k * sxy - sx * sy AS DOUBLE) / (k * sxx - sx * sx)" +
          " * sx) / k) AS BIGINT) END").as("intercept_e6"))
  }

  /** Forecast-skill backtest over the daily series — the one-step
    * MAE of the three classical baselines every fancier model must
    * beat (naive x_{t−1}, seasonal-naive x_{t−7}, drift
    * x_{t−1} + (x_{t−1}−x_1)/(t−2)): the [[qHoltWinters]] family's
    * honesty check, per event type. Naive/seasonal errors are exact
    * integers; the drift forecast's one division is e6-rounded PER
    * ROW on the bounded day grid before the exact integer error
    * sums; MAEs are integer floor divisions (e2). Lag windows over
    * the calendar-bounded per-type grid only. */
  def qForecastSkill(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("x"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val e = d
      .withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("x1", lag(col("x"), 1).over(w))
      .withColumn("x7", lag(col("x"), 7).over(w))
      .withColumn("xf", first(col("x")).over(w))
      .withColumn("e_naive", abs(col("x") - col("x1")))
      .withColumn("e_snaive", abs(col("x") - col("x7")))
      .withColumn("e_drift", when(col("rk") >= 3L,
        abs(col("x") * 1000000L - (col("x1") * 1000000L +
          round((col("x1") - col("xf")).cast("double") * 1000000.0 /
            (col("rk").cast("double") - 2.0)).cast("long")))))
    e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        count(col("e_naive")).as("n_naive"),
        sum(col("e_naive")).as("s_naive"),
        count(col("e_snaive")).as("n_snaive"),
        sum(col("e_snaive")).as("s_snaive"),
        count(col("e_drift")).as("n_drift"),
        sum(col("e_drift")).as("s_drift"))
      .select(col("event_type"), col("n_days"),
        expr("s_naive * 100 div n_naive").as("mae_naive_e2"),
        expr("s_snaive * 100 div n_snaive").as("mae_snaive_e2"),
        expr("s_drift div (n_drift * 10000)").as("mae_drift_e2"))
      .orderBy(col("event_type"))
  }

  /** Rolling 7-day Pearson correlation between the view and purchase
    * daily series — "are these metrics moving together this week?",
    * the windowed sibling of [[qStats]]' global correlation. Exact
    * integer sufficient statistics from one ±3-day ROWS window over
    * the calendar-bounded joined day grid; r is the one double tree
    * e4-rounded per row, windows with zero variance on either side
    * guard to NULL. */
  def qRollingCorr(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(to_date(col("ts")).as("day"), col("event_type"))
      .groupBy(col("day"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
        .as("xv"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("xp"))
    val w = Window.orderBy(col("day")).rowsBetween(-3, 3)
    val s = d
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("xv")).over(w))
      .withColumn("sy", sum(col("xp")).over(w))
      .withColumn("sxy", sum(col("xv") * col("xp")).over(w))
      .withColumn("sxx", sum(col("xv") * col("xv")).over(w))
      .withColumn("syy", sum(col("xp") * col("xp")).over(w))
    s.select(col("day"), col("n").as("n_win"),
      when(col("n") * col("sxx") - col("sx") * col("sx") > 0L &&
          col("n") * col("syy") - col("sy") * col("sy") > 0L,
        round(((col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
            .cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy"))
              .cast("double")))) * 1e4).cast("long"))
        .as("r_e4"))
      .orderBy(col("day"))
  }

  /** Sample-ratio-mismatch guardrail — the FIRST check of any A/B
    * readout ([[qCuped]]/[[qAbLift]] are meaningless if assignment
    * itself is broken): χ² (1 df) of the observed arm split against
    * the designed 50/50, χ² = (n_a − n_b)²/(n_a + n_b) — exact
    * integer numerator, one double division e4-rounded, and the
    * verdict at the 0.05 critical value 3.8415 stated as the exact
    * integer cross-multiplication (n_a−n_b)²·10⁵ > 384150·(n_a+n_b)
    * (no float in the flag). One distinct-user aggregation. */
  def qSrm(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .select(col("user_id")).distinct()
      .select(pmod(col("user_id"), lit(2L)).as("arm"))
      .groupBy()
      .agg(sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n_b"))
      .select(col("n_a"), col("n_b"),
        expr("CASE WHEN n_a + n_b > 0 THEN" +
          " CAST(round(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)" +
          " / (n_a + n_b) * 10000) AS BIGINT) END").as("chi2_e4"),
        expr("CAST(CASE WHEN (n_a - n_b) * (n_a - n_b) * 100000" +
          " > 384150 * (n_a + n_b) THEN 1 ELSE 0 END AS BIGINT)")
          .as("srm_flag"))
  }

  /** Day-of-week seasonality strength per event type — η² (variance
    * explained by weekday) of the daily count series: the diagnostic
    * read before reaching for [[qHoltWinters]]' seasonal model
    * (η² ≈ 0 ⇒ plain Holt suffices). Same exact sufficient-statistic
    * shape as [[qAnova]] with weekday groups: per-(type, dow) s²·1e6
    * floor-divided BEFORE the cross-group fold (order-free
    * reduction), squares on DECIMAL(38); η² = SSB/SST is the one
    * double tree e6-rounded, zero total variance guards to NULL.
    * Weekday = Spark `weekday` ≡ DuckDB isodow−1 (both 0=Monday). */
  def qSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val d = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("x"))
    val g = d
      .withColumn("dow", weekday(col("day")).cast("long"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum((col("x") * col("x")).cast(d38)).as("ss"))
      .withColumn("sbq", expr(s"CAST(s AS $d38) * s * 1000000 div n"))
    g.groupBy(col("event_type"))
      .agg(count(lit(1)).as("k"), sum(col("n")).as("n"),
        sum(col("s")).as("s"), sum(col("ss")).as("ss"),
        sum(col("sbq")).as("sbq"))
      .select(col("event_type"), col("n").as("n_days"),
        col("k").as("n_dows"),
        expr("CASE WHEN CAST(ss AS DOUBLE)" +
          " - CAST(s AS DOUBLE) * s / n > 0.0 THEN" +
          " CAST(round((CAST(sbq AS DOUBLE) / 1000000" +
          " - CAST(s AS DOUBLE) * s / n)" +
          " / (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)" +
          " * 1000000) AS BIGINT) END").as("eta2_e6"))
      .orderBy(col("event_type"))
  }

  /** One-way ANOVA F statistic across event types over daily counts
    * — "do the types differ in level at all?", the omnibus test run
    * before any per-pair [[qMannWhitney]]. Exact integer sufficient
    * statistics per group (n, Σx, Σx² — the squares on DECIMAL(38),
    * the qStats overflow rule); the between-group sum Σs²/n and the
    * F ratio are the one double tree stated identically, e4-rounded.
    * One map-side-combinable day fold + a k-row group agg + a 1-row
    * fold — nothing scales past the (type, day) grid. */
  def qAnova(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val d = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("x"))
    val g = d.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum((col("x") * col("x")).cast(d38)).as("ss"))
      // Per-group s²/n floored at e6 BEFORE the cross-group fold: a
      // double Σ over groups would depend on accumulation order (the
      // bit-stable rule); integer terms make the reduction exact.
      .withColumn("sbq",
        expr(s"CAST(s AS $d38) * s * 1000000 div n"))
    g.groupBy()
      .agg(count(lit(1)).as("k"), sum(col("n")).as("n"),
        sum(col("s")).as("s"), sum(col("ss")).as("ss"),
        sum(col("sbq")).as("sbq"))
      .select(col("k"), col("n"),
        expr("CAST(round((CAST(sbq AS DOUBLE) / 1000000" +
          " - CAST(s AS DOUBLE) * s / n) / (k - 1)" +
          " * 10000) AS BIGINT)").as("msb_e4"),
        expr("CAST(round((CAST(ss AS DOUBLE)" +
          " - CAST(sbq AS DOUBLE) / 1000000) / (n - k) * 10000)" +
          " AS BIGINT)").as("msw_e4"),
        expr("CASE WHEN CAST(ss AS DOUBLE)" +
          " - CAST(sbq AS DOUBLE) / 1000000 > 0.0 THEN" +
          " CAST(round(((CAST(sbq AS DOUBLE) / 1000000" +
          " - CAST(s AS DOUBLE) * s / n) / (k - 1))" +
          " / ((CAST(ss AS DOUBLE) - CAST(sbq AS DOUBLE) / 1000000)" +
          " / (n - k)) * 10000) AS BIGINT)" +
          " END").as("f_e4"))
  }

  /** CUPED variance-reduced A/B read-out — the experimentation
    * counterpart of [[qAbLift]]: user spend in the second half of
    * the window, adjusted by the same user's FIRST-half spend
    * (θ = cov(pre, post)/var(pre), pooled across arms — the
    * covariate is pre-assignment so the adjustment is unbiased).
    * Split day = min day + 15 (the qTrend anchor pattern —
    * deterministic given the data, stated identically in the
    * oracle); arms by user_id parity. Everything up to θ is exact
    * integer cents via DECIMAL(38) sufficient statistics (Σpre²
    * overflows BIGINT at catalog scale); θ and the adjusted means
    * are the one double tree, e6/e2-rounded; zero pre-variance
    * guards to NULL. One user-grain aggregation + a 2-row fold. */
  def qCuped(spark: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        round(col("value") * 100).cast("long").as("cents"))
    val anchor = ev.agg(date_add(min(col("day")), 15).as("split"))
    val u = ev.crossJoin(broadcast(anchor))
      .groupBy(col("user_id"))
      .agg(sum(when(col("day") < col("split"), col("cents")).otherwise(0L))
        .as("pre"),
        sum(when(col("day") >= col("split"), col("cents")).otherwise(0L))
          .as("post"))
      .select(pmod(col("user_id"), lit(2L)).as("arm"), col("pre"),
        col("post"))
    val arms = u.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("pre")).as("sp"),
        sum(col("post")).as("so"),
        sum((col("pre") * col("pre")).cast(d38)).as("spp"),
        sum((col("pre") * col("post")).cast(d38)).as("spo"))
      .localCheckpoint(true)
    val pooled = arms.groupBy()
      .agg(sum(col("n")).as("n"), sum(col("sp")).cast(d38).as("sp"),
        sum(col("so")).cast(d38).as("so"), sum(col("spp")).as("spp"),
        sum(col("spo")).as("spo"))
    def dbl(c: Column) = c.cast("double")
    val varP = dbl(col("g_n")) * dbl(col("g_spp")) -
      dbl(col("g_sp")) * dbl(col("g_sp"))
    val theta = (dbl(col("g_n")) * dbl(col("g_spo")) -
      dbl(col("g_sp")) * dbl(col("g_so"))) / varP
    val adj = dbl(col("so")) / dbl(col("n")) -
      theta * (dbl(col("sp")) / dbl(col("n")) -
        dbl(col("g_sp")) / dbl(col("g_n")))
    arms.crossJoin(broadcast(pooled.select(col("n").as("g_n"),
        col("sp").as("g_sp"), col("so").as("g_so"), col("spp").as("g_spp"),
        col("spo").as("g_spo"))))
      .select(col("arm"), col("n"),
        expr("sp div n").as("mean_pre_c"),
        expr("so div n").as("mean_post_c"),
        when(varP > 0.0, round(theta * 1e6).cast("long")).as("theta_e6"),
        when(varP > 0.0, round(adj).cast("long")).as("adj_mean_c"))
      .orderBy(col("arm"))
  }

  /** Difference-in-differences readout over the [[qCuped]] design
    * (round 15): per-user spend split at the same day-15 anchor into
    * pre/post, arms by user parity — DiD = (post̄₁ − prē₁) −
    * (post̄₀ − prē₀) nets out both the arm-level baseline and the
    * common time shock, the quasi-experimental workhorse next to
    * q_cuped's variance reduction and q_ab_lift's z. Per-cell sums
    * and user counts are exact integers (cents quantized per event,
    * the §6 float rule); the DiD itself is the ONE double, computed
    * through a single expression tree from those exact integers
    * and e2-rounded (cents): sums of cents stay far below 2^53, so
    * the doubles are exact and the tree identical across engines.
    * One shuffle to (user, pre, post), one 2-row arm fold. */
  def qDiffInDiff(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        round(col("value") * 100).cast("long").as("cents"))
    val anchor = ev.agg(date_add(min(col("day")), 15).as("split"))
    val u = ev.crossJoin(broadcast(anchor))
      .groupBy(col("user_id"))
      .agg(sum(when(col("day") < col("split"), col("cents")).otherwise(0L))
        .as("pre"),
        sum(when(col("day") >= col("split"), col("cents")).otherwise(0L))
          .as("post"))
      .select(pmod(col("user_id"), lit(2L)).as("arm"), col("pre"),
        col("post"))
    u.groupBy()
      .agg(
        sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n0"),
        sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 0L, col("pre")).otherwise(0L)).as("pre0_c"),
        sum(when(col("arm") === 0L, col("post")).otherwise(0L)).as("post0_c"),
        sum(when(col("arm") === 1L, col("pre")).otherwise(0L)).as("pre1_c"),
        sum(when(col("arm") === 1L, col("post")).otherwise(0L)).as("post1_c"))
      .select(col("n0"), col("n1"), col("pre0_c"), col("post0_c"),
        col("pre1_c"), col("post1_c"),
        when(col("n0") > 0L && col("n1") > 0L, expr(
          "CAST(round(((CAST(post1_c AS DOUBLE) - pre1_c) / n1" +
            " - (CAST(post0_c AS DOUBLE) - pre0_c) / n0) * 100) AS BIGINT)"))
          .as("did_e2"))
  }

  /** Bollinger-band breach monitor (round 15) — the rolling
    * mean ± 2σ control chart over the per-(type, day) count series,
    * the dashboard companion of [[qCusum]]/[[qMadOutliers]], made
    * FLOAT-FREE by clearing denominators: over the trailing 7-day
    * ROWS window with integer sums s1 = Σy, s2 = Σy², the breach
    * test y ≷ s1/7 ± 2σ with 49σ² = 7·s2 − s1² is exactly
    * t² > 4·(7·s2 − s1²) for t = 7y − s1 — every quantity an exact
    * integer, no square root, no division, reduction-order-free
    * (the e_silhouette endpoint of the §6 float rule). Warmup rows
    * (fewer than 7 days of history) are excluded, so every emitted
    * row tests a full window. One window per type over the bounded
    * (type, day) grid; t² at 100 TB is (7·count)² — BIGINT-safe to
    * ~4e8 events/day/type, the qGini promotion point past that. */
  def qBollinger(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("y"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-6, 0)
    val wn = Window.partitionBy(col("event_type")).orderBy(col("day"))
    d.withColumn("s1", sum(col("y")).over(w))
      .withColumn("s2", sum(col("y") * col("y")).over(w))
      .withColumn("rn", row_number().over(wn))
      .filter(col("rn") >= 7)
      .select(col("event_type"), col("day"), col("y"),
        col("s1").as("win_sum"),
        (lit(7L) * col("y") - col("s1")).as("dev7"),
        when((lit(7L) * col("y") - col("s1")) *
            (lit(7L) * col("y") - col("s1")) >
            lit(4L) * (lit(7L) * col("s2") - col("s1") * col("s1")),
          when(col("y") * 7L > col("s1"), 1L).otherwise(-1L))
          .otherwise(0L).as("breach"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Winsorized mean per event type (round 15) — the robust-mean
    * companion of [[qMadOutliers]]: clamp each observation to the
    * exact discrete [p10, p90] values (ordered selection at rank
    * ⌈p·n/100⌉, the q_percentile_select convention — ties collapse
    * to the same VALUE under any tie order) and average the clamped
    * integers. Everything stays in exact cents: the clamp is
    * integer, the sum is integer, the mean is one truncating div
    * stated identically in the oracle. One rank window per type
    * (groups spread across the shuffle) + a broadcast threshold
    * join back — the q_group_percentile scale shape. */
  def qWinsorize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("cents"))
    val ranked = ev
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .localCheckpoint(true)
    def cut(p: Int, as: String) = ranked
      .filter(col("rk") === greatest(lit(1L),
        ceil(lit(p / 100.0) * col("n")).cast("long")))
      .groupBy(col("event_type")).agg(max(col("cents")).as(as))
    val cuts = cut(10, "lo_c").join(cut(90, "hi_c"), Seq("event_type"))
    ranked.join(broadcast(cuts), Seq("event_type"))
      .select(col("event_type"), col("n"),
        greatest(col("lo_c"), least(col("hi_c"), col("cents"))).as("wc"),
        col("lo_c"), col("hi_c"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"), max(col("lo_c")).as("lo_c"),
        max(col("hi_c")).as("hi_c"), sum(col("wc")).as("wsum_c"))
      .select(col("event_type"), col("n"), col("lo_c"), col("hi_c"),
        expr("wsum_c div n").as("wmean_c"))
      .orderBy(col("event_type"))
  }

  /** TPC-H Q7 shape (round 16) — bi-directional shipping volume
    * between a nation pair by ship year. The fact join chain keeps
    * lineitem→orders as the single big shuffle; supplier, customer
    * and both nation legs broadcast (dimension tables stay dimension
    * tables at 100 TB). The disjunctive pair predicate lands on the
    * broadcast nation names BEFORE the fact join, so non-pair rows
    * die at the earliest semi-joined dimension, and the year filter
    * pushes to the parquet scan. Money per the suite rule:
    * round(sum, 2). */
  def q7Volume(spark: SparkSession, dir: String): DataFrame = {
    val pair = Seq("NATION_1", "NATION_2")
    val sn = Tables.nation(spark, dir)
      .filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val cn = Tables.nation(spark, dir)
      .filter(col("n_name").isin(pair: _*))
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    val supp = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(sn), col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(cn), col("c_nationkey") === col("cn_key"))
      .select(col("c_custkey"), col("cust_nation"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    // Raw timestamp bounds, not year(l_shipdate) BETWEEN: a function
    // over the column can't reach the parquet scan, the range
    // predicate pushes as PushedFilters (≡ year ∈ [1996, 1999]).
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("2000-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).as("l_year"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"))
    li.join(Joins.maybeBroadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Joins.maybeBroadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(round(sum(col("volume")), 2).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q8 shape (round 16) — target nation's market share of a
    * part-type market in a customer region, by order year. The share
    * is an EXACT integer ratio (§6 emitted-type rule): per-row volume
    * in cents × (100 − discount%) stays integral, both sums ride
    * DECIMAL(38,0) against the qGini overflow point, and the emitted
    * `mkt_share_e6` is one truncating div stated identically in the
    * oracle. part, customer-region and supplier-nation legs all
    * broadcast; the one shuffle is lineitem→orders. */
  def q8MktShare(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables.part(spark, dir)
      .filter(col("p_type") === lit("PROMO"))
      .select(col("p_partkey"))
    val asiaNations = Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)
          .filter(col("r_name") === lit("ASIA"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val cust = Tables.customer(spark, dir)
      .join(broadcast(asiaNations), col("c_nationkey") === col("cn_key"))
      .select(col("c_custkey"))
    val suppNation = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
          .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).as("o_year"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .cast("decimal(38,0)").as("vol"))
      .join(Joins.maybeBroadcast(pt), col("l_partkey") === col("p_partkey"))
      .join(Joins.maybeBroadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Joins.maybeBroadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_year"))
      .agg(
        sum(when(col("supp_nation") === lit("NATION_5"), col("vol"))
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("nvol"),
        sum(col("vol")).as("tvol"))
      .select(col("o_year"),
        // tvol = 0 cannot happen for an emitted group here (every
        // group has ≥1 lineitem with price ≥ 1 cent) but the guard
        // keeps engine parity on degenerate corpora (ADVICE r16).
        expr("CAST(CASE WHEN tvol = 0 THEN NULL " +
          "ELSE (1000000 * nvol) div tvol END AS BIGINT)").as("mkt_share_e6"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q10 shape (round 16) — top-20 customers by revenue lost
    * to returned items. Returned lineitems aggregate per customer
    * (ONE shuffle on o_custkey after the fact-fact join; nation
    * broadcasts onto the 20-row readout side), and the top-20 rides
    * the rounded money under the unique (revenue DESC, c_custkey)
    * order so the limit is deterministic — Catalyst turns the
    * orderBy+limit into a TakeOrdered, never a full sort. */
  def q10Returns(spark: SparkSession, dir: String): DataFrame = {
    val ret = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === lit("R"))
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"))
    val ord = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
    val perCust = ret.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(round(sum(col("volume")), 2).as("revenue"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))
    val nat = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"))
    perCust.join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"),
        round(col("c_acctbal"), 2).as("acctbal"), col("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** XYZ demand-variability classification (round 16) — [[qAbc]]'s
    * textbook companion (ABC ranks by value, XYZ by forecastability;
    * planners cross them): per part, the coefficient of variation of
    * MONTHLY demand over the full month spine (zero months count —
    * n is the GLOBAL spine size, attached as one broadcast scalar,
    * so a part sold once isn't "perfectly stable"). Float-free
    * classes by cross-multiplied integer comparisons on
    * CV² = (n·Σq² − S²)/S²: X (CV < 0.5 ⇔ 4·(nΣq²−S²) < S²),
    * Y (CV < 1), Z otherwise; ledgers ride DECIMAL(38,0) (n·Σq²
    * passes BIGINT when per-part S nears 1e9 — the qGini rule) and
    * the emitted cv2_e6 is one truncating div both sides. One
    * map-side-combined (part, month) collapse, one per-part fold. */
  def qXyz(spark: SparkSession, dir: String): DataFrame = {
    val pm = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), date_trunc("month", col("l_shipdate")).as("mo"),
        round(col("l_quantity")).cast("long").as("q"))
      .groupBy(col("l_partkey"), col("mo"))
      .agg(sum(col("q")).cast("decimal(38,0)").as("mq"))
    val spine = pm.agg(count_distinct(col("mo")).cast("decimal(38,0)").as("n"))
    pm.groupBy(col("l_partkey"))
      .agg(sum(col("mq")).as("s"), sum(col("mq") * col("mq")).as("s2"))
      .crossJoin(broadcast(spine))
      .select(col("l_partkey"),
        expr("CAST(n AS BIGINT)").as("n_months"),
        expr("CAST(s AS BIGINT)").as("total_qty"),
        // s = 0 (a part whose rounded quantities all vanish) zeroes
        // the s² denominator: NULL on both engine sides (ADVICE r16).
        expr("""CAST(CASE WHEN s = 0 THEN NULL
          ELSE (1000000 * (n * s2 - s * s)) div (s * s) END AS BIGINT)""")
          .as("cv2_e6"),
        expr("""CASE WHEN 4 * (n * s2 - s * s) < s * s THEN 'X'
          WHEN n * s2 - s * s < s * s THEN 'Y'
          ELSE 'Z' END""").as("cls"))
      .orderBy(col("l_partkey"))
  }

  /** Inter-order gap profile per market segment (round 16) — the
    * repurchase-cycle readout behind replenishment/churn models
    * (q_survival measures time-to-churn; this measures the rhythm
    * while alive): per customer, day gaps between consecutive orders
    * under the unique (day, orderkey) lag order, then per segment
    * the exact lower-median gap (ordered selection at rank
    * ⌈n/2⌉ — gap ties collapse to the same VALUE under any tie
    * order) and the truncating e4 mean. One lag window per customer
    * (groups spread across the shuffle), one rank window per segment
    * over the already-collapsed gap rows. */
  def qOrderGap(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"), col("o_orderkey"))
    val gaps = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("day"))
      .withColumn("gap",
        datediff(col("day"), lag(col("day"), 1).over(w)).cast("long"))
      .filter(col("gap").isNotNull)
      .join(Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_custkey"), col("o_orderkey"), col("gap"))
      .localCheckpoint(true)
    val agg = gaps.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("gap")).as("gsum"))
      .select(col("c_mktsegment"), col("n_gaps"),
        expr("(gsum * 10000) div n_gaps").as("mean_gap_e4"))
    val rw = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("gap"), col("o_custkey"), col("o_orderkey"))
    val med = gaps.withColumn("rk", row_number().over(rw))
      .join(agg.select(col("c_mktsegment"), col("n_gaps")), Seq("c_mktsegment"))
      .filter(col("rk").cast("long") === expr("(n_gaps + 1) div 2"))
      .groupBy(col("c_mktsegment")).agg(max(col("gap")).as("median_gap"))
    agg.join(med, Seq("c_mktsegment")).orderBy(col("c_mktsegment"))
  }

  /** TPC-H Q13 shape (round 16) — customer order-count distribution
    * INCLUDING zero-order customers: the filter lives in the LEFT
    * join's ON clause (a WHERE would silently drop the zero-order
    * row — the classic Q13 trap), orders carry the non-urgent
    * predicate down to their scan, and the two aggregations are both
    * map-side combinable (per-customer count, then the bounded
    * count-of-counts histogram). Unique (custdist DESC, c_count
    * DESC) order. */
  def q13CustDist(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") =!= lit("1-URGENT"))
      .select(col("o_orderkey"), col("o_custkey"))
    Tables.customer(spark, dir).select(col("c_custkey"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q14 shape (round 16) — promo-part revenue share by ship
    * month over one year: the year lands on the scan as a raw
    * timestamp range, part broadcasts, and the share is an EXACT
    * integer ratio (cents × (100−disc%), DECIMAL(38,0) ledgers, one
    * truncating div — the q8_mktshare §6 discipline). */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables.part(spark, dir)
      .select(col("p_partkey"), (col("p_type") === lit("PROMO")).as("is_promo"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_partkey"), month(col("l_shipdate")).as("l_month"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .cast("decimal(38,0)").as("vol"))
      .join(Joins.maybeBroadcast(pt), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_month"))
      .agg(
        sum(when(col("is_promo"), col("vol"))
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("pvol"),
        sum(col("vol")).as("tvol"))
      .select(col("l_month"),
        expr("CAST(CASE WHEN tvol = 0 THEN NULL " +
          "ELSE (1000000 * pvol) div tvol END AS BIGINT)").as("promo_share_e6"))
      .orderBy(col("l_month"))
  }

  /** TPC-H Q18 shape (round 16) — large-volume orders: the HAVING
    * over per-order quantity runs FIRST on lineitem alone (one
    * map-side-combined aggregate), then joins into orders ⋈
    * customer — the join never sees non-qualifying orders. The
    * survivor set is ~1% of orders, so it is NOT broadcast-hinted:
    * Catalyst/AQE broadcasts it at bench scale and falls back to a
    * shuffled join at 100 TB where 1% of orders no longer fits.
    * Quantities are exact integers (qty is integral in this corpus);
    * unique (sum_qty DESC, o_orderkey) order. */
  def q18BigOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(round(sum(col("l_quantity"))).cast("long").as("sum_qty"))
      .filter(col("sum_qty") > 300L)
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("totalprice"))
    ord.join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("totalprice"), col("sum_qty"))
      .orderBy(col("sum_qty").desc, col("o_orderkey"))
  }

  /** TPC-H Q19 shape (round 16) — disjunctive brand × quantity-band
    * revenue: the OR spans both tables, so the DERIVABLE conjuncts
    * are stated explicitly the way Q19 executors rewrite it — brand
    * ∈ {1,2,3} prunes the broadcast part scan, qty ∈ [1, 30] pushes
    * to the lineitem scan — and the residual disjunction filters the
    * joined stream. One scalar money row under the §6 round rule. */
  def q19DiscRevenue(spark: SparkSession, dir: String): DataFrame = {
    val brands = Seq("Brand#1", "Brand#2", "Brand#3")
    val pt = Tables.part(spark, dir)
      .filter(col("p_brand").isin(brands: _*))
      .select(col("p_partkey"), col("p_brand"))
    Tables.lineitem(spark, dir)
      .filter(col("l_quantity").between(1.0, 30.0))
      .select(col("l_partkey"), col("l_quantity"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"))
      .join(Joins.maybeBroadcast(pt), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === lit("Brand#1") && col("l_quantity").between(1.0, 11.0)) ||
        (col("p_brand") === lit("Brand#2") && col("l_quantity").between(10.0, 20.0)) ||
        (col("p_brand") === lit("Brand#3") && col("l_quantity").between(20.0, 30.0)))
      .agg(round(sum(col("volume")), 2).as("revenue"))
  }

  /** Spearman rank correlation (round 16) — does a customer's
    * account balance predict their total spend, per market segment?
    * Tie-corrected via AVERAGE ranks kept integral at ×2 scale
    * (r2 = 2·min_rank + ties − 1), so every moment sum is exact;
    * sums ride DECIMAL(38,0) (n·Σr² grows past BIGINT near n≈2M —
    * the qGini promotion rule) and the emitted `rho_e6` is one
    * identical-tree double (num/√d1/√d2, exact integer inputs cast
    * to DOUBLE the same way both sides). Zero-order customers count
    * with spend 0 (left join + coalesce) so the population is
    * deterministic. Rank windows spread per segment; no pair join —
    * O(n log n), the at-scale Spearman shape. */
  def qSpearman(spark: SparkSession, dir: String): DataFrame = {
    val spend = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("spend_c"))
    val base = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        round(col("c_acctbal") * 100).cast("long").as("bal_c"))
      .join(spend, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_mktsegment"), col("bal_c"),
        coalesce(col("spend_c"), lit(0L)).as("spend_c"))
    // min-rank as 1 + count of strictly-smaller values via a RANGE
    // frame: count() is LongType, unlike rank() whose IntegerType
    // silently wraps past ~2.1B rows per segment (round-16 ADVICE) —
    // identical values and no per-segment row bound.
    def r2(v: String) = {
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col(v))
        .rangeBetween(Window.unboundedPreceding, -1)
      val tw = Window.partitionBy(col("c_mktsegment"), col(v))
      (lit(2L) * (count(lit(1)).over(w) + lit(1L)) +
        count(lit(1)).over(tw) - lit(1L))
    }
    base
      .withColumn("rx", r2("bal_c"))
      .withColumn("ry", r2("spend_c"))
      .select(col("c_mktsegment"),
        col("rx").cast("decimal(38,0)").as("rx"),
        col("ry").cast("decimal(38,0)").as("ry"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
        sum(col("rx") * col("rx")).as("sxx"),
        sum(col("ry") * col("ry")).as("syy"),
        sum(col("rx") * col("ry")).as("sxy"))
      .select(col("c_mktsegment"), col("n").cast("long").as("n"),
        expr("""CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
          THEN CAST(round(CAST(n * sxy - sx * sy AS DOUBLE)
            / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            / sqrt(CAST(n * syy - sy * sy AS DOUBLE)) * 1000000) AS BIGINT)
          END""").as("rho_e6"))
      .orderBy(col("c_mktsegment"))
  }

  /** Kendall tau-b (round 16) — rank concordance between daily event
    * VOLUME and daily total VALUE per event type, with full tie
    * correction: C−D = Σ sgn(nᵢ−nⱼ)·sgn(vᵢ−vⱼ) over day pairs, the
    * denominator √((n₀−tx)(n₀−ty)) from per-value tie histograms.
    * The pair join rides the calendar-bounded day spine (the
    * qMannKendall/qTheilSen scale argument: days grow with TIME, not
    * data volume — 100 TB of events is still ≤ a few thousand spine
    * rows per type), everything below the final `tau_e6` is exact
    * integer, and the readout is the identical-tree double form. */
  def qKendallTau(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("nv"), sum(col("cents")).as("vv"))
      .localCheckpoint(true)
    val pairs = d.toDF("event_type", "di", "ni", "vi")
      .join(d.toDF("event_type", "dj", "nj", "vj"), Seq("event_type"))
      .filter(col("di") < col("dj"))
      .select(col("event_type"),
        (signum(col("nj") - col("ni")).cast("long") *
          signum(col("vj") - col("vi")).cast("long")).as("cd"))
      .groupBy(col("event_type"))
      .agg(sum(col("cd")).as("c_minus_d"))
    // Tie ledgers stay DOUBLED (Σ t(t−1), never /2 on a Column —
    // Long `/` is double division): n₀−t = (n(n−1) − Σt(t−1)) div 2.
    def tieTerm(v: String, as: String) = d
      .groupBy(col("event_type"), col(v)).agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"))
      .agg(sum(col("t")).as(s"n_$as"),
        sum(col("t") * (col("t") - lit(1L))).as(s"t2_$as"))
    pairs
      .join(tieTerm("nv", "x"), Seq("event_type"))
      .join(tieTerm("vv", "y").drop("n_y"), Seq("event_type"))
      .select(col("event_type"), col("n_x").as("n_days"), col("c_minus_d"),
        expr("""CASE WHEN (n_x * (n_x - 1) - t2_x) div 2 > 0
            AND (n_x * (n_x - 1) - t2_y) div 2 > 0
          THEN CAST(round(CAST(c_minus_d AS DOUBLE)
            / sqrt(CAST((n_x * (n_x - 1) - t2_x) div 2 AS DOUBLE))
            / sqrt(CAST((n_x * (n_x - 1) - t2_y) div 2 AS DOUBLE))
            * 1000000) AS BIGINT) END""").as("tau_e6"))
      .orderBy(col("event_type"))
  }

  /** TPC-H Q17 shape (round 17) — the scalar-subquery-per-group
    * classic: revenue lost to small-quantity orders, where "small"
    * means `l_quantity < 0.2 * avg(l_quantity) over the SAME part`.
    * The correlation decorrelates into one per-part (Σqty, count)
    * aggregate (map-side combined on the scan) joined back to
    * lineitem on the key both sides already shuffle on; the 0.2·avg
    * comparison clears denominators into the exact-integer
    * cross-multiply `5·qty·cnt < Σqty` (quantities are integral in
    * this corpus), so NO float avg is materialized — a per-row
    * correlated subquery never executes. The brand/size filter
    * prunes via the broadcast part dim; the readout is one scalar
    * row under the §6 round(money, 2) rule. */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame = {
    val pa = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), round(col("l_quantity")).cast("long").as("q"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("cq"))
    val pt = Tables.part(spark, dir)
      .filter(col("p_brand") === lit("Brand#3") && col("p_size") < 15)
      .select(col("p_partkey"))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), round(col("l_quantity")).cast("long").as("q"),
        col("l_extendedprice"))
      .join(Joins.maybeBroadcast(pt), col("l_partkey") === col("p_partkey"))
      .join(pa, Seq("l_partkey"))
      .filter(col("q") * lit(5L) * col("cq") < col("sq"))
      .agg(count(lit(1)).as("n_small"),
        round(sum(col("l_extendedprice")) / lit(7.0), 2).as("avg_yearly"))
  }

  /** TPC-H Q21 shape (round 17) — the multi-EXISTS/NOT-EXISTS
    * anti-join classic, restated over this corpus's columns:
    * suppliers whose lineitem is the ONLY returned item in a
    * multi-supplier order (EXISTS another supplier in the order;
    * NOT EXISTS another supplier with a returned row). Both
    * correlated quantifiers decorrelate into ONE per-order
    * aggregate — ns = distinct suppliers, rs = distinct suppliers
    * with flag 'R' — joined to the R rows on the orderkey they
    * already shuffle on: EXISTS ⇔ ns ≥ 2, NOT-EXISTS ⇔ rs = 1
    * (the row's own supplier accounts for the one). No per-row
    * subquery, no second pass over lineitem per quantifier. Top-25
    * rides the unique (numwait DESC, s_suppkey) order →
    * TakeOrdered. */
  def q21Waiting(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
    val ord = li.groupBy(col("l_orderkey"))
      .agg(count_distinct(col("l_suppkey")).as("ns"),
        count_distinct(when(col("l_returnflag") === lit("R"),
          col("l_suppkey"))).as("rs"))
    val sup = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_name"))
    li.filter(col("l_returnflag") === lit("R"))
      .join(ord, Seq("l_orderkey"))
      .filter(col("ns") >= 2L && col("rs") === 1L)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(Joins.maybeBroadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(25)
  }

  /** TPC-H Q22 shape (round 17) — NOT EXISTS + global-scalar-filter:
    * well-funded idle customers. "Idle" is time-windowed (no order
    * since 1999 — in this corpus every customer has SOME order, so
    * the textbook unconditional NOT EXISTS would be vacuously
    * empty); the quantifier decorrelates into a left-anti join
    * against the date-pruned orders scan (the filter pushes to the
    * scan, so the anti side is a fraction of orders). The scalar
    * subquery (global avg positive balance) is a one-row aggregate
    * broadcast by the cross join — computed once, never per row —
    * and the avg COMPARISON clears the denominator into the exact
    * integer cross-multiply bal_cents·n_pos > sum_pos_cents on
    * DECIMAL(38,0)/HUGEINT ledgers (ADVICE r17: a float avg's
    * reduction order differs between engines and across runs, so a
    * balance within an ulp of it could flip membership — the same
    * q11/q17/q20 discipline, no float share anywhere). Grouped by
    * market segment (this corpus's stand-in for Q22's phone country
    * code); §6 rounded money (same-sign fold). */
  def q22IdleCust(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
    val avgbal = cust.filter(col("bal_cents") > 0L)
      .agg(count(lit(1)).cast("decimal(38,0)").as("n_pos"),
        sum(col("bal_cents")).cast("decimal(38,0)").as("sum_pos_cents"))
    val recent = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(avgbal))
      .filter(col("bal_cents").cast("decimal(38,0)") * col("n_pos")
        > col("sum_pos_cents"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"),
        round(sum(col("c_acctbal")), 2).as("totacctbal"))
      .orderBy(col("c_mktsegment"))
  }

  /** TPC-H Q15 shape (round 17) — argmax-over-join: the top
    * supplier(s) by quarterly revenue. The revenue "view" is one
    * map-side-combined aggregate over the date-pruned lineitem scan
    * (exact integer cents×(100−disc%) ledgers — ties compare
    * exactly, where a float revenue could split a true tie across
    * engines); the correlated `= (SELECT max(...))` decorrelates
    * into a one-row max broadcast by the cross join. Emits ALL
    * maximal suppliers (Q15 semantics) — deterministic without a
    * tie-break because equality against the max is order-free. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .select(col("l_suppkey"),
        (round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
          .as("v"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("v")).as("total_rev"))
      .localCheckpoint(true) // scanned twice: max + filter
    val mx = rev.agg(max(col("total_rev")).as("mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_rev") === col("mx"))
      .join(Joins.maybeBroadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q4 shape (round 17) — order-priority distribution of
    * orders with at least one returned lineitem (this corpus's
    * stand-in for Q4's late-delivery EXISTS — no receipt/commit
    * dates): the correlated EXISTS decorrelates into a LEFT-SEMI
    * join against the flag-filtered lineitem scan (the filter
    * pushes to parquet; the semi join carries bare orderkeys), the
    * quarter filter pushes to the orders scan, and the readout is
    * one bounded map-side-combined count per priority. */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val ret = Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === lit("R"))
      .select(col("l_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      .join(ret, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q6 shape (round 17) — the forecasting-revenue-change
    * scan: every predicate (ship year, discount band, quantity cap)
    * reaches the parquet scan as PushedFilters, the projection
    * prunes to 2 columns, and the single scalar aggregate combines
    * map-side — the canonical "the scan does ALL the work" query,
    * §6-rounded money. */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24.0)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
        .as("revenue"))

  /** TPC-H Q9 shape (round 17) — product-line profit by supplier
    * nation and order year (supply cost from p_retailprice — this
    * corpus has no partsupp): part (type-filtered) and
    * supplier⋈nation broadcast onto the lineitem scan, orders joins
    * on the one big shuffle, and profit aggregates per bounded
    * (nation, year) cell — Q9's classic mixed-sign money fold, and
    * exactly the fold where round(sum(double), 2) is NOT safe:
    * cancellation between the revenue and cost terms amplifies the
    * double sum's reduction-order ulp into a flipped cent (sf0.1
    * measured 2 of 175 cells off by 0.01 across engines). Emitted
    * as exact integer cents instead: per-row round(·100) doubles
    * are the identical expression tree both sides, and the BIGINT
    * sum is order-free. */
  def q9Profit(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables.part(spark, dir)
      .filter(col("p_type") === lit("PROMO"))
      .select(col("p_partkey"), col("p_retailprice"))
    val sup = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        round(col("l_quantity")).cast("long").as("qty"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long").as("rev_cents"))
      .join(Joins.maybeBroadcast(pt), col("l_partkey") === col("p_partkey"))
      .join(Joins.maybeBroadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("nation"), col("o_year"))
      .agg(sum(col("rev_cents") -
        round(col("p_retailprice") * 100).cast("long") * col("qty"))
        .as("profit_cents"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q11 shape (round 17) — important stock: parts whose
    * shipped value through NATION_5 suppliers exceeds TWICE the
    * per-part average for that nation. Q11's textbook threshold is
    * an absolute fraction of the total scaled by 1/SF precisely
    * because a fixed fraction empties as parts multiply — the
    * ×-average form is the scale-free restatement (sf0.01: 121
    * rows, sf0.1: 1302, any SF: nonempty). The group-vs-GLOBAL
    * scalar HAVING decorrelates into a one-row (total, count)
    * broadcast by the cross join, and the comparison clears the
    * fraction into the exact integer cross-multiply val·n > 2·total
    * on the DECIMAL(38,0)/HUGEINT ledgers — no float share. Unique
    * (value DESC, partkey) order. */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    val natSupp = Tables.supplier(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)
        .filter(col("n_name") === lit("NATION_5"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val v = Tables.lineitem(spark, dir)
      .join(Joins.maybeBroadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
        .cast("decimal(38,0)").as("val"))
      .localCheckpoint(true) // scanned twice: total + filter
    val tot = v.agg(sum(col("val")).as("tv"),
      count(lit(1)).cast("decimal(38,0)").as("ns"))
    v.crossJoin(broadcast(tot))
      .filter(col("val") * col("ns") > col("tv") * 2)
      .select(col("l_partkey"), col("val").cast("long").as("value_cents"))
      .orderBy(col("value_cents").desc, col("l_partkey"))
  }

  /** TPC-H Q16 shape (round 17) — supplier diversity per part
    * attribute cell, excluding flagged suppliers: the NOT IN
    * subquery decorrelates into a LEFT-ANTI join (negative-balance
    * suppliers — the corpus's complaint stand-in), part's brand/size
    * filters ride the broadcast dim, and count(DISTINCT suppkey)
    * shuffles once on the bounded (brand, type, size) grid. Unique
    * (cnt DESC, brand, type, size) order. */
  def q16PartsSupp(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables.part(spark, dir)
      .filter(col("p_brand") =!= lit("Brand#5") &&
        col("p_size").isin(1, 9, 19, 29, 39, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val flagged = Tables.supplier(spark, dir)
      .filter(col("s_acctbal") < 0.0)
      .select(col("s_suppkey"))
    Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(Joins.maybeBroadcast(pt), col("l_partkey") === col("p_partkey"))
      .join(Joins.maybeBroadcast(flagged), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** TPC-H Q20 shape (round 17) — concentrating suppliers of promo
    * parts: suppliers whose shipped quantity of a part exceeds the
    * part's per-supplier AVERAGE over the year. Q20's nested-IN +
    * correlated half-sum both decorrelate: the part filter into a
    * broadcast semi-join, the per-part average into one aggregate
    * of the (part, supplier) quantity table joined back on the key
    * it already shuffled on, the comparison cleared to the exact
    * cross-multiply sq·ns > tq. Top-25 under the unique
    * (n_excess DESC, suppkey) order. */
  def q20PromoSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val promo = Tables.part(spark, dir)
      .filter(col("p_type") === lit("PROMO")).select(col("p_partkey"))
    val pq = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Joins.maybeBroadcast(promo), col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_quantity")).cast("long").as("q"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("q")).as("sq"))
    val pa = pq.groupBy(col("l_partkey"))
      .agg(sum(col("sq")).as("tq"), count(lit(1)).as("ns"))
    pq.join(pa, Seq("l_partkey"))
      .filter(col("sq") * col("ns") > col("tq"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_excess_parts"))
      .join(Joins.maybeBroadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_excess_parts"))
      .orderBy(col("n_excess_parts").desc, col("s_suppkey"))
      .limit(25)
  }

  /** TPC-H Q12 shape (round 17) — slow-shipping service audit (no
    * shipmode/receipt columns in this corpus, so the mode dimension
    * is l_linestatus and "late" is shipped > 90 days after order):
    * per status, CASE-counts of high- vs low-priority orders among
    * late lines — Q12's exact conditional-aggregation join. The ship
    * year pushes to the lineitem scan; the day-gap predicate needs
    * both tables so it filters the joined stream; counts combine
    * map-side on the 2-row group. */
  def q12ShipAudit(spark: SparkSession, dir: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linestatus"),
        to_date(col("l_shipdate")).as("ship_day"))
      .join(Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_orderpriority"),
          to_date(col("o_orderdate")).as("order_day")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(datediff(col("ship_day"), col("order_day")) > 90)
      .groupBy(col("l_linestatus"))
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  /** TPC-H Q2 shape (round 17) — min-cost supplier per part (this
    * corpus has no partsupp, so supply cost is the supplier's avg
    * lineitem price for the part): the correlated
    * `= (SELECT min(cost) ... WHERE same part)` classic,
    * decorrelated into the §6 unique-ranked window — row_number over
    * (avg cost, suppkey) per part picks ONE deterministic winner
    * even on cost ties. The avg stays exact-integer at e6 scale
    * (truncating div of the cents ledger), the size filter prunes
    * via the broadcast part dim, and the window's partkey exchange
    * moves only the MAP-SIDE-COMBINED (part, supplier) cost rows —
    * already collapsed before any shuffle, so both exchanges are
    * aggregate-sized, never fact-sized (plan re-audited round 17:
    * Catalyst also plans WindowGroupLimit on both exchange sides). */
  def q2MinCost(spark: SparkSession, dir: String): DataFrame = {
    val cost = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("cents")).as("sc"), count(lit(1)).as("nc"))
      .withColumn("avg_cost_e8", expr("(sc * 1000000) div nc"))
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("avg_cost_e8"), col("l_suppkey"))
    cost.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(Joins.maybeBroadcast(Tables.part(spark, dir)
        .filter(col("p_size") > 45)
        .select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_brand"),
        col("l_suppkey").as("s_suppkey"), col("avg_cost_e8"))
      .orderBy(col("p_partkey"))
  }
}
