package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** Executable form of the PLANS.md audit claims: the physical-plan
  * properties that make these queries scale (pushdown, broadcast
  * stars, partition pruning) are asserted here so a regression in a
  * future change fails a spec instead of only drifting a benchmark.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  private def executedPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q2 pushes both predicates and prunes to 4 read columns") {
    val plan = executedPlan(Relational.q2FilterProj(spark, sf))
    assert(plan.contains("PushedFilters"), plan.take(2000))
    // PushedFilters renders truncated in toString; the DataFilters
    // clause on the same FileScan line carries the full predicates.
    assert(plan.contains("GreaterThan(l_quantity,45.0)"),
      "l_quantity predicate not pushed to the scan")
    assert(plan.contains("l_discount") && plan.contains(">= 0.05"),
      "l_discount predicate not at the scan")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_shipdate"),
      s"scan reads columns the query never uses: $readSchema")
  }

  test("q5 star join is pure broadcast — the fact side never shuffles pre-agg") {
    val plan = executedPlan(Relational.q5Multijoin(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), "dims should broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "a dim fell back to sort-merge: the fact table would shuffle")
  }

  test("partition-pruned events read shows PartitionFilters, not a full scan") {
    val df = graft.SparkEntry.queries("src_partition_prune")(spark, sf)
    val plan = executedPlan(df)
    assert(plan.contains("PartitionFilters"), plan.take(2000))
    assert(plan.contains("event_type"), "prune must key on the partition column")
  }

  test("candidate-path kNN is equi-join only — no nested-loop, no cartesian") {
    // The at-scale dispatch's whole point: past the exact-path size
    // bound, the kNN graph must never plan the all-pairs comparison.
    // LSH and IVF candidate paths may broadcast SMALL sides at this
    // scale, but the join strategy must be hash-keyed throughout.
    import org.apache.spark.sql.functions.col
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    for ((label, pairs) <- Seq(
        "lsh" -> Similarity.lshCandidatePairs(emb),
        "ivf" -> Similarity.ivfCandidatePairs(spark, emb,
          Similarity.fitIvfCentroids(spark, sf)))) {
      val plan = executedPlan(Similarity.knnGraphFrom(emb, pairs))
      assert(!plan.contains("BroadcastNestedLoopJoin")
          && !plan.contains("CartesianProduct"),
        s"$label candidate path planned a non-equi join:\n${plan.take(3000)}")
    }
  }

  test("top-k windows plan bounded group limits, not full per-group sorts") {
    // The reason this repo never needed a custom SparkStrategy for
    // top-k-per-group: Catalyst plans a rank-filter window as
    // partial + final WindowGroupLimit (a bounded per-group heap on
    // BOTH sides of the exchange — map-side top-k), and a global
    // ORDER BY + LIMIT as TakeOrderedAndProject. Pinned so a future
    // Spark upgrade or plan drift that silently reverts to full
    // sorts fails here instead of only drifting the bench.
    val rankPlan = executedPlan(Relational.qWindowRank(spark, sf))
    assert("WindowGroupLimit".r.findAllIn(rankPlan).size >= 2,
      s"expected partial+final WindowGroupLimit:\n${rankPlan.take(1500)}")
    val topNPlan = executedPlan(Relational.q3TopnJoin(spark, sf))
    assert(topNPlan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject:\n${topNPlan.take(1500)}")
  }

  test("bottom_k_by_key equals the window formulation and partial-aggregates map-side") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"),
        md5(concat(col("doc_id").cast("string"), lit(":graft"))).as("sk"),
        col("doc_id"))
    val w = Window.partitionBy(col("source")).orderBy(col("sk"), col("doc_id"))
    val viaWindow = docs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("source"), col("doc_id"))
      .orderBy(col("source"), col("doc_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val viaAgg = Pipeline.domainCap(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(viaAgg.toSeq == viaWindow.toSeq)
    // The scale property: a partial (map-side) aggregate must appear
    // below the exchange, so each partition ships at most k rows per
    // group instead of sorting the whole input like the window does.
    val plan = executedPlan(Pipeline.domainCap(spark, sf))
    assert(plan.contains("partial_bottomkbykey"),
      s"no map-side partial for the custom aggregate:\n${plan.take(1500)}")
  }

  test("global-rank family plans no unpartitioned window anywhere") {
    // The round-10 verdict's one remaining scale-killer class: a
    // Window with an EMPTY partition spec requires SinglePartition
    // distribution — the whole input funnels through one task. All
    // five former offenders now ride Selection.withGlobalRank's
    // range-partitioned rank; this walks every WindowExec in each
    // plan (through AQE wrappers) and asserts a nonempty partition
    // spec, so a regression fails here instead of melting at scale.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.window.WindowExec
    def windows(p: SparkPlan): Seq[WindowExec] = {
      val here = p match { case w: WindowExec => Seq(w); case _ => Nil }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.inputPlan)
        case _ => p.children
      }
      here ++ kids.flatMap(windows)
    }
    // Round-11 additions that rank/cumsum globally ride the same
    // distributed form — pinned here the day they were born.
    for (q <- Seq("q_gini", "q_pareto", "q_rfm", "q_skyline", "e_hubness",
        "t_vocab_coverage", "q_join_heat", "m_shard_pack", "p_shuffle",
        "q_equidepth_hist", "q_abc", "p_token_budget")) {
      val df = graft.SparkEntry.queries(q)(spark, sf)
      val bad = windows(df.queryExecution.executedPlan)
        .filter(_.partitionSpec.isEmpty)
      assert(bad.isEmpty,
        s"$q plans ${bad.size} unpartitioned window(s):\n${bad.map(_.toString.take(300)).mkString("\n")}")
    }
  }

  test("salted aggregation partials run on (key, salt) before any exchange") {
    val plan = executedPlan(graft.SparkEntry.queries("q_skew_agg")(spark, sf))
    val firstAgg = plan.linesIterator.toSeq.reverse
      .find(l => l.contains("HashAggregate") && l.contains("_salt"))
    assert(firstAgg.isDefined,
      "no partial aggregate keyed by (key, _salt) — hot keys would hit one reducer")
  }
}
