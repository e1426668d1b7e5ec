package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession
import graft.Tables

/** The point of bucketing is the PLAN, not just the answer: both join
  * inputs must come pre-hash-partitioned from disk so the sort-merge
  * join runs with zero shuffle exchanges.
  */
class BucketJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("bucketed join plan has no shuffle exchange and matches the plain join") {
    Relational.writeBucketedTables(spark, sf)
    val joined = Relational.bucketedJoin(spark)
    val n = joined.count()
    // executedPlan after an action reflects the final (AQE) plan.
    // ShuffleExchangeExec prints as "Exchange hashpartitioning(...)";
    // a BroadcastExchange would not be a shuffle, but the merge hint
    // pins SMJ so neither should appear.
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"not a sort-merge join:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketed join shuffled:\n$plan")
    val plain = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .count()
    assert(n == plain, s"bucketed=$n plain=$plain")
  }
}
