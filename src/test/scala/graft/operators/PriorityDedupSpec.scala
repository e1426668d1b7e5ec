package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** Priority dedup: the survivor is the highest-priority copy, not the
  * min-id one; min-id breaks ties within a tier; singletons survive.
  */
class PriorityDedupSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("higher-priority later-id copy beats the min-id copy") {
    val docs = Seq(
      (1L, "crawl", "same text"),
      (5L, "curated", "same text"),
      (6L, "curated", "same text"),
      (9L, "crawl", "same text"),
      (3L, "crawl", "unique text")
    ).toDF("doc_id", "source", "text")
    val out = Dedup.priorityDedupOf(docs,
        when(col("source") === "curated", 2L).otherwise(0L))
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .sortBy(_._1)
    // cluster label stays min-id (1); survivor is the min-id member of
    // the top priority tier (5, not 1 and not 6)
    assert(out.toSeq == Seq(
      (1L, 1L, 5L, false),
      (3L, 3L, 3L, true),
      (5L, 1L, 5L, true),
      (6L, 1L, 5L, false),
      (9L, 1L, 5L, false)))
  }

  test("uniform priority degenerates to min-id survivor selection") {
    val docs = Seq(
      (4L, "a", "dup"), (2L, "b", "dup"), (7L, "c", "dup")
    ).toDF("doc_id", "source", "text")
    val out = Dedup.priorityDedupOf(docs, lit(0L)).collect()
      .map(r => (r.getLong(0), r.getLong(3))).sortBy(_._1)
    assert(out.toSeq == Seq((2L, 2L), (4L, 2L), (7L, 2L)))
  }
}
