package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks (SURVEY §5). AQE's skew-join
  * splitting covers sort-merge joins automatically; these cover the
  * two cases it doesn't: aggregations over power-law keys, and
  * broadcast-ineligible joins against a replicable side.
  */
object SkewOps {

  /** Retry-deterministic salt: a hash of the full row contents.
    * `monotonically_increasing_id`/`rand` depend on partition layout
    * and row order within a task attempt — under shuffle-fetch
    * failure + map re-run, rows would re-salt differently and
    * partials double-count or drop (the SPARK-23207 bug class). A
    * content hash assigns every row the same salt on every attempt. */
  private def rowSalt(df: DataFrame, saltBuckets: Int) =
    pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(saltBuckets.toLong))

  /** Two-phase salted aggregation for algebraic aggregates over
    * skewed keys: phase 1 aggregates on (key, salt) — spreading one
    * hot key over `saltBuckets` reducers — phase 2 merges the
    * partials per key. sum/count/min/max compose exactly. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    df.withColumn("_salt", rowSalt(df, saltBuckets))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(keyCols: _*)
      .agg(sum(col("_psum")).as(s"sum_$valueCol"),
        sum(col("_pcnt")).as("n"))
  }

  /** Salted join: replicate the right (small-ish, but over the
    * broadcast budget) side `saltBuckets` times and salt the left
    * side, so one hot left key spreads across `saltBuckets` tasks.
    * Exact same rows as a plain inner equi-join. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltBuckets: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("_salt", rowSalt(left, saltBuckets))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(saltBuckets - 1L))))
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }

  /** Convenience: top-N heaviest keys of a column — the usual first
    * step when deciding whether salting is needed. */
  def keyHistogram(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key.as("key")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key").asc)
      .limit(topN)
}
