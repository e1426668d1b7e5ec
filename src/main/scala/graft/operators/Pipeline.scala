package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{TextFunctions => TF}

/** End-to-end training-data curation: the composition a user actually
  * runs over a raw corpus — language filter, quality gates, dedup
  * survivors — produced by chaining the engine's own operators, not
  * bespoke logic. Every stage is a narrow projection or an operator
  * that is independently oracle/spec-checked; the composition itself
  * is spec-checked on a planted corpus.
  */
object Pipeline {

  /** Curated corpus: English documents passing quality gates, one
    * survivor per duplicate cluster.
    *
    * Gates (tunable): ≥ `minTokens` whitespace tokens, ≥ 50% alpha
    * characters, predicted language "en". Dedup verdict from
    * [[Dedup.dupClusters]] on exact + SimHash pairs (the cheap pair
    * sources — MinHash adds recall but triples pair-source cost; at
    * 100 TB you run it once and persist, not per downstream read).
    *
    * Output: (doc_id, n_tokens, n_chars) of kept documents. */
  def cleanCorpus(spark: SparkSession, dir: String,
      minTokens: Int = 10): DataFrame = {
    val t = col("text")
    val metrics = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(TF.tokens(t)).cast("long").as("n_tokens"),
        length(t).cast("long").as("n_chars"),
        length(regexp_replace(t, "[^A-Za-z]", "")).cast("long").as("n_alpha"),
        TF.langId(t).as("pred_lang"))
    val gated = metrics
      .filter(col("pred_lang") === "en")
      .filter(col("n_tokens") >= minTokens)
      .filter(col("n_alpha") * 2 >= col("n_chars"))
    val survivors = Dedup.dupClusters(spark, dir, includeMinhash = false)
      .filter(col("is_survivor"))
      .select(col("doc_id"))
    gated
      .join(survivors, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("n_tokens"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic stratified sample over a keyed column — the
    * training-mix control knob (e.g. rebalance languages). Bernoulli
    * per-stratum sampling with a fixed seed: reproducible for a fixed
    * input, one scan, no shuffle — the sample decision is evaluated
    * at the scan, so at 100 TB this composes with pushdown instead of
    * materializing the corpus. */
  def stratifiedSample(spark: SparkSession, dir: String,
      fractions: Map[String, Double] = Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.1),
      seed: Long = 42L): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .stat.sampleBy("lang", fractions, seed)
      .orderBy(col("doc_id"))
  }
}
