package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pads minimal planted fixtures to the canonical table schemas that
  * the vintage-normalized [[Tables]] readers require (a missing
  * canonical column fails loudly by design — specs must plant the
  * full logical schema, as the real testdata always does). */
object TestFixtures {
  /** (doc_id, text, ...) → canonical documents schema. */
  def canonDocs(df: DataFrame): DataFrame = {
    val withLang =
      if (df.columns.contains("lang")) df
      else df.withColumn("lang", lit("en"))
    val withSource =
      if (withLang.columns.contains("source")) withLang
      else withLang.withColumn("source", lit("planted"))
    if (withSource.columns.contains("n_chars")) withSource
    else withSource.withColumn("n_chars",
      length(col("text")).cast("long"))
  }

  /** (vec_id, embedding, ...) → canonical embeddings schema. */
  def canonEmb(df: DataFrame): DataFrame =
    if (df.columns.contains("label")) df
    else df.withColumn("label", lit(0))
}
