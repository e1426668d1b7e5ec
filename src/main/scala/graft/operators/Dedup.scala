package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{CatalystText, TextFunctions => TF}

/** Deduplication operators (SURVEY §2 rows 22–26).
  *
  * Exact dedup is one hash-groupBy. Near-dup never goes O(n²):
  * MinHash+LSH banding and sign-LSH bucketing shuffle on band/bucket
  * keys, so candidate generation is linear in documents + bucket-local
  * pair counts — the property that keeps this runnable at 100 TB.
  */
object Dedup {

  /** Exact dedup: min-doc_id survivor per identical text (md5 key —
    * the groupBy shuffles 16-byte keys, not document bodies). */
  def exactDedup(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text")))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
      .orderBy(col("doc_id"))

  val MinhashK = 64
  val MinhashBands = 16

  /** doc_id + minhash signature over distinct word 3-gram shingles. */
  private def signatures(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        TF.minhashSignature(array_distinct(TF.wordShingles(col("text"), 3)), MinhashK)
          .as("sig"))

  /** LSH candidate pairs (doc_a < doc_b) from shared band keys. */
  private def candidatePairs(sigs: DataFrame): DataFrame = {
    val banded = sigs
      .select(col("doc_id"),
        explode(TF.bandKeys(col("sig"), MinhashK, MinhashBands)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val a = banded.select(col("band"), col("key"), col("doc_id").as("doc_a"))
    val b = banded.select(col("band"), col("key"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** MinHash near-dup pairs with estimated Jaccard (e4-scaled),
    * threshold 0.5. */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val sigs = signatures(spark, dir)
    val pairs = candidatePairs(sigs)
    pairs
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), Seq("doc_a"))
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        TF.signatureSimilarityE4(col("sig_a"), col("sig_b"), MinhashK).as("est_jaccard_e4"))
      .filter(col("est_jaccard_e4") >= 5000)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 64-bit SimHash fingerprint per document (custom Catalyst
    * expression — bit-vote over token hashes). */
  def simhash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        CatalystText.simhash64(TF.tokens(col("text"))).as("simhash"))
      .orderBy(col("doc_id"))

  /** SimHash near-dup pairs: split each 64-bit fingerprint into 8
    * byte-bands; pairs sharing any band are candidates (pigeonhole:
    * any pair within Hamming distance 7 shares at least one exact
    * band), then filter by exact Hamming distance ≤ `maxHamming`.
    * Same OR-of-ANDs shape as MinHash banding — band-key equi-join,
    * never O(n²). */
  def simhashPairs(spark: SparkSession, dir: String, maxHamming: Int = 7): DataFrame = {
    val fps = Tables.documents(spark, dir)
      .select(col("doc_id"),
        CatalystText.simhash64(TF.tokens(col("text"))).as("fp"))
    val bands = (0 until 8).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("fp"), b * 8).bitwiseAND(lit(0xffL)).as("key"))
    }
    val banded = fps.select(col("doc_id"), col("fp"),
        explode(array(bands: _*)).as("bk"))
      .select(col("doc_id"), col("fp"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val a = banded.select(col("band"), col("key"),
      col("doc_id").as("doc_a"), col("fp").as("fp_a"))
    val b = banded.select(col("band"), col("key"),
      col("doc_id").as("doc_b"), col("fp").as("fp_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Exact n-gram Jaccard (e4-scaled) computed only on LSH candidate
    * pairs — the verify stage after MinHash candidate generation. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sigs = signatures(spark, dir)
    val pairs = candidatePairs(sigs)
    val shingled = Tables.documents(spark, dir)
      .select(col("doc_id"),
        array_distinct(TF.wordShingles(col("text"), 3)).as("sh"))
    pairs
      .join(shingled.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(shingled.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        TF.jaccardE4(col("sh_a"), col("sh_b")).as("jaccard_e4"))
      .filter(col("jaccard_e4") >= 3000)
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
