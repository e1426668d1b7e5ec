package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column handling (SURVEY §2 rows 33–34): image/audio/
  * video payloads are opaque `binary` columns with typed metadata.
  * The container has no media codecs, so the decode step is a
  * clearly-marked deterministic STUB — the Spark-side plumbing
  * (schema, batch iteration, partition-local decode) is real.
  *
  * The test corpus has no binary column; `text` is encoded to UTF-8
  * bytes to stand in for a payload. Stub content hashes are md5 hex
  * so the DuckDB oracle can recompute them; the oracle's
  * char-slicing equals this byte-slicing because the corpus is
  * ASCII (verified) — a non-ASCII corpus would only weaken the
  * oracle, not the operator.
  */
object Multimodal {

  /** md5 hex of a byte slice — the deterministic stand-in for a
    * decoded-content fingerprint. */
  private def md5Hex(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Typed record produced by the stub decoder. */
  case class Frame(doc_id: Long, frame_idx: Int, frame_hash: String)

  /** Metadata extraction over opaque bytes: size, content hash, and
    * stub-decoded "dimensions". Pure projection — no shuffle. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame = {
    val bytes = encode(col("text"), "UTF-8")
    val nBytes = length(bytes).cast("long")
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        nBytes.as("n_bytes"),
        sha2(bytes, 256).as("sha"),
        // STUB decode: real decoders would parse the container header;
        // here dimensions derive deterministically from payload size.
        (pmod(nBytes, lit(640L)) + lit(1L)).as("width"),
        (pmod(nBytes * 7L, lit(480L)) + lit(1L)).as("height"))
      .orderBy(col("doc_id"))
  }

  /** Fixed-stride frame sampling: every 256-byte chunk of the payload
    * becomes a "frame" with a content hash — the batch shape a real
    * video-frame extractor would have (partition-local iteration over
    * byte buffers, many output rows per input row). Decode itself is
    * a STUB (FNV hash of the chunk instead of pixel decoding). */
  def frameSample(spark: SparkSession, dir: String, stride: Int = 256): Dataset[Frame] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (docId, payload) =>
          payload.grouped(stride).zipWithIndex.map { case (chunk, idx) =>
            Frame(docId, idx, md5Hex(chunk))
          }
        }
      }
  }

  def frameSampleDf(spark: SparkSession, dir: String): DataFrame =
    frameSample(spark, dir).toDF()
      .orderBy(col("doc_id"), col("frame_idx"))

  /** Typed record produced by the stub resize. */
  case class Resized(doc_id: Long, orig_bytes: Int, thumb_bytes: Int, thumb_hash: String)

  /** "Resize" an opaque payload: stride-sample every k-th byte into a
    * thumbnail payload — the batch shape of an image downscale
    * (partition-local, bytes-in/bytes-out, size metadata alongside).
    * Decode/encode is a STUB (byte sampling instead of pixel
    * resampling). */
  def resize(spark: SparkSession, dir: String, factor: Int = 8): Dataset[Resized] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (docId, payload) =>
          val thumb = payload.indices.collect {
            case i if i % factor == 0 => payload(i)
          }.toArray
          Resized(docId, payload.length, thumb.length, md5Hex(thumb))
        }
      }
  }

  def resizeDf(spark: SparkSession, dir: String): DataFrame =
    resize(spark, dir).toDF().orderBy(col("doc_id"))

  /** Typed record produced by the stub feature extractor. */
  case class Features(doc_id: Long, n_bytes: Int, mean_byte: Double,
      distinct_bytes: Int, entropy_e4: Long)

  /** Feature extraction over opaque bytes: byte-level statistics
    * (mean, cardinality, Shannon entropy) — the batch shape of an
    * embedding/feature extractor (one feature row per payload,
    * partition-local compute). A real model call would replace the
    * statistics; everything around it is the production plumbing. */
  def extractFeatures(spark: SparkSession, dir: String): Dataset[Features] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (docId, payload) =>
          val counts = new Array[Long](256)
          payload.foreach(b => counts(b & 0xff) += 1)
          val n = payload.length.toDouble
          val mean = if (n == 0) 0.0 else payload.map(b => (b & 0xff).toLong).sum / n
          // Per-term e4 rounding BEFORE the integer sum (SURVEY §6):
          // the oracle accumulates the same integers in any order.
          val entropyE4 = counts.filter(_ > 0).map { c =>
            val p = c / n
            math.round(-p * math.log(p) / math.log(2.0) * 1e4)
          }.sum
          Features(docId, payload.length, mean,
            counts.count(_ > 0), entropyE4)
        }
      }
  }

  def extractFeaturesDf(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(spark, dir).toDF().orderBy(col("doc_id"))

  /** Scene-cut detection over the sampled frame stream — the
    * video-segmentation composition: frames ([[frameSample]]'s
    * stride-chunk stub for the real decoder) carry a deterministic
    * per-frame feature scalar (leading 15 hex digits of the frame
    * hash — the stub stand-in for a perceptual feature), and a cut
    * fires where the lag-delta against the previous frame exceeds the
    * threshold. The Spark-side plumbing is the real thing: one
    * per-video window over the ordered frame stream (frames of one
    * video co-partition), counts aggregate map-side — swap the
    * feature column for a decoded embedding distance and the plan is
    * unchanged. */
  def sceneCuts(spark: SparkSession, dir: String, stride: Int = 256,
      threshold: Long = 600000000000000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frameSample(spark, dir, stride).toDF()
      .withColumn("fv",
        conv(substring(col("frame_hash"), 1, 15), 16, 10).cast("long"))
      .withColumn("prev", lag(col("fv"), 1).over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("prev").isNotNull
          && abs(col("fv") - col("prev")) > lit(threshold), 1L)
          .otherwise(0L)).as("n_cuts"))
      .orderBy(col("doc_id"))
  }

  /** VAD-style activity segmentation over the sampled frame stream —
    * the audio-segmentation composition (voice-activity detection →
    * contiguous active segments): each frame carries a deterministic
    * energy proxy (the frame-hash scalar — the stub stand-in for an
    * RMS energy, per the multimodal decode contract), frames above
    * the threshold are "active", and runs of consecutive active
    * frames group into segments by the classic gaps-and-islands
    * identity (rn − rn-within-activity is constant per run). All
    * windows key on doc_id, so one per-document shuffle carries the
    * whole computation; swap the proxy for a decoded energy column
    * and the plan is unchanged. Output per doc: frame/active counts,
    * segment count, longest segment. */
  def vadSegments(spark: SparkSession, dir: String, stride: Int = 256,
      threshold: Long = 600000000000000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val wa = Window.partitionBy(col("doc_id"), col("active"))
      .orderBy(col("frame_idx"))
    val marked = frameSample(spark, dir, stride).toDF()
      .withColumn("fv",
        conv(substring(col("frame_hash"), 1, 15), 16, 10).cast("long"))
      .withColumn("active", col("fv") > lit(threshold))
      .withColumn("rn", row_number().over(w))
      .withColumn("arn", row_number().over(wa))
    val segs = marked.filter(col("active"))
      .groupBy(col("doc_id"), (col("rn") - col("arn")).as("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segments"), max(col("len")).as("longest"))
    marked.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("active"), 1L).otherwise(0L)).as("n_active"))
      .join(segs, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_frames"), col("n_active"),
        coalesce(col("n_segments"), lit(0L)).as("n_segments"),
        coalesce(col("longest"), lit(0L)).as("longest"))
      .orderBy(col("doc_id"))
  }

  /** Reference 64-bit byte-level SimHash — the plain-Scala statement
    * of the fingerprint the native [[graft.functions.PayloadSimHash64]]
    * expression computes (same sliding-window FNV-1a bit votes). The
    * hot path is the EXPRESSION; this stays as the independent
    * implementation the equality spec compares against. */
  private[operators] def payloadSimhash(payload: Array[Byte], n: Int = 8): Long = {
    import graft.functions.Fnv
    val votes = new Array[Int](64)
    def vote(h: Long): Unit = {
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
    }
    if (payload.length <= n) vote(Fnv.hash(payload))
    else {
      var i = 0
      while (i + n <= payload.length) {
        vote(Fnv.hash(java.util.Arrays.copyOfRange(payload, i, i + n)))
        i += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Byte-payload near-duplicate pairs over ANY (doc_id, payload:
    * binary) table — the third dedup modality next to text
    * (MinHash/SimHash on tokens) and embeddings (cosine): a re-encoded
    * or lightly-corrupted copy of a binary asset hashes to a nearby
    * byte-level SimHash even though its exact hash differs. Candidate
    * generation reuses [[Dedup.simhashPairsFrom]]'s 8-byte-band
    * pigeonhole join (100% recall at Hamming ≤ 7, never O(n²)); the
    * fingerprint table is checkpointed so the payload scan runs once,
    * and only (id, fp) rows — 16 bytes — ever shuffle. */
  def nearDupPairsOf(payloads: DataFrame, maxHamming: Int = 7): DataFrame = {
    val fps = payloads
      .select(col("doc_id"),
        graft.functions.CatalystText.payload_simhash64(col("payload")).as("fp"))
      .localCheckpoint(true)
    Dedup.simhashPairsFrom(fps, maxHamming)
  }

  /** [[nearDupPairsOf]] over the documents table's stand-in payloads
    * (text encoded to UTF-8 bytes — the corpus has no binary column;
    * see the object scaladoc). */
  def nearDupPairs(spark: SparkSession, dir: String,
      maxHamming: Int = 7): DataFrame =
    nearDupPairsOf(
      Tables.documents(spark, dir)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")),
      maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))

  /** Byte-budget shard packing — the webdataset/tar-shard build step
    * of a multimodal training pipeline: payloads pack in stable
    * doc_id order into ~`budget`-byte shards, where an item belongs
    * to the shard its STARTING offset falls in (shards may overrun
    * by one item's tail — the tar convention; items never split).
    * The running byte offset comes from
    * [[Selection.withGlobalRank]]'s range-partitioned cumsum — the
    * corpus-scale shape, no single-reducer window, and only
    * (doc_id, nbytes) ever shuffles, never payload bytes. Readout:
    * per-shard item/byte totals and id span — exactly the shard
    * manifest a downstream loader consumes. */
  def shardPack(spark: SparkSession, dir: String,
      budget: Long = 65536L): DataFrame = {
    val items = Tables.documents(spark, dir)
      .select(col("doc_id"),
        length(encode(col("text"), "UTF-8")).cast("long").as("nbytes"))
    Selection.withGlobalRank(items, Seq(col("doc_id")), "rk",
      cumSumOf = Some("nbytes"), cumName = "cum")
      .withColumn("shard", expr(s"(cum - nbytes) div ${budget}L"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_items"), sum(col("nbytes")).as("shard_bytes"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("shard"))
  }
}
