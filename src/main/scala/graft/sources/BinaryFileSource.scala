package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Binary-asset ingestion through Spark's `binaryFile` source — the
  * production entry point for the multimodal surface: a directory of
  * image/audio/video files becomes a (doc_id, payload) table that
  * [[graft.operators.Multimodal]]'s decode/feature/near-dup operators
  * consume. The source lists files in parallel, carries per-file
  * (path, modificationTime, length, content), and prunes unread
  * columns — a metadata-only query never loads payload bytes.
  */
object BinaryFileSource {

  /** Materialize (doc_id, text) rows as one `doc_<id>.bin` payload
    * file each — the test harness's stand-in for a real asset
    * directory, written executor-side per partition. Assumes a
    * filesystem all writers share (true in local mode and on any
    * cluster with a shared store, where `path` would be an object
    * store URI and this writer a real asset-producing job). */
  def writePayloadFiles(docs: DataFrame, path: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .filter(col("payload").isNotNull)
      .as[(Long, Array[Byte])]
      .foreachPartition { it: Iterator[(Long, Array[Byte])] =>
        it.foreach { case (id, p) =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(path, s"doc_$id.bin"), p)
        }
      }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "_SUCCESS"), Array.emptyByteArray)
  }

  /** Read an asset directory into the engine's payload-table shape.
    * `pathGlobFilter` keeps marker/sidecar files (e.g. `_SUCCESS`)
    * out of the scan; doc_id comes from the file name, so the join
    * key exists before any payload byte is decoded.
    *
    * ZERO-BYTE files are INVISIBLE to this source: Spark sizes file
    * splits by length, so a 0-length file yields no partition at all
    * (spec-pinned). A corpus where empty assets are meaningful must
    * carry them through a metadata sidecar, not payload files. */
  def readPayloads(spark: SparkSession, path: String,
      glob: String = "*.bin"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin$", 1)
          .cast("long").as("doc_id"),
        col("length").as("bytes"),
        col("content").as("payload"))
}
