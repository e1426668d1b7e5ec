package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession
import org.apache.hadoop.conf.Configuration
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import scala.jdk.CollectionConverters._

/** The bloom-skipping contract: the written footers actually carry a
  * bloom filter on the indexed column, that filter is discriminating
  * (present keys hash-hit in at least one row group; an absent key
  * misses in every group — deterministic, blooms have no false
  * negatives and the planted data is fixed), and the skipped read
  * answers exactly like the plain scan. */
class BloomSkipSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString
    (0L until 20000L).map(i => (i, i % 997L, i.toDouble))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .repartition(4, col("o_orderkey"))
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#o_custkey", "true")
      .option("parquet.bloom.filter.expected.ndv#o_custkey", "8192")
      .option("parquet.enable.dictionary#o_custkey", "false")
      .option("parquet.block.size", (1 << 20).toString)
      .parquet(s"$dir/data")
    dir
  }

  private def dataFiles = new java.io.File(s"$out/data").listFiles()
    .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)

  /** For each row group of each file: Some(true) if the bloom says
    * the key may be present, Some(false) if provably absent, None if
    * the column carries no bloom filter. */
  private def bloomVerdicts(key: Long): Seq[Option[Boolean]] =
    dataFiles.toSeq.flatMap { f =>
      val in = HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath), new Configuration())
      val reader = ParquetFileReader.open(in)
      try {
        reader.getRowGroups.asScala.toSeq.map { bm =>
          val cc = bm.getColumns.asScala
            .find(_.getPath.toDotString == "o_custkey").get
          Option(reader.getBloomFilterDataReader(bm).readBloomFilter(cc))
            .map(b => b.findHash(b.hash(key)))
        }
      } finally reader.close()
    }

  test("footers carry a bloom filter on o_custkey") {
    val v = bloomVerdicts(42L)
    assert(v.nonEmpty && v.forall(_.isDefined))
  }

  test("present keys hit, absent keys provably miss") {
    // Every residue 0..996 occurs in the data; the layout is
    // hash-scattered so each key appears in (essentially) every row
    // group — at minimum one bloom must say "maybe".
    assert(bloomVerdicts(42L).flatten.exists(identity))
    // 5000 > 997: never written. Bloom filters have no false
    // negatives, and on this FIXED dataset the false-positive draw
    // is deterministic — pin full exclusion.
    assert(bloomVerdicts(5000L).flatten.forall(v => !v))
  }

  test("bloom-skipped read answers exactly like the plain scan") {
    val keys = SkipIndex.BloomProbeKeys
    val got = spark.read.parquet(s"$out/data")
      .filter(col("o_custkey").isin(keys: _*))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = (0L until 20000L).map(i => i % 997L)
      .filter(keys.contains).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    assert(got == expected)
  }
}
