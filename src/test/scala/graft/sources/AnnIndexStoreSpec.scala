package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession
import graft.operators.Similarity

/** The persisted IVF index (round 18): build-once-search-from-disk
  * must be indistinguishable from the in-memory path — same rows, a
  * partition-pruned scan, and a LOUD refusal on staleness (never a
  * silently wrong neighbor list from an old index).
  */
class AnnIndexStoreSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("persisted search ≡ in-memory annIvfTopK, bit for bit") {
    val live = Similarity.annIvfTopK(spark, sf)
      .orderBy(col("query_id"), col("rank")).collect().map(_.toSeq)
    val persisted = AnnIndexStore.annIvfTopKPersisted(spark, sf)
      .orderBy(col("query_id"), col("rank")).collect().map(_.toSeq)
    assert(persisted.toSeq == live.toSeq && persisted.nonEmpty)
  }

  test("persisted PQ search ≡ in-memory pqAdcTopK, bit for bit") {
    val live = Similarity.pqAdcTopK(spark, sf)
      .orderBy(col("query_id"), col("rank")).collect().map(_.toSeq)
    val persisted = AnnIndexStore.pqAdcTopKPersisted(spark, sf)
      .orderBy(col("query_id"), col("rank")).collect().map(_.toSeq)
    assert(persisted.toSeq == live.toSeq && persisted.nonEmpty)
  }

  test("persisted HNSW search ≡ in-memory hnswTopK, bit for bit") {
    val live = Similarity.hnswTopK(spark, sf)
      .orderBy(col("query_id"), col("rank")).collect().map(_.toSeq)
    val persisted = AnnIndexStore.hnswTopKPersisted(spark, sf)
      .orderBy(col("query_id"), col("rank")).collect().map(_.toSeq)
    assert(persisted.toSeq == live.toSeq && persisted.nonEmpty)
  }

  test("persisted LSH search ≡ in-memory annLshTopK, bit for bit") {
    val live = Similarity.annLshTopK(spark, sf)
      .orderBy(col("query_id"), col("rank")).collect().map(_.toSeq)
    val persisted = AnnIndexStore.annLshTopKPersisted(spark, sf)
      .orderBy(col("query_id"), col("rank")).collect().map(_.toSeq)
    assert(persisted.toSeq == live.toSeq && persisted.nonEmpty)
  }

  test("stale LSH manifest refuses after in-place source regeneration") {
    import spark.implicits._
    def vec(axis: Int): Seq[Float] =
      (0 until Similarity.EmbeddingDim).map(i => if (i == axis) 1f else 0.02f)
    val dir = java.nio.file.Files.createTempDirectory("graft_lshidx").toString
    def write(n: Int): Unit = {
      graft.TestFixtures.canonEmb((0 until n).map(i => (i.toLong, vec(i % 32)))
        .toDF("vec_id", "embedding")).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val f = new java.io.File(s"$dir/embeddings.parquet")
      f.setLastModified(f.lastModified() + 2000)
    }
    write(40)
    val idx = s"$dir/lsh_index"
    AnnIndexStore.saveLshBands(spark, dir, idx)
    assert(AnnIndexStore.annLshTopKFrom(spark, dir, idx).count() > 0)
    write(60)
    val e = intercept[IllegalArgumentException] {
      AnnIndexStore.annLshTopKFrom(spark, dir, idx)
    }
    assert(e.getMessage.contains("STALE"), e.getMessage)
    // a regenerated source means a NEW fixture path → rebuild, not refuse
    assert(AnnIndexStore.annLshTopKPersisted(spark, dir)
      .select(col("query_id")).distinct().count() > 0)
  }

  test("persisted-signature pairs ≡ d_minhash_pairs, bit for bit") {
    val live = graft.operators.Dedup.minhashPairs(spark, sf)
      .collect().map(_.toSeq)
    val persisted = AnnIndexStore.minhashPairsPersisted(spark, sf)
      .collect().map(_.toSeq)
    assert(persisted.toSeq == live.toSeq)
  }

  test("probe join dynamic-partition-prunes the inverted-list scan") {
    val plan = AnnIndexStore.annIvfTopKPersisted(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"inverted-list scan not DPP-pruned:\n${plan.take(2000)}")
  }

  test("stale manifest refuses; regenerated source gets a fresh index") {
    import spark.implicits._
    def vec(axis: Int): Seq[Float] =
      (0 until Similarity.EmbeddingDim).map(i => if (i == axis) 1f else 0.02f)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfidx").toString
    def write(n: Int): Unit = {
      graft.TestFixtures.canonEmb((0 until n).map(i => (i.toLong, vec(i % 32)))
        .toDF("vec_id", "embedding")).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val f = new java.io.File(s"$dir/embeddings.parquet")
      f.setLastModified(f.lastModified() + 2000)
    }
    write(40)
    val idx = s"$dir/ivf_index"
    AnnIndexStore.saveIvf(spark, dir, idx)
    AnnIndexStore.requireFresh(spark,
      new java.io.File(s"$dir/embeddings.parquet"), idx) // fresh: no throw
    assert(AnnIndexStore.annIvfTopKFrom(spark, dir, idx).count() > 0)
    // regenerate the source IN PLACE: the old index must refuse
    graft.graph.GraphOps.clearAllMemos(spark)
    write(60)
    val e = intercept[IllegalArgumentException] {
      AnnIndexStore.annIvfTopKFrom(spark, dir, idx)
    }
    assert(e.getMessage.contains("STALE"), e.getMessage)
    // the fixture-path entry keys on (mtime ^ length): a new source
    // means a new path, so it rebuilds instead of refusing
    assert(AnnIndexStore.annIvfTopKPersisted(spark, dir)
      .select(col("query_id")).distinct().count() > 0)
  }

  test("format-version gate refuses an index written by a future format") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfver").toString
    def vec(axis: Int): Seq[Float] =
      (0 until Similarity.EmbeddingDim).map(i => if (i == axis) 1f else 0.02f)
    graft.TestFixtures.canonEmb((0 until 40).map(i => (i.toLong, vec(i % 32)))
      .toDF("vec_id", "embedding")).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val idx = s"$dir/ivf_index"
    AnnIndexStore.saveIvf(spark, dir, idx)
    // rewrite the manifest with a bumped version, same identity
    val r = spark.read.parquet(s"$idx/manifest").collect().head
    Seq((AnnIndexStore.FormatVersion + 1, r.getAs[Long]("src_mtime"),
      r.getAs[Long]("src_length"), r.getAs[Long]("extra")))
      .toDF("version", "src_mtime", "src_length", "extra")
      .coalesce(1).write.mode("overwrite").parquet(s"$idx/manifest")
    val e = intercept[IllegalArgumentException] {
      AnnIndexStore.requireFresh(spark,
        new java.io.File(s"$dir/embeddings.parquet"), idx)
    }
    assert(e.getMessage.contains("format"), e.getMessage)
  }
}
