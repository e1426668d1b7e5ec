package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** Vintage pins for documents/embeddings (the events.ts lesson
  * generalized BEFORE the next testdata regeneration drifts another
  * table): plant a current-vintage and a physically-drifted file per
  * table and assert `Tables.documents`/`Tables.embeddings` read both
  * to identical canonical values and schema. Drifts planted are the
  * plausible ones: INT32 ids, INT32 n_chars, float64 embeddings,
  * BIGINT label. A missing canonical column must fail loudly, not
  * null-fill.
  */
class TablesVintageSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft_tvintage_$tag").toString

  test("documents: INT32 id/n_chars vintage reads identically to the canonical one") {
    import spark.implicits._
    val rows = Seq(
      (1L, "hello world", "en", "web", 11L),
      (2L, "bonjour", "fr", "book", 7L))
    val cur = tmp("docs_cur"); val old = tmp("docs_old")
    val df = rows.toDF("doc_id", "text", "lang", "source", "n_chars")
    df.write.mode("overwrite").parquet(s"$cur/documents.parquet")
    df.select(col("doc_id").cast("int").as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars").cast("int").as("n_chars"))
      .write.mode("overwrite").parquet(s"$old/documents.parquet")
    val a = graft.Tables.documents(spark, cur)
    val b = graft.Tables.documents(spark, old)
    assert(a.schema == b.schema, s"${a.schema} != ${b.schema}")
    assert(a.schema.map(f => f.name -> f.dataType.simpleString) ==
      Seq("doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
        "source" -> "string", "n_chars" -> "bigint"))
    def read(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).sorted.toSeq
    assert(read(a) == rows.sorted)
    assert(read(b) == rows.sorted)
  }

  test("embeddings: float64/BIGINT-label vintage reads identically to the canonical one") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array(0.25f, -1.5f, 3.0f), 0),
      (2L, Array(1.0f, 0.125f, -2.0f), 1))
    val cur = tmp("emb_cur"); val old = tmp("emb_old")
    val df = rows.toDF("vec_id", "embedding", "label")
    df.write.mode("overwrite").parquet(s"$cur/embeddings.parquet")
    // Drifted vintage: INT32 vec_id, float64 embedding, BIGINT label.
    // The planted floats are dyadic, so the double round-trip is
    // value-exact and the equality below is legitimate.
    df.select(col("vec_id").cast("int").as("vec_id"),
        col("embedding").cast("array<double>").as("embedding"),
        col("label").cast("bigint").as("label"))
      .write.mode("overwrite").parquet(s"$old/embeddings.parquet")
    val a = graft.Tables.embeddings(spark, cur)
    val b = graft.Tables.embeddings(spark, old)
    assert(a.schema == b.schema, s"${a.schema} != ${b.schema}")
    assert(a.schema.map(f => f.name -> f.dataType.simpleString) ==
      Seq("vec_id" -> "bigint", "embedding" -> "array<float>", "label" -> "int"))
    def read(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toList, r.getInt(2)))
      .sortBy(_._1).toSeq
    assert(read(a) == read(b))
    assert(read(a) == rows.map { case (i, e, l) => (i, e.toList, l) }.toSeq)
  }

  test("a vintage missing a canonical column fails loudly, not null-filled") {
    import spark.implicits._
    val d = tmp("docs_missing")
    Seq((1L, "text only")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      graft.Tables.documents(spark, d).collect()
    }
    assert(e.getMessage.toLowerCase.contains("lang"),
      s"error should name the missing column: ${e.getMessage.take(200)}")
  }
}
