package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.{GraphOps, SparkTestSession}

class SourcesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("edge list round-trip: tsv → canonical edges → louvain-ready graph") {
    val dir = Files.createTempDirectory("graft_edges").toFile
    val f = new java.io.File(dir, "edges.tsv")
    val w = new java.io.PrintWriter(f)
    w.println("# comment line")
    w.println("1\t2\t2.0")
    w.println("2\t1\t1.0") // reverse direction, merges with the above
    w.println("2\t3")      // missing weight → 1.0
    w.println("3\t3\t9.0") // self loop → dropped by canonicalization
    w.close()

    val edges = EdgeListSource.readCanonical(spark, f.getAbsolutePath)
    val got = edges.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq((1L, 2L, 3.0), (2L, 3L, 1.0)))

    // the canonical form feeds the graph ops directly
    val deg = GraphOps.degrees(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(deg == Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }

  test("edge list write/read round-trip preserves edges") {
    val dir = Files.createTempDirectory("graft_edges_rt").toFile.getAbsolutePath
    import spark.implicits._
    val edges = Seq((1L, 2L, 1.5), (2L, 3L, 2.5)).toDF("src", "dst", "weight")
    EdgeListSource.write(edges, s"$dir/out")
    val back = EdgeListSource.read(spark, s"$dir/out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(t => (t._1, t._2))
    assert(back.toSeq == Seq((1L, 2L, 1.5), (2L, 3L, 2.5)))
  }

  test("json documents round-trip with explicit schema and prune columns") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val spark2 = spark
    import spark2.implicits._
    val dir = Files.createTempDirectory("graft_json").toString
    val docs = Seq((1L, "alpha beta", "en"), (2L, "gamma", "de"))
      .toDF("doc_id", "text", "lang")
    docs.write.mode("overwrite").json(s"$dir/docs")
    // Explicit schema: no inference pass over the data (an extra full
    // scan at 100 TB) and stable types.
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val back = spark.read.schema(schema).json(s"$dir/docs")
    assert(back.select(col("doc_id"), col("text"), col("lang")).collect().toSet
      == docs.collect().toSet)
    // column pruning reaches the JSON scan
    val pruned = back.select(col("doc_id"))
      .queryExecution.executedPlan.toString
    assert(pruned.contains("ReadSchema: struct<doc_id:bigint>"), pruned)
  }

  test("quoted csv round-trips text with embedded commas, quotes and newlines") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val spark2 = spark
    import spark2.implicits._
    val dir = Files.createTempDirectory("graft_csv").toString
    // The adversarial corpus for RFC-4180: delimiter inside a field,
    // escaped double quotes, a record spanning lines, and an empty
    // string (must not collapse to null on read with quoteAll).
    val docs = Seq(
      (1L, "plain words"),
      (2L, "comma, inside, field"),
      (3L, "she said \"hello, world\" twice"),
      (4L, "line one\nline two\nline three"),
      (5L, "")).toDF("doc_id", "text")
    docs.write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true")
      .option("escape", "\"")
      .csv(s"$dir/docs")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val back = spark.read.schema(schema)
      .option("header", "true").option("multiLine", "true")
      .option("escape", "\"")
      .csv(s"$dir/docs")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)).getOrElse("")))
      .sortBy(_._1)
    assert(back.toSeq == docs.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq)
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    val conf = spark.conf
    val oldThreshold = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      (1L to 1000L).map(i => (i, s"a$i")).toDF("id", "a")
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "id").sortBy("id").saveAsTable("graft_bkt_a")
      (1L to 1000L).map(i => (i, i * 2.0)).toDF("id", "b")
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "id").sortBy("id").saveAsTable("graft_bkt_b")
      val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      // co-located bucketed join: no shuffle exchange on either side
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() == 1000L)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = Files.createTempDirectory("graft_part").toFile.getAbsolutePath
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
      .toDF("id", "k", "v")
      .write.mode("overwrite").partitionBy("k").parquet(s"$dir/t")
    val pruned = spark.read.parquet(s"$dir/t").filter($"k" === "a")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
    // partition filter must appear in the scan, not a post-filter
    assert(plan.contains("PartitionFilters") || !plan.contains("Filter ("), plan)
  }

  test("binaryFile source: payload round-trip is byte-exact, markers excluded") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_bin").toFile.getAbsolutePath
    val docs = Seq(
      (1L, "hello world"),
      (2L, ""),             // empty payload → 0-byte file, see below
      (7L, "naïve déjà-vu") // multi-byte UTF-8: bytes ≠ chars
    ).toDF("doc_id", "text")
    BinaryFileSource.writePayloadFiles(docs, dir)
    val back = BinaryFileSource.readPayloads(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        new String(r.getAs[Array[Byte]](2), "UTF-8")))
      .sortBy(_._1)
    // _SUCCESS is in the directory but pathGlobFilter keeps it out.
    assert(new java.io.File(dir, "_SUCCESS").exists())
    // PIN the source quirk: the 0-byte doc_2.bin exists on disk but
    // Spark sizes file splits by length, so a 0-length file yields
    // NO partition — zero-byte assets are invisible to binaryFile
    // (the src_binary_files oracle excludes empty text to match).
    assert(new java.io.File(dir, "doc_2.bin").exists())
    assert(back.toSeq == Seq(
      (1L, 11L, "hello world"),
      (7L, "naïve déjà-vu".getBytes("UTF-8").length.toLong, "naïve déjà-vu")))
  }

  test("mixed parquet vintages: one explicit widened schema reads both files") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_vint").toFile.getAbsolutePath
    // v1 vintage: narrow INT32 id, no source column (old ingest)
    Seq(1, 2).toDF("doc_id")
      .select(col("doc_id").cast("int").as("doc_id"))
      .write.mode("overwrite").parquet(s"$dir/t")
    // v2 vintage: widened BIGINT id + added column, same directory
    Seq((10L, "web"), (11L, "book")).toDF("doc_id", "source")
      .write.mode("append").parquet(s"$dir/t")

    // The scale path: declare the target schema once; the per-file
    // parquet scan widens INT32→BIGINT and null-fills absent columns.
    val got = spark.read.schema("doc_id long, source string")
      .parquet(s"$dir/t")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, None), (2L, None),
      (10L, Some("web")), (11L, Some("book"))))

    // mergeSchema handles ONLY the add-column half of the drift: over
    // files that differ by a type change it throws CANNOT_MERGE_SCHEMAS
    // (pinned so the next vintage drift reaches for the explicit-schema
    // path, not the mergeSchema flag).
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.option("mergeSchema", "true").parquet(s"$dir/t").schema
    }
    assert(ex.getMessage.contains("CANNOT_MERGE_SCHEMAS"), ex.getMessage)
  }

  test("mergeSchema unions add-only vintages; plain read binds one footer") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_vint2").toFile.getAbsolutePath
    Seq((1L, "en")).toDF("doc_id", "lang")
      .write.mode("overwrite").parquet(s"$dir/t")
    Seq((2L, "de", 42L)).toDF("doc_id", "lang", "n_chars")
      .write.mode("append").parquet(s"$dir/t")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/t")
    assert(merged.schema.fieldNames.sorted.toSeq == Seq("doc_id", "lang", "n_chars"))
    assert(merged.count() == 2L)
  }

  test("text-line round-trip preserves ids and text through the delimiter") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_text_rt").toFile.getAbsolutePath
    val docs = Seq(
      (1L, "hello  world"),   // double space survives (no trim on write)
      (2L, ""),               // empty text → trailing-delimiter line
      (7L, "naïve déjà-vu"),  // multi-byte UTF-8
      (9L, "tab\ttokens here") // tab is whitespace, not the delimiter
    ).toDF("doc_id", "text")
    docs.select(concat_ws("\u0001", col("doc_id"), col("text")).as("value"))
      .write.text(s"$dir/out")
    val parts = split(col("value"), "\u0001", 2)
    val back = spark.read.text(s"$dir/out")
      .select(parts.getItem(0).cast("long").as("doc_id"),
        parts.getItem(1).as("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(back.toSeq == Seq((1L, "hello  world"), (2L, ""),
      (7L, "naïve déjà-vu"), (9L, "tab\ttokens here")))
  }
}
