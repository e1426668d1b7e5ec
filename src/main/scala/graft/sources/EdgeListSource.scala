package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.graph.GraphBuilder

/** Delimited edge-list ingestion — the reference engine's native
  * input format (src<sep>dst[<sep>weight] per line, '#' comments).
  * Reads through Spark's CSV source (splittable, predicate-prunable)
  * and canonicalizes into the engine's undirected weighted edge form.
  */
object EdgeListSource {

  val schema: StructType = StructType(Seq(
    StructField("src", LongType, nullable = false),
    StructField("dst", LongType, nullable = false),
    StructField("weight", DoubleType, nullable = true)))

  /** Read a delimited edge list. Missing weight column → 1.0.
    * Comment lines starting with '#' are dropped. */
  def read(spark: SparkSession, path: String, delimiter: String = "\t"): DataFrame =
    spark.read
      .schema(schema)
      .option("sep", delimiter)
      .option("comment", "#")
      .option("mode", "PERMISSIVE")
      .csv(path)
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .withColumn("weight", coalesce(col("weight"), lit(1.0)))

  val stringSchema: StructType = StructType(Seq(
    StructField("src", StringType, nullable = false),
    StructField("dst", StringType, nullable = false),
    StructField("weight", DoubleType, nullable = true)))

  /** Read an edge list whose vertex ids are arbitrary strings (the
    * common shape of real-world edge files). Pair with
    * `GraftGraph(spark, df)`, which dictionary-encodes them. */
  def readString(spark: SparkSession, path: String, delimiter: String = "\t"): DataFrame =
    spark.read
      .schema(stringSchema)
      .option("sep", delimiter)
      .option("comment", "#")
      .option("mode", "PERMISSIVE")
      .csv(path)
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .withColumn("weight", coalesce(col("weight"), lit(1.0)))

  /** Read + canonicalize (undirected src<dst, parallel edges summed,
    * self-loops dropped). */
  def readCanonical(spark: SparkSession, path: String, delimiter: String = "\t"): DataFrame =
    GraphBuilder.canonicalEdges(read(spark, path, delimiter), "src", "dst", "weight")

  /** Write an edge DataFrame back out as a delimited edge list. */
  def write(edges: DataFrame, path: String, delimiter: String = "\t"): Unit =
    edges.select(col("src"), col("dst"), col("weight"))
      .write.mode("overwrite").option("sep", delimiter).csv(path)
}
