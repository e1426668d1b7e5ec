package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{DataType, LongType, StructType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver-generated test schema.
  *
  * Each loader is a plain `spark.read.parquet` — column pruning and
  * predicate pushdown are left to Catalyst, which prunes the parquet
  * scan to exactly the columns/filters each query uses (verified via
  * `.explain("formatted")`: `ReadSchema` / `PushedFilters`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")

  /** `events.ts` has shipped in more than one physical parquet
    * encoding across testdata generations: TIMESTAMP(NANOS) — which
    * Spark's vectorized reader only accepts as a raw INT64 under the
    * legacy conf — and TIMESTAMP(MICROS, isAdjustedToUTC=false),
    * which Spark reads as TIMESTAMP_NTZ. A 100 TB lake mixes parquet
    * vintages the same way, so ingestion branches on the footer's
    * actual `ts` dataType instead of binding to one encoding.
    *
    * All three helpers below normalize to the SAME logical value the
    * engine has always used: microsecond-precision TimestampType
    * (`eventsTsCol`) or epoch-µs BIGINT (`eventsTsUsCol`). Nanos are
    * floored to µs with integer division (ns epochs overflow double's
    * 53-bit mantissa — no float math); NTZ wall-clocks are
    * reinterpreted as instants under the session timezone, which this
    * project pins to UTC everywhere (Verify/Bench/specs), making the
    * cast value-identical to the UTC-written testdata.
    */
  def eventsRawSchema(s: SparkSession, d: String): StructType = {
    // Must be set before the footer read: a NANOS file is otherwise
    // rejected at schema inference. No-op for other vintages.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events").schema
  }

  private def tsVintage[A](dt: DataType)(nanos: => A, micros: => A): A = dt match {
    case LongType                         => nanos // TIMESTAMP(NANOS) read as raw INT64
    case TimestampNTZType | TimestampType => micros // TIMESTAMP(MICROS/MILLIS), NTZ or UTC
    case other => throw new IllegalArgumentException(
      s"unsupported events.ts encoding: $other (expected INT64 nanos or TIMESTAMP)")
  }

  /** Raw `ts` → microsecond TimestampType, whatever the file vintage. */
  def eventsTsCol(schema: StructType): Column = tsVintage(schema("ts").dataType)(
    expr("timestamp_micros(ts div 1000)"),
    expr("cast(ts as timestamp)"))

  /** Raw `ts` → epoch-microseconds BIGINT, whatever the file vintage. */
  def eventsTsUsCol(schema: StructType): Column = tsVintage(schema("ts").dataType)(
    expr("ts div 1000"),
    expr("unix_micros(cast(ts as timestamp))"))

  def events(s: SparkSession, d: String): DataFrame = {
    val schema = eventsRawSchema(s, d)
    table(s, d, "events").withColumn("ts", eventsTsCol(schema))
  }
  /** Vintage normalization for the fingerprinted LLM-pipeline tables
    * (the generalization of the events.ts lesson BEFORE the next
    * drift, not after): every reader declares its table's canonical
    * LOGICAL schema and casts whatever physical vintage the footer
    * presents into it — INT32 ids widen to BIGINT, float64 embedding
    * vintages narrow to the float32 contract, and so on. A column
    * that is already canonical costs nothing (Catalyst eliminates
    * the trivial cast, so pushdown/pruning are untouched on current
    * data); a MISSING canonical column fails loudly at analysis
    * instead of null-filling into silently-wrong results (the
    * add-column evolution case is its own explicit-schema query,
    * `src_schema_evolution`). TablesVintageSpec plants drifted
    * vintages per table and pins value-identical reads. */
  private def normalized(df: DataFrame, canon: Seq[(String, String)]): DataFrame =
    df.select(canon.map { case (n, t) => expr(s"`$n`").cast(t).as(n) }: _*)

  def documents(s: SparkSession, d: String): DataFrame =
    normalized(table(s, d, "documents"), Seq(
      "doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "bigint"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    normalized(table(s, d, "embeddings"), Seq(
      "vec_id" -> "bigint", "embedding" -> "array<float>", "label" -> "int"))
}
