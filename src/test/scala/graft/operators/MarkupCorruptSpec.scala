package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** Markup routing signal and PERMISSIVE dirty-CSV ingestion. */
class MarkupCorruptSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("markup detector: tags and entities vote independently; prose is cold") {
    val docs = Seq(
      (1L, "<html> <body> <p>hi</p> </body> </html>"), // 6 tag spans
      (2L, "tom &amp; jerry &lt; cat &gt; mouse"),      // 3 entities
      (3L, "a < b and b > c plain prose here"),          // bare comparisons
      (4L, "just ordinary text")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.markupDetectOf(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(5))))
      .toMap
    assert(out(1L)._1 == 6L && out(1L)._3)
    assert(out(2L)._2 == 3L && out(2L)._3)
    // "< b and b >" matches one <...> span; far below the threshold
    assert(!out(3L)._3 && !out(4L)._3)
  }

  test("PERMISSIVE csv: malformed rows null-fill, good rows parse intact") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val dir = java.nio.file.Files.createTempDirectory("graft_badcsv").toString
    val w = new java.io.PrintWriter(s"$dir/part.csv")
    try {
      w.println("doc_id,text")
      w.println("""1,"alpha beta"""")
      w.println("""oops,"bad"""")
      w.println("""2,"gamma"""")
    } finally w.close()
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val df = spark.read.schema(schema)
      .option("header", "true").option("mode", "PERMISSIVE").csv(dir)
    val rows = df.collect().map(r =>
      (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(rows.toSeq == Seq((-1L, "bad"), (1L, "alpha beta"), (2L, "gamma")))
  }
}
