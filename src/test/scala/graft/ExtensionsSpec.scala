package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Uses the shared test session with runtime registration — the
  * suite-ordering-safe path (`withExtensions` only applies when the
  * session is first built; `getOrCreate` would silently reuse an
  * existing one). */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = graft.graph.SparkTestSession.spark
    GraftExtensions.register(s)
    s
  }

  test("custom expressions are callable from SQL") {
    val row = spark.sql(
      """SELECT simhash64(array('a','b','c')) AS sh,
        |  rolling_hash64('hello world') AS rh,
        |  minhash_sig(array('x','y'), 8) AS mh,
        |  cosine_sim(array(1.0D, 0.0D), array(1.0D, 1.0D)) AS cs,
        |  inner_product(array(2.0D, 3.0D), array(4.0D, 5.0D)) AS ip""".stripMargin)
      .collect()(0)
    assert(row.getLong(0) != 0L)
    assert(row.getLong(1) != 0L)
    assert(row.getSeq[Long](2).length == 8)
    assert(math.abs(row.getDouble(3) - math.sqrt(0.5)) < 1e-12)
    assert(row.getDouble(4) == 23.0)
  }

  test("sorted_kv_intersect_stats from SQL matches the Column API and hand counts") {
    import org.apache.spark.sql.functions._
    val row = spark.sql(
      """SELECT sorted_kv_intersect_stats(
        |  array(1L, 3L, 5L, 9L), array(10L, 30L, 50L, 90L),
        |  array(2L, 3L, 9L, 11L)) AS s""".stripMargin).collect()(0)
    val s = row.getStruct(0)
    // intersection {3, 9} → common 2, vsum 30 + 90
    assert(s.getLong(0) == 2L && s.getLong(1) == 120L)
    val viaCol = spark.range(1).select(
      graft.functions.CatalystGraph.sorted_kv_intersect_stats(
        array(lit(1L), lit(3L), lit(5L), lit(9L)),
        array(lit(10L), lit(30L), lit(50L), lit(90L)),
        array(lit(2L), lit(3L), lit(9L), lit(11L))).as("s"))
      .collect()(0).getStruct(0)
    assert(viaCol.getLong(0) == s.getLong(0) && viaCol.getLong(1) == s.getLong(1))
    // disjoint and empty inputs
    val z = spark.sql(
      "SELECT sorted_kv_intersect_stats(array(1L), array(5L), array(2L)) AS s,"
        + " sorted_kv_intersect_stats(CAST(array() AS ARRAY<BIGINT>),"
        + "   CAST(array() AS ARRAY<BIGINT>), array(1L)) AS e")
      .collect()(0)
    assert(z.getStruct(0).getLong(0) == 0L && z.getStruct(1).getLong(0) == 0L)
  }

  test("l2_normalize yields unit vectors and matches the HOF composition") {
    import org.apache.spark.sql.functions._
    import graft.functions.CatalystText
    val row = spark.sql(
      "SELECT l2_normalize(array(3.0D, 4.0D)) AS v").collect()(0)
    assert(row.getSeq[Double](0) == Seq(0.6, 0.8))
    // parity with the interpreted builtin composition it replaces
    val df = spark.range(1).select(
      array(lit(1.0f), lit(2.0f), lit(2.0f)).as("e"))
    val viaNative = df.select(CatalystText.l2_normalize(col("e"))).collect()(0).getSeq[Double](0)
    val viaHof = df.select({
      val e = col("e").cast("array<double>")
      transform(e, x => x / sqrt(aggregate(e, lit(0.0), (a, x2) => a + x2 * x2)))
    }).collect()(0).getSeq[Double](0)
    assert(viaNative == viaHof)
  }

  test("bottom_k_by_key aggregate is callable from SQL and matches the Column API") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1L to 100L).map(i => (s"g${i % 3}", f"k$i%03d", i))
      .toDF("g", "k", "v")
    df.createOrReplaceTempView("bk")
    val viaSql = spark.sql(
      "SELECT g, bottom_k_by_key(k, v, 2) AS ids FROM bk GROUP BY g ORDER BY g")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1))
    val viaColumn = df.groupBy(col("g"))
      .agg(graft.functions.BottomK.bottom_k_by_key(col("k"), col("v"), 2).as("ids"))
      .orderBy(col("g"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1))
    assert(viaSql.toSeq == viaColumn.toSeq)
    // zero-padded keys sort lexicographically = numerically: the two
    // smallest v per group are the expected sample
    assert(viaSql.toMap.apply("g1") == Seq(1L, 4L))
  }

  test("SQL and Column APIs produce identical fingerprints") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.{CatalystText, TextFunctions}
    val df = Seq("one two three", "four five six").toDF("text")
    val viaColumn = df.select(CatalystText.rolling_hash64(col("text"))).collect().map(_.getLong(0))
    df.createOrReplaceTempView("t")
    val viaSql = spark.sql("SELECT rolling_hash64(text) FROM t").collect().map(_.getLong(0))
    assert(viaColumn.toSeq == viaSql.toSeq)
    val simC = df.select(CatalystText.simhash64(TextFunctions.tokens(col("text")))).collect().map(_.getLong(0))
    val simS = spark.sql("SELECT simhash64(split(trim(text), '\\\\s+')) FROM t").collect().map(_.getLong(0))
    assert(simC.toSeq == simS.toSeq)
  }
}
