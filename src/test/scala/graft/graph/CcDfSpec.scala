package graft.graph

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class CcDfSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def components(edges: Seq[(Long, Long)]): Map[Long, Set[Long]] = {
    val df = edges.map { case (a, b) => (a, b, 1.0) }.toDF("src", "dst", "weight")
    ConnectedComponentsDF.run(spark, df).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).map { case (c, vs) => c -> vs.map(_._1).toSet }
  }

  test("two chains and an isolated pair") {
    val comps = components(Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)))
    assert(comps.values.toSet == Set(Set(1L, 2L, 3L, 4L), Set(10L, 11L)))
    assert(comps.keySet == Set(1L, 10L), "component label must be the min id")
  }

  test("long path (stresses multi-round contraction)") {
    val n = 40L
    val comps = components((0L until n - 1).map(i => (i, i + 1)))
    assert(comps.values.toSet == Set((0L until n).toSet))
  }

  test("survives Long.MaxValue-scale vertex ids (ANSI sum overflow regression)") {
    // Snowflake/hash-scale ids: a raw long Σid signature would
    // overflow under Spark 4 ANSI mode; the decimal accumulator must
    // keep the run alive and correct.
    val big = Long.MaxValue
    val comps = components(Seq(
      (big, big - 1L), (big - 1L, big - 2L),
      (big - 10L, big - 11L)))
    assert(comps.values.toSet ==
      Set(Set(big, big - 1L, big - 2L), Set(big - 10L, big - 11L)))
    assert(comps.keySet == Set(big - 2L, big - 11L))
  }

  test("agrees with GraphX connected components on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    val df = edges.map { case (a, b) => (a, b, 1.0) }.toDF("src", "dst", "weight")
    val dfCc = ConnectedComponentsDF.run(spark, df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val gxCc = GraphOps.connectedComponents(spark, df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dfCc == gxCc)
  }
}
