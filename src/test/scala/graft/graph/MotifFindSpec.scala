package graft.graph

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MotifFindSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  // Directed test graph: two feed-forward triangles sharing an edge,
  // one 3-cycle, a dangling chain, a self-loop and a duplicate edge
  // (the last two must be invisible under set semantics).
  private def directedEdges = {
    import spark.implicits._
    Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), // ffl abc
      (1L, 4L), (4L, 3L),           // second ffl over (1,3): 1→4→3
      (5L, 6L), (6L, 7L), (7L, 5L), // 3-cycle
      (7L, 8L), (8L, 9L),           // chain
      (9L, 9L),                     // self-loop (dropped)
      (1L, 2L)                      // duplicate (deduped)
    ).toDF("src", "dst")
  }

  test("feed-forward and cycle motifs equal the triad census") {
    val e = directedEdges
    val census = GraphOps.triadCensus(spark, e).head()
    val ff = MotifFind.find(e, "(a)-[]->(b); (b)-[]->(c); (a)-[]->(c)")
      .filter(col("a") =!= col("c")).count()
    val cyc = MotifFind.find(e, "(a)-[]->(b); (b)-[]->(c); (c)-[]->(a)")
      .filter(col("a") < col("b") && col("a") < col("c")).count()
    assert(ff == census.getLong(0), s"ffl $ff vs census ${census.getLong(0)}")
    assert(cyc == census.getLong(1), s"cycle $cyc vs census ${census.getLong(1)}")
    assert(ff == 2L && cyc == 1L)
  }

  test("undirected triangle motif equals triangleCount") {
    import spark.implicits._
    // Undirected canonical edges: K4 plus a pendant (K4 has 4 triangles).
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val viaMotif = MotifFind.find(und, "(a)-[]-(b); (b)-[]-(c); (a)-[]-(c)")
      .filter(col("a") < col("b") && col("b") < col("c")).count()
    val viaCensus = GraphOps.triangleCount(und).head().getLong(0)
    assert(viaMotif == viaCensus && viaMotif == 4L)
  }

  test("negated term: open wedges + closed wedges = all wedges") {
    val e = directedEdges
    val wedges = MotifFind.find(e, "(a)-[]->(b); (b)-[]->(c)")
      .filter(col("a") =!= col("c")).count()
    val closed = MotifFind.find(e, "(a)-[]->(b); (b)-[]->(c); (a)-[]->(c)")
      .filter(col("a") =!= col("c")).count()
    val open = MotifFind.find(e, "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)")
      .filter(col("a") =!= col("c")).count()
    assert(open + closed == wedges, s"$open + $closed != $wedges")
    assert(open > 0L)
  }

  test("broadcast and shuffled term-join paths agree") {
    val e = directedEdges
    def counts() = (
      MotifFind.find(e, "(a)-[]->(b); (b)-[]->(c); (a)-[]->(c)")
        .filter(col("a") =!= col("c")).count(),
      MotifFind.find(e, "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)")
        .filter(col("a") =!= col("c")).count())
    val viaBroadcast = counts()
    spark.conf.set("graft.broadcast.bytes", "1")
    try assert(counts() == viaBroadcast)
    finally spark.conf.unset("graft.broadcast.bytes")
  }

  test("GraftGraph.find decodes string vertex labels") {
    import spark.implicits._
    val edges = Seq(("x", "y", 1.0), ("y", "z", 1.0), ("x", "z", 1.0))
      .toDF("src", "dst", "weight")
    val g = GraftGraph(spark, edges)
    val rows = g.find("(a)-[]->(b); (b)-[]->(c); (a)-[]->(c)")
      .filter(col("a") =!= col("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(("x", "y", "z")))
  }

  test("anonymous ends match but don't appear in output; negated anon is existential") {
    val e = directedEdges
    // One row per out-edge of a (bag semantics), single output column.
    val outs = MotifFind.find(e, "(a)-[]->()")
    assert(outs.columns.toSeq == Seq("a"))
    assert(outs.count() == 10L) // 10 distinct non-self directed edges
    // Sink-pointing edges: b exists but has no out-edge of its own.
    val sinks = MotifFind.find(e, "(a)-[]->(b); !(b)-[]->()")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sinks == Set((2L, 3L), (1L, 3L), (4L, 3L), (8L, 9L)), sinks.toString)
    // Anonymous-first-term patterns bind from the anonymous side too.
    assert(MotifFind.find(e, "()-[]->(b)").columns.toSeq == Seq("b"))
  }

  test("malformed patterns and unbound negations are rejected") {
    val e = directedEdges
    intercept[IllegalArgumentException](MotifFind.parse("(a)->(b)"))
    intercept[IllegalArgumentException](MotifFind.parse("!(a)-[]->(b)"))
    intercept[IllegalArgumentException](MotifFind.parse("(a)-[]->(a)"))
    intercept[IllegalArgumentException](
      MotifFind.find(e, "(a)-[]->(b); (c)-[]->(d)")) // disconnected
    intercept[IllegalArgumentException](
      MotifFind.find(e, "(a)-[]->(b); !(a)-[]->(z)")) // unbound z
    intercept[IllegalArgumentException](MotifFind.parse("()-[]->()")) // nothing named
    intercept[IllegalArgumentException](
      MotifFind.parse("(a)-[]->(b); !()-[]->()")) // negated both-anonymous
  }
}
