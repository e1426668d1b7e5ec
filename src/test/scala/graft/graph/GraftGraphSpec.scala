package graft.graph

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftGraphSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("facade wires every operator over one canonical edge set") {
    val raw = Seq((1L, 2L), (2L, 1L), (2L, 3L), (4L, 5L))
      .toDF("src", "dst")
    val g = GraftGraph(spark, raw, weightCol = None)
    assert(g.edges.count() == 3) // (1,2) merged
    assert(g.degrees().count() == 5)
    assert(g.triangleCount().collect()(0).getLong(0) == 0L)
    val cc = g.connectedComponents().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cc(4L) == cc(5L) && cc(1L) != cc(4L))
    assert(g.louvain().count() == 5)
    assert(g.pageRank().count() == 5)
  }

  test("fromKnn clusters a planted embedding set end-to-end") {
    // Three well-separated base directions with per-member jitter:
    // embeddings → mutual-kNN cosine graph → CC / Louvain must
    // recover exactly the three planted clusters (the SemDeDup story
    // in one facade call).
    def vec(axis: Int, jitter: Int): Seq[Float] =
      (0 until 64).map { i =>
        val base = if (i == axis) 10f else 0f
        base + (if (i == (axis + jitter + 1) % 64) 0.1f * (jitter + 1) else 0f)
      }
    val emb = (for { c <- 0 until 3; j <- 0 until 5 }
      yield ((c * 10 + j).toLong, vec(c * 20, j))).toDF("vec_id", "embedding")
    val g = GraftGraph.fromKnn(spark, emb, k = 4)
    val cc = g.connectedComponents().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cc.size == 15, s"all planted members in the graph, got ${cc.size}")
    for (c <- 0 until 3; j <- 1 until 5)
      assert(cc(c * 10L + j) == cc(c * 10L), s"member ${c * 10 + j} split off")
    assert(Set(cc(0L), cc(10L), cc(20L)).size == 3, "clusters must not merge")
    val comm = g.louvain().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    for (c <- 0 until 3; j <- 1 until 5)
      assert(comm(c * 10L + j) == comm(c * 10L))
    assert(Set(comm(0L), comm(10L), comm(20L)).size == 3)
  }

  test("string vertex ids round-trip through louvain and cc with original labels") {
    // Two name-keyed triangles joined by nothing: the facade must
    // dictionary-encode, run the long-id algorithms, and hand back
    // the original string labels in BOTH the vertex and the
    // community/component columns.
    val names = Seq(
      ("alice", "bob", 1.0), ("bob", "carol", 1.0), ("alice", "carol", 1.0),
      ("xavier", "yolanda", 1.0), ("yolanda", "zed", 1.0), ("xavier", "zed", 1.0))
      .toDF("src", "dst", "weight")
    val g = GraftGraph(spark, names)
    val cc = g.connectedComponentsDF().collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(cc.keySet == Set("alice", "bob", "carol", "xavier", "yolanda", "zed"))
    assert(cc("alice") == cc("bob") && cc("bob") == cc("carol"))
    assert(cc("xavier") == cc("yolanda") && cc("yolanda") == cc("zed"))
    assert(cc("alice") != cc("zed"))
    assert(cc.values.toSet.subsetOf(cc.keySet), "component labels must be original ids")
    val comm = g.louvain().collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(comm("alice") == comm("bob") && comm("bob") == comm("carol"))
    assert(comm("xavier") == comm("yolanda") && comm("yolanda") == comm("zed"))
    assert(comm("alice") != comm("xavier"))
  }

  test("facade leiden, node2vec and anf decode string labels") {
    val names = Seq(
      ("alice", "bob", 1.0), ("bob", "carol", 1.0), ("alice", "carol", 1.0),
      ("xavier", "yolanda", 1.0), ("yolanda", "zed", 1.0), ("xavier", "zed", 1.0))
      .toDF("src", "dst", "weight")
    val g = GraftGraph(spark, names)
    val le = g.leiden().collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(le.map(_._1).toSet ==
      Set("alice", "bob", "carol", "xavier", "yolanda", "zed"))
    assert(le.map(_._3).toSet.subsetOf(le.map(_._1).toSet),
      "refined community labels must be original ids")
    val walks = g.node2vecWalks(steps = 3).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    assert(walks.map(_._1).toSet.subsetOf(le.map(_._1).toSet))
    assert(walks.count(_._2 == 0) == 6)
    // two disjoint triangles: N(r) fixes at 2·(3·3) = 18 after r=1
    val anf = g.anf().collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(anf.sortBy(_._1).toSeq == Seq((0, 6L), (1, 18L)))
  }

  test("facade walkPmi and richClub decode string labels") {
    val names = Seq(
      ("alice", "bob", 1.0), ("bob", "carol", 1.0), ("alice", "carol", 1.0),
      ("carol", "dave", 1.0))
      .toDF("src", "dst", "weight")
    val g = GraftGraph(spark, names)
    val pmi = g.walkPmi(steps = 3).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val ids = Set("alice", "bob", "carol", "dave")
    assert(pmi.nonEmpty)
    assert(pmi.map(_._1).toSet.subsetOf(ids) && pmi.map(_._2).toSet.subsetOf(ids))
    assert(pmi.forall(_._4 > 0))
    val rc = g.richClub().collect()
    // Degrees 2,2,3,1: spine has 3 distinct degrees; only k=1 keeps
    // >=2 survivors (the three degree>=2 vertices form a triangle).
    assert(rc.length == 3)
    val k1 = rc.find(_.getLong(0) == 1L).get
    assert(k1.getLong(1) == 3L && k1.getLong(2) == 3L
      && k1.getLong(3) == 1000000L)
  }

  test("similarity surface decodes string ids: jaccard, adamic-adar, strong ties") {
    // Heavy 5-clique on names + weight-1 filler edges so strongTies
    // keeps the clique; adamic-adar then predicts nothing inside the
    // clique (all adjacent) and the facade returns original labels.
    val people = Seq("ann", "ben", "cat", "dan", "eve")
    val clique = for {
      a <- people; b <- people if a < b
    } yield (a, b, 5.0)
    val filler = (1 to 30).map(i => (s"f$i", s"g$i", 1.0))
    val g = GraftGraph(spark, (clique ++ filler).toDF("src", "dst", "weight"))
    val st = g.strongTies()
    assert(st.edges.count() == 10L) // just the clique
    val jac = st.edgeJaccard().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(3))).toMap
    // every clique edge: common = 3 of 4+4-3 union → jaccard 0.6
    assert(jac.keySet.flatMap(t => Set(t._1, t._2)) == people.toSet)
    assert(jac.values.forall(_ == 6000L), jac.toString)
    // 4-regular clique → zero degree variance → the degenerate guard
    // must yield NULL, not a NaN cast error
    assert(st.assortativity().collect()(0).isNullAt(1))
    val aa = g.adamicAdar().collect()
    // cross-pairs like (ann, f1) have no common neighbors; inside the
    // clique everything is adjacent → no prediction among people
    assert(!aa.exists(r => people.contains(r.getString(0))
      && people.contains(r.getString(1))))
  }

  test("facade hits and betweenness decode string labels") {
    // HITS runs on the ORIGINAL orientation: u→v and w→v make v the
    // sole authority and u, w equal hubs (each normalizes to 1e6) —
    // on the canonicalized undirected view the roles would blur.
    val directed = Seq(("u", "v", 1.0), ("w", "v", 1.0))
      .toDF("src", "dst", "weight")
    val h = GraftGraph(spark, directed).hits().collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(h == Map(("v", "auth") -> 1000000L,
      ("u", "hub") -> 1000000L, ("w", "hub") -> 1000000L), h.toString)

    // Landmark betweenness on the path ann—bob—cat from its
    // endpoints: only bob carries any dependency; landmarks are
    // given (and results returned) as original labels.
    val path = Seq(("ann", "bob", 1.0), ("bob", "cat", 1.0))
      .toDF("src", "dst", "weight")
    val bc = GraftGraph(spark, path)
      .betweennessCentrality(Seq("ann", "cat")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(bc.keySet == Set("ann", "bob", "cat"), bc.toString)
    assert(bc("bob") > 0L && bc("ann") == 0L && bc("cat") == 0L, bc.toString)
    // unknown landmark labels fail loudly, not silently
    val err = intercept[IllegalArgumentException] {
      GraftGraph(spark, path).betweennessCentrality(Seq("nobody"))
    }
    assert(err.getMessage.contains("nobody"))
  }

  test("facade kTruss decodes edge labels") {
    // 4-clique among people plus a star at hub: the truss keeps the
    // clique edges (as original labels) and drops the star.
    val g = Seq(("ann", "bob"), ("ann", "cat"), ("ann", "dan"),
      ("bob", "cat"), ("bob", "dan"), ("cat", "dan"),
      ("hub", "s1"), ("hub", "s2"), ("hub", "s3"))
      .map { case (a, b) => (a, b, 1.0) }.toDF("src", "dst", "weight")
    val t = GraftGraph(spark, g).kTruss(4).collect()
      .map(r => Set(r.getString(0), r.getString(1)))
    assert(t.length == 6)
    assert(t.forall(_.subsetOf(Set("ann", "bob", "cat", "dan"))))
  }

  test("facade modularityOf scores a string-id assignment to Louvain's own Q") {
    import org.apache.spark.sql.functions.col
    val names = Seq(
      ("alice", "bob", 1.0), ("bob", "carol", 1.0), ("alice", "carol", 1.0),
      ("xavier", "yolanda", 1.0), ("yolanda", "zed", 1.0), ("xavier", "zed", 1.0))
      .toDF("src", "dst", "weight")
    val g = GraftGraph(spark, names)
    val q = g.modularityOf(
      g.louvain().select(col("vertex"), col("community").as("label")))
      .collect()(0)
    // two disjoint triangles, communities = the triangles → Q = 0.5
    assert((q.getLong(0), q.getLong(1), q.getLong(2)) == ((6L, 2L, 500000L)))
    val lastLevelQ = g.louvainLevels().orderBy(col("level").desc)
      .collect()(0).getLong(1)
    assert(math.abs(lastLevelQ - q.getLong(2)) <= 1L)
  }

  test("explicit landmarks on a string-id graph are given as labels") {
    val names = Seq(
      ("alice", "bob", 1.0), ("bob", "carol", 1.0), ("carol", "dave", 1.0))
      .toDF("src", "dst", "weight")
    val g = GraftGraph(spark, names)
    val sp = g.shortestPaths(Seq("alice")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // landmark column decodes back to the label; distances are hops
    // from "alice" regardless of what dense id it was encoded to.
    val dist = sp.map { case (v, l, d) => assert(l == "alice"); v -> d }.toMap
    assert(dist == Map("alice" -> 0L, "bob" -> 1L, "carol" -> 2L, "dave" -> 3L), sp.toString)
    // unknown labels fail loudly instead of selecting arbitrary vertices
    val err = intercept[IllegalArgumentException](g.shortestPaths(Seq("nobody")))
    assert(err.getMessage.contains("nobody"))
    // the shared landmark translation serves the whole landmark family
    val cc = g.closenessCentrality(Seq("alice")).collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    assert(cc == Map("bob" -> 1L, "carol" -> 2L, "dave" -> 3L), cc.toString)
    val ppr = g.personalizedPageRank(Seq("alice"), iters = 2).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // mass concentrates at the seed; every vertex decodes to a label
    assert(ppr.keySet == Set("alice", "bob", "carol", "dave"))
    assert(ppr("alice") == ppr.values.max, ppr.toString)
    // weighted distances share the translation: alice→carol is 2 by
    // weight sum (1+1), not 1 hop — and labels decode on both columns.
    val wd = g.weightedShortestPaths(Seq("alice")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val wdist = wd.map { case (v, l, d) => assert(l == "alice"); v -> d }.toMap
    assert(wdist == Map("alice" -> 0L, "bob" -> 1L, "carol" -> 2L, "dave" -> 3L),
      wd.toString)
  }

  test("string-id edge list file reads and analyzes end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft_strids")
    val f = dir.resolve("edges.tsv")
    java.nio.file.Files.writeString(f,
      "# named graph\nalice\tbob\nbob\tcarol\t2.0\nalice\tcarol\n")
    val g = GraftGraph.fromEdgeList(spark, f.toString, stringIds = true)
    val deg = g.degrees().collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(deg("bob") == ((2L, 3.0)), s"got $deg")
    assert(deg.keySet == Set("alice", "bob", "carol"))
  }

  test("louvain recovers 50 planted cliques in a 250-vertex ring") {
    // 50 cliques of 5, ring-linked by single weak edges — planted
    // community structure at a size where multi-level compression
    // actually engages.
    val k = 50
    val size = 5
    val cliques = (0 until k).flatMap { c =>
      val base = c * size
      for (i <- 0 until size; j <- i + 1 until size)
        yield (base + i.toLong, base + j.toLong)
    }
    val ring = (0 until k).map { c =>
      ((c * size + size - 1).toLong, (((c + 1) % k) * size).toLong)
    }
    val edges = (cliques ++ ring).map { case (a, b) => (a, b, 1.0) }
      .toDF("src", "dst", "weight")
    val g = GraftGraph(spark, edges)
    val comm = g.louvain().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // every planted clique must be assigned a single community
    (0 until k).foreach { c =>
      val ids = (0 until size).map(i => comm((c * size + i).toLong)).toSet
      assert(ids.size == 1, s"clique $c split across $ids")
    }
    val levels = g.louvainLevels().collect()
    val finalQ = levels.map(_.getLong(1)).max / 1e6
    // ideal partition Q for ring-of-cliques ≈ 1 - 1/k - m_inter/m; loose floor:
    assert(finalQ > 0.8, s"modularity $finalQ too low: $levels")

    // Resolution sweep on the same graph. At γ = 1 the classic
    // resolution limit (Fortunato & Barthélemy 2007) merges adjacent
    // ring cliques pairwise (10 intra-edges < √(2m)) — that is the
    // optimum, not a bug. Raising γ strengthens the Σtot² penalty and
    // recovers the planted cliques; lowering γ coarsens further.
    val nAtGamma1 = g.louvain().select("community").distinct().count()
    val nFine = g.louvain(resolution = 4.0)
      .select("community").distinct().count()
    val nCoarse = g.louvain(resolution = 0.02)
      .select("community").distinct().count()
    assert(nCoarse < nAtGamma1 && nAtGamma1 < nFine,
      s"γ sweep not monotone: γ=0.02 → $nCoarse, γ=1 → $nAtGamma1, γ=4 → $nFine")
    assert(nFine == 50L, s"γ=4 should recover the 50 planted cliques, got $nFine")
  }
}
