package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Fluent facade over the graph operator set: wrap any (src, dst
  * [, weight]) DataFrame once, then call the analytics directly —
  * the API surface a user of the reference engine lands on.
  *
  * Vertex ids may be any type: integral ids pass through zero-cost;
  * anything else (strings, UUIDs) is dictionary-encoded to dense
  * longs (one sort + zipWithIndex over the distinct vertex set — the
  * standard scalable dictionary build) and every per-vertex result is
  * decoded back to the original labels, including community/component
  * columns (a community is labeled by its representative member).
  *
  * {{{
  * val g = GraftGraph(spark, edgesDf)          // canonicalizes
  * g.louvain()          // vertex → community
  * g.louvainLevels()    // modularity per level
  * g.degrees()          // degree + weighted degree
  * g.connectedComponents()
  * g.pageRank()
  * g.triangleCount()
  * }}}
  */
final class GraftGraph private (
    val spark: SparkSession,
    /** canonical undirected (src, dst, weight) edges, long vertex ids */
    val edges: DataFrame,
    /** (vid: original label, vertex_id: long) — present only when the
      * input ids were non-integral */
    private val dict: Option[DataFrame],
    /** (src, dst) in the ORIGINAL wrapped orientation, encoded to the
      * same long ids — the input for direction-aware measures (HITS),
      * which the canonical undirected view would erase. A lazy plan:
      * nothing is computed unless a directed measure runs. */
    private val directed: DataFrame) {

  /** Replace encoded long ids in `cols` with the original labels,
    * preserving column order. */
  private def decode(df: DataFrame, cols: Seq[String]): DataFrame =
    dict match {
      case None => df
      case Some(d) =>
        val order = df.columns.toSeq
        cols.foldLeft(df) { (acc, c) =>
          acc.join(d.select(col("vertex_id").as(c), col("vid").as(s"${c}__orig")), Seq(c))
            .drop(c)
            .withColumnRenamed(s"${c}__orig", c)
        }.select(order.map(col): _*)
    }

  def degrees(): DataFrame = decode(GraphOps.degrees(edges), Seq("vertex"))
  def degreeHistogram(): DataFrame = GraphOps.degreeHistogram(edges)
  def triangleCount(): DataFrame = GraphOps.triangleCount(edges)
  /** Global 4-cycle census (one scalar row) — counts only, no decode. */
  def squareCount(): DataFrame = GraphOps.squareCount(edges)
  def clusteringCoefficients(): DataFrame =
    decode(GraphOps.clusteringCoefficients(edges), Seq("vertex"))
  /** Landmarks are given as ORIGINAL vertex labels: on a
    * dictionary-encoded graph they are translated through the dict
    * (a label-keyed lookup over the vertex-sized dict table — the
    * landmark set is small by construction), so callers never see or
    * guess the internal dense ids. Unknown labels fail loudly rather
    * than silently selecting arbitrary vertices. */
  private def encodeLandmarks(landmarks: Seq[Any], who: String): Seq[Long] =
    dict match {
      case None => landmarks.map {
        case l: Long => l
        case i: Int => i.toLong
        case s: Short => s.toLong
        case b: Byte => b.toLong
        case other => throw new IllegalArgumentException(
          s"$who: graph has integral vertex ids but landmark '$other' " +
            s"(${other.getClass.getSimpleName}) is not integral")
      }
      case Some(d) if landmarks.nonEmpty =>
        val labels = landmarks.map(String.valueOf)
        val found = d.filter(col("vid").isin(labels: _*))
          .select(col("vid"), col("vertex_id"))
          .collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        val missing = labels.filterNot(found.contains)
        if (missing.nonEmpty) throw new IllegalArgumentException(
          s"$who: unknown landmark labels: ${missing.mkString(", ")}")
        labels.map(found)
      case Some(_) => Seq.empty
    }

  def shortestPaths(landmarks: Seq[Any] = Seq.empty): DataFrame =
    decode(GraphOps.shortestPaths(spark, edges,
      encodeLandmarks(landmarks, "shortestPaths")), Seq("vertex", "landmark"))
  /** Weighted (min edge-weight sum) landmark distances; empty
    * landmarks default to the 3 smallest internal ids, like
    * [[shortestPaths]]. */
  def weightedShortestPaths(landmarks: Seq[Any] = Seq.empty,
      rounds: Int = 6): DataFrame =
    decode(GraphOps.weightedShortestPaths(spark, edges,
      encodeLandmarks(landmarks, "weightedShortestPaths"), rounds),
      Seq("vertex", "landmark"))
  /** Seeded (personalized) PageRank; empty seeds default to the 3
    * smallest internal ids, like [[shortestPaths]]. */
  def personalizedPageRank(landmarks: Seq[Any] = Seq.empty,
      iters: Int = 10): DataFrame =
    decode(GraphOps.personalizedPageRank(spark, edges,
      encodeLandmarks(landmarks, "personalizedPageRank"), iters), Seq("vertex"))
  /** Landmark closeness/harmonic centrality over [[shortestPaths]]. */
  def closenessCentrality(landmarks: Seq[Any] = Seq.empty): DataFrame =
    decode(GraphOps.closenessCentrality(spark, edges,
      encodeLandmarks(landmarks, "closenessCentrality")), Seq("vertex"))
  /** Landmark betweenness (Brandes σ-splits from the landmark set;
    * empty landmarks default to the 3 smallest internal ids, like
    * [[shortestPaths]]). Landmarks are ORIGINAL labels. */
  def betweennessCentrality(landmarks: Seq[Any] = Seq.empty): DataFrame =
    decode(GraphOps.betweennessCentrality(spark, edges,
      encodeLandmarks(landmarks, "betweennessCentrality")), Seq("vertex"))
  /** HITS hubs/authorities over the ORIGINAL edge orientation as
    * wrapped (hub score of a vertex with no out-edges, or authority
    * with no in-edges, is simply absent, as in [[GraphOps.hits]]).
    * Ids decode back to the original labels. */
  def hits(iters: Int = 5): DataFrame =
    decode(GraphOps.hits(spark, directed, iters), Seq("id"))
  /** Directed triad census (feed-forward vs cycle counts) over the
    * graph's edges as stored — counts only, so no label decode. */
  def triadCensus(): DataFrame = GraphOps.triadCensus(spark, edges)
  /** Motif pattern matching over the graph's edges in their ORIGINAL
    * wrapped orientation (directed terms need it; the canonical
    * undirected view would erase direction). See [[MotifFind]] for
    * the pattern language; vertex columns decode back to the
    * original labels on dictionary-encoded graphs.
    *
    * {{{
    * g.find("(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)")  // open wedges
    * }}} */
  def find(pattern: String): DataFrame = {
    val res = MotifFind.find(directed, pattern)
    decode(res, res.columns.toSeq)
  }
  def kCore(k: Int): DataFrame = decode(GraphOps.kCore(spark, edges, k), Seq("vertex"))
  def kTruss(k: Int): DataFrame =
    decode(GraphOps.kTruss(spark, edges, k), Seq("src", "dst"))
  def randomWalks(steps: Int = 4): DataFrame =
    decode(GraphOps.randomWalks(spark, edges, steps), Seq("walk_id", "vertex"))
  /** Skip-gram (center, context) co-occurrence statistics over the
    * walk corpus — the PMI sufficient statistics a DeepWalk embedding
    * factorizes. */
  def walkPmi(steps: Int = 4, window: Int = 2): DataFrame =
    decode(GraphOps.walkPmi(spark, edges, steps, window),
      Seq("center", "context"))
  /** Rich-club coefficient φ(k) over the bounded degree spine. */
  def richClub(): DataFrame = GraphOps.richClub(edges)
  /** One-row graph profile (V, E, degree extremes, density). */
  def summary(): DataFrame = GraphOps.graphSummary(edges)
  /** Spectral bisection scores (Fiedler direction, integer power
    * iteration). */
  def spectralCut(rounds: Int = 15): DataFrame =
    decode(GraphOps.spectralCut(spark, edges, rounds), Seq("vertex"))
  /** One-hop neighborhood summary (the aggregateMessages primitive,
    * stated declaratively). */
  def neighborDegreeStats(): DataFrame =
    decode(GraphOps.neighborDegreeStats(edges), Seq("vertex"))
  /** Densest-subgraph stats by Bahmani batch peeling. */
  def densestSubgraph(maxRounds: Int = 12): DataFrame =
    GraphOps.densestSubgraph(spark, edges, maxRounds)
  def pageRankWeighted(iters: Int = 10): DataFrame =
    decode(GraphOps.pageRankWeighted(spark, edges, iters), Seq("vertex"))
  def connectedComponents(): DataFrame =
    decode(GraphOps.connectedComponents(spark, edges), Seq("vertex", "component"))
  /** DataFrame-native CC for graphs past GraphX's comfortable size. */
  def connectedComponentsDF(): DataFrame =
    decode(ConnectedComponentsDF.run(spark, edges), Seq("vertex", "component"))
  def pageRank(iters: Int = 10): DataFrame =
    decode(GraphOps.pageRank(spark, edges, iters), Seq("vertex"))
  def labelPropagation(iters: Int = 10): DataFrame =
    decode(GraphOps.labelPropagation(spark, edges, iters), Seq("vertex", "label"))
  /** `resolution` is generalized modularity's γ: 1.0 = classic
    * Louvain, larger → more and smaller communities, smaller →
    * coarser merging. */
  def louvain(resolution: Double = 1.0): DataFrame =
    decode(GraphOps.louvain(spark, edges, resolution), Seq("vertex", "community"))
  def louvainLevels(resolution: Double = 1.0): DataFrame =
    GraphOps.louvainLevels(spark, edges, resolution)
  /** Louvain + Leiden connectivity repair: every community connected. */
  def leiden(resolution: Double = 1.0): DataFrame =
    decode(GraphOps.leiden(spark, edges, resolution),
      Seq("vertex", "community_louvain", "community"))
  /** Second-order biased walks; equal weights ≡ [[randomWalks]]. */
  def node2vecWalks(steps: Int = 4, wReturn: Int = 1, wCommon: Int = 2,
      wOut: Int = 4): DataFrame =
    decode(GraphOps.node2vecWalks(spark, edges, steps, wReturn, wCommon, wOut),
      Seq("walk_id", "vertex"))
  /** HyperANF neighborhood function + 90% effective diameter. */
  def anf(lgK: Int = 12, maxRounds: Int = 32): DataFrame =
    GraphOps.anf(spark, edges, lgK, maxRounds)
  /** Bit-reproducible integer PageRank — identical output under any
    * partitioning (the run-to-run reproducibility contract). */
  def pageRankDeterministic(iters: Int = 10): DataFrame =
    decode(GraphOps.pageRankInteger(spark, edges, iters), Seq("vertex"))
  /** Strong-tie subgraph (weight ≥ 1.25× median) as a new graph —
    * the similarity statistics below are typically run on it. */
  def strongTies(): GraftGraph = {
    // the subgraph is undirected by construction: its canonical
    // orientation doubles as the directed view
    val st = GraphOps.strongTies(edges)
    new GraftGraph(spark, st, dict, st.select(col("src"), col("dst")))
  }
  def edgeJaccard(): DataFrame =
    decode(GraphOps.edgeJaccard(edges), Seq("src", "dst"))
  def assortativity(): DataFrame = GraphOps.assortativity(edges)
  def adamicAdar(topN: Int = 100): DataFrame =
    decode(GraphOps.adamicAdar(edges, topN), Seq("a", "b"))
  /** Modularity Q of an ARBITRARY (vertex, label) assignment given in
    * ORIGINAL vertex ids (labels may be any type — they only need
    * equality). On a dictionary-encoded graph the vertex column is
    * translated through the dict; unknown vertices fail the inner
    * join silently on the edge side, which a caller scoring a full
    * assignment never hits. */
  def modularityOf(assignment: DataFrame): DataFrame = {
    val lab = assignment.select(col("vertex"), col("label"))
    val encoded = dict match {
      case None => lab
      case Some(d) =>
        lab.join(d, lab("vertex") === d("vid"))
          .select(col("vertex_id").as("vertex"), col("label"))
    }
    // labels need only equality semantics; normalize to a stable
    // string so integral and string labellings both work
    GraphOps.modularityOf(edges,
      encoded.select(col("vertex"), col("label").cast("string").as("label")))
  }

  /** Full core decomposition: every vertex's coreness number (h-index
    * fixpoint), decoded through the dictionary like the other
    * per-vertex outputs. */
  def coreness(): DataFrame =
    decode(GraphOps.coreness(spark, edges), Seq("vertex", "coreness"))

  /** Per-community conductance of an arbitrary (vertex, label)
    * assignment — [[modularityOf]]'s per-community sibling; same
    * dictionary translation and string-label normalization. */
  def conductanceOf(assignment: DataFrame): DataFrame = {
    val lab = assignment.select(col("vertex"), col("label"))
    val encoded = dict match {
      case None => lab
      case Some(d) =>
        lab.join(d, lab("vertex") === d("vid"))
          .select(col("vertex_id").as("vertex"), col("label"))
    }
    GraphOps.conductanceOf(edges,
      encoded.select(col("vertex"), col("label").cast("string").as("label")))
  }
}

object GraftGraph {

  private def isIntegral(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt == LongType || dt == IntegerType || dt == ShortType || dt == ByteType

  /** Wrap an edge DataFrame; `weightCol = None` assigns unit weights.
    * Edges are canonicalized (undirected src<dst, parallel edges
    * summed, self-loops dropped). Non-integral vertex ids are
    * dictionary-encoded; results decode back to the original labels. */
  def apply(spark: SparkSession, edges: DataFrame,
      srcCol: String = "src", dstCol: String = "dst",
      weightCol: Option[String] = Some("weight")): GraftGraph = {
    val weighted = weightCol match {
      case Some(_) => edges
      case None => edges.withColumn("weight", lit(1.0))
    }
    // least/greatest canonicalization is type-generic (lexicographic
    // for strings) — canonicalize first, encode after.
    val canon = GraphBuilder.canonicalEdges(weighted, srcCol, dstCol,
      weightCol.getOrElse("weight"))
    // original-orientation (src, dst) for direction-aware measures
    val rawDirected = weighted.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src") =!= col("dst"))
    if (isIntegral(canon.schema("src").dataType))
      new GraftGraph(spark,
        canon.select(col("src").cast("long"), col("dst").cast("long"), col("weight")),
        None,
        rawDirected.select(col("src").cast("long"), col("dst").cast("long")))
    else {
      import spark.implicits._
      // Dense deterministic ids: global sort fixes a total order, then
      // zipWithIndex assigns 0..n-1 without a driver round-trip. The
      // dict is vertex-sized; localCheckpoint materializes it once so
      // the sort doesn't rerun per downstream action.
      val verts = canon.select(col("src").cast("string").as("vid"))
        .unionAll(canon.select(col("dst").cast("string").as("vid")))
        .distinct()
      val dict = verts.orderBy(col("vid")).rdd.map(_.getString(0))
        .zipWithIndex()
        .toDF("vid", "vertex_id")
        .localCheckpoint(true)
      def encode(df: DataFrame, cols: Seq[String]): DataFrame = {
        val order = df.columns.toSeq
        cols.foldLeft(df) { (acc, c) =>
          acc.withColumn(c, col(c).cast("string"))
            .join(dict.select(col("vid").as(c), col("vertex_id").as(s"${c}__enc")),
              Seq(c))
            .drop(c)
            .withColumnRenamed(s"${c}__enc", c)
        }.select(order.map(col): _*)
      }
      new GraftGraph(spark, encode(canon, Seq("src", "dst")), Some(dict),
        encode(rawDirected, Seq("src", "dst")))
    }
  }

  /** Embeddings → similarity graph in one line — the SemDeDup-style
    * bridge: top-k cosine neighbors per vector
    * ([[graft.operators.Similarity.knnGraphOf]], which dispatches to
    * LSH candidates past the exact-path size bound), kept only where
    * MUTUAL (a ∈ knn(b) AND b ∈ knn(a) — the hub chain-merge guard)
    * and above `minSimE4`, wrapped as a [[GraftGraph]] with cosine
    * edge weights so Louvain / CC / degrees run directly on it.
    *
    * {{{
    * GraftGraph.fromKnn(spark, embeddings).louvain()  // semantic communities
    * }}}
    *
    * `embeddings` must carry (vec_id, embedding: array&lt;float&gt;). */
  def fromKnn(spark: SparkSession, embeddings: DataFrame, k: Int = 10,
      minSimE4: Long = 9000L): GraftGraph = {
    val knn = graft.operators.Similarity
      .knnGraphOf(embeddings.select(col("vec_id"), col("embedding")), k)
      .filter(col("sim_e4") >= minSimE4)
      .select(col("vec_id").as("a"), col("neighbor_id").as("b"), col("sim_e4"))
      .localCheckpoint(true) // feeds both sides of the mutual check
    val mutual = knn
      .join(knn.select(col("b").as("a"), col("a").as("b")), Seq("a", "b"), "left_semi")
      .filter(col("a") < col("b"))
      .select(col("a").as("src"), col("b").as("dst"),
        (col("sim_e4") / 1e4).as("weight"))
    apply(spark, mutual)
  }

  /** Read + wrap a delimited edge list. `stringIds = true` reads
    * src/dst as strings and dictionary-encodes them — real edge lists
    * routinely carry non-numeric ids. */
  def fromEdgeList(spark: SparkSession, path: String,
      delimiter: String = "\t", stringIds: Boolean = false): GraftGraph =
    if (stringIds)
      apply(spark, graft.sources.EdgeListSource.readString(spark, path, delimiter))
    else {
      // readCanonical pre-canonicalizes, so the file's orientation is
      // already collapsed — the canonical view doubles as directed.
      val canon = graft.sources.EdgeListSource.readCanonical(spark, path, delimiter)
      new GraftGraph(spark, canon, None, canon.select(col("src"), col("dst")))
    }
}
