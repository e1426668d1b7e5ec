package graft.graph

import org.apache.spark.graphx._
import org.apache.spark.rdd.RDD

/** Per-vertex Louvain state.
  *
  * @param community         current community id (min member vertex id at init)
  * @param communitySigmaTot Σ of degrees k_j over the community's members
  * @param internalWeight    self-loop weight folded into this vertex
  *                          (from compressed intra-community edges)
  * @param nodeWeight        Σ of incident (non-loop) edge weights
  * @param changed           moved in the last local-move round
  */
case class LouvainState(
    community: Long,
    communitySigmaTot: Double,
    internalWeight: Double,
    nodeWeight: Double,
    changed: Boolean) extends Serializable

/** Per-level summary returned to the driver (scalars only — the
  * assignment itself stays distributed). */
case class LouvainLevel(
    level: Int,
    modularity: Double,
    nCommunities: Long,
    nVertices: Long)

/** Multi-level Louvain modularity optimization (Blondel et al. 2008)
  * on GraphX.
  *
  * Level loop: (1) local-move phase — every vertex greedily joins the
  * neighboring community with the best modularity gain
  * ΔQ ∝ k_i,in − Σ_tot·k_i / 2m, iterated with Pregel-style
  * `aggregateMessages` rounds until movement stalls; (2) compression —
  * communities collapse to super-vertices (intra-community weight
  * becomes self-loop weight, inter-community edges sum), and the next
  * level runs on the smaller graph.
  *
  * Scale notes (100 TB): messages carry one (community → weight)
  * entry per *distinct neighboring community*, combined map-side by
  * `aggregateMessages`, so hub vertices cost O(#neighbor communities),
  * not O(degree); the graph shrinks geometrically per level; only
  * per-level scalar stats reach the driver. Oscillation is prevented
  * by alternating move parity (even rounds move only to lower
  * community ids, odd rounds only to higher), which also makes runs
  * deterministic — ties break toward the smaller community id.
  */
object Louvain extends Serializable {

  /** Run Louvain.
    * @return (final vertexId → communityId assignment, per-level stats)
    */
  /** maxMoveRounds caps the local-move phase per level: measured on
    * dense graphs, rounds past ~20 move <5% of vertices each at full
    * per-round cost, and graph compression + the next (smaller,
    * cheaper) level recovers those refinements. */
  /** resolution is the γ of generalized (Reichardt–Bornholdt)
    * modularity: gain ∝ k_i,in − γ·Σ_tot·k_i / 2m. γ = 1 is classic
    * Louvain; larger γ favors more, smaller communities; smaller γ
    * merges more aggressively. */
  def run(
      graph: Graph[Double, Double],
      maxLevels: Int = 10,
      maxMoveRounds: Int = 20,
      minDeltaQ: Double = 1e-4,
      resolution: Double = 1.0): (RDD[(VertexId, Long)], Seq[LouvainLevel]) = {

    // m2 = 2m: every edge counts twice, every self-loop twice.
    var working = initialize(graph)
    val m2 = working.vertices
      .map { case (_, st) => st.nodeWeight + 2.0 * st.internalWeight }
      .sum()

    // vertexId → community at the ORIGINAL graph's granularity.
    var assignment: RDD[(VertexId, Long)] =
      working.vertices.map { case (id, _) => (id, id) }
    assignment.cache()

    val levels = scala.collection.mutable.ArrayBuffer[LouvainLevel]()
    var prevQ = Double.MinValue
    var level = 0
    var continue = maxLevels > 0 && m2 > 0.0

    while (continue) {
      val moved = localMove(working, m2, maxMoveRounds, resolution)
      val q = modularity(moved, m2, resolution)
      val nComm = moved.vertices.map { case (_, st) => st.community }.distinct().count()
      val nVert = moved.vertices.count()
      levels += LouvainLevel(level, q, nComm, nVert)

      // Fold this level's community mapping into the original-id assignment.
      val levelMap: RDD[(VertexId, Long)] =
        moved.vertices.map { case (id, st) => (id, st.community) }
      val newAssignment = assignment
        .map { case (orig, comm) => (comm, orig) }
        .join(levelMap)
        .map { case (_, (orig, newComm)) => (orig, newComm) }
      newAssignment.cache()
      newAssignment.count()
      assignment.unpersist(blocking = false)
      assignment = newAssignment

      val improved = q > prevQ + minDeltaQ
      prevQ = q
      level += 1
      if (improved && level < maxLevels && nComm < nVert) {
        val compressed = compress(moved)
        // Materialize BEFORE unpersisting the parents: compress() is
        // lazy, and letting the next level trigger it after the
        // unpersist would replay the whole local-move phase from
        // lineage — and a replay can tie-break differently (shuffle
        // order changes float summation), diverging from the
        // assignment recorded above and silently dropping vertices
        // at the next fold's inner join.
        compressed.vertices.count()
        compressed.edges.count()
        working.unpersist(blocking = false)
        moved.unpersist(blocking = false)
        working = compressed
      } else {
        moved.unpersist(blocking = false)
        continue = false
      }
    }
    (assignment, levels.toSeq)
  }

  /** Each vertex starts in its own community. nodeWeight = Σ incident
    * edge weights (computed with one aggregateMessages pass). */
  private def initialize(graph: Graph[Double, Double]): Graph[LouvainState, Double] = {
    val nodeWeights: VertexRDD[Double] = graph.aggregateMessages[Double](
      ctx => { ctx.sendToSrc(ctx.attr); ctx.sendToDst(ctx.attr) },
      _ + _)
    graph.outerJoinVertices(nodeWeights) { (id, internal, wOpt) =>
      val w = wOpt.getOrElse(0.0)
      LouvainState(id, w + 2.0 * internal, internal, w, changed = false)
    }.cache()
  }

  private def degree(st: LouvainState): Double =
    st.nodeWeight + 2.0 * st.internalWeight

  /** One level of greedy local moves. Alternating parity prevents
    * A↔B oscillation: even rounds only move to smaller community
    * ids, odd rounds only to larger. */
  private def localMove(
      start: Graph[LouvainState, Double],
      m2: Double,
      maxRounds: Int,
      resolution: Double = 1.0): Graph[LouvainState, Double] = {
    var g = start
    // Early-stop when the moving fraction drops below 0.1% of
    // vertices (floor 0 keeps small graphs iterating to a true
    // fixpoint): the modularity tail beyond that is noise, and each
    // extra round costs fixed scheduling latency at any scale.
    val minProgress = start.vertices.count() / 1000L
    var round = 0
    var movedCount = Long.MaxValue
    while (round < maxRounds && movedCount > minProgress) {
      // neighborCommunity → (sigmaTot of that community, Σ edge weight
      // into it). Mutable LongMap accumulators: each edge sends a
      // fresh 1-entry map and the combiner folds into its first
      // argument in place — on dense graphs (hub vertices see
      // thousands of neighbor communities) immutable-map merging was
      // the measured round bottleneck.
      val msgs: VertexRDD[scala.collection.mutable.LongMap[(Double, Double)]] =
        g.aggregateMessages[scala.collection.mutable.LongMap[(Double, Double)]](
          ctx => {
            ctx.sendToSrc(scala.collection.mutable.LongMap(
              ctx.dstAttr.community -> (ctx.dstAttr.communitySigmaTot, ctx.attr)))
            ctx.sendToDst(scala.collection.mutable.LongMap(
              ctx.srcAttr.community -> (ctx.srcAttr.communitySigmaTot, ctx.attr)))
          },
          (a, b) => mergeMaps(a, b))

      val parity = round % 2 == 0
      val movedGraph = g.outerJoinVertices(msgs) { (id, st, msgOpt) =>
        msgOpt match {
          case None => st.copy(changed = false)
          case Some(byComm) =>
            val kI = degree(st)
            // Gain of being in community c (with self removed from Σtot).
            // For the current community the σtot comes from own state —
            // the message map has no entry when no neighbor shares it.
            def gain(c: Long): Double = {
              val kIn = byComm.get(c).map(_._2).getOrElse(0.0)
              val sigmaAdj =
                if (c == st.community) st.communitySigmaTot - kI
                else byComm(c)._1
              kIn - resolution * sigmaAdj * kI / m2
            }
            val stayGain = gain(st.community)
            // Best candidate: highest gain, ties to the smallest id.
            val (bestComm, bestGain) = byComm.keysIterator
              .map(c => (c, gain(c)))
              .foldLeft((st.community, stayGain)) {
                case ((bc, bg), (c, gn)) =>
                  if (gn > bg + 1e-12 || (math.abs(gn - bg) <= 1e-12 && c < bc)) (c, gn)
                  else (bc, bg)
              }
            val allowed = if (parity) bestComm < st.community else bestComm > st.community
            if (bestComm != st.community && bestGain > stayGain + 1e-12 && allowed)
              st.copy(community = bestComm, changed = true)
            else st.copy(changed = false)
        }
      }

      // Refresh Σtot per community after the moves (one small shuffle
      // keyed by community id). NOTE an earlier attempt deferred this
      // refresh lazily to skip it on each level's final round: GraphX's
      // incremental replicated-view maintenance then left the returned
      // graph's edge view unmaterialized while parents were freed, and
      // every level-end action replayed the whole level's shuffle
      // lineage — orders of magnitude slower than the refresh it saved.
      // The count below is the round's single materializing action.
      val sigmaTots: RDD[(Long, Double)] = movedGraph.vertices
        .map { case (_, st) => (st.community, degree(st)) }
        .reduceByKey(_ + _)
      val vertexSigma: RDD[(VertexId, Double)] = movedGraph.vertices
        .map { case (id, st) => (st.community, id) }
        .join(sigmaTots)
        .map { case (_, (id, sigma)) => (id, sigma) }
      val withSigma = movedGraph.outerJoinVertices(vertexSigma) { (id, st, sOpt) =>
        st.copy(communitySigmaTot = sOpt.getOrElse(degree(st)))
      }.cache()

      movedCount = withSigma.vertices.filter { case (_, st) => st.changed }.count()
      if (sys.props.contains("graft.louvain.debug"))
        println(f"[louvain] round=$round moved=$movedCount")
      if (round > 0) g.unpersist(blocking = false)
      g = withSigma
      round += 1
    }
    g
  }

  private def mergeMaps(
      a: scala.collection.mutable.LongMap[(Double, Double)],
      b: scala.collection.mutable.LongMap[(Double, Double)]): scala.collection.mutable.LongMap[(Double, Double)] = {
    b.foreach { case (c, (sigma, w)) =>
      a.get(c) match {
        case Some((s0, w0)) => a(c) = (s0, w0 + w)
        case None => a(c) = (sigma, w)
      }
    }
    a
  }

  /** Generalized modularity Q = Σ_c [ W_in(c)/m − γ·(Σ_tot(c)/2m)² ]
    * where W_in counts intra-community edge weight plus
    * vertex-internal (self loop) weight, and Σ_tot sums member
    * degrees. γ = 1 is the classic Newman–Girvan Q. */
  def modularity(g: Graph[LouvainState, Double], m2: Double,
      resolution: Double = 1.0): Double = {
    val intraEdge = g.triplets
      .filter(t => t.srcAttr.community == t.dstAttr.community)
      .map(_.attr)
      .sum()
    val internal = g.vertices.map { case (_, st) => st.internalWeight }.sum()
    val wIn = intraEdge + internal
    val sigmaSq = g.vertices
      .map { case (_, st) => (st.community, degree(st)) }
      .reduceByKey(_ + _)
      .map { case (_, s) => (s / m2) * (s / m2) }
      .sum()
    2.0 * wIn / m2 - resolution * sigmaSq
  }

  /** Collapse communities to super-vertices: intra-community edge
    * weight + member internal weight → new self weight; inter-community
    * edges sum into single canonical edges. */
  private def compress(g: Graph[LouvainState, Double]): Graph[LouvainState, Double] = {
    val intra: RDD[(Long, Double)] = g.triplets
      .filter(t => t.srcAttr.community == t.dstAttr.community)
      .map(t => (t.srcAttr.community, t.attr))
    val internal: RDD[(Long, Double)] = g.vertices
      .map { case (_, st) => (st.community, st.internalWeight) }
    val newInternal: RDD[(VertexId, Double)] =
      intra.union(internal).reduceByKey(_ + _)

    val newEdges: RDD[Edge[Double]] = g.triplets
      .filter(t => t.srcAttr.community != t.dstAttr.community)
      .map { t =>
        val a = math.min(t.srcAttr.community, t.dstAttr.community)
        val b = math.max(t.srcAttr.community, t.dstAttr.community)
        ((a, b), t.attr)
      }
      .reduceByKey(_ + _)
      .map { case ((a, b), w) => Edge(a, b, w) }

    val base = Graph(newInternal, newEdges, 0.0)
      .partitionBy(PartitionStrategy.EdgePartition2D)
    val nodeWeights = base.aggregateMessages[Double](
      ctx => { ctx.sendToSrc(ctx.attr); ctx.sendToDst(ctx.attr) },
      _ + _)
    base.outerJoinVertices(nodeWeights) { (id, internalW, wOpt) =>
      val w = wOpt.getOrElse(0.0)
      LouvainState(id, w + 2.0 * internalW, internalW, w, changed = false)
    }.cache()
  }
}
