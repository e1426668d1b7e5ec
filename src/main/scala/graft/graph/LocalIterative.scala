package graft.graph

import scala.collection.mutable

/** Driver-side twins of the integer-exact iterative graph loops
  * (round 14) — the [[LocalLouvain]] dispatch argument applied to the
  * fixed-round family: every one of these operators is a
  * deterministic INTEGER recursion (truncating `div`, Long sums —
  * the g_pagerank_det bit-reproducibility contract), so the driver
  * twin produces BIT-IDENTICAL output to the DataFrame loop it
  * stands in for, and the unrolled-SQL DuckDB oracles keep
  * hash-matching unchanged. What the DataFrame loops pay at small V
  * is not arithmetic but per-round plan analysis + codegen
  * (g_spectral_cut measured 15 rounds × ~3 plans ≈ its whole 8 s;
  * the "DF micro-rounds are plan-compile-bound" lesson) — work a
  * tight array loop does in microseconds. Callers dispatch on the
  * measured edge count (≤ [[LocalLouvain.CollectMax]] rows collect);
  * the DataFrame loops remain verbatim as the at-scale shape, and
  * IterativeDispatchSpec pins driver ≡ distributed bit-equality on
  * the real corpus.
  *
  * Long-only arithmetic throughout: `/` on non-negative Longs and
  * Spark's `div` truncate identically, and the one signed site
  * (spectral deflation) truncates toward zero in both — never
  * Math.floorDiv (the holt-winters lesson). */
object LocalIterative {

  /** (vertex, rank_e6) — mirrors GraphOps.pageRankInteger's loop:
    * rows are the checkpointed (src, dst, w, wdeg) frame. */
  def pageRankInt(rows: Array[(Long, Long, Long, Long)],
      iters: Int): Seq[(Long, Long)] = {
    val verts = rows.map(_._1).distinct.sorted
    val rank = mutable.LongMap.empty[Long]
    verts.foreach(v => rank(v) = 1000000L)
    for (_ <- 1 to iters) {
      val csum = mutable.LongMap.empty[Long].withDefaultValue(0L)
      rows.foreach { case (s, d, w, wdeg) =>
        csum(d) += rank(s) * w / wdeg
      }
      verts.foreach(v => rank(v) = 150000L + csum(v) * 17L / 20L)
    }
    verts.map(v => (v, rank(v))).toSeq
  }

  /** (vertex, rank_e6) — mirrors GraphOps.personalizedPageRank:
    * unnormalized 150000/round restart onto the seed set only. */
  def personalizedPageRank(rows: Array[(Long, Long, Long, Long)],
      seeds: Set[Long], iters: Int): Seq[(Long, Long)] = {
    val verts = rows.map(_._1).distinct.sorted
    val rank = mutable.LongMap.empty[Long]
    verts.foreach(v => rank(v) = if (seeds(v)) 1000000L else 0L)
    for (_ <- 1 to iters) {
      val csum = mutable.LongMap.empty[Long].withDefaultValue(0L)
      rows.foreach { case (s, d, w, wdeg) =>
        csum(d) += rank(s) * w / wdeg
      }
      verts.foreach { v =>
        rank(v) = (if (seeds(v)) 150000L else 0L) + csum(v) * 17L / 20L
      }
    }
    verts.map(v => (v, rank(v))).toSeq
  }

  /** (vertex, katz_e6) — mirrors GraphOps.katzCentrality including
    * its per-round BIGINT headroom guard (same failure message
    * class: a wrap must fail loudly, driver path or not). */
  def katz(rows: Array[(Long, Long, Long)], iters: Int,
      bound: Long): Seq[(Long, Long)] = {
    val verts = rows.map(_._1).distinct.sorted
    val katz = mutable.LongMap.empty[Long]
    verts.foreach(v => katz(v) = 1000000L)
    for (round <- 1 to iters) {
      val csum = mutable.LongMap.empty[Long].withDefaultValue(0L)
      rows.foreach { case (s, d, w) => csum(d) += katz(s) * w / 256L }
      verts.foreach(v => katz(v) = 1000000L + csum(v))
      val m = verts.iterator.map(katz).max
      require(m <= bound,
        s"katzCentrality: round $round max katz $m exceeds the BIGINT " +
          s"headroom bound $bound — the next round could wrap silently. " +
          "Lower iters, raise the beta denominator, or thin the input graph.")
    }
    verts.map(v => (v, katz(v))).toSeq
  }

  /** (vertex, eig_e6) — mirrors GraphOps.eigenCentrality: power
    * iteration x ← A·x with per-round truncating renormalization
    * x ← y div max(1, ymax div 1e6), all-integer (the
    * pageRankInt contract), so driver and DataFrame paths are
    * bit-identical. rows are the symmetrized (src, dst, w) list. */
  def eigenCentrality(rows: Array[(Long, Long, Long)],
      iters: Int): Seq[(Long, Long)] = {
    val verts = rows.map(_._1).distinct.sorted
    // Empty-graph guard (round-15 ADVICE): dispatch routes count 0
    // through this twin, and `verts.iterator.map(y).max` below throws
    // on the empty iterator where the distributed path's isNullAt
    // handles it — the same bug class as spectralCut's round-15 fix.
    if (verts.isEmpty) return Seq.empty
    val x = mutable.LongMap.empty[Long]
    verts.foreach(v => x(v) = 1000000L)
    for (_ <- 1 to iters) {
      val y = mutable.LongMap.empty[Long].withDefaultValue(0L)
      rows.foreach { case (s, d, w) => y(d) += x(s) * w }
      val ymax = verts.iterator.map(y).max
      val k = math.max(1L, ymax / 1000000L)
      verts.foreach(v => x(v) = y(v) / k)
    }
    verts.map(v => (v, x(v))).toSeq
  }

  /** (vertex, score_e6, side) — mirrors GraphOps.spectralCut: shifted
    * Laplacian power iteration with mean deflation and max-|·|
    * renormalization, md5-hex pseudo-random start (identical string
    * hash both paths). */
  def spectralCut(rows: Array[(Long, Long)], rounds: Int)
      : Seq[(Long, Long, Boolean)] = {
    // rows are the SYMMETRIZED (src, dst) pairs, exactly the `sym`
    // frame the DataFrame loop joins against.
    val deg = mutable.LongMap.empty[Long].withDefaultValue(0L)
    rows.foreach { case (s, _) => deg(s) += 1L }
    val verts = deg.keys.toArray.sorted
    val c = 2L * verts.iterator.map(deg).max
    val md = java.security.MessageDigest.getInstance("MD5")
    def start(v: Long): Long = {
      val hex = md.digest(v.toString.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16) % 2000001L - 1000000L
    }
    val x = mutable.LongMap.empty[Long]
    verts.foreach(v => x(v) = start(v))
    for (_ <- 1 to rounds) {
      val sSum = mutable.LongMap.empty[Long].withDefaultValue(0L)
      rows.foreach { case (s, d) => sSum(s) += x(d) }
      var tot = 0L; var mxY = Long.MinValue; var mnY = Long.MaxValue
      val y = mutable.LongMap.empty[Long]
      verts.foreach { v =>
        val yv = (c - deg(v)) * x(v) + sSum(v)
        y(v) = yv; tot += yv
        if (yv > mxY) mxY = yv
        if (yv < mnY) mnY = yv
      }
      val mean = tot / verts.length
      val mx = math.max(mxY - mean, mean - mnY)
      verts.foreach { v =>
        x(v) = if (mx == 0L) 0L else (y(v) - mean) * 1000000L / mx
      }
    }
    verts.map(v => (v, x(v), x(v) >= 0L)).toSeq
  }

  /** (vertex, landmark, wdist) — mirrors GraphOps
    * .weightedShortestPaths: fixed Bellman-Ford relax-and-min rounds
    * from the landmark set over the symmetrized weighted edges. */
  /** (vertex, coreness) — mirrors GraphOps.coreness' h-index
    * fixpoint: c₀ = deg, c ← h-index of neighbor values, stop at the
    * total-sum fixpoint or `rounds`. max(least(value, rank)) over the
    * descending neighbor list ≡ the DataFrame loop's grouped-cumsum
    * form (the CLAUDE.md rank-window collapse lesson, both ways). */
  def coreness(rows: Array[(Long, Long)], rounds: Int): Seq[(Long, Long)] = {
    val adj = rows.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    val verts = adj.keys.toArray.sorted
    val c = mutable.LongMap.empty[Long]
    verts.foreach(v => c(v) = adj(v).length.toLong)
    var prevSum = Long.MaxValue
    var iter = 0
    var changed = true
    while (changed && iter < rounds) {
      val next = mutable.LongMap.empty[Long]
      verts.foreach { v =>
        val vals = adj(v).map(c).sortBy(x => -x)
        var h = 0L
        var i = 0
        while (i < vals.length) {
          val least = math.min(vals(i), i + 1L)
          if (least > h) h = least
          i += 1
        }
        next(v) = h
      }
      val tot = verts.iterator.map(next).sum
      changed = tot != prevSum
      prevSum = tot
      verts.foreach(v => c(v) = next(v))
      iter += 1
    }
    verts.map(v => (v, c(v))).toSeq
  }

  /** (vertex, label) — mirrors GraphOps.labelPropagation: synchronous
    * weighted-majority adoption with parity alternation (even rounds
    * adopt only smaller labels, odd only larger), ties to the min
    * label, early stop after two zero-move parities. Weight sums ride
    * doubles exactly like the DataFrame loop — callers gate dispatch
    * on integral weights so both sums are order-independent-exact. */
  def labelPropagation(rows: Array[(Long, Long, Double)],
      iters: Int): Seq[(Long, Long)] = {
    val adj = rows.groupBy(_._1)
    val verts = adj.keys.toArray.sorted
    var label = mutable.LongMap.empty[Long]
    verts.foreach(v => label(v) = v)
    var round = 0
    var zeroStreak = 0
    while (round < iters && zeroStreak < 2) {
      val next = mutable.LongMap.empty[Long]
      var moved = 0L
      verts.foreach { v =>
        val wsum = mutable.LongMap.empty[Double].withDefaultValue(0.0)
        adj(v).foreach { case (_, d, w) => wsum(label(d)) += w }
        var bestW = Double.NegativeInfinity
        var bestL = Long.MaxValue
        wsum.foreach { case (l, w) =>
          if (w > bestW || (w == bestW && l < bestL)) { bestW = w; bestL = l }
        }
        val cur = label(v)
        val allowed =
          if (round % 2 == 0) bestL < cur else bestL > cur
        val nl = if (wsum.nonEmpty && allowed) bestL else cur
        if (nl != cur) moved += 1
        next(v) = nl
      }
      zeroStreak = if (moved == 0L) zeroStreak + 1 else 0
      label = next
      round += 1
    }
    verts.map(v => (v, label(v))).toSeq
  }

  /** (vertex, landmark, hops) — BFS from each landmark over the
    * symmetrized pairs. Hop distances are UNIQUE values, so any
    * correct BFS is bit-identical to the Pregel ShortestPaths
    * result it stands in for (landmark self-rows at 0 included,
    * unreachable vertices absent). */
  def hopDistances(rows: Array[(Long, Long)],
      seeds: Seq[Long]): Seq[(Long, Long, Long)] = {
    val adj = rows.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    val out = mutable.ArrayBuffer.empty[(Long, Long, Long)]
    seeds.foreach { lm =>
      val dist = mutable.LongMap.empty[Long]
      dist(lm) = 0L
      var frontier = Array(lm)
      var d = 0L
      while (frontier.nonEmpty) {
        d += 1L
        val next = mutable.ArrayBuffer.empty[Long]
        frontier.foreach { v =>
          adj.getOrElse(v, Array.empty).foreach { w =>
            if (!dist.contains(w)) { dist(w) = d; next += w }
          }
        }
        frontier = next.toArray
      }
      dist.foreach { case (v, h) => out += ((v, lm, h)) }
    }
    out.sortBy(t => (t._1, t._2)).toSeq
  }

  /** (vertex, bc_e6) — mirrors GraphOps.betweennessCentrality's
    * landmark-sampled Brandes: lockstep forward BFS accumulating
    * exact σ counts (all landmarks advance together, `deepest`
    * tracks the last level ANY landmark reached — the DataFrame
    * loop's early-stop), then the backward dependency fold with the
    * PER-TERM floor division σ_v·(1e6 + δ_w) div σ_w. Integers end
    * to end ⇒ bit-identical. */
  def betweenness(rows: Array[(Long, Long)], seeds: Seq[Long],
      maxLevels: Int): Seq[(Long, Long)] = {
    val adj = rows.groupBy(_._1).map { case (v, es) => v -> es.map(_._2) }
    val bc = mutable.LongMap.empty[Long].withDefaultValue(0L)
    // The DataFrame loop advances all landmarks in lockstep with a
    // GLOBAL deepest level, but every (lm, v) row only ever interacts
    // with same-lm rows (a landmark whose frontier empties early just
    // contributes no new rows), so per-landmark sweeps with unboxed
    // LongMaps produce the identical row set.
    seeds.foreach { lm =>
      val d = mutable.LongMap.empty[Int]
      val sigma = mutable.LongMap.empty[Long]
      d(lm) = 0; sigma(lm) = 1L
      var frontier = Array(lm)
      var level = 0
      while (frontier.nonEmpty && level < maxLevels) {
        level += 1
        val cand = mutable.LongMap.empty[Long].withDefaultValue(0L)
        frontier.foreach { v =>
          adj.getOrElse(v, Array.empty).foreach { w =>
            if (!d.contains(w)) cand(w) += sigma(v)
          }
        }
        frontier = cand.keys.toArray
        cand.foreach { case (w, s) => d(w) = level; sigma(w) = s }
      }
      val deepest = if (d.isEmpty) 0 else d.values.max
      val delta = mutable.LongMap.empty[Long].withDefaultValue(0L)
      for (lev <- (deepest - 1) to 0 by -1) {
        d.foreach { case (v, dv) =>
          if (dv == lev) {
            var dsum = 0L
            adj.getOrElse(v, Array.empty).foreach { w =>
              if (d.getOrElse(w, -1) == lev + 1)
                dsum += sigma(v) * (1000000L + delta(w)) / sigma(w)
            }
            delta(v) = dsum
          }
        }
      }
      d.foreach { case (v, _) => if (v != lm) bc(v) += delta(v) }
    }
    bc.keys.toArray.sorted.map(v => (v, bc(v))).toSeq
  }

  /** (vertex, arr?) — mirrors GraphOps.temporalReach's earliest-
    * arrival relaxation over symmetric (src, dst, t) contacts:
    * per round every reached vertex relaxes its contacts with
    * t ≥ own arrival, destinations take the min candidate; stop at
    * the no-improvement fixpoint or maxRounds. Integer min-folds ⇒
    * bit-identical to the DataFrame loop. */
  def temporalReach(rows: Array[(Long, Long, Long)], source: Long,
      maxRounds: Int): Seq[(Long, Option[Long])] = {
    val adj = rows.groupBy(_._1)
    val verts = rows.map(_._1).distinct.sorted
    val arr = mutable.LongMap.empty[Long]
    arr(source) = 0L
    var improved = true
    var round = 0
    while (improved && round < maxRounds) {
      val cand = mutable.LongMap.empty[Long]
      arr.foreach { case (v, av) =>
        adj.getOrElse(v, Array.empty).foreach { case (_, d, t) =>
          if (t >= av && t < cand.getOrElse(d, Long.MaxValue)) cand(d) = t
        }
      }
      improved = false
      cand.foreach { case (v, t) =>
        if (t < arr.getOrElse(v, Long.MaxValue)) { arr(v) = t; improved = true }
      }
      round += 1
    }
    verts.map(v => (v, arr.get(v))).toSeq
  }

  def weightedSssp(rows: Array[(Long, Long, Long)], seeds: Seq[Long],
      rounds: Int): Seq[(Long, Long, Long)] = {
    // Per-landmark unboxed LongMaps: the state is independent per
    // landmark, and tuple-keyed maps box every probe (the first draft
    // measured SLOWER than the DataFrame loop it replaced).
    val adj = rows.groupBy(_._1)
    val out = mutable.ArrayBuffer.empty[(Long, Long, Long)]
    seeds.foreach { lm =>
      var dist = mutable.LongMap.empty[Long]
      dist(lm) = 0L
      for (_ <- 1 to rounds) {
        // relax every known vertex over its out-edges, then min
        // against the carried distances — exactly the DataFrame
        // loop's unionAll + grouped min.
        val next = dist.clone()
        dist.foreach { case (v, dv) =>
          adj.getOrElse(v, Array.empty).foreach { case (_, dst, w) =>
            val cand = dv + w
            if (cand < next.getOrElse(dst, Long.MaxValue)) next(dst) = cand
          }
        }
        dist = next
      }
      dist.foreach { case (v, d) => out += ((v, lm, d)) }
    }
    out.sortBy(t => (t._1, t._2)).toSeq
  }

  /** (src, dst, w) MSF edges — mirrors GraphOps
    * .minimumSpanningForest: under the STRICT total edge order
    * (w, src, dst) the minimum forest is UNIQUE (cycle property), so
    * driver Kruskal and distributed Borůvka produce the SAME edge
    * set — equality of the algorithms' outputs is a theorem, not a
    * convention, and IterativeDispatchSpec pins it anyway. Output in
    * the DataFrame path's (src, dst) order. */
  def kruskal(rows: Array[(Long, Long, Double)]): Seq[(Long, Long, Double)] = {
    val parent = mutable.LongMap.empty[Long]
    def find(x0: Long): Long = {
      var x = x0
      while (parent.getOrElse(x, x) != x) {
        val p = parent.getOrElse(x, x)
        parent(x) = parent.getOrElse(p, p)
        x = parent(x)
      }
      x
    }
    val out = mutable.ArrayBuffer.empty[(Long, Long, Double)]
    rows.sortBy(t => (t._3, t._1, t._2)).foreach { case (s, d, w) =>
      val (a, b) = (find(s), find(d))
      if (a != b) { parent(a) = b; out += ((s, d, w)) }
    }
    out.sortBy(t => (t._1, t._2)).toSeq
  }

  /** (id, role, score_e6) rows mirroring [[GraphOps.hits]]' integer
    * loop: e6-scaled hub/authority sums with a truncating max-
    * normalization per half-round. Long sums are accumulation-order
    * independent and the div truncates toward zero exactly like
    * Spark's `div`, so the twin is bit-identical to the DataFrame
    * loop (IterativeDispatchSpec pins it). */
  def hits(rows: Array[(Long, Long)], iters: Int): Seq[(Long, String, Long)] = {
    // Empty-graph guard (the eigenCentrality round-15 ADVICE class:
    // .max on an empty half-round would throw where the distributed
    // loop returns an empty frame).
    if (rows.isEmpty) return Seq.empty
    val e = rows.distinct
    val srcs = e.map(_._1).distinct.sorted
    val hub = mutable.LongMap.empty[Long]
    srcs.foreach(s => hub(s) = 1000000L)
    var auth = mutable.LongMap.empty[Long]
    for (_ <- 1 to iters) {
      val araw = mutable.LongMap.empty[Long].withDefaultValue(0L)
      e.foreach { case (s, d) => araw(d) += hub(s) }
      val amax = araw.values.max
      // raw·1e6 headroom ties to the dispatch bound: raw sums are
      // ≤ |E|·1e6 ≤ CollectMax·1e6 ≈ 2.1e12 (CollectMax = 2^21), so
      // ·1e6 peaks ~2.1e18 < Long.MaxValue 9.2e18 (~4.4× headroom).
      // Raising CollectMax past ~2^23 would silently wrap HERE and
      // in the Spark DF loop identically (twin equality would stay
      // green on garbage) while the DuckDB oracle errors — assert
      // the invariant rather than trust the constant (ADVICE r16).
      // require, not assert: assert elides under
      // -Xdisable-assertions, which is exactly the silent-wrap
      // scenario the guard exists to prevent (ADVICE r17).
      require(amax <= Long.MaxValue / 1000000L,
        s"hits twin overflow: amax=$amax * 1e6 wraps; CollectMax too high")
      auth = mutable.LongMap.empty[Long]
      araw.foreach { case (d, a) => auth(d) = a * 1000000L / amax }
      val hraw = mutable.LongMap.empty[Long].withDefaultValue(0L)
      e.foreach { case (s, d) => hraw(s) += auth(d) }
      val hmax = hraw.values.max
      require(hmax <= Long.MaxValue / 1000000L,
        s"hits twin overflow: hmax=$hmax * 1e6 wraps; CollectMax too high")
      hraw.foreach { case (s, h) => hub(s) = h * 1000000L / hmax }
    }
    srcs.map(s => (s, "hub", hub(s))).toSeq ++
      auth.keys.toSeq.sorted.map(d => (d, "auth", auth(d)))
  }

  /** (vertex, scc_id = min member id) — driver twin of
    * [[StronglyConnectedDF]]: SCC labels are CANONICAL (the min
    * member id), so any correct algorithm emits identical rows and
    * the twin-equality contract holds by definition, not by matching
    * iteration order. Iterative Tarjan with an explicit frame stack
    * (no JVM recursion bound on path-shaped chains); self-loops are
    * ignored exactly as the distributed peel does. */
  def tarjanScc(rows: Array[(Long, Long)]): Seq[(Long, Long)] = {
    val adj = mutable.LongMap.empty[mutable.ArrayBuffer[Long]]
    val verts = mutable.LinkedHashSet.empty[Long]
    rows.foreach { case (s, d) =>
      verts += s; verts += d
      if (s != d)
        adj.getOrElseUpdate(s, mutable.ArrayBuffer.empty[Long]) += d
    }
    val index = mutable.LongMap.empty[Long]
    val low = mutable.LongMap.empty[Long]
    val onStack = mutable.LongMap.empty[Boolean]
    val stack = mutable.ArrayBuffer.empty[Long]
    val label = mutable.LongMap.empty[Long]
    val empty = mutable.ArrayBuffer.empty[Long]
    var counter = 0L
    verts.foreach { root =>
      if (!index.contains(root)) {
        val frames = mutable.ArrayBuffer[(Long, Int)]((root, 0))
        index(root) = counter; low(root) = counter; counter += 1
        stack += root; onStack(root) = true
        while (frames.nonEmpty) {
          val (v, ci) = frames.last
          val nbrs = adj.getOrElse(v, empty)
          if (ci < nbrs.length) {
            frames(frames.length - 1) = (v, ci + 1)
            val w = nbrs(ci)
            if (!index.contains(w)) {
              index(w) = counter; low(w) = counter; counter += 1
              stack += w; onStack(w) = true
              frames += ((w, 0))
            } else if (onStack.getOrElse(w, false)) {
              if (index(w) < low(v)) low(v) = index(w)
            }
          } else {
            frames.remove(frames.length - 1)
            if (frames.nonEmpty) {
              val p = frames.last._1
              if (low(v) < low(p)) low(p) = low(v)
            }
            if (low(v) == index(v)) {
              var minId = Long.MaxValue
              val comp = mutable.ArrayBuffer.empty[Long]
              var w = 0L
              do {
                w = stack.remove(stack.length - 1)
                onStack(w) = false
                comp += w
                if (w < minId) minId = w
              } while (w != v)
              comp.foreach(u => label(u) = minId)
            }
          }
        }
      }
    }
    verts.toSeq.sorted.map(v => (v, label(v)))
  }

  /** 60-bit md5 bridge — bit-identical to the DataFrame walks'
    * `conv(substring(md5(s), 1, 15), 16, 10) cast long` (lowercase
    * hex, first 15 nibbles, unsigned 60-bit parse; the spectralCut
    * start-vector hash, shared). */
  private def md5Bridge60(md: java.security.MessageDigest,
      s: String): Long = {
    val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Per-vertex neighbors of the SYMMETRIZED (src, dst) pairs in
    * dst-ASC order — exactly the DataFrame walks' ranking
    * (`row_number` over partition src, order by dst, minus 1): the
    * rank-r pick is `sorted(v)(r)`. */
  private def sortedAdjacency(rows: Array[(Long, Long)])
      : mutable.LongMap[Array[Long]] = {
    val acc = mutable.LongMap.empty[mutable.ArrayBuilder.ofLong]
    rows.foreach { case (s, d) =>
      acc.getOrElseUpdate(s, new mutable.ArrayBuilder.ofLong) += d
    }
    val out = mutable.LongMap.empty[Array[Long]]
    acc.foreach { case (v, b) =>
      val a = b.result(); java.util.Arrays.sort(a); out(v) = a
    }
    out
  }

  /** (walk_id, step, vertex) — mirrors GraphOps.randomWalksUncached:
    * one walk per vertex; step t moves to the
    * `pmod(md5("id:t"), deg)`-th dst-sorted neighbor. Integer rank
    * picks ⇒ bit-identical to the DataFrame loop. A vertex with no
    * adjacency row ends its walk (the loop's inner join drops it). */
  def randomWalks(rows: Array[(Long, Long)], steps: Int)
      : Seq[(Long, Int, Long)] = {
    val adj = sortedAdjacency(rows)
    val verts = adj.keys.toArray.sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = mutable.ArrayBuffer.empty[(Long, Int, Long)]
    verts.foreach { w =>
      var v = w
      out += ((w, 0, v))
      var t = 1
      var alive = true
      while (t <= steps && alive) {
        val ns = adj.getOrElse(v, Array.emptyLongArray)
        if (ns.isEmpty) alive = false
        else {
          v = ns((md5Bridge60(md, s"$w:$t") % ns.length).toInt)
          out += ((w, t, v))
        }
        t += 1
      }
    }
    out.toSeq
  }

  /** (walk_id, step, vertex) — mirrors GraphOps.node2vecWalks: step 1
    * is the first-order rank pick; steps ≥ 2 are the second-order
    * biased pick (w = wReturn when the candidate IS prev, wCommon
    * when prev→candidate is an edge — the triangle case — wOut
    * otherwise), sampled by `pmod(md5("id:t"), Σw)` against the
    * dst-ASC running weight sum — the DataFrame loop's cum/tot window
    * pair folded into one local scan. Long weights and the 60-bit
    * hash keep every pick integer-exact ⇒ bit-identical. */
  def node2vecWalks(rows: Array[(Long, Long)], steps: Int,
      wReturn: Long, wCommon: Long, wOut: Long): Seq[(Long, Int, Long)] = {
    val adj = sortedAdjacency(rows)
    val verts = adj.keys.toArray.sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    def isEdge(a: Long, b: Long): Boolean = {
      val ns = adj.getOrElse(a, Array.emptyLongArray)
      java.util.Arrays.binarySearch(ns, b) >= 0
    }
    val out = mutable.ArrayBuffer.empty[(Long, Int, Long)]
    verts.foreach { w =>
      out += ((w, 0, w))
      var prev = w
      var v = w
      var alive = true
      val ns1 = adj.getOrElse(v, Array.emptyLongArray)
      if (ns1.isEmpty) alive = false
      else {
        v = ns1((md5Bridge60(md, s"$w:1") % ns1.length).toInt)
        out += ((w, 1, v))
      }
      var t = 2
      while (t <= steps && alive) {
        val ns = adj.getOrElse(v, Array.emptyLongArray)
        if (ns.isEmpty) alive = false
        else {
          var tot = 0L
          val ws = new Array[Long](ns.length)
          var i = 0
          while (i < ns.length) {
            val d = ns(i)
            ws(i) = if (d == prev) wReturn
              else if (isEdge(prev, d)) wCommon
              else wOut
            tot += ws(i); i += 1
          }
          if (tot == 0L) alive = false // the loop's filter(tot > 0)
          else {
            val pick = md5Bridge60(md, s"$w:$t") % tot
            var cum = 0L; i = 0
            while (pick >= cum + ws(i)) { cum += ws(i); i += 1 }
            prev = v; v = ns(i)
            out += ((w, t, v))
          }
        }
        t += 1
      }
    }
    out.toSeq
  }
}
