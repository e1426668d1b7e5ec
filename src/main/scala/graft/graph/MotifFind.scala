package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal motif (subgraph-pattern) matching DSL — the
  * GraphFrames-style `find` surface the fixed censuses
  * ([[GraphOps.triangleCount]], [[GraphOps.triadCensus]]) don't
  * generalize to.
  *
  * Pattern language: semicolon-separated edge terms.
  *   - `(a)-[]->(b)`  — a directed edge from variable a to b
  *   - `(a)-[]-(b)`   — an edge between a and b in either direction
  *   - `(a)-[]->()`   — an ANONYMOUS end: matches like a fresh
  *     variable (one row per such edge) but is dropped from the
  *     output columns
  *   - `!(a)-[]->(b)` — NO directed edge a→b (anti-join; named
  *     variables must already be bound by positive terms). An
  *     anonymous end in a negated term is existential:
  *     `!(a)-[]->()` keeps only bindings where a has NO out-edge.
  *
  * Semantics are join composition, as in GraphFrames: one output row
  * per binding of the named vertex variables, columns in first-
  * appearance order. Distinct variables MAY bind the same vertex —
  * add `col("a") =!= col("c")` filters for injective matching. Edges
  * are matched with SET semantics (the input is de-duplicated,
  * self-loops dropped), so a motif instance is counted once per
  * distinct binding, never once per parallel edge.
  *
  * Plan shape: each positive term extends the accumulated binding
  * table by an equi-join on the shared variables, with the same
  * measured dispatch as [[GraphOps.triangleCount]]: while the edge
  * relation fits the broadcast budget every term join (including the
  * anti joins) is a BROADCAST hash join, so the exploding binding
  * stream pipelines through one stage and never shuffles; past the
  * budget the joins shuffle, and both inputs carry an explicit
  * NUMBERED repartition on the join key — these are the row-exploding
  * wedge joins AQE mis-coalesces (it sizes the stage by its tiny
  * INPUTS and serializes the Σdeg² output through ~2 tasks — measured
  * 78 s vs 26 s on the adamicAdar shape), and numbered repartitions
  * are exempt from that coalescing. Negated terms are left-anti
  * joins at the end — they can only shrink the binding table, so they
  * run after all positives. A term sharing no variable with the
  * bindings so far is a cross product and is rejected: reorder the
  * pattern so each term (after the first) connects, which is always
  * possible for a connected motif and keeps every join an equi-join.
  */
object MotifFind {

  final case class Term(src: String, dst: String, directed: Boolean, negated: Boolean)

  /** Prefix for anonymous-end variables — never appears in output. */
  private val Anon = "__anon_"

  private val TermRe =
    """\s*(!?)\s*\(\s*([A-Za-z_]\w*)?\s*\)\s*-\s*\[\s*\]\s*(->|-)\s*\(\s*([A-Za-z_]\w*)?\s*\)\s*""".r

  def parse(pattern: String): Seq[Term] = {
    var anonN = 0
    def name(raw: String): String =
      if (raw == null || raw.isEmpty) { anonN += 1; s"$Anon$anonN" } else raw
    val terms = pattern.split(";").toSeq.filter(_.trim.nonEmpty).map {
      case TermRe(bang, s, arrow, d) =>
        Term(name(s), name(d), arrow == "->", bang == "!")
      case bad => throw new IllegalArgumentException(
        s"unparseable motif term '${bad.trim}' — expected (a)-[]->(b), (a)-[]-(b), anonymous ends (), or a !-negated form")
    }
    if (terms.isEmpty || terms.forall(_.negated))
      throw new IllegalArgumentException(
        s"motif '$pattern' needs at least one positive edge term")
    terms.foreach { t =>
      if (t.src == t.dst) throw new IllegalArgumentException(
        s"motif term binds both ends to '${t.src}' — self-loops are dropped " +
          "from the matched edge set, so this term can never match")
      if (t.negated && t.src.startsWith(Anon) && t.dst.startsWith(Anon))
        throw new IllegalArgumentException(
          "a negated motif term needs at least one NAMED variable — " +
            "'no edge between any two vertices' is not a per-binding predicate")
    }
    if (terms.flatMap(t => Seq(t.src, t.dst)).forall(_.startsWith(Anon)))
      throw new IllegalArgumentException(
        s"motif '$pattern' binds no named variable — nothing to output")
    terms
  }

  /** Match `pattern` against a directed (src, dst) edge table. */
  def find(edges: DataFrame, pattern: String): DataFrame = {
    val terms = parse(pattern)
    val spark = edges.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    // Set-semantics edge relation, materialized once: it feeds one
    // join branch per term (lineage-free, the triangleCount shape).
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .localCheckpoint(true)
    // Broadcastable edge relation ⇒ every term join is a broadcast
    // hash join, so the exploding binding table NEVER shuffles — the
    // whole motif pipelines in one stage (measured on the dense
    // supplier chain: the shuffled close of a ~100M-row wedge stream
    // dominated the 20 s query; broadcast-closing removes it). Past
    // the budget, the at-scale shape: shuffled equi-joins with
    // NUMBERED repartitions on the key (AQE-coalesce-exempt).
    val nE = e.count()
    val budget = graft.operators.Joins.budgetBytes(spark)
    val bcast = 2L * 16L * nE < budget
    lazy val sym = e.unionAll(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    def rel(t: Term): DataFrame = {
      val r = (if (t.directed) e else sym)
        .select(col("src").as(t.src), col("dst").as(t.dst))
      if (bcast) broadcast(r) else r
    }

    val (pos, neg) = terms.partition(!_.negated)
    var acc = rel(pos.head)
    for (t <- pos.tail) {
      val shared = Seq(t.src, t.dst).distinct.filter(acc.columns.contains)
      if (shared.isEmpty) throw new IllegalArgumentException(
        s"motif term (${t.src})-(${t.dst}) shares no variable with the terms " +
          "before it (cross product) — reorder the pattern so every term connects")
      val keys = shared.map(col)
      acc = if (bcast) acc.join(rel(t), shared)
        else acc.repartition(n, keys: _*)
          .join(rel(t).repartition(n, keys: _*), shared)
    }
    for (t <- neg) {
      // Anonymous ends are existential, not join keys: the anti-join
      // keys are the NAMED variables only (parse guarantees ≥ 1).
      val keys = Seq(t.src, t.dst).filterNot(_.startsWith(Anon)).distinct
      val unbound = keys.filterNot(acc.columns.contains)
      if (unbound.nonEmpty) throw new IllegalArgumentException(
        s"negated motif term references unbound variable(s) ${unbound.mkString(", ")}")
      acc = acc.join(rel(t), keys, "left_anti")
    }
    // Named columns in first-appearance order; anonymous ends matched
    // but are not part of the output.
    val order = terms.flatMap(t => Seq(t.src, t.dst)).distinct
      .filterNot(_.startsWith(Anon))
      .filter(acc.columns.contains)
    acc.select(order.map(col): _*)
  }
}
