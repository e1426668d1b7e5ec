package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DataFrame-native connected components via alternating large-star /
  * small-star contraction (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SoCC 2014).
  *
  * Each round is two join/aggregate passes over a plain (u, v) edge
  * table — shuffles that Catalyst/AQE size, coalesce and skew-split,
  * with no vertex mirroring: the 100 TB alternative to GraphX's
  * replicated vertex views (g_cc keeps the GraphX form; this is the
  * big-graph path). Converges in O(log² n) rounds (O(log n) in
  * practice); state per round is only the shrinking edge list.
  */
object ConnectedComponentsDF {

  /** large-star: connect every neighbor v > u to u's minimum
    * neighborhood label m(u) = min(Γ(u) ∪ {u}). Operates on the
    * symmetrized view. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.unionAll(e.select(col("v").as("u"), col("u").as("v"))).distinct()
    val minN = sym.groupBy(col("u")).agg(least(min(col("v")), col("u")).as("m"))
    sym.join(minN, Seq("u"))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** small-star: orient edges high→low, then connect every low
    * neighbor (and u itself) to m(u). */
  private def smallStar(e: DataFrame): DataFrame = {
    val oriented = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
    val minN = oriented.groupBy(col("u")).agg(min(col("v")).as("m"))
    val nbrLinks = oriented.join(minN, Seq("u"))
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    val selfLinks = minN.select(col("u"), col("m").as("v"))
    nbrLinks.unionAll(selfLinks)
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** @param edges (src, dst) DataFrame, any orientation.
    * @return (vertex, component) with component = min member id. */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    // Iterative DataFrame loops must cut lineage every round —
    // otherwise the logical plan nests (each star pass references the
    // previous result several times) and grows exponentially.
    // localCheckpoint materializes the round and starts a fresh plan;
    // on a cluster with an HDFS checkpoint dir, `checkpoint()` is the
    // fault-tolerant equivalent.
    var cur = edges
      .select(col("src").cast("long").as("u"), col("dst").cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)

    var converged = cur.limit(1).count() == 0
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(cur)).localCheckpoint(true)
      val sameSize = next.count() == cur.count()
      converged = sameSize && next.exceptAll(cur).limit(1).count() == 0
      cur = next
      iter += 1
    }
    // A non-fixpoint edge set yields labels that are not component
    // minima — failing loudly beats silently splitting components.
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds; " +
          "raise maxIter for adversarially deep graphs")

    // At the fixpoint every edge is (member, componentMin).
    val verts = edges.select(col("src").cast("long").as("vertex"))
      .unionAll(edges.select(col("dst").cast("long").as("vertex")))
      .distinct()
    val labels = cur.groupBy(col("u")).agg(min(col("v")).as("component"))
    verts.join(labels, verts("vertex") === labels("u"), "left")
      .select(col("vertex"),
        coalesce(col("component"), col("vertex")).as("component"))
  }
}
