package graft
import org.apache.spark.sql.SparkSession
import graft.graph.GraphOps

/** Driver benchmark: runs every SparkEntry query at
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query seconds.
  * Queries run in sorted-name order (deterministic across JVMs). A
  * failing query is reported on stderr and fails the whole run —
  * a swallowed failure would *improve* the total and mask breakage. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val failures = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // Optional local-iteration subset (comma-separated names). The
    // driver never sets it — full sweep remains the default.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable => failures += ((name, String.valueOf(e))) }
      val dt = (System.nanoTime() - t0) / 1e9
      // Release per-query scratch state (localCheckpoint blocks, stray
      // caches): leftovers tax later queries with heap pressure. The
      // Louvain memo is the only state meant to outlive a query.
      val keep = GraphOps.retainedRddIds
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!keep(id)) rdd.unpersist(blocking = false)
      }
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    if (failures.nonEmpty) {
      failures.foreach { case (n, e) => System.err.println(s"[bench] $n FAILED: $e") }
      spark.stop()
      sys.exit(1)
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
