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
    // Explicit warmup, excluded from the report: scan every input
    // table once so session bring-up, parquet footer reads and the
    // first codegen compiles are not billed to whichever query sorts
    // first (measured ~4-5 s on d_containment before this existed).
    val tWarm0 = System.nanoTime()
    try {
      Seq("lineitem", "orders", "customer", "supplier", "part",
        "nation", "region", "documents", "embeddings")
        .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
      Tables.events(spark, sfDir).count()
      spark.range(1000).selectExpr("sum(id) s", "count(*) c").count()
    } catch { case e: Throwable => System.err.println(s"[bench] warmup: $e") }
    val warmupSec = (System.nanoTime() - tWarm0) / 1e9
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
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","warmup_sec":$warmupSec,"queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // Also persist the line as an artifact: log capture has truncated
    // the stdout tail mid-JSON two rounds running, losing the first
    // half of the per-query history.
    try java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/graft_bench.json"),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] artifact write: $e") }
    spark.stop()
  }
}
