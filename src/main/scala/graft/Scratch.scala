package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val edges = time("co-edges build+checkpoint") {
      graph.GraphBuilder.supplierCoEdges(spark, sfDir).localCheckpoint(true)
    }
    val st = time("strongTies") {
      graph.GraphOps.strongTies(edges).select(col("src"), col("dst")).localCheckpoint(true)
    }
    val sym = st.unionAll(st.select(col("dst").as("src"), col("src").as("dst")))
    val probe = time("maxDeg probe") {
      sym.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .agg(max(col("deg"))).first().getLong(0)
    }
    println(s"[scratch] maxDeg = $probe")
    val adj = sym.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("nbrs"), count(lit(1)).as("deg"))
    time("adjacency jaccard") {
      val n = st.join(adj.select(col("src").as("a"), col("nbrs").as("na"), col("deg").as("da")),
          col("src") === col("a"))
        .join(adj.select(col("src").as("b"), col("nbrs").as("nb"), col("deg").as("db")),
          col("dst") === col("b"))
        .select(col("src"), col("dst"),
          size(array_intersect(col("na"), col("nb"))).cast("long").as("common"),
          col("da"), col("db"))
        .withColumn("jaccard_e4",
          round(col("common") * 10000.0 / (col("da") + col("db") - col("common")))
            .cast("long"))
        .count()
      println(s"[scratch] jaccard rows: $n")
    }
    time("full edgeJaccard (as shipped)") {
      println("[scratch] rows: " + graph.GraphOps.edgeJaccard(st).count())
    }
    time("full clusteringCoefficients (as shipped)") {
      println("[scratch] rows: " + graph.GraphOps.clusteringCoefficients(st).count())
    }
    spark.stop()
  }
}
