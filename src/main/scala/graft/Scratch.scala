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
    val term = sym.groupBy(col("src").as("w"))
      .agg(round(lit(10000.0) / log(count(lit(1)))).cast("long").as("term_e4"))
    val wedgeParts = 4 * spark.sparkContext.defaultParallelism
    val centers = sym.select(col("dst").as("w"), col("src").as("a"))
      .join(term, Seq("w"))
      .repartition(wedgeParts, col("w"))
    val pairs = centers
      .join(sym.select(col("src").as("w"), col("dst").as("b"))
          .repartition(wedgeParts, col("w")),
        Seq("w"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common"), sum(col("term_e4")).as("aa_e4"))
    val agg = time("wedge join + agg") { pairs.localCheckpoint(true) }
    println(s"[scratch] pair rows: ${agg.count()}")
    val res = time("anti-join + top100") {
      agg.join(st.select(col("src").as("a"), col("dst").as("b")),
          Seq("a", "b"), "left_anti")
        .orderBy(col("aa_e4").desc, col("a"), col("b"))
        .limit(100).collect()
    }
    println(s"[scratch] top rows: ${res.length}")
    spark.stop()
  }
}
