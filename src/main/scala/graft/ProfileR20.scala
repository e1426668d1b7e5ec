package graft

import org.apache.spark.sql.functions._

/** TEMPORARY round-20 piece profiler (deleted before the closing
  * commit): times the hidden subtrees of the slowest queries —
  * pair scoring inside memo builds, the streaming-louvain fold vs its
  * end audit — so optimization targets are measured, not guessed. */
object ProfileR20 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    args.headOption.getOrElse("knn") match {
      case "knn" =>
        val emb = Tables.embeddings(spark, dir)
          .select(col("vec_id"), col("embedding"))
        println("n = " + emb.count())
        val pairs = graft.operators.Similarity
          .cosineThresholdPairs(emb, 4000L)
        println(pairs.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        t("cosineThresholdPairs(4000) noop")(
          pairs.write.format("noop").mode("overwrite").save())
        t("cosineThresholdPairs(4000) 2nd")(
          pairs.write.format("noop").mode("overwrite").save())
        t("knnGraph memo build")(
          graft.operators.Similarity.knnGraph(spark, dir).count())
      case "louvain" =>
        // fold vs audit split of streamLouvainIncremental
        t("warm coEdges")(
          graft.graph.GraphBuilder.supplierCoEdges(spark, dir).count())
        t("s_stream_louvain full")(
          graft.streaming.StreamingOps.streamLouvainIncremental(spark, dir)
            .count())
        t("s_stream_louvain again")(
          graft.streaming.StreamingOps.streamLouvainIncremental(spark, dir)
            .count())
      case "scc" =>
        t("warm coEdges")(
          graft.graph.GraphBuilder.supplierCoEdges(spark, dir).count())
        t("s_stream_cc full")(
          graft.streaming.StreamingOps.streamCcIncremental(spark, dir).count())
        t("s_stream_cc again")(
          graft.streaming.StreamingOps.streamCcIncremental(spark, dir).count())
        t("s_stream_cc fold-distributed")(
          graft.streaming.StreamingOps.withFoldDistributed {
            graft.streaming.StreamingOps.streamCcIncremental(spark, dir).count()
          })
        t("s_stream_cc twin again")(
          graft.streaming.StreamingOps.streamCcIncremental(spark, dir).count())
      case "ivfpq" =>
        val emb = Tables.embeddings(spark, dir)
          .select(col("vec_id"), col("embedding"))
        import graft.operators.Similarity
        val cents = t("fitIvfCentroids")(Similarity.fitIvfCentroids(spark, dir))
        val cb = t("fitPqCodebooks")(Similarity.fitPqCodebooks(spark, dir))
        t("pqEncode count")(Similarity.pqEncode(spark, dir, emb, cb).count())
        t("ivfCandidatePairs count")(
          Similarity.ivfCandidatePairs(spark, emb, cents).count())
        t("e_knn_ivfpq full")(
          Similarity.knnIvfPqWithRecall(spark, dir).count())
        t("e_knn_ivfpq again")(
          Similarity.knnIvfPqWithRecall(spark, dir).count())
      case "nnd" =>
        val emb = Tables.embeddings(spark, dir)
          .select(col("vec_id"), col("embedding"))
        val base = t("base knnGraphFrom(lsh)")({
          val b = graft.operators.Similarity.knnGraphFrom(emb,
            graft.operators.Similarity.lshCandidatePairs(emb), 10)
            .localCheckpoint(true)
          b.count(); b
        })
        t("nnDescentFrom round")(
          graft.operators.Similarity.nnDescentFrom(emb, base, 10).count())
    }
    spark.stop()
  }
}
