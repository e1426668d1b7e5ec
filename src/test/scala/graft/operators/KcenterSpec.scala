package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** Greedy k-center: planted orthogonal clusters force one center per
  * cluster; the separation sequence is non-increasing by construction.
  */
class KcenterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def vec(parts: (Int, Float)*): Seq[Float] = {
    val a = Array.fill(64)(0f)
    parts.foreach { case (i, v) => a(i) = v }
    a.toSeq
  }

  private def planted(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_kc").toString
    // four orthogonal clusters along axes 0..3; ids grouped by cluster
    val rows = (0 until 4).flatMap { c =>
      (0 until 5).map { j =>
        (c * 10L + j, vec(c -> 1f, (c + 4) -> (0.01f * j)))
      }
    }
    graft.TestFixtures.canonEmb(rows.toDF("vec_id", "embedding"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("k=4 on four orthogonal clusters picks one center per cluster") {
    val dir = planted()
    val out = Similarity.kcenterCoreset(spark, dir, k = 4).collect()
    assert(out.length == 4)
    // seed = min vec_id
    assert(out(0).getLong(1) == 0L && out(0).isNullAt(2))
    val clusters = out.map(_.getLong(1) / 10L).toSet
    assert(clusters == Set(0L, 1L, 2L, 3L), out.map(_.getLong(1)).mkString(","))
  }

  test("separation sequence is non-increasing and centers are distinct") {
    val dir = planted()
    val out = Similarity.kcenterCoreset(spark, dir, k = 6).collect()
    val ids = out.map(_.getLong(1))
    assert(ids.distinct.length == ids.length)
    val seps = out.drop(1).map(_.getLong(2))
    assert(seps.zip(seps.drop(1)).forall { case (a, b) => a >= b },
      seps.mkString(","))
  }

  test("matches a driver-side exact greedy reference on the planted set") {
    val dir = planted()
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray)).sortBy(_._1)
    def distE6(a: Array[Double], b: Array[Double]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      math.round((1.0 - dot / (math.sqrt(na) * math.sqrt(nb))) * 1e6)
    }
    var centers = Vector(emb.head._1)
    var expect = Vector[(Long, Long, Option[Long])]((0L, emb.head._1, None))
    for (t <- 1 until 5) {
      val byId = emb.map { case (id, v) =>
        (id, centers.map(c => distE6(emb.find(_._1 == c).get._2, v)).min)
      }
      val (id, d) = byId.maxBy { case (id, d) => (d, -id) }
      centers :+= id
      expect :+= ((t.toLong, id, Some(d)))
    }
    val got = Similarity.kcenterCoreset(spark, dir, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toVector
    assert(got == expect, s"got $got expect $expect")
  }
}
