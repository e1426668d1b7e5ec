package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** The deletion-neighborhood fuzzy join must find EVERY Levenshtein
  * ≤ 1 pair — including the insertion/deletion cases (differing
  * lengths) the sequential supplier names never exercise — and no
  * false positives after the exact verify. Checked against an
  * in-test brute force over an adversarial key set. */
class FuzzyJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("deletion-neighborhood join equals brute-force levenshtein <= 1") {
    val names = Seq("abc", "abcd", "xbc", "abd", "bc", "abcf",
      "zzz", "zz", "z", "", "a", "abce", "axbc")
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzzy").toString
    names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("s_suppkey", "s_name")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val got = Relational.qFuzzyJoin(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // brute force in plain Scala
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val idx = names.zipWithIndex
    val want = (for {
      (a, i) <- idx; (b, j) <- idx if i < j && lev(a, b) <= 1
    } yield (a, b, lev(a, b).toLong)).toSet
    assert(got == want, s"missing: ${want -- got}; extra: ${got -- want}")
  }
}
