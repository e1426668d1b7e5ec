package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSim, InnerProduct, L2Normalize, MinHashSig, RollingHash64, SimHash64, SortedKvIntersectStats}

/** Registers graft's custom Catalyst expressions as SQL functions, so
  * `spark.sql("SELECT simhash64(...) ...")` works next to the Column
  * API. Install with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, usage, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        GraftExtensions.info(name, usage), builder))
    }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "scala_udf")

  private val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("simhash64", "simhash64(array<string>) - 64-bit SimHash fingerprint",
      args => SimHash64(args.head)),
    ("rolling_hash64", "rolling_hash64(string) - Rabin-Karp rolling fingerprint",
      args => RollingHash64(args.head)),
    ("minhash_sig", "minhash_sig(array<string>, k) - k-element MinHash signature",
      args => MinHashSig(args.head, extractK(args))),
    ("cosine_sim", "cosine_sim(array<float|double>, array<float|double>) - cosine similarity",
      args => CosineSim(args.head, args(1))),
    ("inner_product", "inner_product(array<float|double>, array<float|double>) - raw dot product",
      args => InnerProduct(args.head, args(1))),
    ("l2_normalize", "l2_normalize(array<float|double>) - unit-normalized array<double>",
      args => L2Normalize(args.head)),
    ("word_shingles",
      "word_shingles(tokens array<string>, n) - word n-gram shingles, short docs yield one whole-array shingle",
      args => graft.functions.WordShingles(args.head,
        extractIntLiteral(args, 2, 1, "word_shingles"))),
    ("sorted_kv_intersect_stats",
      "sorted_kv_intersect_stats(keys_a array<bigint> ASC, vals_a array<bigint>, keys_b array<bigint> ASC)" +
        " - struct(common, vsum): intersection size and value sum over it",
      args => SortedKvIntersectStats(args(0), args(1), args(2))),
    // Aggregate: the registry takes the bare AggregateFunction; the
    // analyzer wraps it in an AggregateExpression.
    ("bottom_k_by_key",
      "bottom_k_by_key(key string, value bigint, k) - k values with the smallest keys per group",
      args => graft.functions.BottomKByKey(args(0), args(1), extractIntLiteral(args, 3, 2, "bottom_k_by_key"))))

  /** k must be a foldable integral literal — anything else (a column
    * reference, a string) fails here with a clear message instead of
    * a ClassCastException deep in expression building. */
  private def extractK(args: Seq[Expression]): Int =
    extractIntLiteral(args, expectedArity = 2, kIndex = 1, fn = "minhash_sig")

  private def extractIntLiteral(args: Seq[Expression], expectedArity: Int,
      kIndex: Int, fn: String): Int = {
    if (args.length != expectedArity)
      throw new IllegalArgumentException(s"$fn expects $expectedArity arguments")
    val kExpr = args(kIndex)
    if (!kExpr.foldable)
      throw new IllegalArgumentException(s"$fn: k must be a literal integer")
    kExpr.eval() match {
      case i: java.lang.Integer => i.intValue()
      case l: java.lang.Long if l >= 1 && l <= Int.MaxValue => l.intValue()
      case s: java.lang.Short => s.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: k must be a literal integer, got $other")
    }
  }

  /** Register on an already-built session (temp functions). The
    * `withExtensions`/`spark.sql.extensions` path above is preferred
    * at session build time; this covers REPL/late binding. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
