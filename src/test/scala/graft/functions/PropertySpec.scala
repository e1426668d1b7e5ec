package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.{GraphBuilder, SparkTestSession}

/** Property-based invariants for the core primitives, driven by
  * ScalaCheck generators sampled from a fixed seed (the
  * scalatest↔scalacheck bridge isn't on the offline classpath, so
  * sampling is explicit — which also makes runs reproducible). */
class PropertySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val edgeListGen: Gen[List[(Long, Long, Double)]] =
    Gen.listOfN(30, for {
      a <- Gen.choose(0L, 9L)
      b <- Gen.choose(0L, 9L)
      w <- Gen.choose(1, 5).map(_.toDouble)
    } yield (a, b, w))

  test("canonicalEdges: src<dst, no self loops, non-loop weight preserved") {
    samples(edgeListGen, 10).foreach { edges =>
      val df = edges.toDF("src", "dst", "weight")
      val canon = GraphBuilder.canonicalEdges(df, "src", "dst", "weight").collect()
      canon.foreach(r => assert(r.getLong(0) < r.getLong(1)))
      val expectedW = edges.filter { case (a, b, _) => a != b }.map(_._3).sum
      val gotW = canon.map(_.getDouble(2)).sum
      assert(math.abs(gotW - expectedW) < 1e-9, s"weight $gotW != $expectedW")
    }
  }

  private val tokensGen: Gen[List[String]] =
    Gen.choose(1, 20).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 99).map(i => s"w$i")))

  test("word_shingles: native expression equals the HOF composition it replaced") {
    // Random word-soup strings plus the edge cases: empty text, one
    // word, exactly n words, n-1 words, repeated whitespace.
    val gen = Gen.listOfN(40,
      Gen.chooseNum(0, 24).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("key", "agg", "row", "scan", "a", "x9"))
          .map(_.mkString(" "))))
    val texts = gen.pureApply(Gen.Parameters.default, Seed(7L)) ++
      Seq("", "one", "a b c", "a b c d", "  two   spaces  here ")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (n <- Seq(1, 3, 8)) {
      val got = df.select(col("id"), TextFunctions.wordShingles(col("text"), n).as("s"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
      val want = df.select(col("id"), TextFunctions.wordShinglesHof(col("text"), n).as("s"))
        .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
      assert(got == want, s"n=$n mismatch")
    }
  }

  test("deletion_variants: native expression equals the HOF composition it replaced") {
    // Includes empty string, single char, repeated chars (duplicate
    // variants preserved — dedup happens downstream) and multi-byte
    // code points (deletion is character-based, like substring).
    val texts = Seq("", "a", "ab", "aaa", "Supplier#000000001",
      "naïve", "日本語テキスト", "mixé 字")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "name")
    val got = df.select(col("id"),
        CatalystText.deletion_variants(col("name")).as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    val want = df.select(col("id"),
        concat(array(col("name")),
          expr("transform(sequence(1, length(name)), " +
            "i -> concat(substring(name, 1, i-1), " +
            "substring(name, i+1, length(name))))")).as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1))).toMap
    // Multiset equality on non-empty inputs. On "" the HOF quirked:
    // sequence(1, 0) DESCENDS to [1, 0], emitting two spurious empty
    // variants (collapsed downstream by distinct()); the native form
    // returns the correct one-element neighborhood.
    for (i <- texts.indices if texts(i).nonEmpty)
      assert(got(i.toLong) == want(i.toLong), s"id=$i")
    assert(got(0L) == Seq(""))
  }

  test("minhash: identical inputs → identical signatures of length k") {
    samples(tokensGen, 10).foreach { toks =>
      val df = Seq((1L, toks), (2L, toks)).toDF("id", "toks")
      val sigs = df.select(col("id"), CatalystText.minhash_sig(col("toks"), 32).as("s"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(sigs(1L).length == 32)
      assert(sigs(1L) == sigs(2L))
    }
  }

  private val vecGen: Gen[List[Double]] =
    Gen.listOfN(8, Gen.choose(-10.0, 10.0)).suchThat(v => v.exists(x => math.abs(x) > 0.1))

  test("cosine: self-similarity 1, symmetric, bounded") {
    val vs = samples(vecGen, 20)
    vs.zip(vs.reverse).take(10).foreach { case (a, b) =>
      val df = Seq((a.toArray, b.toArray)).toDF("a", "b")
      val row = df.select(
        CatalystText.cosine_sim(col("a"), col("a")).as("saa"),
        CatalystText.cosine_sim(col("a"), col("b")).as("sab"),
        CatalystText.cosine_sim(col("b"), col("a")).as("sba")).collect()(0)
      assert(math.abs(row.getDouble(0) - 1.0) < 1e-9)
      assert(row.getDouble(1) == row.getDouble(2))
      assert(row.getDouble(1) >= -1.0 - 1e-9 && row.getDouble(1) <= 1.0 + 1e-9)
    }
  }

  test("fingerprints: deterministic; simhash invariant to token order") {
    samples(tokensGen, 10).foreach { toks =>
      val df = Seq((1L, toks.mkString(" "), toks), (2L, toks.mkString(" "), toks.reverse))
        .toDF("id", "text", "toks")
      val rows = df.select(col("id"),
        CatalystText.rolling_hash64(col("text")).as("rh"),
        CatalystText.simhash64(col("toks")).as("sh"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // simhash is a bag-of-tokens hash: order-invariant
      assert(rows(1L)._2 == rows(2L)._2)
      // rolling hash is deterministic across evaluations
      val again = df.filter(col("id") === 1).select(
        CatalystText.rolling_hash64(col("text"))).collect()(0).getLong(0)
      assert(rows(1L)._1 == again)
    }
  }

  test("sig_agree_count: native expression equals the HOF composition it replaced") {
    import graft.functions.{TextFunctions => TF}
    // Random word-soup docs: signatures vary from all-agree (identical
    // text) through partial overlap to disjoint; k = 64 as production.
    val texts = Seq(
      "alpha beta gamma delta epsilon zeta", "alpha beta gamma delta epsilon zeta",
      "alpha beta gamma delta other words", "completely different token stream here",
      "", "one")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"),
        TF.minhashSignature(array_distinct(TF.wordShingles(col("text"), 3)), 64)
          .as("sig"))
      .localCheckpoint(true)
    val pairs = df.select(col("id").as("a"), col("sig").as("sa"))
      .crossJoin(df.select(col("id").as("b"), col("sig").as("sb")))
      .filter(col("a") < col("b"))
    val got = pairs.select(col("a"), col("b"),
        TF.signatureSimilarityE4(col("sa"), col("sb"), 64).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val want = pairs.select(col("a"), col("b"),
        TF.signatureSimilarityE4Hof(col("sa"), col("sb"), 64).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want)
    assert(got((0L, 1L)) == 10000L) // identical docs agree everywhere
  }
}
