package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession
import graft.functions.{CatalystText, TextFunctions => TF, VectorFunctions => VF}

class PipelineSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("memoized corpus tables miss when the file is regenerated in place") {
    // The signature/n-gram memos key on (path, mtime, length):
    // rewriting documents.parquet at the SAME path must produce fresh
    // results, not serve the previous corpus (the stale-memo bug the
    // identity key exists to prevent).
    val dir = java.nio.file.Files.createTempDirectory("graft_memo").toString
    def write(rows: Seq[(Long, String)]): Unit = {
      graft.TestFixtures.canonDocs(rows.toDF("doc_id", "text")).coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // mtime granularity can be coarse; force a distinct timestamp
      val f = new java.io.File(s"$dir/documents.parquet")
      f.setLastModified(f.lastModified() + 2000)
    }
    write(Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma")))
    val firstDup = Dedup.exactDedup(spark, dir).collect().map(_.getLong(0))
    val firstGrams = Dedup.crossdocNgrams(spark, dir, n = 2).count()
    // exact + SimHash sources each emit the (1,2) link → distinct
    val firstPairs = Dedup.dupPairs(spark, dir, includeMinhash = false)
      .distinct().count()
    assert(firstDup.toSeq == Seq(1L) && firstPairs == 1L)
    write(Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"),
      (3L, "eta theta iota")))
    val secondDup = Dedup.exactDedup(spark, dir).collect().map(_.getLong(0))
    val secondGrams = Dedup.crossdocNgrams(spark, dir, n = 2).count()
    val secondPairs = Dedup.dupPairs(spark, dir, includeMinhash = false)
      .distinct().count()
    assert(secondDup.toSeq == Seq(1L, 2L, 3L), s"stale memo: ${secondDup.mkString(",")}")
    assert(secondPairs == 0L, s"stale pair memo: $secondPairs")
    assert(firstGrams == 2L && secondGrams == 3L,
      s"stale ngram memo: $firstGrams / $secondGrams")
  }

  test("minhash estimates jaccard within tolerance on planted near-dups") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 54).map(i => s"tok$i").mkString(" ") + " x1 x2 x3 x4 x5 x6"
    val distinctDoc = (100 to 160).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, distinctDoc)).toDF("doc_id", "text")
    val sigs = df.select(col("doc_id"),
      TF.minhashSignature(array_distinct(TF.wordShingles(col("text"), 3)), 64).as("sig"))
    val s = sigs.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def est(a: Long, b: Long): Double =
      s(a).zip(s(b)).count { case (x, y) => x == y } / 64.0
    // exact shingle jaccard of (1,2): ~52/72 ≈ 0.72; (1,3) = 0
    assert(est(1, 2) > 0.4, s"near-dup est too low: ${est(1, 2)}")
    assert(est(1, 3) < 0.15, s"distinct est too high: ${est(1, 3)}")
  }

  test("identical docs share all LSH band keys; distinct docs share none") {
    val df = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "z y x w v u t s")).toDF("doc_id", "text")
    val banded = df.select(col("doc_id"),
      TF.bandKeys(
        TF.minhashSignature(array_distinct(TF.wordShingles(col("text"), 3)), 64),
        64, 16).as("bands"))
      .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(1))).toMap
    assert(banded(1L) == banded(2L))
    assert(banded(1L).intersect(banded(3L)).isEmpty)
  }

  test("simhash: near-dup docs within small hamming distance, distinct far") {
    val base = (1 to 100).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 95).map(i => s"tok$i").mkString(" ") + " a b c d e"
    val distinctDoc = (500 to 600).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, distinctDoc)).toDF("doc_id", "text")
    val hs = df.select(col("doc_id"), CatalystText.simhash64(TF.tokens(col("text"))).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(hs(a) ^ hs(b))
    assert(ham(1, 2) < 16, s"near-dup hamming ${ham(1, 2)}")
    assert(ham(1, 3) > 16, s"distinct hamming ${ham(1, 3)}")
  }

  test("rolling hash is order-sensitive, token hashes are not") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha")).toDF("doc_id", "text")
    val fp = df.select(col("doc_id"), CatalystText.rolling_hash64(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) != fp(2L))
    // determinism
    val fp2 = df.select(col("doc_id"), CatalystText.rolling_hash64(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp == fp2)
  }

  test("langId detects clear-cut languages") {
    val df = Seq(
      (1L, "the cat is in the house and it is warm"),
      (2L, "el gato es un animal y es bueno para la casa"),
      (3L, "der Hund ist nicht mit der Katze und das ist gut"),
      (4L, "le chat est dans la maison et les enfants"),
      (5L, "你好 世界")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), TF.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr", 5L -> "zh"), got.toString)
  }

  test("ann-lsh achieves reasonable recall of brute-force top-10") {
    val exact = Similarity.cosineTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annLshTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ann).size.toDouble / exact.size
    assert(recall >= 0.5, s"ANN recall $recall (${(exact & ann).size}/${exact.size})")
  }

  test("ann queries emit recall@10 matching brute-force ground truth") {
    // The recall_e2 column the DRIVER sees must equal the recall a
    // spec computes against the exact top-k — retrieval quality is
    // part of the query output, not just a test-side number.
    val exactByQ = Similarity.cosineTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for (ann <- Seq(Similarity.annLshTopK(spark, sf).collect(),
                    Similarity.annIvfTopK(spark, sf).collect())) {
      ann.groupBy(_.getLong(0)).foreach { case (q, rows) =>
        val hits = rows.count(r => exactByQ(q).contains(r.getLong(1)))
        val expected = hits * 100L / Similarity.TopK
        rows.foreach { r =>
          assert(r.getLong(4) == expected,
            s"query $q: recall_e2 ${r.getLong(4)} != computed $expected")
        }
      }
    }
  }

  test("embedDup finds most exact cosine>=0.4 pairs via LSH") {
    val emb = graft.Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val a = emb.select(col("vec_id").as("va"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("vb"), col("embedding").as("eb"))
    val exact = a.crossJoin(b).filter(col("va") < col("vb"))
      .select(col("va"), col("vb"),
        round(VF.cosine(col("ea"), col("eb")) * 1e4).cast("long").as("c"))
      .filter(col("c") >= 4000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.embedDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact), "LSH produced a pair below threshold")
    val recall = if (exact.isEmpty) 1.0 else (exact & got).size.toDouble / exact.size
    assert(recall >= 0.5, s"embedDup recall $recall (${(exact & got).size}/${exact.size})")
  }

  test("dupClusters recovers planted clusters with min-id survivors") {
    // Planted corpus: {1,2,3} byte-identical; {4,5,6} a near-dup CHAIN
    // (4~5 and 5~6 strongly similar, 4~6 weaker) that only transitive
    // clustering (connected components) groups fully; {7} unique.
    val baseA = (1 to 60).map(i => s"tok$i").mkString(" ")
    val baseB = (101 to 160).map(i => s"tok$i").mkString(" ")
    val nd1 = (101 to 158).map(i => s"tok$i").mkString(" ") + " x1 x2"
    val nd2 = (101 to 156).map(i => s"tok$i").mkString(" ") + " x1 x2 y1 y2"
    val uniq = (500 to 560).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, baseA), (2L, baseA), (3L, baseA),
      (4L, baseB), (5L, nd1), (6L, nd2), (7L, uniq)).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_dup").toString
    graft.TestFixtures.canonDocs(docs).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.dupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got.keySet == (1L to 7L).toSet)
    assert((1L to 3L).forall(got(_)._1 == 1L), s"cluster A expected: $got")
    assert((4L to 6L).forall(got(_)._1 == 4L), s"cluster B expected: $got")
    assert(got(7L) == (7L, true))
    assert((1L to 7L).filter(got(_)._2) == Seq(1L, 4L, 7L), s"survivors: $got")
  }

  test("dupClusters pairs-overload equals the self-computing path") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base), (3L, base + " x1 x2"),
      (4L, (500 to 560).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_dupov").toString
    graft.TestFixtures.canonDocs(docs).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val self = Dedup.dupClusters(spark, dir).collect().map(_.toSeq)
    // The 100 TB contract: compute the pair table once, persist it,
    // and feed the verdict from the precomputed table.
    val pairs = Dedup.dupPairs(spark, dir).localCheckpoint(true)
    val reused = Dedup.dupClusters(spark, dir, pairs).collect().map(_.toSeq)
    assert(self.toSeq == reused.toSeq)
  }

  test("cleanCorpus picks the survivor among gate-PASSING cluster members") {
    // Cluster {1, 2}: min-id member 1 is German (fails the language
    // gate); 2 is good English. Pre-fix, survivor = 1 was chosen
    // before gating, so the whole cluster's content vanished; now 2
    // must survive. The pair comes in via the precomputed-pairs
    // overload so the cluster link is deterministic.
    val docs = Seq(
      (1L, ("der Hund ist nicht mit der Katze und das ist gut " * 4).trim),
      (2L, ("the cat and the dog are in the house and " * 4).trim))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_gate").toString
    graft.TestFixtures.canonDocs(docs).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Seq((1L, 2L)).toDF("src", "dst")
    val kept = Pipeline.cleanCorpus(spark, dir, precomputedPairs = Some(pairs))
      .collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(2L), s"kept: ${kept.mkString(",")}")
  }

  test("cleanCorpus precomputed-pairs path equals the self-computing path") {
    val goodEn = ("the cat and the dog are in the house and " * 4).trim
    val docs = Seq((1L, goodEn), (2L, goodEn),
      (3L, ("it is a good day for all of us here and there " * 4).trim))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_cleanov").toString
    graft.TestFixtures.canonDocs(docs).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val self = Pipeline.cleanCorpus(spark, dir).collect().map(_.toSeq)
    val pairs = Dedup.dupPairs(spark, dir, includeMinhash = false)
    val reused = Pipeline.cleanCorpus(spark, dir, precomputedPairs = Some(pairs))
      .collect().map(_.toSeq)
    assert(self.toSeq == reused.toSeq)
  }

  test("cleanCorpus keeps quality English survivors only") {
    // Planted corpus: 1 = good English; 2 = byte-dup of 1 (loses to
    // min-id survivor); 3 = German (language gate); 4 = too short
    // (token gate); 5 = digit soup (alpha-ratio gate); 6 = good
    // English, unique.
    val goodEn = ("the cat and the dog are in the house and " * 4).trim
    val goodEn2 = ("it is a good day for all of us here and there " * 4).trim
    val docs = Seq(
      (1L, goodEn), (2L, goodEn),
      (3L, ("der Hund ist nicht mit der Katze und das ist gut " * 4).trim),
      (4L, "the cat"),
      (5L, ("12345 67890 " * 20).trim),
      (6L, goodEn2)).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_clean").toString
    graft.TestFixtures.canonDocs(docs).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kept = Pipeline.cleanCorpus(spark, dir).collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(1L, 6L), s"kept: ${kept.mkString(",")}")
  }

  test("cleanCorpus semantic-cluster stage collapses paraphrases lexical dedup misses") {
    // Docs 1 and 2 are paraphrases: different words (no shared
    // shingles, distant simhash — the lexical pair sources cannot
    // link them) but, by assumption, nearby embeddings; doc 3 is
    // unrelated. The semantic cluster table (in production:
    // Similarity.semanticDedup keyed to doc ids) is threaded in
    // precomputed, and only the min-id paraphrase may survive.
    val docs = Seq(
      (1L, ("the cat and the dog are in the house and " * 4).trim),
      (2L, ("it is a good day for all of us here and there " * 4).trim),
      (3L, ("please read the following terms and conditions for it " * 4).trim))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_semclean").toString
    graft.TestFixtures.canonDocs(docs).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val without = Pipeline.cleanCorpus(spark, dir).collect().map(_.getLong(0))
    assert(without.toSeq == Seq(1L, 2L, 3L), s"ungated: ${without.mkString(",")}")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("doc_id", "cluster_id")
    val semantic = Pipeline.cleanCorpus(spark, dir,
        semanticClusters = Some(clusters))
      .collect().map(_.getLong(0))
    assert(semantic.toSeq == Seq(1L, 3L), s"semantic: ${semantic.mkString(",")}")
    // docs absent from the cluster table are their own singletons
    val partial = Pipeline.cleanCorpus(spark, dir,
        semanticClusters = Some(Seq((1L, 1L), (2L, 1L)).toDF("doc_id", "cluster_id")))
      .collect().map(_.getLong(0))
    assert(partial.toSeq == Seq(1L, 3L), s"partial: ${partial.mkString(",")}")
  }

  test("cleanCorpus boilerplate gate drops template docs, keeps unique ones") {
    // Docs 1 and 2 share the same long boilerplate preamble (high
    // cross-doc 8-gram overlap) but differ enough that they are NOT
    // exact/SimHash duplicates; doc 3 is unique fluent English. All
    // three pass every per-document gate — only the corpus-level
    // boilerplate signal separates them.
    val template = "please read the following terms and conditions before " +
      "you continue to use the site because the provider requires it " +
      "and the provider may change the terms at any time without notice "
    val docs = Seq(
      (1L, template * 3 + "alpha beta gamma delta epsilon zeta eta theta " * 3),
      (2L, template * 3 + "one two three four five six seven eight nine ten " * 3),
      (3L, ("it is a good day for all of us here and there my friend " * 6).trim))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_boiler").toString
    graft.TestFixtures.canonDocs(docs).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val without = Pipeline.cleanCorpus(spark, dir).collect().map(_.getLong(0))
    assert(without.toSeq == Seq(1L, 2L, 3L), s"ungated: ${without.mkString(",")}")
    // Docs 1/2 are >60% shared 8-grams; doc 3 shares none.
    val gated = Pipeline.cleanCorpus(spark, dir, maxSharedE4 = Some(5000L))
      .collect().map(_.getLong(0))
    assert(gated.toSeq == Seq(3L), s"gated: ${gated.mkString(",")}")
  }

  test("stratifiedSample is deterministic, a subset, and respects 0/1 fractions") {
    val docs = (1L to 200L).map(i =>
      (i, s"doc $i", if (i % 3 == 0) "de" else if (i % 3 == 1) "en" else "fr"))
      .toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft_strat").toString
    graft.TestFixtures.canonDocs(docs).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fr = Map("en" -> 0.5, "de" -> 1.0) // fr absent => fraction 0
    val run1 = Pipeline.stratifiedSample(spark, dir, fr).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val run2 = Pipeline.stratifiedSample(spark, dir, fr).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(run1.sameElements(run2), "seeded sample not deterministic")
    val byLang = run1.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang.getOrElse("de", 0) == 66, s"de stratum: $byLang") // fraction 1.0 = all
    assert(!byLang.contains("fr"), s"fr stratum leaked: $byLang")   // absent key = none
    val en = byLang.getOrElse("en", 0)
    assert(en > 10 && en < 57, s"en stratum implausible for p=0.5: $en")
  }

  test("chunkDocs splits by width with exact remainders and reconstructible chunks") {
    val docs = Seq((1L, "abcdefghijkl"), (2L, "x"), (3L, "abcde"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_chunk").toString
    graft.TestFixtures.canonDocs(docs).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Pipeline.chunkDocs(spark, dir, width = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // doc 1: 12 chars -> chunks of 5,5,2; doc 2: 1 chunk; doc 3: exactly one width
    assert(got.map(c => (c._1, c._2, c._3)).toSeq ==
      Seq((1L, 0L, 5L), (1L, 1L, 5L), (1L, 2L, 2L), (2L, 0L, 1L), (3L, 0L, 5L)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(got.head._4 == md5hex("abcde"))
    assert(got(2)._4 == md5hex("kl"))
  }

  test("packSequences respects the token budget per sequence start") {
    val docs = (1L to 40L).map(i => (i, ("w " * (i % 7 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_pack").toString
    graft.TestFixtures.canonDocs(docs).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Pipeline.packSequences(spark, dir, budget = 10, shards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 40, "every doc assigned exactly one sequence")
    // within a shard, seq ids are nondecreasing in doc order, and every
    // doc's START offset lies inside its sequence's budget window: the
    // sequence total minus its last doc never exceeds the budget.
    got.groupBy(t => t._1 % 4).foreach { case (_, shardDocs) =>
      val inOrder = shardDocs.sortBy(_._1)
      assert(inOrder.map(_._3).sameElements(inOrder.map(_._3).sorted), "seq ids decreased")
      inOrder.groupBy(_._3).foreach { case (seq, ds) =>
        val overshoot = ds.map(_._2).sum - ds.last._2
        assert(overshoot <= 10, s"seq $seq pre-last total $overshoot > budget")
      }
    }
  }

  test("incrementalDedup drops cross-batch and within-batch exact dups") {
    // Old corpus: 1, 2. New batch (>= 250): 250 dups old doc 1 (drop),
    // 251 is fresh (keep), 252 dups 251 within the batch (drop),
    // 253 is fresh (keep).
    val docs = Seq(
      (1L, "old doc one"), (2L, "old doc two"),
      (250L, "old doc one"), (251L, "brand new text"),
      (252L, "brand new text"), (253L, "another new text"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_incr").toString
    graft.TestFixtures.canonDocs(docs).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val kept = Dedup.incrementalDedup(spark, dir).collect().map(_.getLong(0))
    assert(kept.toSeq == Seq(251L, 253L), s"kept: ${kept.mkString(",")}")
  }

  test("decontaminate flags planted benchmark 8-gram overlap only") {
    // doc 20 is in the benchmark partition (doc_id % 20 == 0); doc 21
    // embeds an exact 8-token window of it; doc 22 shares nothing.
    val benchText = (1 to 30).map(i => s"bm$i").mkString(" ")
    val leaked = "intro words " + (5 to 12).map(i => s"bm$i").mkString(" ") + " outro"
    val clean = (100 to 130).map(i => s"c$i").mkString(" ")
    val docs = Seq((20L, benchText), (21L, leaked), (22L, clean))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_decon").toString
    graft.TestFixtures.canonDocs(docs).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Pipeline.decontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(21L), s"contaminated set: $got")
    assert(got(21L) == 1L, s"doc 21 shares exactly one distinct 8-gram: $got")
  }

  test("piiScan counts and redacts planted emails, urls, phone numbers") {
    val text = "mail a@b.co and c.d@e-f.org or visit https://x.y/z?q=1 " +
      "call +1 (555) 123-4567 now"
    val docs = Seq((1L, text), (2L, "no pii here")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_pii").toString
    graft.TestFixtures.canonDocs(docs).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.piiScan(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(got(0) == ((1L, 2L, 1L, 1L, {
      val red = text
        .replaceAll(TextAnalysis.EmailPattern, "<EMAIL>")
        .replaceAll(TextAnalysis.UrlPattern, "<URL>")
        .replaceAll(TextAnalysis.PhonePattern, "<PHONE>")
      java.security.MessageDigest.getInstance("MD5").digest(red.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    })), s"got: ${got(0)}")
    assert(got(1) == ((2L, 0L, 0L, 0L,
      java.security.MessageDigest.getInstance("MD5").digest("no pii here".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString)))
  }

  test("frame sampling yields ceil(n_bytes/256) frames per doc") {
    val frames = Multimodal.frameSample(spark, sf, 256).collect()
      .groupBy(_.doc_id).view.mapValues(_.length).toMap
    val expected = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), length(encode(col("text"), "UTF-8")).as("n"))
      .collect().map(r => r.getLong(0) -> math.ceil(r.getInt(1) / 256.0).toInt).toMap
    assert(frames == expected)
  }

  test("approx percentile verdict is true and the raw sketch is within 5%") {
    val rows = Relational.qApproxPercentile(spark, sf).collect()
    assert(rows.nonEmpty)
    // The query's own error-bound verdict (what the oracle pins):
    rows.foreach(r => assert(r.getBoolean(3), s"approx_ok false for ${r.getString(0)}"))
    // Independent re-check of the raw sketch against the exact median:
    import org.apache.spark.sql.functions.{expr, percentile_approx, lit => flit}
    graft.Tables.lineitem(spark, sf).groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_quantity"), flit(0.5), flit(10000)).as("a"),
        expr("percentile(l_quantity, 0.5)").as("e"))
      .collect().foreach { r =>
        val (approx, exact) = (r.getDouble(1), r.getDouble(2))
        assert(math.abs(approx - exact) <= math.max(0.05 * math.abs(exact), 1e-9),
          s"approx $approx vs exact $exact for ${r.getString(0)}")
      }
  }

  test("approx distinct verdict is true and the raw sketch is within 5%") {
    val rows = Relational.qApproxDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(2), s"approx_ok false for ${r.getString(0)}"))
    import org.apache.spark.sql.functions.{approx_count_distinct, countDistinct}
    graft.Tables.lineitem(spark, sf).groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("a"),
        countDistinct(col("l_partkey")).as("e"))
      .collect().foreach { r =>
        val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
        assert(math.abs(approx - exact) / exact < 0.05,
          s"approx $approx vs exact $exact")
      }
  }

  test("lineDedup strikes cross-doc lines and re-assembles survivors in order") {
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    // "BANNER" appears in 3 docs (>= minDocs) → struck everywhere;
    // "rare" in only 2 → kept; blank lines are never boilerplate.
    val docs = Seq(
      (1L, "BANNER\nalpha\nrare\nomega"),
      (2L, "beta\nBANNER\nrare"),
      (3L, "\nBANNER"), // all non-blank lines removed, blank kept
      (4L, "solo text")
    ).toDF("doc_id", "text")
    val got = Pipeline.lineDedupOf(docs, minDocs = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == Seq(
      (1L, 4L, 1L, md5hex("alpha\nrare\nomega")), // order preserved around the strike
      (2L, 3L, 1L, md5hex("beta\nrare")),
      (3L, 2L, 1L, md5hex("")),                   // blank line + struck line
      (4L, 1L, 0L, md5hex("solo text"))))
  }

  test("epoch schedule: rare sources repeat more, copies bracket the rate") {
    import spark.implicits._
    // 96 "web" docs vs 6 "book" docs: sqrt-temperature gives book a
    // higher per-doc repetition rate than web.
    val docs = ((0 until 96).map(i => (i.toLong, "web"))
      ++ (100 until 106).map(i => (i.toLong, "book")))
      .toDF("doc_id", "source")
    val epochs = 4
    val got = Pipeline.epochScheduleOf(docs, epochs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    // exact integer rates this fixture implies
    val n = Map("web" -> 96L, "book" -> 6L)
    val w = n.map { case (s, c) => s -> math.round(math.sqrt(c.toDouble) * 1e6) }
    val totW = w.values.sum
    val nn = n.values.sum
    def rate(s: String): (Long, Long) = (w(s) * nn * epochs, totW * n(s))
    // per-doc copies must bracket the fractional rate
    got.foreach { case (_, s, c) =>
      val (num, den) = rate(s)
      assert(c == num / den || c == num / den + 1, s"$s copies $c vs $num/$den")
    }
    // rare source repeats strictly more per doc
    val (bn, bd) = rate("book"); val (wn, wd) = rate("web")
    assert(bn * wd > wn * bd)
    val bookMin = got.filter(_._2 == "book").map(_._3).min
    val webMax = got.filter(_._2 == "web").map(_._3).max
    assert(bookMin >= webMax, s"book min $bookMin vs web max $webMax")
    // fractional path actually exercised: both floor and ceil occur
    // in at least one source (rates here are non-integer)
    assert(got.map(_._3).distinct.length >= 2)
    // deterministic across partitionings
    val again = Pipeline.epochScheduleOf(docs.repartition(7), epochs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }
}
