package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.graph.SparkTestSession

/** Hand-computed contracts of the retrieval pack on a four-doc
  * corpus (apple/banana/cherry/durian):
  *  - BM25: per-term e4 scores match the hand calculation, the
  *    (score DESC, doc_id ASC) order resolves an exact score tie;
  *  - RRF: exact 1e6 div (60+rank) arithmetic, outer fuse of a doc
  *    present in only one list, tie broken by doc_id;
  *  - eval: MRR/NDCG hand-checked against a same-(source,lang)
  *    relevance proxy;
  *  - hard negatives: relevant candidates are excluded, scores keep
  *    the BM25 values.
  */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val D = Similarity.EmbeddingDim

  /** docs 0-1 source A, 2-3 source B; embeddings rank d1 > d2 > d3
    * for query 0 (descending first-axis alignment). */
  private def plant(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_retr").toString
    graft.TestFixtures.canonDocs(Seq(
      (0L, "apple banana apple", "A"),
      (1L, "apple cherry", "A"),
      (2L, "banana banana banana", "B"),
      (3L, "cherry cherry durian", "B"))
      .toDF("doc_id", "text", "source"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def vec(x0: Float, x1: Float): Seq[Float] = {
      val v = Array.fill(D)(0.0f); v(0) = x0; v(1) = x1; v.toSeq
    }
    graft.TestFixtures.canonEmb(Seq(
      (0L, vec(1.0f, 0.0f)),
      (1L, vec(0.9f, 0.1f)),
      (2L, vec(0.7f, 0.3f)),
      (3L, vec(0.5f, 0.5f)))
      .toDF("vec_id", "embedding"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("bm25: hand-computed scores, tie broken by doc_id") {
    val dir = plant()
    val got = Retrieval.bm25TopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .groupBy(_._1).map { case (q, rows) =>
        q -> rows.sortBy(_._4).map(t => (t._2, t._3)).toSeq
      }
    // Query 0 {apple, banana}: d2 scores ln2·(3·2.2/4.281818…) →
    // 10684; d1 ln2·(2.2/1.954545…) → 7802.
    assert(got(0L) == Seq((2L, 10684L), (1L, 7802L)))
    // Query 1 {apple, cherry}: d0 and d3 tie at 9293 exactly —
    // unique order must put doc 0 first.
    assert(got(1L) == Seq((0L, 9293L), (3L, 9293L)))
    assert(got(2L) == Seq((0L, 6683L)))
    assert(got(3L) == Seq((1L, 7802L)))
  }

  test("rrf: exact contributions, outer fuse, doc-id tie-break") {
    val dir = plant()
    val got = Retrieval.rrfFusion(spark, dir).collect()
      .filter(_.getLong(0) == 0L)
      .sortBy(_.getInt(3))
      .map(r => (r.getLong(1), r.getLong(2)))
    // Query 0: sparse ranks {d2:1, d1:2}; dense {d1:1, d2:2, d3:3}.
    // d1 = 1e6/62 + 1e6/61 = 16129+16393 = 32522 = d2 (mirror) —
    // tie → doc 1 first; d3 dense-only = 1e6/63 = 15873.
    assert(got.toSeq == Seq((1L, 32522L), (2L, 32522L), (3L, 15873L)))
  }

  test("eval: MRR and binary-gain NDCG hand-checked") {
    val dir = plant()
    val got = Retrieval.retrievalEval(spark, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // Query 0: run = [d2, d1]; relevant (source A, en) = {d1} at
    // rank 2 → rr = 500000; dcg = round(1e4/log2(3)) = 6309, ideal
    // packs it at rank 1 (term 1e4) → ndcg = 630900.
    assert(got(0L) == ((1L, 500000L, 630900L)))
    // Query 2: run = [d0] (source A ≠ B) → nothing relevant.
    assert(got(2L) == ((0L, 0L, 0L)))
  }

  test("prf: hand-computed expansion terms and weighted re-scores") {
    val dir = plant()
    val got = Retrieval.prfTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .groupBy(_._1).map { case (q, rows) =>
        q -> rows.sortBy(_._4).map(t => (t._2, t._3)).toSeq
      }
    // Query 0 {apple, banana}: feedback docs = base run [d2, d1];
    // expansion candidates cherry(6931, from d1) only (apple/banana
    // are original) → expanded {apple·2, banana·2, cherry·1}:
    // d1 = 2·7802 + 1·7802 = 23406; d2 = 2·10684; d3 = 1·9293.
    assert(got(0L) == Seq((1L, 23406L), (2L, 21368L), (3L, 9293L)))
    // Query 1 {apple, cherry}: fdocs [d0, d3]; candidates banana
    // (6931) and durian (13863) → both join at weight 1:
    // d3 = 2·9293 + 11608 = 30194; d0 = 2·9293 + 6683 = 25269;
    // d2 = 1·10684.
    assert(got(1L) == Seq((3L, 30194L), (0L, 25269L), (2L, 10684L)))
    // Query 2 {banana}: fdocs [d0]; expansion {apple}:
    // d0 = 2·6683 + 9293 = 22659; d1 = 7802.
    assert(got(2L) == Seq((0L, 22659L), (1L, 7802L)))
    // Query 3 {cherry, durian}: fdocs [d1]; expansion {apple}:
    // d1 = 2·7802 + 7802 = 23406; d0 = 9293.
    assert(got(3L) == Seq((1L, 23406L), (0L, 9293L)))
  }

  test("phrase retrieval matches words in ORDER, not as a bag") {
    // doc 3 contains BOTH query words ("new", "york") but never
    // adjacently — a bag-of-words scorer would rank it; the bigram
    // index must not even see it as a candidate. Query 0's phrases
    // (top-2 bigrams by tf·idf) are "new york" (tf 2) and the
    // reversed "york new" (tf 1); doc 1 matches only the former,
    // doc 2 only the latter.
    val docs = Seq(
      (0L, "new york new york"),
      (1L, "i love new york"),
      (2L, "york new haven"),
      (3L, "new jersey york"),
      (4L, "a b")).toDF("doc_id", "text")
    val got = Retrieval.phraseTopKOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val q0 = got.filter(_._1 == 0L).toSeq.sortBy(_._4)
    // Hand-computed (N=5 postings docs, totdl=11): doc 2 (dl 2)
    // scores ln(1+3.5/2.5)·2.2/2.1181818 → 9093; doc 1 (dl 3) →
    // 7621. Doc 3 must be ABSENT (shares no bigram).
    assert(q0 == Seq((0L, 2L, 9093L, 1), (0L, 1L, 7621L, 2)), s"$q0")
    assert(!got.exists(t => t._1 == 0L && t._2 == 3L),
      "bag-of-words leak: non-adjacent co-occurrence became a candidate")
    // Single-token docs carry no bigram: a 1-token corpus member can
    // never be a candidate nor a query with phrases.
    val withShort = docs.union(Seq((5L, "solo")).toDF("doc_id", "text"))
    val got2 = Retrieval.phraseTopKOf(withShort).collect()
    assert(!got2.exists(r => r.getLong(0) == 5L || r.getLong(1) == 5L))
  }

  test("3-term phrases match in ORDER; sub-3-token docs drop out entirely") {
    // doc 3 contains all three query words but never as an adjacent
    // ordered run; doc 2 holds the reversed phrase. Only doc 1
    // shares the exact trigram "new york city" with query 0. The
    // 2-token doc 4 spans no trigram: it is neither query, nor
    // candidate, nor counted in the postings-derived N.
    val docs = Seq(
      (0L, "new york city new york city"),
      (1L, "i love new york city"),
      (2L, "city york new haven"),
      (3L, "new jersey york big city"),
      (4L, "a b")).toDF("doc_id", "text")
    val got = Retrieval.phraseTopKOf(docs, 10, 3, Retrieval.QueryPhrases3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val q0c = got.filter(_._1 == 0L).map(_._2).toSet
    assert(q0c.contains(1L), s"exact trigram match missing: $got")
    assert(!q0c.contains(3L),
      "bag-of-words leak: non-adjacent trigram words became a candidate")
    assert(!got.exists(t => t._1 == 4L || t._2 == 4L),
      "a 2-token doc can span no trigram")
  }

  test("bm25f: a title hit outranks the identical hit buried in the body") {
    // Query doc 0's only term is zzz. Docs 1 and 2 are the SAME
    // length and carry the SAME single zzz occurrence — differing
    // only in WHERE: inside the first-8-token title (doc 1) vs in
    // the body (doc 2). Classic one-bag BM25 ties them; BM25F's
    // title weight must rank doc 1 strictly first.
    val fill = (1 to 9).map(i => s"f$i").mkString(" ")
    val docs = Seq(
      (0L, "zzz zzz zzz"),
      (1L, "zzz " + fill),
      (2L, fill.split(" ").take(8).mkString(" ") + " zzz f9"))
      .toDF("doc_id", "text")
    // Force-read via the dir-less path: bm25fTopK reads Tables
    // directly, so plant a documents.parquet.
    val dir = java.nio.file.Files.createTempDirectory("graft_bm25f").toString
    graft.TestFixtures.canonDocs(docs)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Retrieval.bm25fTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val q0 = got.filter(_._1 == 0L).toSeq.sortBy(_._4)
    assert(q0.map(_._2) == Seq(1L, 2L), s"title hit must lead: $q0")
    assert(q0.head._3 > q0(1)._3, s"strictly higher score: $q0")
  }

  test("hard negatives: relevant candidates excluded, scores preserved") {
    val dir = plant()
    val got = Retrieval.hardNegatives(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // Query 0 (source A): d2 (B) stays with its BM25 score, d1 (A)
    // is filtered as relevant.
    val q0 = got.filter(_._1 == 0L).toSeq
    assert(q0 == Seq((0L, 2L, 10684L, 1)))
    // Query 1: both candidates tie at 9293; only d3 (source B)
    // survives the relevance filter.
    val q1 = got.filter(_._1 == 1L).toSeq
    assert(q1 == Seq((1L, 3L, 9293L, 1)))
  }
}
