package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks composed from codegen'd builtins —
  * no UDFs in any hot path (SURVEY §4). Shingling, MinHash and
  * band-hashing are pure `Column` expressions so they stay inside
  * WholeStageCodegen; the only interpreted expressions are the two
  * compact fingerprint `Expression`s in [[CatalystText]].
  */
object TextFunctions {

  /** Whitespace tokenization. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Word n-gram shingles: ["a","b","c","d"], n=3 →
    * ["a b c", "b c d"]. Documents shorter than n yield one shingle
    * of the whole text. Native [[WordShingles]] expression — the
    * equivalent `transform`+`slice`+`concat_ws` composition pays an
    * interpreted closure per shingle (spec-checked equal). */
  def wordShingles(text: Column, n: Int): Column =
    CatalystText.word_shingles(tokens(text), n)

  /** The interpreted HOF composition [[wordShingles]] replaced —
    * kept as the parity reference for the equality spec. */
  private[graft] def wordShinglesHof(text: Column, n: Int): Column = {
    val t = tokens(text)
    transform(
      sequence(lit(0), greatest(size(t) - lit(n), lit(0))),
      i => concat_ws(" ", slice(t, i + lit(1), lit(n))))
  }

  /** MinHash signature: k minimums of seeded per-shingle hashes,
    * computed by the native [[MinHashSig]] Catalyst expression (one
    * tight loop per row — the equivalent `transform`+`aggregate`
    * builtin composition pays interpreted-lambda cost per shingle per
    * seed, ~100× slower). Constant memory per doc — this is what
    * keeps near-dup linear at 100 TB. */
  def minhashSignature(shingles: Column, k: Int): Column =
    CatalystText.minhash_sig(shingles, k)

  /** LSH band keys: split a k-length signature into `bands` bands of
    * k/bands rows and hash each band (salted by band index). Two
    * documents sharing any band key become a candidate pair. */
  def bandKeys(signature: Column, k: Int, bands: Int): Column = {
    val rows = k / bands
    transform(
      sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.as("band"),
        xxhash64(b, slice(signature, b * lit(rows) + lit(1), lit(rows))).as("key")))
  }

  /** Signature agreement fraction scaled to e4 — the MinHash Jaccard
    * estimate, counted by the native [[CatalystText.SigAgreeCount]]
    * loop (the zip_with+aggregate composition pays an interpreted
    * closure per element per candidate pair; kept below as the
    * parity reference for the equality spec). */
  def signatureSimilarityE4(sigA: Column, sigB: Column, k: Int): Column =
    round(CatalystText.sig_agree_count(sigA, sigB).cast("double")
      / lit(k.toDouble) * 1e4).cast("long")

  /** The interpreted HOF composition [[signatureSimilarityE4]]
    * replaced — the parity reference for the equality spec. */
  private[graft] def signatureSimilarityE4Hof(sigA: Column, sigB: Column,
      k: Int): Column =
    round(aggregate(
      zip_with(sigA, sigB, (a, b) => when(a === b, 1.0).otherwise(0.0)),
      lit(0.0), (acc, x) => acc + x) / lit(k.toDouble) * 1e4).cast("long")

  /** Exact Jaccard over two shingle arrays, scaled to e4. */
  def jaccardE4(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    round(when(union === 0.0, 0.0).otherwise(inter / union) * 1e4).cast("long")
  }

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"),
    "fr" -> Seq("le", "la", "les", "et", "est", "dans", "un", "une", "pour", "que"),
    "es" -> Seq("el", "los", "y", "es", "en", "un", "una", "por", "con", "para"))

  /** Heuristic language id: CJK-script detection, then stopword-hit
    * scoring with a fixed priority tiebreak. Deterministic. */
  def langId(text: Column): Column = {
    val t = tokens(lower(text))
    def score(lang: String): Column =
      size(array_intersect(t, array(stopwords(lang).map(lit): _*)))
    val en = score("en"); val de = score("de"); val fr = score("fr"); val es = score("es")
    val best = greatest(en, de, fr, es)
    when(text.rlike("[\\u4e00-\\u9fff]"), lit("zh"))
      .when(best === 0, lit("und"))
      .when(en === best, lit("en"))
      .when(es === best, lit("es"))
      .when(de === best, lit("de"))
      .otherwise(lit("fr"))
  }
}
