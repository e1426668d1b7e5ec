package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{TextFunctions => TF}

/** End-to-end training-data curation: the composition a user actually
  * runs over a raw corpus — language filter, quality gates, dedup
  * survivors — produced by chaining the engine's own operators, not
  * bespoke logic. Every stage is a narrow projection or an operator
  * that is independently oracle/spec-checked; the composition itself
  * is spec-checked on a planted corpus.
  */
object Pipeline {

  /** Curated corpus: English documents passing quality gates, one
    * survivor per duplicate cluster.
    *
    * Gates (tunable): ≥ `minTokens` whitespace tokens, ≥ 50% alpha
    * characters, predicted language "en". Duplicate clusters from
    * [[Dedup.dupClusters]] on exact + SimHash pairs (the cheap pair
    * sources — MinHash adds recall but triples pair-source cost);
    * pass `precomputedPairs` to reuse a persisted [[Dedup.dupPairs]]
    * table — at 100 TB you build the pair table once and fan it out,
    * not recompute it per downstream read.
    *
    * Gate FIRST, then pick one survivor per duplicate cluster AMONG
    * the gate-passing members (min doc_id): choosing the survivor
    * before gating would drop a whole cluster whenever its min-id
    * member happens to fail a gate, silently losing content that has
    * a perfectly good gate-passing duplicate.
    *
    * `maxSharedE4` arms the corpus-level boilerplate gate: documents
    * whose cross-document duplicated-8-gram fraction
    * ([[Dedup.crossdocNgrams]], e4-scaled) EXCEEDS the threshold are
    * dropped — the RefinedWeb-style template/boilerplate filter that
    * per-document gates can't see (a template page is individually
    * fluent English; only the corpus view exposes it). Off by
    * default: it adds one corpus-wide n-gram df pass.
    *
    * `semanticClusters` arms the SemDeDup stage: a precomputed
    * (doc_id, cluster_id) table — [[Similarity.semanticDedup]] output
    * keyed to doc ids, or any clustering — applied AFTER the lexical
    * survivor pass: among lexical survivors sharing a semantic
    * cluster, only the min doc_id is kept (paraphrases and
    * re-renderings that hash/shingle dedup cannot see). Threaded the
    * same persist-once way as `precomputedPairs`: at 100 TB the
    * cluster table is built once off the embedding store and fanned
    * out. Docs absent from the table are their own singletons.
    *
    * Output: (doc_id, n_tokens, n_chars) of kept documents. */
  def cleanCorpus(spark: SparkSession, dir: String,
      minTokens: Int = 10,
      precomputedPairs: Option[DataFrame] = None,
      maxSharedE4: Option[Long] = None,
      semanticClusters: Option[DataFrame] = None): DataFrame = {
    val t = col("text")
    val metrics = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(TF.tokens(t)).cast("long").as("n_tokens"),
        length(t).cast("long").as("n_chars"),
        length(regexp_replace(t, "[^A-Za-z]", "")).cast("long").as("n_alpha"),
        TF.langId(t).as("pred_lang"))
    val perDocGated = metrics
      .filter(col("pred_lang") === "en")
      .filter(col("n_tokens") >= minTokens)
      .filter(col("n_alpha") * 2 >= col("n_chars"))
    val gated = maxSharedE4 match {
      case Some(tau) =>
        // Docs too short to produce an 8-gram are absent from the
        // crossdoc table: no corpus-level evidence → keep (coalesce 0).
        val shared = Dedup.crossdocNgrams(spark, dir)
          .select(col("doc_id"), col("shared_e4"))
        perDocGated.join(shared, Seq("doc_id"), "left")
          .filter(coalesce(col("shared_e4"), lit(0L)) <= tau)
          .drop("shared_e4")
      case None => perDocGated
    }
    val pairs = precomputedPairs.getOrElse(
      Dedup.dupPairs(spark, dir, includeMinhash = false))
    val clusters = Dedup.dupClusters(spark, dir, pairs)
      .select(col("doc_id"), col("cluster_id"))
    // Survivor = min doc_id among the cluster's GATED members; the
    // shuffle carries only (id, id, counters) — no text.
    import org.apache.spark.sql.expressions.Window
    val lexical = gated
      .join(clusters, Seq("doc_id"))
      .withColumn("survivor",
        min(col("doc_id")).over(Window.partitionBy(col("cluster_id"))))
      .filter(col("doc_id") === col("survivor"))
      .select(col("doc_id"), col("n_tokens"), col("n_chars"))
    val kept = semanticClusters match {
      case Some(sem) =>
        // One survivor per semantic cluster AMONG lexical survivors —
        // the same gate-then-pick discipline as the lexical stage.
        lexical
          .join(sem.select(col("doc_id"), col("cluster_id").as("sem_cluster")),
            Seq("doc_id"), "left")
          .withColumn("sem_c", coalesce(col("sem_cluster"), col("doc_id")))
          .withColumn("sem_survivor",
            min(col("doc_id")).over(Window.partitionBy(col("sem_c"))))
          .filter(col("doc_id") === col("sem_survivor"))
          .select(col("doc_id"), col("n_tokens"), col("n_chars"))
      case None => lexical
    }
    kept.orderBy(col("doc_id"))
  }

  /** Fixed-width character chunking — the training-sequence prep
    * step. Each document explodes into ⌈len/width⌉ chunks (an empty
    * or short doc yields exactly one). Narrow per-row explode: no
    * shuffle, pipelines with the scan, and chunk rows carry only
    * (id, idx, len, md5) — the chunk text itself never moves unless a
    * downstream stage asks for it. */
  def chunkDocs(spark: SparkSession, dir: String, width: Int = 200): DataFrame = {
    val w = lit(width.toLong)
    val nChunks = greatest(ceil(length(col("text")) / lit(width.toDouble)), lit(1L))
    val chunk = col("text").substr((col("chunk_idx") * w + lit(1L)).cast("int"), w.cast("int"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0L), nChunks - lit(1L))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        length(chunk).cast("long").as("n_chunk_chars"),
        md5(chunk).as("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** Token-budget sequence packing: assign documents to training
    * sequences of ~`budget` whitespace tokens. Sharded running-sum
    * design — a single global running sum over the corpus is a
    * one-partition window (the classic 100 TB bottleneck), so docs
    * are hashed into `shards` independent streams and each shard
    * packs with its own running token count; `seq_id` encodes
    * (shard, position) collision-free as `seq_index * shards + shard`
    * — an interleaved encoding with no per-shard capacity, so a
    * hot shard can exceed any fixed sequence count without aliasing
    * into a neighbor's id space. All windows run in parallel, one
    * shuffle on the shard key. Documents may straddle a budget
    * boundary — the
    * consumer truncates or spills to the next sequence, which is the
    * standard trade against a bin-packing pass that cannot be
    * expressed as a parallel scan. */
  def packSequences(spark: SparkSession, dir: String,
      budget: Int = 2048, shards: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(TF.tokens(col("text"))).cast("long").as("n_tokens"),
        pmod(col("doc_id"), lit(shards.toLong)).as("shard"))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("n_tokens"),
        (floor((col("cum") - col("n_tokens")) / lit(budget.toDouble)).cast("long")
          * lit(shards.toLong) + col("shard"))
          .as("seq_id"))
      .orderBy(col("doc_id"))
  }

  /** Curation funnel in ONE scan: how many documents survive each
    * successive gate (language metadata, token floor, alpha ratio,
    * exact dedup) — computed as conditional aggregates over a single
    * pass instead of one filtered scan per stage, which is the only
    * affordable way to report a funnel over 100 TB. The dedup stage
    * counts distinct hashes among full-gate survivors. */
  def curationFunnel(spark: SparkSession, dir: String,
      minTokens: Int = 10): DataFrame = {
    val t = col("text")
    val langOk = col("lang") === "en"
    val tokOk = langOk && col("n_tokens") >= minTokens
    val alphaOk = tokOk && col("n_alpha") * 2 >= col("n_chars")
    Tables.documents(spark, dir)
      .select(col("lang"),
        size(TF.tokens(t)).cast("long").as("n_tokens"),
        length(t).cast("long").as("n_chars"),
        length(regexp_replace(t, "[^A-Za-z]", "")).cast("long").as("n_alpha"),
        md5(t).as("h"))
      .agg(count(lit(1)).as("n_raw"),
        sum(when(langOk, 1L).otherwise(0L)).as("n_lang"),
        sum(when(tokOk, 1L).otherwise(0L)).as("n_tokens_gate"),
        sum(when(alphaOk, 1L).otherwise(0L)).as("n_alpha_gate"),
        countDistinct(when(alphaOk, col("h"))).as("n_distinct_clean"))
  }

  /** Deterministic per-stratum cap: at most `n` documents per source,
    * chosen by smallest md5(doc_id·salt) — an order-independent
    * uniform sample. Runs on the native [[graft.functions.BottomKByKey]]
    * aggregate, whose map-side combine sends at most `n` rows per
    * group per partition to the shuffle; the equivalent row_number
    * window would shuffle and sort EVERY row, the per-group-sampling
    * bottleneck at 100 TB. */
  def domainCap(spark: SparkSession, dir: String, n: Int = 5): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"),
        md5(concat(col("doc_id").cast("string"), lit(":graft"))).as("sk"),
        col("doc_id"))
      .groupBy(col("source"))
      .agg(graft.functions.BottomK.bottom_k_by_key(col("sk"), col("doc_id"), n)
        .as("ids"))
      .select(col("source"), explode(col("ids")).as("doc_id"))
      .orderBy(col("source"), col("doc_id"))

  /** Training-mix dashboard: document/token/char totals per
    * (source, lang) stratum — the numbers a curation run reports
    * before and after gating. One map-side-combined aggregation;
    * token counting stays in the scan projection. */
  def sourceMix(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TF.tokens(col("text"))).cast("long")).as("n_tokens"),
        sum(length(col("text")).cast("long")).as("n_chars"))
      .orderBy(col("source"), col("lang"))

  /** Benchmark decontamination: count, per corpus document, the
    * distinct word `n`-grams it shares with a benchmark set (here the
    * deterministic stand-in doc_id % 20 == 0 — in production the
    * eval suites). The join key is md5(ngram), so the shuffle carries
    * fixed-width hashes instead of raw n-gram text; the benchmark
    * side is distinct-ed and small (eval suites are KBs against a
    * 100 TB corpus), so Catalyst broadcasts it and the corpus never
    * shuffles. Documents with zero overlap drop out (the common case
    * — the output is the contamination report, not the corpus). */
  def decontaminate(spark: SparkSession, dir: String, n: Int = 8): DataFrame = {
    // Both sides project from the memoized corpus-wide n-gram table
    // (one scan shared with crossdocNgrams/containment); the bench
    // set's per-doc-distinct rows collapse to a distinct hash set.
    val grams = Dedup.ngramHashes(spark, dir, n)
    val bench = grams.filter(pmod(col("doc_id"), lit(20L)) === 0)
      .select(col("h")).distinct()
    val corpus = grams.filter(pmod(col("doc_id"), lit(20L)) =!= 0)
    corpus.join(bench, Seq("h"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
      .orderBy(col("doc_id"))
  }

  /** Cross-document LINE-level boilerplate removal (the CCNet /
    * RefinedWeb line-dedup pass): lines appearing in ≥ `minDocs`
    * distinct documents — navigation chrome, cookie banners, footer
    * legalese — are struck from every document, and the cleaned text
    * is re-assembled in original line order. The complement of
    * document-level dedup: no document pair need be similar for the
    * corpus to be full of repeated lines.
    *
    * Shape at scale: the corpus is exploded to (doc_id, pos, line)
    * ONCE (localCheckpoint — the df pass and the reconstruction both
    * read it); the line-frequency table keys on md5(line) so only
    * 16-byte hashes shuffle for the df aggregation, and the verdict
    * joins back by hash. Line TEXT crosses exactly one exchange — the
    * per-doc reconstruction groupBy, which any re-assembly must pay.
    * Blank lines are never boilerplate (kept verbatim); the cleaned
    * text is emitted as md5 so the row stays narrow.
    *
    * Output: (doc_id, n_lines, n_removed, clean_md5). Takes any
    * (doc_id, text) table — the driver query feeds it synthetic
    * multi-line pages (source header + body + lang footer built from
    * the documents table, both engine sides identically), because the
    * raw test corpus is single-line token bags where line repetition
    * cannot occur; the planted spec covers mixed keep/drop layouts. */
  def lineDedupOf(docs: DataFrame, minDocs: Int = 3): DataFrame = {
    val lines = docs
      .select(col("doc_id"), posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
      .localCheckpoint(true)
    val bp = lines
      .filter(length(trim(col("line"))) > 0)
      .groupBy(md5(col("line")).as("h"))
      .agg(countDistinct(col("doc_id")).as("doc_freq"))
      .filter(col("doc_freq") >= minDocs)
      .select(col("h"))
    lines
      .join(bp, md5(col("line")) === col("h"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("h").isNotNull, 1L).otherwise(0L)).as("n_removed"),
        // collect_list drops the nulls `when` leaves on removed
        // lines; array_sort orders by the struct's leading pos field,
        // so the surviving lines re-assemble in document order.
        md5(concat_ws("\n",
          transform(
            array_sort(collect_list(
              when(col("h").isNull, struct(col("pos"), col("line"))))),
            x => x.getField("line")))).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  /** Cross-document EXACT-SUBSTRING span removal — the strongest
    * lexical dedup signal (Lee et al. 2022, "Deduplicating Training
    * Data"): any run of ≥ `minTokens` consecutive tokens shared
    * verbatim by ≥ 2 distinct documents is struck from every
    * document carrying it. The distributed equivalent of the paper's
    * suffix array: a duplicated span of length s ≥ L is exactly a
    * chain of s − L + 1 consecutive duplicated L-shingles, so
    * (1) every position's L-shingle hashes once (md5 — span TEXT
    * never shuffles, 16-byte keys do), (2) shingles in ≥ 2 docs mark
    * their positions, (3) per doc, overlapping/adjacent marked
    * intervals [p, p+L−1] merge into maximal spans via one
    * running-max window, and (4) the kept tokens re-assemble from
    * the complement ranges. Token arrays stay inside their document
    * row end to end (the explode and the slice both run in the
    * scan's stage); the only wide exchanges are the hash df
    * aggregation and the per-doc window/groupBy any span assembly
    * must pay.
    *
    * Output: (doc_id, n_tokens, n_spans, n_removed, clean_md5) with
    * clean_md5 = md5 of the kept tokens joined by ' ' (md5("") for a
    * fully-covered doc). Takes any (doc_id, text) table; the driver
    * query plants shared spans in-query (the raw corpus is random
    * token bags, where verbatim 25-token cross-doc runs cannot
    * occur), and the planted spec covers overlap/adjacency/edge
    * layouts. */
  def spanDedupOf(docs: DataFrame, minTokens: Int = 25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val L = minTokens
    val sep = "\u0001"
    val toks = docs
      .select(col("doc_id"), split(trim(col("text")), "\\s+").as("ts"))
      .localCheckpoint(true)
    // one (doc_id, pos, h) row per shingle position; the sequence is
    // guarded (sequence(0, n) DESCENDS for n < 0 — the documented
    // Spark quirk), and the slice/md5 run before any exchange.
    val sh = toks
      .filter(size(col("ts")) >= L)
      .select(col("doc_id"), col("ts"),
        explode(sequence(lit(0), size(col("ts")) - L)).as("p"))
      .select(col("doc_id"), col("p"),
        md5(concat_ws(sep, slice(col("ts"), col("p") + 1, lit(L)))).as("h"))
      .localCheckpoint(true)
    val dup = sh.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2)
      .select(col("h"))
    val marked = sh.join(dup, Seq("h"), "left_semi")
      .select(col("doc_id"), col("p"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("p"))
    val islands = marked
      .withColumn("prev_end",
        max(col("p") + (L - 1)).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("nw",
        when(col("prev_end").isNull || col("p") > col("prev_end") + 1, 1L)
          .otherwise(0L))
      .withColumn("iid", sum(col("nw")).over(w))
      .groupBy(col("doc_id"), col("iid"))
      .agg(min(col("p")).as("s"), (max(col("p")) + (L - 1)).as("e"))
    val cov = islands.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + 1).as("n_removed"),
        array_sort(collect_list(struct(col("s"), col("e")))).as("iv"))
    // complement ranges: starts = [0] ++ (e+1), ends = (s−1) ++ [n−1];
    // per-doc O(spans) interpreted HOF work over bounded arrays.
    toks.join(cov, Seq("doc_id"), "left")
      .select(col("doc_id"),
        size(col("ts")).cast("long").as("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        md5(concat_ws(" ", flatten(zip_with(
          concat(array(lit(0)),
            transform(coalesce(col("iv"),
              array().cast("array<struct<s:int,e:int>>")),
              x => x.getField("e") + 1)),
          concat(transform(coalesce(col("iv"),
              array().cast("array<struct<s:int,e:int>>")),
              x => x.getField("s") - 1),
            array(size(col("ts")) - 1)),
          (a, b) => when(b >= a, slice(col("ts"), a + 1, b - a + 1))
            .otherwise(array().cast("array<string>")))))).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  /** Temperature-flattened source mix (α = 0.5): the multinomial
    * re-weighting used to even out source sizes when drawing a
    * training mix — small sources keep more of their docs, huge ones
    * are capped. Per-source weight w_s = √n_s; source s's quota of a
    * budget of ⌊N/2⌋ docs is ⌊budget·w_s/Σw⌋, and each source keeps
    * its quota lowest-content-hash-first, so the selected set is
    * layout-stable and unique. Every cross-engine step is integer:
    * √n is IEEE-exact, w is e6-rounded ONCE, and the quota is an
    * exact integral `div` over a DECIMAL(38,0) product (long·long
    * overflows ANSI math at snowflake-id scale; decimal TRUE division
    * would round half-up at scale 6 before the floor — off by one on
    * x.9999995 fractions — so the integral-divide operator, which
    * truncates exactly, is the only cross-engine-safe form; the
    * DuckDB oracle mirrors it with HUGEINT `//`). The per-source
    * counts are a tiny aggregate (one row per source) that broadcasts
    * back — the corpus parquet is read by two column-pruned scans
    * (the weights pass reads only `source`) plus the one row_number
    * shuffle keyed by source. */
  def temperatureSample(spark: SparkSession, dir: String,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        substring(md5(concat(col("doc_id").cast("string"), lit(s":$seed"))),
          1, 16).as("hk"))
    val weights = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n"))
      .withColumn("w_e6", round(sqrt(col("n")) * 1e6).cast("long"))
    val totals = weights.agg(
      sum(col("w_e6")).as("tot_w"),
      expr("sum(n) div 2").as("budget"))
    val quotas = weights.crossJoin(broadcast(totals))
      .withColumn("quota",
        least(col("n"),
          expr("(CAST(w_e6 AS DECIMAL(38,0)) * budget) div tot_w")))
      .select(col("source"), col("quota"))
    val ranked = docs.withColumn("rk",
      row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("hk"), col("doc_id"))))
    ranked.join(broadcast(quotas), Seq("source"))
      .filter(col("rk") <= col("quota"))
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  /** Multi-epoch repetition schedule — [[temperatureSample]]'s
    * UPSAMPLING sibling (the Llama-style "epochs per dataset" mix):
    * over `epochs` passes of the total token budget, source s repeats
    * at rate r_s = epochs · (w_s / Σw) · (N / n_s) copies per doc
    * (sqrt-temperature weights w_s — rare sources repeat MORE, the
    * corpus-level budget Σ n_s·r_s = epochs·N is preserved exactly by
    * construction). Fractional rates resolve per document with a
    * layout-stable hash Bernoulli: copies = ⌊r_s⌋ + [h16·den <
    * (num mod den)·65536] — all-integer compares, no float
    * thresholds, so the schedule is bit-identical across engines and
    * partitionings. Magnitudes stay in BIGINT through ~1e8 docs per
    * source; past that lift the products to DECIMAL(38,0), same tree.
    * Shape: one count aggregation, one broadcast rate join, one
    * narrow projection — no shuffle of document text ever. */
  def epochSchedule(spark: SparkSession, dir: String, epochs: Int = 4,
      seed: Long = 42L): DataFrame =
    epochScheduleOf(Tables.documents(spark, dir), epochs, seed)

  /** [[epochSchedule]] over any (doc_id, source) table. */
  def epochScheduleOf(table: DataFrame, epochs: Int = 4,
      seed: Long = 42L): DataFrame = {
    val docs = table
      .select(col("doc_id"), col("source"),
        conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(s":epoch:$seed"))), 1, 4), 16, 10).cast("long").as("h16"))
    val weights = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n"))
      .withColumn("w_e6", round(sqrt(col("n")) * 1e6).cast("long"))
    val totals = weights.agg(sum(col("w_e6")).as("tot_w"), sum(col("n")).as("nn"))
    val rates = weights.crossJoin(broadcast(totals))
      .select(col("source"),
        (col("w_e6") * col("nn") * lit(epochs.toLong)).as("num"),
        (col("tot_w") * col("n")).as("den"))
    docs.join(broadcast(rates), Seq("source"))
      .select(col("doc_id"), col("source"),
        (expr("num div den") +
          when(col("h16") * col("den") < expr("num % den") * lit(65536L), 1L)
            .otherwise(0L)).as("n_copies"))
      .orderBy(col("doc_id"))
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every raw
    * document by how target-like its hashed n-gram profile is —
    * log w(x) = Σ_grams [ln p̂_target(bucket) − ln p̂_raw(bucket)] —
    * and keep the highest-weight half per source, the data-selection
    * pass run before a pretraining mix is cut. Here the target
    * distribution is the `targetLang` slice of the corpus itself
    * (in production: a Wikipedia/books reference corpus — same plan,
    * different scan).
    *
    * Features are hashed unigrams + bigrams (the paper's bag of
    * hashed n-grams): bucket = first-8-md5-hex mod `buckets`, a
    * layout-stable content hash both engines state identically.
    * Distributions are add-one smoothed over the bucket space; each
    * ln is e4-rounded BEFORE the subtraction and the per-document
    * integer sum, so the score is immune to float accumulation order
    * (the t_bigram_lm contract). Selection ranks within SOURCE
    * (score desc, doc_id) and keeps the top half — stratified DSIR:
    * the mix's source balance survives selection, and the rank
    * window shards by source instead of funnelling the corpus
    * through one global sort.
    *
    * Shape: ONE corpus explode feeds both distributions and the
    * scoring join (checkpointed occurrence table); bucket stats are
    * a ≤`buckets`-row aggregate broadcast back; the per-doc score is
    * one map-side-combinable sum keyed by doc_id. Only (doc_id,
    * bucket) int pairs ever shuffle — text stays in its scan. */
  def dsirWeights(spark: SparkSession, dir: String, buckets: Int = 256,
      targetLang: String = "en"): DataFrame =
    dsirWeightsOf(Tables.documents(spark, dir), buckets, targetLang)

  /** [[dsirWeights]] over any (doc_id, lang, source, text) table. */
  def dsirWeightsOf(docs: DataFrame, buckets: Int = 256,
      targetLang: String = "en"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = docs.select(col("doc_id"), col("lang"), col("source"), col("text"))
    val uni = base.select(col("doc_id"), col("lang"), col("source"),
      explode(TF.tokens(col("text"))).as("gram"))
    // wordShingles' short-doc fallback (whole text, no space) is not a
    // bigram — the space filter drops it, mirrored by the oracle's
    // i+1 <= len(t) bound.
    val bi = base.select(col("doc_id"), col("lang"), col("source"),
      explode(TF.wordShingles(col("text"), 2)).as("gram"))
      .filter(col("gram").contains(" "))
    val occ = uni.unionAll(bi)
      .select(col("doc_id"), col("lang"), col("source"),
        pmod(conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long"),
          lit(buckets.toLong)).as("b"))
      .localCheckpoint(true)
    val raw = occ.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tgt = occ.filter(col("lang") === targetLang)
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val stats = raw.join(tgt, Seq("b"), "left")
      .select(col("b"), col("cr"), coalesce(col("ct"), lit(0L)).as("ct"))
    val totals = stats.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    val delta = stats.crossJoin(broadcast(totals))
      .select(col("b"),
        (round(log((col("ct") + lit(1L)).cast("double")
            / (col("nt") + lit(buckets.toLong))) * 1e4).cast("long")
          - round(log((col("cr") + lit(1L)).cast("double")
            / (col("nr") + lit(buckets.toLong))) * 1e4).cast("long"))
          .as("delta_e4"))
    val scored = occ.join(broadcast(delta), Seq("b"))
      .groupBy(col("doc_id"), col("lang"), col("source"))
      .agg(count(lit(1)).as("n_grams"), sum(col("delta_e4")).as("score_e4"))
    val perSource = scored.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    scored
      .withColumn("rk", row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("score_e4").desc, col("doc_id"))))
      .join(broadcast(perSource), Seq("source"))
      .select(col("doc_id"), col("lang"), col("source"), col("n_grams"),
        col("score_e4"), (col("rk") <= expr("n_src div 2")).as("selected"))
      .orderBy(col("doc_id"))
  }

  /** Keep-threshold for a sampling fraction as an 8-hex-digit string:
    * a row survives iff the first 8 md5 hex chars of its key sort
    * below it. "g" > every hex digit = keep all; "0" = keep none. */
  private[operators] def fractionThreshold(f: Double): String =
    if (f >= 1.0) "g"
    else if (f <= 0.0) "0"
    else f"${math.floor(f * 4294967296.0).toLong}%08x"

  /** Deterministic stratified sample over a keyed column — the
    * training-mix control knob (e.g. rebalance languages). The keep
    * decision is content-hash-based: row survives iff the first 8
    * md5 hex chars of (doc_id:lang:seed) sort below the stratum's
    * fraction threshold. Unlike `sampleBy` (whose rand(seed) streams
    * are seeded PER PARTITION — the sample silently changes whenever
    * the input repartitions, which at 100 TB it always does), a
    * content hash gives the same sample on any cluster layout, makes
    * the query oracle-checkable, and still evaluates at the scan:
    * one pass, no shuffle, composes with pushdown. */
  /** Deterministic train/val/test split — the assignment every
    * training run needs frozen BEFORE any sampling/packing: each doc
    * lands in exactly one split by its content-hash residue (md5 of
    * doc_id + salt, first 8 hex chars as a uniform draw), so the
    * split is layout-stable (repartition/rerun/engine-independent),
    * leak-free by construction (a doc can never be in two splits),
    * and replayable in closed form by the oracle — the
    * [[stratifiedSample]] contract extended from keep/drop to an
    * N-way partition. Thresholds at 96%/2%/2% of the 32-bit hex
    * space. Emitted as per-(source, split) counts — the sanity
    * dashboard checked before training starts; the per-doc
    * assignment is the same expression un-aggregated. */
  def trainValTestSplit(spark: SparkSession, dir: String,
      seed: Long = 42L): DataFrame = {
    val h = substring(md5(concat(col("doc_id").cast("string"),
      lit(s":split:$seed"))), 1, 8)
    val split = when(h < lit("f5c28f5c"), "train")
      .when(h < lit("fae147ae"), "val")
      .otherwise("test")
    Tables.documents(spark, dir)
      .select(col("source"), split.as("split"))
      .groupBy(col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("source"), col("split"))
  }

  def stratifiedSample(spark: SparkSession, dir: String,
      fractions: Map[String, Double] = Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.1),
      seed: Long = 42L): DataFrame = {
    // when-chain over the stratum map; absent strata → "0" (keep none)
    val thr = fractions.foldLeft(lit("0")) { case (acc, (k, f)) =>
      when(col("lang") === k, lit(fractionThreshold(f))).otherwise(acc)
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"))
      .filter(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
        col("lang"), lit(s":$seed"))), 1, 8) < thr)
      .orderBy(col("doc_id"))
  }

  /** Corpus composition report — the per-(source, lang) health
    * dashboard a curation run starts and ends with: document counts,
    * share of the corpus (e6), and exact-integer mean lengths
    * (chars, whitespace tokens, e2-scaled floor means — no float
    * averages, the bit-stable-compare rule). One scan, one bounded
    * (|sources|·|langs|) aggregation with a broadcast total. */
  def corpusReport(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("source"), col("lang"),
        length(col("text")).cast("long").as("chars"),
        size(graft.functions.TextFunctions.tokens(col("text")))
          .cast("long").as("toks"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("chars")).as("sum_chars"),
        sum(col("toks")).as("sum_tokens"))
    val tot = d.agg(sum(col("n_docs")).as("total"))
    d.crossJoin(broadcast(tot))
      .select(col("source"), col("lang"), col("n_docs"),
        expr("n_docs * 1000000 div total").as("share_e6"),
        expr("sum_chars * 100 div n_docs").as("mean_chars_e2"),
        expr("sum_tokens * 100 div n_docs").as("mean_tokens_e2"))
      .orderBy(col("source"), col("lang"))
  }
  /** Deterministic global training shuffle — the "shuffle the corpus
    * per epoch" step of a data loader, done as a total order instead
    * of an RNG: sort key = md5(doc_id ++ epoch tag). Cryptographic
    * diffusion makes the order indistinguishable from random while
    * staying REPLAYABLE (same epoch tag → same order on any cluster,
    * any partitioning — restartable mid-epoch) and cheap to change
    * (next epoch = next tag, no state). The global rank rides
    * [[Selection.withGlobalRank]]'s range-partitioned form — a 100 TB
    * corpus shuffles with two narrow shuffles and no single-reducer
    * sort. Readout: every 100th position of the shuffled order, a
    * direct probe of the order itself. */
  def pShuffle(spark: SparkSession, dir: String,
      epochTag: String = "epoch0"): DataFrame = {
    val keyed = Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit(":" + epochTag)))
          .as("skey"))
    Selection.withGlobalRank(keyed,
      Seq(col("skey"), col("doc_id")), "rank")
      .filter(pmod(col("rank") - 1, lit(100L)) === 0)
      .select(col("rank"), col("doc_id"), col("skey"))
      .orderBy(col("rank"))
  }

  /** Greedy token-budget selection — "fill a 25%-of-corpus token
    * budget with the most lexically diverse documents": global
    * (diversity DESC, doc_id) order + running token sum via
    * [[Selection.withGlobalRank]] (range-partitioned rank+cumsum,
    * PlanAuditSpec-pinned — never a single-reducer window), keep the
    * prefix whose cumulative tokens fit. The data-mixing primitive
    * behind "best N tokens under the compute budget". */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(TF.tokens(col("text"))).cast("long").as("n_tokens"),
        size(array_distinct(TF.tokens(col("text")))).cast("long")
          .as("n_distinct"))
      .select(col("doc_id"), col("n_tokens"),
        expr("n_distinct * 10000 div n_tokens").as("div_e4"))
    val ranked = Selection.withGlobalRank(d,
      Seq(col("div_e4").desc, col("doc_id")), "rk",
      cumSumOf = Some("n_tokens"), cumName = "cum")
    val tot = d.agg(expr("sum(n_tokens) div 4").as("budget"))
    ranked.crossJoin(broadcast(tot))
      .filter(col("cum") <= col("budget"))
      .select(col("doc_id"), col("n_tokens"), col("rk"), col("cum"))
      .orderBy(col("rk"))
  }

  /** Quality-threshold yield curve — "what do we keep at each bar":
    * docs and tokens surviving diversity ≥ t for t = 0..9000 e4, with
    * exact e6 shares. The corpus reduces to the ≤10001-value
    * (div_e4 → docs, tokens) table FIRST; the curve is a bounded
    * grid join over it — the sweep never rescans the corpus per
    * threshold. */
  def qualitySweep(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(size(TF.tokens(col("text"))).cast("long").as("n_tokens"),
        size(array_distinct(TF.tokens(col("text")))).cast("long")
          .as("n_distinct"))
      .select(col("n_tokens"),
        expr("n_distinct * 10000 div n_tokens").as("div_e4"))
      .groupBy(col("div_e4"))
      .agg(count(lit(1)).as("nd"), sum(col("n_tokens")).as("nt"))
      .localCheckpoint(true)
    val tot = d.agg(sum(col("nd")).as("tot_docs"), sum(col("nt")).as("tot_tokens"))
    spark.range(0, 10).select((col("id") * 1000).as("thr_e4"))
      .join(broadcast(d), col("div_e4") >= col("thr_e4"), "left")
      .groupBy(col("thr_e4"))
      .agg(coalesce(sum(col("nd")), lit(0L)).as("n_docs"),
        coalesce(sum(col("nt")), lit(0L)).as("n_tokens"))
      .crossJoin(broadcast(tot))
      .select(col("thr_e4"), col("n_docs"), col("n_tokens"),
        expr("n_docs * 1000000 div tot_docs").as("doc_share_e6"),
        expr("n_tokens * 1000000 div tot_tokens").as("token_share_e6"))
      .orderBy(col("thr_e4"))
  }

  /** Language-mix report + capped sampling plan: per language, doc
    * and token counts, exact e6 shares, and the 2×-fair-share quota
    * a balanced mix would cap it to ([[domainCap]]'s policy applied
    * to languages). Two map-side-combinable aggregations over the
    * bounded language table. */
  def langMix(spark: SparkSession, dir: String): DataFrame = {
    val toks = TF.tokens(col("text"))
    val byLang = Tables.documents(spark, dir)
      .select(col("lang"), size(toks).cast("long").as("n_tokens"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
    val tot = byLang.agg(sum(col("n_docs")).as("tot_docs"),
      sum(col("n_tokens")).as("tot_tokens"),
      count(lit(1)).as("n_langs"))
    byLang.crossJoin(broadcast(tot))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        expr("n_docs * 1000000 div tot_docs").as("doc_share_e6"),
        expr("n_tokens * 1000000 div tot_tokens").as("token_share_e6"),
        expr("least(n_docs, tot_docs * 2 div n_langs)").as("capped_docs"))
      .orderBy(col("lang"))
  }

  /** Deterministic round-robin source interleave — the "don't feed
    * the model a source block" training-order primitive: sources get
    * a stable index (alphabetical), documents get a within-source
    * hash order (the [[temperatureSample]] key), and global position
    * pos = (rk−1)·n_src + sidx−1 interleaves them 1:1:…:1 (exhausted
    * sources leave gaps — positions stay a strict total order, which
    * is all a loader consumes). Per-source windows only; the readout
    * is the first 500 positions. */
  def interleave(spark: SparkSession, dir: String, limit: Int = 500): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        substring(md5(concat(col("doc_id").cast("string"), lit(":42"))),
          1, 16).as("hk"))
    val srcIdx = docs.select(col("source")).distinct()
      .withColumn("sidx", row_number().over(Window.orderBy(col("source")))
        .cast("long"))
    val nSrc = srcIdx.agg(count(lit(1)).as("n_src"))
    val rk = docs.withColumn("rk",
      row_number().over(Window.partitionBy(col("source"))
        .orderBy(col("hk"), col("doc_id"))).cast("long"))
    rk.join(broadcast(srcIdx), Seq("source"))
      .crossJoin(broadcast(nSrc))
      .select(((col("rk") - 1) * col("n_src") + col("sidx") - 1).as("pos"),
        col("doc_id"), col("source"))
      .orderBy(col("pos"))
      .limit(limit)
  }

  /** Curriculum-learning phase manifest (Bengio et al. 2009) — the
    * training ORDER complement of the mixing/packing ops: documents
    * ranked easiest-first by a difficulty proxy (length; any scored
    * column slots in) under the unique (n_chars, doc_id) total
    * order, split into `phases` contiguous NTILE phases, reported
    * as the per-(phase, source) manifest a loader consumes (counts,
    * char budget, boundary lengths). The global rank rides
    * [[Selection.withGlobalRank]]'s range-partitioned pass and the
    * phase is [[Selection.ntileOfRank]]'s closed form — no
    * single-reducer window (PlanAuditSpec family); the total count
    * is a 1-row driver read. */
  def curriculum(spark: SparkSession, dir: String,
      phases: Int = 3): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val total = docs.count()
    Selection.withGlobalRank(docs,
        Seq(col("n_chars"), col("doc_id")), "rk")
      .withColumn("nn", lit(total))
      .withColumn("phase", Selection.ntileOfRank("rk", "nn", phases))
      .groupBy(col("phase"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
        min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
      .orderBy(col("phase"), col("source"))
  }

  /** Cross-source contamination matrix (round 13) — which corpus
    * sources share verbatim content: for every source pair, the
    * count of distinct 8-gram hashes present in BOTH (the same
    * md5(shingle) keys `d_crossdoc_ngram`/`p_decontaminate` block
    * on, riding the memoized [[Dedup.ngramHashes]] table) and the
    * containment ratio against the SMALLER source's n-gram
    * vocabulary — the leakage direction a curation pipeline acts on
    * (cap, dedup-priority, or drop). Shape: distinct (source, h) is
    * one h-keyed shuffle; the self-join fans each hash into at most
    * |sources|² pairs (sources are a bounded dimension, never the
    * corpus); totals broadcast. Pairs with zero shared n-grams are
    * absent (the join IS the sparsity). */
  def sourceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val meta = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
    val srcH = Dedup.ngramHashes(spark, dir, 8)
      .join(meta, Seq("doc_id"))
      .select(col("source"), col("h"))
      .distinct()
      .localCheckpoint(true)
    val tot = srcH.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val pairs = srcH.select(col("source").as("src_a"), col("h"))
      .join(srcH.select(col("source").as("src_b"), col("h")), Seq("h"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(broadcast(tot.select(col("source").as("src_a"), col("n").as("n_a"))),
        Seq("src_a"))
      .join(broadcast(tot.select(col("source").as("src_b"), col("n").as("n_b"))),
        Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_shared"),
        expr("n_shared * 10000 div least(n_a, n_b)").as("contain_e4"))
      .orderBy(col("src_a"), col("src_b"))
  }

  /** Soft dedup by downweighting (round 16) — the keep-everything
    * alternative to survivor selection: instead of dropping
    * duplicates, every member of an exact-content cluster gets
    * sampling weight 1/|cluster| so the cluster contributes one
    * document's worth of expected training mass (the repetition-
    * aware reweighting practice; cf. the "repeat or reweight"
    * dedup-ablation literature). One md5 collapse + one count join —
    * the d_exact_dedup shuffle shape with a weight readout instead
    * of a verdict; weight_e6 is one truncating div both sides. */
  def dedupWeightsOf(docs: DataFrame): DataFrame = {
    val h = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val c = h.groupBy(col("h"))
      .agg(min(col("doc_id")).as("cluster_id"), count(lit(1)).as("csize"))
    h.join(c, Seq("h"))
      .select(col("doc_id"), col("cluster_id"), col("csize"),
        expr("1000000 div csize").as("weight_e6"))
      .orderBy(col("doc_id"))
  }
}
