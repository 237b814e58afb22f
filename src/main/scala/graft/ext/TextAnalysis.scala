package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Num

/** Text-analysis operators for a large-scale training-data pipeline
  * (extension tier beyond the reference — see SURVEY.md §2.7/§7.3-5):
  * token counting, quality stats, document fingerprinting, language ID.
  *
  * Everything is built from codegen'd `functions._`/higher-order functions —
  * no UDFs — so the whole pass stays inside WholeStageCodegen and scales
  * linearly with executors: one projection over the corpus, no shuffle at
  * all unless the caller aggregates.
  */
object TextAnalysis {

  /** Whitespace tokenization of normalized text. */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** BPE-ish subword count approximation: alphanumeric runs and individual
    * punctuation both count as tokens (a common pre-tokenizer shape). */
  def regexTokens(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{N}]+"), x => length(x) > 0)

  /** Per-document quality/statistics columns. Ratios are exact integer
    * counts divided in double space — deterministic across engines. */
  def withTextStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    // counts surface as long: the other engines' length()/len() are 64-bit,
    // and schema parity matters as much as value parity for the oracle gate
    val t = tokens(col(textCol))
    df.withColumn("n_chars_m", length(col(textCol)).cast("long"))
      .withColumn("n_tokens", size(t).cast("long"))
      .withColumn("n_distinct_tokens", size(array_distinct(t)).cast("long"))
      .withColumn("type_token_ratio",
        col("n_distinct_tokens").cast("double") / col("n_tokens"))
      .withColumn("avg_token_len",
        // native char-count sum (== aggregate(t, 0L, (acc, x) => acc +
        // length(x)) — the HOF form dispatched an interpreted lambda per
        // token; see the hot-kernel invariant)
        graft.functions.VectorExpressions.tokenLenSumNative(t).cast("double")
          / col("n_tokens"))
      .withColumn("stopword_ratio",
        size(filter(t, x => x.isin(EnStop: _*))).cast("double") / col("n_tokens"))
  }

  /** Conservative email pattern — identical semantics under Java regex
    * (Spark) and RE2 (DuckDB/the oracle): plain character classes, no
    * backreferences, no lookaround. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** URL pattern: scheme + maximal non-whitespace run. */
  val UrlRe = "https?://[^\\s]+"

  /** PII/URL scrubbing — the redaction pass a training corpus runs before
    * release: URLs replaced with `<URL>`, then email addresses with
    * `<EMAIL>` (URL-first, so an address inside a URL's userinfo/query is
    * consumed by the URL redaction and never double-counted; the email
    * count is taken on the URL-redacted text for the same reason). Adds
    * (n_emails, n_urls, redacted_text). Codegen'd regexp built-ins — no
    * UDF — so the scrub is one projection in WholeStageCodegen, zero
    * shuffles at any corpus scale. Patterns are deliberately engine-
    * portable (see [[EmailRe]]); swap in stricter ones per deployment. */
  def withPiiRedaction(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("n_urls", regexp_count(col(textCol), lit(UrlRe)).cast("long"))
      .withColumn("__nourl", regexp_replace(col(textCol), UrlRe, "<URL>"))
      .withColumn("n_emails", regexp_count(col("__nourl"), lit(EmailRe)).cast("long"))
      .withColumn("redacted_text", regexp_replace(col("__nourl"), EmailRe, "<EMAIL>"))
      .drop("__nourl")

  /** Per-document REPETITION signals — the Gopher-style boilerplate/spam
    * screens that complement [[withTextStats]]' length/stopword screens:
    *  - `n_3grams`: total (non-distinct) trigram count, max(n_tokens−2, 0);
    *  - `dup_3gram_frac`: 1 − distinct/total trigrams — near 1 for
    *    "lorem lorem lorem" spam, near 0 for natural prose;
    *  - `top_token_frac`: share of the single most frequent token
    *    (native per-row hash count, graft.functions.TopTokenCountExpr —
    *    no explode, no shuffle; an explode+groupBy would shuffle the
    *    corpus token stream just to compute a per-row statistic).
    * Distinct trigrams are counted via the 64-bit shingle hashes (same
    * ~2⁻⁶⁴-collision caveat as every sketch operator). Pure projection:
    * one corpus pass, zero shuffles. */
  def withRepetitionStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = tokens(col(textCol))
    df.withColumn("n_tokens", size(t).cast("long"))
      .withColumn("n_3grams", greatest(col("n_tokens") - 2, lit(0L)))
      .withColumn("dup_3gram_frac",
        when(col("n_3grams") > 0, lit(1.0) -
          size(graft.functions.VectorExpressions.shingleHashesNative(t, 3))
            .cast("double") / col("n_3grams"))
          .otherwise(lit(0.0)))
      .withColumn("top_token_frac",
        when(col("n_tokens") > 0,
          graft.functions.VectorExpressions.topTokenCountNative(t).cast("double")
            / col("n_tokens"))
          .otherwise(lit(0.0)))
  }

  /** Adjacent-token bigrams ("a b") from a token array — the n-gram LM /
    * collocation-statistics unit. Pure projection; empty for 0/1-token
    * docs. `sequence` is NOT used unguarded: Spark's sequence(1, 0) yields
    * a DESCENDING [1, 0], not an empty array, so short docs must short-
    * circuit before the index range is built. */
  def bigramsFromTokens(t: Column): Column =
    when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => concat(element_at(t, i), lit(" "), element_at(t, i + 1))))
      .otherwise(array().cast("array<string>"))

  def bigrams(text: Column): Column = bigramsFromTokens(tokens(text))

  /** PMI COLLOCATIONS — the association-strength upgrade to x3's raw
    * bigram counts: raw frequency ranks "of the"-type stopword pairs
    * first, while pointwise mutual information log(N·c(ab)/(c(a)·c(b)))
    * ranks pairs that co-occur far MORE than their parts' popularity
    * predicts — the classic phrase-mining statistic (Church & Hanks
    * 1990) every tokenizer-vocabulary and named-entity seeding pipeline
    * runs. The log is monotone, so the emitted score drops it and ranks
    * by the RATIO itself as truncating scaled-BIGINT fixed point
    * (N·c(ab)·10⁴)/(c(a)·c(b)) — the ewma1 discipline: a float log
    * behind round(·,6) can land cross-engine half-boundaries, an integer
    * quotient cannot. `minCount` floors c(ab) (rare pairs otherwise
    * dominate PMI — the statistic's known pathology).
    *
    * Shape at scale: one tokenize pass behind a fan-out exchange feeds
    * BOTH the unigram and bigram aggregates (identical exchange subplan
    * → ReusedExchange; only the cheap explode differs per branch); the
    * unigram table is vocabulary-sized and joins the thresholded bigram
    * relation twice with no hint (AQE broadcasts while it fits); N rides
    * as a driver literal from one bounded 1-row action. Integer bound:
    * N·c(ab)·10⁴ is ANSI-loud past ~10⁷-token corpora × 10⁶-count
    * bigrams — beyond that, widen the numerator to DECIMAL(38,0) and
    * sign-split the division (documented swap). */
  def pmiCollocations(docs: DataFrame, textCol: String, topK: Int = 20,
                      minCount: Long = 5L, scale: Long = 10000L): DataFrame = {
    val base = graft.core.Par.fanOut(
      docs.select(tokens(col(textCol)).as("toks")))
    val uni = base.select(explode(col("toks")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = uni.agg(sum(col("c"))).head().getLong(0)
    val bg = base
      .select(explode_outer(bigramsFromTokens(col("toks"))).as("bigram"))
      .where(col("bigram").isNotNull)
      .groupBy("bigram").agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minCount)
    val res = bg
      .withColumn("wa", element_at(split(col("bigram"), " "), 1))
      .withColumn("wb", element_at(split(col("bigram"), " "), 2))
      .join(uni.select(col("w").as("wa"), col("c").as("c_a")), "wa")
      .join(uni.select(col("w").as("wb"), col("c").as("c_b")), "wb")
      .select(col("bigram"), col("c_ab"), col("c_a"), col("c_b"),
        call_function("div", lit(n) * col("c_ab") * lit(scale),
          col("c_a") * col("c_b")).as("pmi_fp"))
      .orderBy(col("pmi_fp").desc, col("bigram").asc)
      .limit(topK)
      .localCheckpoint()   // topK rows; frees the unigram cache now
    uni.unpersist()
    res
  }

  /** Overlapping token-window chunking — the max-sequence-length splitter
    * every training pipeline runs on documents longer than the model
    * context (the converse of [[Sampling.packSequences]], which packs
    * SHORT documents): chunk i covers tokens [i·stride+1, i·stride+chunkLen]
    * (1-based), so consecutive chunks overlap by chunkLen − stride tokens
    * and the last chunk is never empty (start ≤ n whenever stride ≤
    * chunkLen). Returns one row per (doc, chunk): (doc_id, chunk_idx,
    * n_chunk_tokens, chunk_text).
    *
    * Scale: chunk count is exact integer arithmetic
    * (1 + ⌈max(0, n−chunkLen)/stride⌉ via (x+stride−1) div stride — float
    * ceil would be engine-divergent at representation boundaries), and the
    * whole operator is one codegen'd projection + explode: no shuffle, no
    * state, output rows ≈ input tokens / stride regardless of corpus size. */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  chunkLen: Int = 32, stride: Int = 24): DataFrame = {
    require(chunkLen > 0 && stride > 0 && stride <= chunkLen)
    val start = (col("chunk_idx") * stride + 1).cast("int")
    df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .withColumn("n_chunks", lit(1L) + call_function("div",
        greatest(size(col("toks")).cast("long") - chunkLen, lit(0L))
          + (stride - 1), lit(stride.toLong)))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        size(slice(col("toks"), start, lit(chunkLen))).cast("long")
          .as("n_chunk_tokens"),
        array_join(slice(col("toks"), start, lit(chunkLen)), " ")
          .as("chunk_text"))
  }

  /** Intra-document repeated-LINE removal — the CCNet/RefinedWeb line-
    * level dedup step: within each document, keep only the FIRST
    * occurrence of every line, preserving line order (navigation chrome,
    * cookie banners and template boilerplate repeat verbatim inside a
    * page; span-level dedup ([[Dedup.substringDuplication]]/ds2) catches
    * cross-document repeats, this catches within-document ones). Returns
    * (doc_id, n_lines, n_kept, kept_text).
    *
    * Spark-first on purpose: `split` + `array_distinct` + `array_join`
    * are all codegen'd builtins, and `array_distinct` is documented
    * first-occurrence-order-preserving — so the whole operator is ONE
    * whole-stage-codegen projection: no custom kernel, no shuffle, no
    * state, scales embarrassingly at any corpus size. `delim` is a
    * LITERAL (regex-quoted before it reaches `split`).
    *
    * The graded projection joins kept lines with `outSep` (default the
    * delimiter) — the oracle contract needs newline-free cells, so the
    * ld1 entry passes " | ". */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
                 delim: String = "\n", outSep: String = " | "): DataFrame = {
    val lines = split(col(textCol), java.util.regex.Pattern.quote(delim), -1)
    df.select(col(idCol).as("doc_id"), lines.as("lines"))
      .select(col("doc_id"), col("lines"),
        array_distinct(col("lines")).as("kept"))
      .select(col("doc_id"),
        size(col("lines")).cast("long").as("n_lines"),
        size(col("kept")).cast("long").as("n_kept"),
        array_join(col("kept"), outSep).as("kept_text"))
  }

  /** Corpus-wide adjacent CHARACTER-pair frequencies — the statistic that
    * seeds byte-pair-encoding tokenizer induction (the first BPE merge is
    * the argmax of exactly this table; Sennrich et al. 2016). Tokenize,
    * emit every token's overlapping 2-character substrings (native kernel,
    * [[graft.functions.CharPairsExpr]] — tokenizer induction touches every
    * character of the corpus, so the per-character work must not be an
    * interpreted lambda), count corpus-wide, keep the top `k`.
    *
    * Scale shape: tokenize + pair expansion in the cheap projection, fan
    * out, explode; the count is one hash-aggregate whose map-side combine
    * collapses each partition to its distinct-pair table (bounded by the
    * character-bigram vocabulary, tiny) before a |pairs|-row shuffle;
    * TakeOrdered keeps k. Iterating BPE merges re-runs this with the
    * previous merge applied — each iteration stays one corpus pass. */
  def bpePairCounts(df: DataFrame, textCol: String, k: Int = 30): DataFrame = {
    val pairs = graft.core.Par.fanOut(df.select(
      graft.functions.VectorExpressions.charPairsNative(tokens(col(textCol)))
        .as("pairs")))
    pairs.select(explode_outer(col("pairs")).as("pair"))
      .where(col("pair").isNotNull) // see termStats' explode_outer note
      .groupBy("pair").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair").asc)
      .limit(k)
  }

  /** FIXED-ROUND BPE MERGE TRAINING (Sennrich et al. 2016) — the iterative
    * loop [[bpePairCounts]] seeds, run for `rounds` merges: each round
    * counts corpus-wide adjacent SYMBOL pairs (frequency-weighted over the
    * distinct-word vocabulary — the classic word-frequency formulation, so
    * per-round work is vocabulary-sized, not corpus-sized), merges the
    * most frequent pair everywhere (ties break lexicographically on the
    * pair — classic BPE's insertion-order tie is not an engine-free
    * contract), and recounts over the merged segmentation. Returns one row
    * per round: (round, sym_a, sym_b, merged, freq).
    *
    * Words ride as SPACE-JOINED SYMBOL STRINGS with flanking spaces
    * (" l o w " → merge(l,o) → " lo w "): the merge is then ONE literal
    * (non-regex) `replace(sym, " a b ", " ab ")` — a pure codegen'd
    * projection both engines implement with the identical left-to-right
    * non-overlapping scan, which is what makes the whole loop
    * oracle-expressible. Deviation from reference BPE, documented:
    * CONSECUTIVE occurrences of the top pair share their boundary space
    * (" a a a a " matches at positions 0 and 6, not 0 and 4), so runs
    * like "aaaa" merge alternately within one round rather than strictly
    * greedily — deterministic, engine-identical, and immaterial off
    * repeated-character runs; a fixpoint inner replace is the drop-in
    * upgrade where reference-greedy parity matters.
    *
    * Scale shape: the word-frequency vocabulary aggregates ONCE from the
    * corpus (the only corpus-sized pass) and persists; each round is one
    * vocabulary-sized pair count (HOF expansion over the symbol array —
    * acceptable off the corpus hot path; map-side combine collapses to
    * the pair vocabulary) + ONE 1-row driver argmax (the km1 bounded-
    * action budget) + a lazy merge projection. Driver state: `rounds`
    * merge rows. */
  def bpeMergeRounds(df: DataFrame, textCol: String,
                     rounds: Int = 3): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    require(rounds >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val vocab0 = wordVocab(df, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val (merges, _) = trainMerges(vocab0, 1, rounds)
      merges.toDF("round", "sym_a", "sym_b", "merged", "freq")
    } finally vocab0.unpersist(blocking = false)
  }

  /** The word-frequency vocabulary in spaced-symbol form — BPE training's
    * ONE corpus-sized pass (every later merge round is vocabulary-sized
    * work over this relation). Shared by [[bpeMergeRounds]] and
    * [[writeBpeVocab]] so in-query and stored-artifact training see the
    * identical segmenter seed. */
  private def wordVocab(df: DataFrame, textCol: String): DataFrame = {
    val sym0 = concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 "))
    graft.core.Par.fanOut(
        df.select(explode(tokens(col(textCol))).as("w")))
      .where(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(sym0.as("sym"), col("freq"))
  }

  /** The merge-training loop body over a (sym, freq) vocabulary state,
    * numbering emitted rounds from `startRound` — shared by in-query
    * training ([[bpeMergeRounds]], startRound = 1), artifact build
    * ([[writeBpeVocab]]) and stored-state EXTENSION ([[extendBpeVocab]],
    * startRound = stored + 1). Each round: one vocabulary-sized pair
    * count, ONE 1-row driver argmax (the km1 bounded-action budget), a
    * lazy merge projection. Returns the merge rows AND the final vocab
    * plan (input state + the new merges applied) so callers can persist
    * the training STATE, which is what makes extension a vocabulary-sized
    * continuation instead of a corpus re-scan. Round numbering is
    * bookkeeping only — the trained merges depend on nothing but the
    * vocab state, so extend-after-store ≡ continuous training (bpe5 pins
    * this end-to-end). */
  private def trainMerges(vocabStart: DataFrame, startRound: Int,
                          rounds: Int)
      : (Seq[(Int, String, String, String, Long)], DataFrame) = {
    var vocab = vocabStart
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    for (r <- startRound until startRound + rounds) {
      val arr = split(trim(col("sym")), " ")
      val idx = when(size(arr) >= 2, sequence(lit(0), size(arr) - 2))
        .otherwise(array().cast("array<int>"))
      val top = vocab.select(col("freq"), explode(transform(idx, i =>
          struct(element_at(arr, i + 1).as("a"),
            element_at(arr, i + 2).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("f"))
        .orderBy(col("f").desc, col("a").asc, col("b").asc)
        .limit(1).head()
      val (a, b, f) = (top.getString(0), top.getString(1), top.getLong(2))
      out += ((r, a, b, a + b, f))
      vocab = vocab.select(
        call_function("replace", col("sym"),
          lit(s" $a $b "), lit(s" $a$b ")).as("sym"),
        col("freq"))
    }
    (out.toSeq, vocab)
  }

  /** BUILD the stored tokenizer artifact — the bf2/sim6/ret3/pq2 lifecycle
    * closure for the BPE tier (at 100 TB the corpus-sized vocabulary pass
    * is the expensive step and must be build-once; every apply job and
    * every vocabulary extension then reads the artifact, never the
    * corpus). Layout under `dir`: `merges/` — the ordered apply-time
    * contract (round, sym_a, sym_b, merged, freq); `vocab/` — the
    * post-merge (sym, freq) training STATE [[extendBpeVocab]] continues
    * from; `meta/` — rounds trained. Committed all-or-nothing via
    * [[graft.core.Artifacts.stageCommit]] (a crash mid-build leaves only
    * an invisible `__tmp`; no reader ever sees merges without their vocab
    * state). */
  def writeBpeVocab(df: DataFrame, textCol: String, dir: String,
                    rounds: Int = 3): Unit = {
    import org.apache.spark.storage.StorageLevel
    require(rounds >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val vocab0 = wordVocab(df, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val (merges, vocabFinal) = trainMerges(vocab0, 1, rounds)
      graft.core.Artifacts.stageCommit(spark, dir) { tmp =>
        merges.toDF("round", "sym_a", "sym_b", "merged", "freq")
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/merges")
        vocabFinal.write.mode("overwrite").parquet(s"$tmp/vocab")
        Seq(rounds).toDF("rounds")
          .coalesce(1).write.mode("overwrite").parquet(s"$tmp/meta")
      }
    } finally vocab0.unpersist(blocking = false)
  }

  /** EXTEND a stored vocabulary by `extraRounds` further merges WITHOUT
    * re-scanning the corpus — the incremental-maintenance leg (sim7/ret4/
    * pq3's counterpart): training state is the stored (sym, freq)
    * relation, so each extra round is vocabulary-sized work, and because
    * a merge round depends on nothing but that state, the extended
    * artifact is byte-identical to training all rounds in one run (bpe5's
    * oracle is continuous training's verbatim). The new copy commits via
    * [[graft.core.Artifacts.swapInto]] — merges, vocab state and meta
    * swap as ONE unit; training reads the live copy (bounded driver
    * argmax per round) and the staged write still reads it lazily BEFORE
    * the swap moves it aside, so no crash window mixes old merges with
    * new state. */
  def extendBpeVocab(spark: org.apache.spark.sql.SparkSession, dir: String,
                     extraRounds: Int = 1): Unit = {
    import spark.implicits._
    require(extraRounds >= 1)
    graft.core.Artifacts.heal(spark, dir)
    val stored = spark.read.parquet(s"$dir/meta").head().getInt(0)
    val oldMerges = spark.read.parquet(s"$dir/merges").orderBy("round")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    val (newMerges, vocabFinal) =
      trainMerges(spark.read.parquet(s"$dir/vocab"), stored + 1, extraRounds)
    graft.core.Artifacts.swapInto(spark, dir) { tmp =>
      (oldMerges ++ newMerges)
        .toDF("round", "sym_a", "sym_b", "merged", "freq")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/merges")
      vocabFinal.write.mode("overwrite").parquet(s"$tmp/vocab")
      Seq(stored + extraRounds).toDF("rounds")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/meta")
    }
  }

  /** [[bpeSegmentCounts]] answered from the STORED artifact — the
    * steady-state tokenize job: the ordered merge list loads as bounded
    * driver state (`rounds` rows), the corpus segments under it with the
    * training segmenter verbatim. Heals a mid-swap crash on entry (the
    * shared read-side contract). */
  def bpeSegmentCountsFromVocab(spark: org.apache.spark.sql.SparkSession,
                                dir: String, df: DataFrame,
                                idCol: String, textCol: String): DataFrame = {
    graft.core.Artifacts.heal(spark, dir)
    val merges = spark.read.parquet(s"$dir/merges").orderBy("round")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    bpeSegmentCounts(df, idCol, textCol, merges)
  }

  /** [[bpeSegmentCountsFromVocab]] AS OF merge round `asOf` — TIME
    * TRAVEL for the tokenizer tier, structurally free: the merge list
    * is ROUND-ORDERED and append-only under [[extendBpeVocab]] (each
    * extension adds rounds after the stored ones; a merge round
    * depends on nothing but the prior state, so the prefix IS the
    * historical tokenizer bit-for-bit), hence version v = the first v
    * merge rows and "tokenize exactly as last week's tokenizer did"
    * needs no per-version storage at all — the retrain-reproducibility
    * verb every tokenizer-versioned training pipeline needs (token
    * budgets and packing lengths are priced in tokenizer units; an
    * audit of last week's run must replay last week's vocabulary). A
    * pin beyond the stored rounds fails loudly; a full
    * [[writeBpeVocab]] rebuild swaps the root and resets history (the
    * shared rebuild-resets rule). */
  def bpeSegmentCountsFromVocabAsOf(spark: org.apache.spark.sql.SparkSession,
                                    dir: String, df: DataFrame,
                                    idCol: String, textCol: String,
                                    asOf: Int): DataFrame = {
    graft.core.Artifacts.heal(spark, dir)
    val stored = spark.read.parquet(s"$dir/meta").head().getInt(0)
    require(asOf >= 0 && asOf <= stored,
      s"bpeSegmentCountsFromVocabAsOf: version $asOf of $dir does not " +
        s"exist (stored rounds = $stored)")
    val merges = spark.read.parquet(s"$dir/merges")
      .where(col("round") <= asOf).orderBy("round")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    bpeSegmentCounts(df, idCol, textCol, merges)
  }

  /** BPE APPLY — the consumer of [[bpeMergeRounds]]' trained artifact
    * (Sennrich et al. 2016 §3: training emits an ordered merge list;
    * tokenization replays it): segment the corpus under the learned
    * merges and emit per-document token counts under the TRAINED
    * tokenizer — the real measurement [[vocabCoverage]]'s whitespace-token
    * approximation stands in for (token budgets, packing lengths and
    * per-doc training cost are all priced in TOKENIZER units, not words).
    * `merges` is the trained artifact: (sym_a, sym_b) pairs in training
    * order, applied in that order — BPE's apply-time contract. Output:
    * (doc_id, n_words, n_bpe_tokens); n_bpe_tokens = Σ over the doc's
    * words of the word's post-merge symbol count, so before any merge it
    * equals the doc's character count and each applied merge occurrence
    * reduces it by one — the compression the tokenizer was trained for.
    *
    * Segmentation semantics are [[bpeMergeRounds]]' own, verbatim: the
    * spaced-symbol string, the literal non-regex replace per merge, and
    * the documented boundary-sharing deviation on repeated-character
    * runs — train and apply MUST share one segmenter or the learned
    * merges mis-apply (the classic tokenizer-skew bug this operator's
    * oracle would catch: it unrolls the identical replaces).
    *
    * Scale shape: the string kernel (space-out + |merges| literal
    * replaces + one split) runs once per DISTINCT WORD — vocabulary-sized,
    * the same economy bpeMergeRounds trains at — never per occurrence;
    * occurrences then join the |vocab| counts relation (un-hinted: AQE
    * broadcasts a vocabulary while it fits and falls back at scale) and
    * collapse into one map-side-combined per-doc aggregate. */
  def bpeSegmentCounts(df: DataFrame, idCol: String, textCol: String,
                       merges: Seq[(String, String)]): DataFrame = {
    require(merges.nonEmpty, "apply needs a trained merge list")
    val words = df.select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("w"))
      .where(col("w") =!= "")
    val sym0 = concat(lit(" "), regexp_replace(col("w"), "(.)", "$1 "))
    val seg = merges.foldLeft(sym0) { case (s, (a, b)) =>
      call_function("replace", s, lit(s" $a $b "), lit(s" $a$b "))
    }
    val perWord = words.select(col("w")).distinct()
      .select(col("w"), size(split(trim(seg), " ")).cast("long").as("n_sub"))
    words.join(perWord, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_bpe_tokens"))
  }

  /** Per-document mean unigram SURPRISAL against the corpus's own unigram
    * distribution — the language-model quality filter's cheap stand-in
    * (CCNet/KenLM-style perplexity filtering ranks docs by LM score; the
    * unigram corpus model needs no external artifact and already separates
    * repetitive/boilerplate docs (low surprisal) from vocabulary-rich ones).
    * surprisal(doc) = (1/n) · Σ_tokens −ln p(t), p(t) = corpus_count(t)/N.
    *
    * Scale shape: ONE corpus pass — the (doc, term, tf) relation feeds both
    * the per-term corpus count (window over term, the x2_tfidf df pattern:
    * the term-keyed shuffle it needed anyway, no self-join re-scan) and the
    * per-doc weighted sum; N rides as a 1-row broadcast. Determinism: a
    * raw double Σ is summation-order-dependent, so each term's
    * contribution is quantized to DECIMAL(30,6) and summed EXACTLY (the
    * Num.dsum policy applied per term); `ln` itself is libm noise of ±1
    * ulp (~10⁻¹⁶ relative), flipping a 10⁻⁶ quantization boundary with
    * probability ~10⁻¹⁰ per term — the same accepted exposure as
    * x2_tfidf's rounded log weight. */
  def unigramSurprisal(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = graft.core.Par.fanOut(df.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("toks")))
    val tf = toks.select(col("doc_id"), explode_outer(col("toks")).as("term"))
      .where(col("term").isNotNull) // see termStats' explode_outer note
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val n = tf.agg(sum(col("tf")).as("n_corpus"))
    val termBits = col("tf").cast("double") *
      (log(col("n_corpus").cast("double")) - log(col("ct").cast("double")))
    tf.withColumn("ct", sum(col("tf"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("term")))
      .crossJoin(broadcast(n))
      .groupBy("doc_id")
      .agg(sum(col("tf")).cast("long").as("n_tokens"),
        round(Num.dsum(termBits) / sum(col("tf")).cast("double"), 6)
          .as("surprisal"))
  }

  /** Per-document CHARACTER-DISTRIBUTION SHANNON ENTROPY (nats/char) —
    * the model-free quality signal next to [[unigramSurprisal]]'s
    * corpus-relative one: H = Σ_c (ct_c∕N)·ln(N∕ct_c) over the doc's OWN
    * character counts. Low entropy = repeated-character spam, padding
    * runs, single-token boilerplate; natural prose sits in a stable band
    * — the classic cheap pre-filter BEFORE tokenizer-level screens (t6's
    * trigram repetition catches phrase loops; this catches what happens
    * below the token level).
    *
    * Determinism = lm1's exact discipline verbatim: per-character
    * contributions ct·(ln N − ln ct) quantize to DECIMAL(30,6) and sum
    * exactly, one final IEEE division behind round(·, 6); the ln
    * arguments are irrational-log inputs, so the quotient cannot sit ON
    * a decimal half-boundary — only libm ±1 ulp noise at ~10⁻¹⁰ per-term
    * exposure, the accepted lm1/x2 class. A single-character document
    * emits exactly 0 (ln N − ln ct is the same double, bits ≡ 0).
    *
    * Scale: one char-explode pass (rows = corpus characters — the bpe1
    * inflation class, map-side combined into (doc, char) groups ≤
    * |alphabet| per doc), a doc-keyed window over those small groups,
    * one final per-doc aggregate. */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chars = graft.core.Par.fanOut(df.select(col(idCol).as("doc_id"),
        col(textCol).as("text")))
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .where(length(col("ch")) === 1) // split("") may emit a trailing ""
    val cf = chars.groupBy("doc_id", "ch").agg(count(lit(1)).as("ct"))
    val bits = col("ct").cast("double") *
      (log(col("n").cast("double")) - log(col("ct").cast("double")))
    cf.withColumn("n", sum(col("ct")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .groupBy("doc_id")
      .agg(max(col("n")).cast("long").as("n_chars"),
        count(lit(1)).cast("long").as("n_distinct_chars"),
        round(Num.dsum(bits) / max(col("n")).cast("double"), 6).as("entropy"))
  }

  /** Trigram STUPID-BACKOFF COVERAGE scoring — the n-gram-LM quality
    * filter of the CCNet/CC-100 lineage (perplexity-filter family),
    * stated in exact arithmetic: a held-out reference corpus `lm` defines
    * trigram/bigram/unigram vocabularies; every trigram position in a
    * scored document classifies by the backoff cascade (trigram known →
    * `tri`; else its closing bigram known → `bi`; else its last token
    * known → `uni`; else `oov`), and the document's score is the weighted
    * coverage (3·n_tri + 2·n_bi + n_uni) / (3·n_pos). A document of
    * n-grams the reference corpus has never seen scores toward 0 —
    * gibberish, boilerplate mutations, and wrong-language text all fall
    * out, with no floating-point LM probabilities in the graded value:
    * counts are exact longs and the score is ONE final IEEE division
    * (both engines correctly-rounded, the mix1 policy — no logs, no
    * per-token float sums).
    *
    * Scale shape: the reference corpus tokenizes ONCE behind a fan-out
    * exchange with three consumers (tri/bi/uni distinct sets — identical
    * subplans below the exchange, so the d3 ReusedExchange pattern
    * applies); the scored corpus tokenizes once into one row per trigram
    * position (rows ≈ corpus tokens — the same inflation every n-gram
    * pass here pays, x3/bpe1). Classification is three left joins keyed
    * on the n-gram string: vocabulary-sized build sides, corpus-sized
    * probe, no hints (vocabulary size is a data property — AQE broadcasts
    * the unigram set while it fits and sort-merges the trigram set, the
    * correct call at every scale). Everything before the joins is one
    * codegen'd projection. */
  /** DSIR importance weight — Data Selection via Importance Resampling
    * (Xie et al., NeurIPS 2023, public method): score every raw-pool
    * document by the log-likelihood ratio of two HASHED-unigram bag
    * models, a curated TARGET distribution vs the raw pool itself —
    * the principled replacement for hand-tuned quality thresholds
    * ("keep web text that looks like the reference corpus"), the
    * selection step between scoring (lm1's class) and sampling
    * (Sampling.sampleByProb takes the weights from here).
    *
    * Model: the hashing trick — terms bucket by the PORTABLE sha-60
    * hash ([[graft.ext.Sampling.hashBucket]], the sp1/d4 family, so the
    * oracle rebuilds the exact collisions) into `buckets` cells;
    * add-one smoothing keeps every ratio finite:
    * llr(b) = [ln(ct_t(b)+1) − ln(ct_s(b)+1)] + [ln(N_s+B) − ln(N_t+B)].
    * A positive per-doc sum Σ_b c_doc(b)·llr(b) reads "more
    * target-like than pool-like".
    *
    * Determinism = lm1's discipline verbatim: each (doc, bucket)
    * contribution quantizes to DECIMAL(30,6) and sums exactly (order-
    * free), ln only on integer-valued doubles behind the quantization,
    * one final round(·, 6).
    *
    * Scale: both models are ≤ `buckets` rows (map-side-combined bucket
    * aggregates — the hashing trick is WHY DSIR runs at corpus scale:
    * model size is fixed, never vocabulary-sized), they broadcast
    * as a bounded relation by construction, and the raw pool makes one
    * tokenize pass into (doc, bucket) groups. Nothing shuffles wider
    * than the doc key. */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
                  textCol: String, buckets: Int = 256): DataFrame = {
    require(buckets >= 2)
    val bL = lit(buckets.toLong)
    def bucketTerms(df: DataFrame, cols: Column*): DataFrame =
      graft.core.Par.fanOut(df.select((cols :+ tokens(col(textCol)).as("toks")): _*))
        .select((cols :+ explode_outer(col("toks")).as("term")): _*)
        .where(col("term").isNotNull)
        .withColumn("b", Sampling.hashBucket(col("term"), "dsir", buckets))
    val tCt = bucketTerms(target).groupBy("b").agg(count(lit(1)).as("ct_t"))
    val rDoc = bucketTerms(raw, col(idCol).as("doc_id"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
    val sCt = rDoc.groupBy("b").agg(sum(col("c")).as("ct_s"))
    // model = buckets PRESENT IN THE POOL (a doc can only hit those);
    // absent-from-target buckets smooth to ct_t = 0. Bounded ≤ `buckets`
    // rows — broadcast by construction, never SF-scaled.
    val model = sCt.join(tCt, Seq("b"), "left")
      .select(col("b"), coalesce(col("ct_t"), lit(0L)).as("ct_t"),
        col("ct_s"))
    val totals = sCt.agg(sum(col("ct_s")).as("ns"))
      .crossJoin(tCt.agg(coalesce(sum(col("ct_t")), lit(0L)).as("nt")))
    // pinned expression order, mirrored token-for-token by the oracle
    val llrTerm = col("c").cast("double") *
      ((log((col("ct_t") + lit(1L)).cast("double")) -
        log((col("ct_s") + lit(1L)).cast("double"))) +
       (log((col("ns") + bL).cast("double")) -
        log((col("nt") + bL).cast("double"))))
    rDoc.join(broadcast(model), "b")
      .crossJoin(broadcast(totals))
      .groupBy("doc_id")
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        round(Num.dsum(llrTerm), 6).as("dsir_llr"))
  }

  def backoffCoverage(lm: DataFrame, scored: DataFrame,
                      idCol: String, textCol: String): DataFrame = {
    def toks(df: DataFrame, extra: Column*) = graft.core.Par.fanOut(
      df.select(extra :+ tokens(col(textCol)).as("toks"): _*))
    def triAt(t: Column, i: Column) = concat_ws(" ",
      element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))
    val lmToks = toks(lm)
    // explode_OUTER over a when-guarded array, NOT where(size>=3)+explode:
    // the pre-filter (and the size>0 filter InferFiltersFromGenerate adds
    // below a plain explode) pushes beneath the shared fan-out exchange and
    // de-canonicalizes this consumer's subplan — the tri/bi/uni trio then
    // costs three corpus scans instead of one + two ReusedExchange (the
    // d2 posting-explode note; the when-guard also avoids sequence(1, 0)'s
    // DESCENDING-array trap for short docs)
    val lmTri = lmToks
      .select(explode_outer(when(size(col("toks")) >= 3,
        transform(sequence(lit(1), size(col("toks")) - 2),
          i => triAt(col("toks"), i)))).as("tri"))
      .where(col("tri").isNotNull).distinct()
    val lmBi = lmToks
      .select(explode_outer(bigramsFromTokens(col("toks"))).as("bi"))
      .where(col("bi").isNotNull).distinct()
    val lmUni = lmToks.select(explode_outer(col("toks")).as("uni"))
      .where(col("uni").isNotNull).distinct()
    val pos = toks(scored, col(idCol).cast("long").as("doc_id"))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(col("toks")) - 2),
          i => struct(
            triAt(col("toks"), i).as("tri"),
            concat_ws(" ", element_at(col("toks"), i + 1),
              element_at(col("toks"), i + 2)).as("bi"),
            element_at(col("toks"), i + 2).as("uni")))).as("g"))
      .select(col("doc_id"), col("g.tri"), col("g.bi"), col("g.uni"))
    val cls = pos
      .join(lmTri.withColumn("t_hit", lit(1)), Seq("tri"), "left")
      .join(lmBi.withColumn("b_hit", lit(1)), Seq("bi"), "left")
      .join(lmUni.withColumn("u_hit", lit(1)), Seq("uni"), "left")
    val nTri = sum(when(col("t_hit").isNotNull, 1L).otherwise(0L))
    val nBi = sum(when(col("t_hit").isNull && col("b_hit").isNotNull, 1L)
      .otherwise(0L))
    val nUni = sum(when(col("t_hit").isNull && col("b_hit").isNull
      && col("u_hit").isNotNull, 1L).otherwise(0L))
    cls.groupBy("doc_id")
      .agg(count(lit(1)).as("n_pos"), nTri.as("n_tri"), nBi.as("n_bi"),
        nUni.as("n_uni"))
      .withColumn("n_oov",
        col("n_pos") - col("n_tri") - col("n_bi") - col("n_uni"))
      .withColumn("coverage",
        (col("n_tri") * 3 + col("n_bi") * 2 + col("n_uni")).cast("double")
          / (col("n_pos") * 3).cast("double"))
  }

  /** Per-source token-distribution KL DIVERGENCE against the whole-corpus
    * unigram distribution — the TEXT-side drift/domain-shift monitor
    * (drift1 watches the embedding space; this watches the token space):
    * a source whose token mix diverges from the corpus — a feed that
    * switched language, started emitting boilerplate, or got re-scraped
    * through a different extractor — shows up as a KL jump without any
    * model in the loop. KL(P_s ‖ Q) = Σ_t p_s(t)·ln(p_s(t)/q(t)) with
    * p_s(t) = c_st/N_s and q(t) = c_t/N; every source term has c_t ≥
    * c_st ≥ 1, so no zero-support guard is needed against the corpus
    * distribution (Q's support contains P's by construction).
    *
    * Scale shape: one corpus tokenize pass to (source, term, tf) —
    * vocabulary-bounded, not corpus-bounded; the per-term corpus count
    * rides the term-keyed window (the lm1/x2 pattern — no self-join
    * re-scan), per-source totals come back as a tiny per-source relation
    * joined WITHOUT a hint (AQE broadcasts while it fits — source
    * cardinality is a data property, not provably bounded), and the
    * grand total rides as a 1-row broadcast. Determinism: per-term
    * contributions quantize to DECIMAL(30,6) and sum exactly (the lm1
    * policy — ln's ±1 ulp libm exposure sits behind the 6-decimal
    * quantization and final round). */
  def sourceTokenKl(df: DataFrame, textCol: String, srcCol: String): DataFrame = {
    val toks = graft.core.Par.fanOut(df.select(col(srcCol).as("source"),
      tokens(col(textCol)).as("toks")))
    val tf = toks.select(col("source"), explode_outer(col("toks")).as("term"))
      .where(col("term").isNotNull) // see termStats' explode_outer note
      .groupBy("source", "term").agg(count(lit(1)).as("tf"))
    val n = tf.agg(sum(col("tf")).as("n_corpus"))
    val ns = tf.groupBy(col("source").as("graft_src"))
      .agg(sum(col("tf")).as("ns"))
    val bits = col("tf").cast("double") *
      (log(col("tf").cast("double")) - log(col("ns").cast("double")) +
        log(col("n_corpus").cast("double")) - log(col("ct").cast("double")))
    tf.withColumn("ct", sum(col("tf"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("term")))
      .join(ns, col("source") === col("graft_src"))
      .crossJoin(broadcast(n))
      .groupBy("source")
      .agg(sum(col("tf")).cast("long").as("n_tokens"),
        count(lit(1)).cast("long").as("n_terms"),
        round(Num.dsum(bits) / sum(col("tf")).cast("double"), 6).as("kl"))
  }

  /** Per-source JENSEN–SHANNON divergence against the whole-corpus
    * unigram distribution — [[sourceTokenKl]]'s SYMMETRIC, BOUNDED
    * companion (JSD ∈ [0, ln 2], so scores compare across sources and
    * corpora; KL is unbounded and asymmetric — the two metrics disagree
    * exactly when a source is missing mass the corpus has, which is why
    * drift dashboards report both). JSD(P‖Q) = ½KL(P‖M) + ½KL(Q‖M) with
    * M = (P+Q)/2; the Q-side sum nominally runs over the FULL vocabulary
    * per source, but terms ABSENT from the source have p = 0 there, so
    * their contribution collapses to the closed form
    * q·ln(q∕(q∕2)) = q·ln 2 — the whole absent-mass block is
    * ln 2 · (1 − Σ_{t∈s} q_t), ONE term per source, and the computation
    * stays on the same (source, term) frame as kl1 (vocabulary-bounded,
    * never |sources|×|vocab|).
    *
    * Exactness: with a = c_st, A = N_s, b = c_t, B = N all exact
    * integers, p∕m = 2aB∕(aB+bA) and q∕m = 2bA∕(aB+bA) — every ln
    * argument is an integer-valued double. The binding bound is the
    * BIGINT PRODUCTS feeding those logs (aB + bA ≤ 2·N², so N must stay
    * ≤ 2·10⁹ or the non-ANSI multiply silently wraps — well before the
    * 2⁵³ double-exactness limit); a larger corpus fails LOUDLY via
    * raise_error below (the cohensKappa discipline — DuckDB errors on
    * BIGINT overflow, so a silent Spark wrap would desynchronize the
    * grade; the documented swap at that scale is DECIMAL pre-scaling).
    * Per-term contributions quantize to DECIMAL(30,6) (the lm1 seam),
    * and the assembly is a fixed chain of IEEE ops behind the final
    * round(·,6). */
  def sourceTokenJsd(df: DataFrame, textCol: String,
                     srcCol: String): DataFrame = {
    val toks = graft.core.Par.fanOut(df.select(col(srcCol).as("source"),
      tokens(col(textCol)).as("toks")))
    val tf = toks.select(col("source"), explode_outer(col("toks")).as("term"))
      .where(col("term").isNotNull)
      .groupBy("source", "term").agg(count(lit(1)).as("a"))
    val n = tf.agg(sum(col("a")).as("bb"))
    val withCt = tf.withColumn("b", sum(col("a"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("term")))
      .crossJoin(broadcast(n))
    def d(c: Column) = c.cast("double")
    // the guard wraps the corpus total every PRODUCT consumes (not a
    // sibling column with unspecified evaluation order — the cohensKappa
    // device): aB + bA ≤ 2·N², so N > 2e9 would wrap BIGINT silently in
    // non-ANSI Spark while DuckDB errors loudly — fail loudly instead
    val bbG = when(col("bb") > 2000000000L, raise_error(lit(
      "graft sourceTokenJsd: corpus exceeds 2e9 tokens — exact BIGINT " +
        "JSD products would overflow; pre-scale to DECIMAL"))
      .cast("long")).otherwise(col("bb"))
    val denom = col("a") * bbG + col("b") * col("aa")
    // per-term bits, each quantized exactly (order-free sums)
    val bitsP = d(col("a")) *
      (log(d(lit(2L) * col("a") * bbG)) - log(d(denom)))
    val bitsQ = d(col("b")) *
      (log(d(lit(2L) * col("b") * col("aa"))) - log(d(denom)))
    val perSrc = withCt
      .join(tf.groupBy(col("source").as("gsrc"))
        .agg(sum(col("a")).as("aa")), col("source") === col("gsrc"))
      .groupBy("source")
      .agg(max(col("aa")).as("na"), max(col("bb")).as("nb"),
        Num.dsumDec(bitsP).as("sp"), Num.dsumDec(bitsQ).as("sq"),
        sum(col("b")).as("present_b"))
    perSrc.select(col("source"), col("na").cast("long").as("n_tokens"),
        round((
          col("sp").cast("double") / d(col("na")) +
          (col("sq").cast("double") +
            (d(col("nb") - col("present_b")) *
              (log(d(lit(2L) * col("nb"))) - log(d(col("nb")))))
              .cast("decimal(30,6)").cast("double")) / d(col("nb"))
        ) * 0.5, 6).as("jsd"))
      .orderBy("source")
  }

  /** Write the hashed-bucket unigram BASELINE model for the streaming
    * drift monitor (qm1s): per-bucket token counts + totals, committed
    * all-or-nothing ([[graft.core.Artifacts.stageCommit]]). The hashing
    * trick ([[Sampling.hashBucket]], the dsir1 device — portable sha-60,
    * so the oracle rebuilds the exact collisions) keeps the model at
    * `buckets` rows at ANY corpus scale; smoothing happens read-side, so
    * the artifact stores raw exact counts. */
  def writeTokenBaseline(docs: DataFrame, textCol: String, dir: String,
                         buckets: Int = 256): Unit = {
    require(buckets >= 2)
    val spark = docs.sparkSession
    val bc = graft.core.Par.fanOut(
        docs.select(tokens(col(textCol)).as("toks")))
      .select(explode_outer(col("toks")).as("term"))
      .where(col("term").isNotNull)
      .withColumn("b", Sampling.hashBucket(col("term"), "qm1", buckets))
      .groupBy("b").agg(count(lit(1)).as("cq"))
    graft.core.Artifacts.stageCommit(spark, dir) { tmp =>
      bc.coalesce(1).write.parquet(s"$tmp/bucket_counts")
      // the totals derive from the bucket counts JUST WRITTEN, not from
      // a second full tokenize+hash+aggregate job over the corpus (the
      // unpersisted bc would re-run end to end — round-12 ADVICE); the
      // staged file is ≤ `buckets` rows, so the re-read is free
      spark.read.parquet(s"$tmp/bucket_counts")
        .agg(coalesce(sum(col("cq")), lit(0L)).as("nq"),
          lit(buckets).as("buckets"))
        .coalesce(1).write.parquet(s"$tmp/meta")
    }
  }

  /** Per-batch token-distribution DRIFT against a stored baseline
    * ([[writeTokenBaseline]]) — the streaming × drift cell: kl1 compares
    * sources within one batch corpus, drift1 watches the embedding
    * space; a production ingest monitor needs "did THIS batch's token
    * mix move away from what we trained the filters on", per
    * micro-batch, against a FIXED reference. Smoothed bucket KL over
    * the model's full support (every bucket contributes — including
    * batch-absent ones, whose (0+1)-smoothed mass is not zero):
    * p(b) = (cp+1)/(np+B), q(b) = (cq+1)/(nq+B),
    * KL = Σ_b p(b)·ln(p(b)/q(b)). Determinism = kl1's discipline: each
    * bucket's numerator term quantizes to DECIMAL(30,6) and sums
    * exactly, ln only on integer-valued doubles, ONE final IEEE
    * division + round(·,6). Output: 1 row (n_tokens, kl).
    *
    * Scale: the batch makes one tokenize pass into ≤ `buckets` groups
    * (map-side combined); the bucket spine, baseline and batch totals
    * are all `buckets`-row bounded relations (explicit broadcast under
    * the bounded-relation policy). */
  def batchDriftKl(batch: DataFrame, textCol: String,
                   baselineDir: String): DataFrame = {
    val spark = batch.sparkSession
    // by NAME, not position — a column-order change in the artifact must
    // fail loudly here, never silently mis-bind nq/buckets (round-12
    // ADVICE)
    val meta = spark.read.parquet(s"$baselineDir/meta").head()
    val (nq, buckets) = (meta.getAs[Long]("nq"), meta.getAs[Int]("buckets"))
    val bL = lit(buckets.toLong)
    val p = graft.core.Par.fanOut(
        batch.select(tokens(col(textCol)).as("toks")))
      .select(explode_outer(col("toks")).as("term"))
      .where(col("term").isNotNull)
      .withColumn("b", Sampling.hashBucket(col("term"), "qm1", buckets))
      .groupBy("b").agg(count(lit(1)).as("cp"))
    val np = p.agg(coalesce(sum(col("cp")), lit(0L)).as("np"))
    val spine = spark.range(buckets).select(col("id").as("b"))
    val full = spine
      .join(broadcast(p), Seq("b"), "left")
      .join(broadcast(spark.read.parquet(s"$baselineDir/bucket_counts")),
        Seq("b"), "left")
      .crossJoin(broadcast(np))
      .select(
        coalesce(col("cp"), lit(0L)).as("cp"),
        coalesce(col("cq"), lit(0L)).as("cq"), col("np"))
    // pinned expression order, mirrored token-for-token by the oracle
    val bits = (col("cp") + lit(1L)).cast("double") *
      ((log((col("cp") + lit(1L)).cast("double")) -
        log((col("cq") + lit(1L)).cast("double"))) +
       (log((lit(nq) + bL).cast("double")) -
        log((col("np") + bL).cast("double"))))
    full.groupBy()
      .agg(max(col("np")).as("n_tokens"), graft.core.Num.dsumDec(bits).as("klq"))
      .select(col("n_tokens"),
        round(col("klq").cast("double") /
          (col("n_tokens") + bL).cast("double"), 6).as("kl"))
  }

  /** Deterministic 64-bit-hex document fingerprint over normalized tokens —
    * the exact-dedup / provenance key. sha2 is identical everywhere, so the
    * fingerprint is portable across engines and runs. */
  def fingerprint(text: Column): Column =
    substring(sha2(array_join(tokens(text), " "), 256), 1, 16)

  /** Per-(document, term) TF-IDF statistics: tf (term count in doc), df
    * (documents containing the term), and tfidf = tf · ln(N/df), for terms
    * with tf ≥ `minTf`. The classic corpus term-weighting pass.
    *
    * Scale shape: tokenize in the cheap projection, fan out, explode; tf is
    * one (doc, term) hash-aggregate with map-side combine; df rides as a
    * WINDOW count over the tf relation partitioned by term — one pipeline,
    * one corpus pass by construction. (A tf⋈dfc self-join relies on AQE
    * exchange reuse to avoid re-running the explode/aggregate branch, and
    * anything between the reused exchange and the two consumers still runs
    * twice; the window formulation needs only the term-keyed shuffle the
    * join would have taken anyway.) N broadcasts as a single-row literal.
    * Shuffled bytes are bounded by distinct (doc, term) pairs — the same
    * bound as any inverted-index build. */
  def termStats(df: DataFrame, idCol: String, textCol: String,
                minTf: Int = 2): DataFrame = {
    val toks = graft.core.Par.fanOut(df.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("toks")))
    // explode_outer + isNotNull: a plain explode infers size(toks) > 0,
    // which re-runs the tokenizer inside the scan-stage Filter (see the
    // d3 single-pass note / Dedup.contaminationPairs)
    val tf = toks.select(col("doc_id"), explode_outer(col("toks")).as("term"))
      .where(col("term").isNotNull)
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    tf.withColumn("df", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy("term")))
      .where(col("tf") >= minTf)
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4)
          .as("tfidf"))
  }

  /** Vocabulary coverage / OOV rate: build the top-`vocabSize` corpus
    * vocabulary by total token frequency (ties broken lexicographically,
    * so the vocab is deterministic), then score every document's
    * out-of-vocabulary token fraction — the tokenizer-fit / domain-shift
    * screen (a corpus slice whose OOV rate spikes is in the wrong language,
    * the wrong domain, or binary junk).
    *
    * Scale shape: ONE corpus pass. Both the vocab build and the scoring
    * aggregate consume the same (doc, term, cnt) relation, whose exchange
    * both consumers reuse (identical subplans — same columns, no pruning
    * divergence), so the scan/tokenize/explode pipeline runs once and
    * everything above it runs at distinct-(doc, term) cardinality, not
    * token-stream cardinality. The vocabulary itself is BOUNDED by
    * construction (`limit vocabSize`), so its broadcast hint is safe at
    * any corpus scale (the bounded-relation broadcast policy). */
  def vocabCoverage(df: DataFrame, idCol: String, textCol: String,
                    vocabSize: Int = 20): DataFrame = {
    require(vocabSize > 0)
    val toks = graft.core.Par.fanOut(df.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("toks")))
    val tf = toks.select(col("doc_id"), explode_outer(col("toks")).as("token"))
      .where(col("token").isNotNull) // see termStats' explode_outer note
      .groupBy("doc_id", "token").agg(count(lit(1)).as("cnt"))
    val vocab = tf.groupBy("token").agg(sum(col("cnt")).as("n"))
      .orderBy(col("n").desc, col("token").asc).limit(vocabSize)
      .select(col("token"), lit(1).as("in_vocab"))
    tf.join(broadcast(vocab), Seq("token"), "left")
      .groupBy("doc_id")
      .agg(sum(col("cnt")).cast("long").as("n_tokens"),
        sum(when(col("in_vocab").isNull, col("cnt")).otherwise(lit(0L)))
          .cast("long").as("n_oov"))
      .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tokens"))
  }

  /** GINI COEFFICIENT of the token-frequency distribution — the
    * vocabulary-inequality statistic corpus reports print next to the
    * Zipf slope (zipf1 fits the power-law EXPONENT over the head; Gini
    * summarizes the WHOLE distribution's concentration in [0, 1)) and
    * bal1's source-level HHI (that measures concentration across
    * SOURCES; this across the vocabulary — a near-1 Gini flags a corpus
    * whose token mass sits in a tiny vocabulary head, boilerplate or
    * template spam). G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over
    * frequencies sorted ASCENDING.
    *
    * Exactness: ranks come from the range-partitioned two-phase global
    * ordinals ([[graft.ext.Curation.globalOrdinals]] — never a
    * single-reducer vocabulary sort; the (x, term) composite is unique
    * so ranks are engine-deterministic, and within an equal-x run the
    * rank permutation cannot change Σ i·xᵢ anyway), the three moments
    * ride DECIMAL(38,0) (i·x products exceed BIGINT at ~10¹³ corpus
    * tokens — the crossCorr widening), and the emitted value is ONE
    * truncating micro division on non-negative integers (ascending
    * order makes 2Σi·xᵢ ≥ (n+1)Σx by the Chebyshev sum inequality, so
    * Spark div ≡ DuckDB //). Output: 1 row (n_terms, n_tokens,
    * gini_micro). */
  def tokenGini(df: DataFrame, textCol: String): DataFrame = {
    val tf = graft.core.Par.fanOut(df.select(tokens(col(textCol)).as("toks")))
      .select(explode_outer(col("toks")).as("term"))
      .where(col("term").isNotNull && col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("x"))
    val (ranked, release) = Curation.globalOrdinalsManaged(
      tf, Seq(col("x"), col("term")))
    try {
      def dec(c: Column) = c.cast("decimal(38,0)")
      ranked.agg(count(lit(1)).as("n"),
          sum(dec(col("x"))).as("sx"),
          sum(dec(col("ordinal")) * dec(col("x"))).as("six"))
        .select(col("n").as("n_terms"), col("sx").cast("long").as("n_tokens"),
          call_function("div",
            (dec(lit(2L)) * col("six") - dec(col("n") + 1L) * col("sx")) *
              dec(lit(1000000L)),
            dec(col("n")) * col("sx")).as("gini_micro"))
        // the bounded 1-row result materializes before the ordinal cache
        // releases (localCheckpoint is eager)
        .localCheckpoint()
    } finally release()
  }

  /** Per-term corpus statistics: document frequency (distinct docs
    * containing the term) and total term frequency. The unit the
    * incremental-maintenance path stores per corpus snapshot. */
  def termCounts(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = graft.core.Par.fanOut(df.select(col(idCol).as("doc_id"),
      tokens(col(textCol)).as("toks")))
    toks.select(col("doc_id"), explode_outer(col("toks")).as("term"))
      .where(col("term").isNotNull) // see termStats' explode_outer note
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("tf")).cast("long").as("tf"))
  }

  /** INCREMENTAL corpus term-statistics maintenance: fold a new batch's
    * [[termCounts]] into an ARCHIVED per-term (df, tf) table additively.
    * df and tf are distributive aggregates (corpora are disjoint by
    * construction — a doc lives in exactly one ingest batch), so the
    * archive is NEVER re-tokenized: upkeep costs one |terms|-keyed merge
    * of yesterday's summary with today's batch, the inc1/inc2 pattern
    * applied to corpus statistics instead of membership. The graded row
    * proves merged(archive, batch) ≡ a from-scratch build over the union.
    */
  def mergeTermStats(archive: DataFrame, batch: DataFrame,
                     idCol: String, textCol: String): DataFrame =
    archive.unionByName(termCounts(batch, idCol, textCol))
      .groupBy("term")
      .agg(sum(col("df")).cast("long").as("df"),
        sum(col("tf")).cast("long").as("tf"))

  val EnStop: Seq[String] = Seq("the", "a", "an", "and", "of", "to", "in", "is", "that", "it")
  val DeStop: Seq[String] = Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den")
  val FrStop: Seq[String] = Seq("le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour")
  val EsStop: Seq[String] = Seq("el", "los", "de", "que", "y", "en", "es", "por", "con", "para")

  /** Marker-word language ID: score each language by how many of its marker
    * words occur in the document (distinct hits), pick the argmax with a
    * deterministic preference order, fall back to CJK script detection.
    * One projection, no shuffle; vocabulary-profile langid at corpus scale.
    */
  def langId(text: Column): Column = {
    val t = array_distinct(tokens(text))
    def hits(stop: Seq[String]) = size(array_intersect(t, array(stop.map(lit): _*)))
    // native byte-walk count (== length(regexp_replace(text,
    // "[^\x{4e00}-\x{9fff}]", "")), which built a stripped copy per row)
    val cjk = graft.functions.VectorExpressions.cjkCountNative(text)
    // PACKED single-eval argmax, not a when-chain and not
    // array_position(scores, array_max(scores)): branches re-evaluate
    // their subtrees (CSE does not hoist lazily-evaluated branch
    // expressions) and the position/max pair evaluates the scores array
    // twice — either way the tokenize+intersect block runs multiple
    // times, which dominated this operator. Packing score and language
    // rank into one int (score·8 + rank) makes a single array_max the
    // whole decision: ties at equal score resolve to the HIGHER rank,
    // so ranks 7,6,5,4,3 encode the unk>en>de>es>fr zero-score ordering
    // — unk (score 0, rank 7) wins exactly when every language scores 0,
    // and any positive score beats it. Decode: rank = max % 8. Identical
    // values to the oracle's greatest/CASE chain.
    val packed = array(
      lit(7),                       // unk: score 0, rank 7
      hits(EnStop) * 8 + lit(6), hits(DeStop) * 8 + lit(5),
      hits(EsStop) * 8 + lit(4), hits(FrStop) * 8 + lit(3))
    val labels = array(lit("fr"), lit("es"), lit("de"), lit("en"), lit("unk"))
    // NULL text → NULL language, explicitly: array_max skips null scores,
    // so without this guard a null document would decode to "unk" while a
    // when-chain (and a SQL CASE) falls through to its ELSE — the one
    // input where the two formulations disagree. The t4 oracle carries
    // the same leading IS NULL arm.
    when(text.isNull, lit(null).cast("string"))
      .when(cjk * 3 > length(text), lit("zh"))
      .otherwise(element_at(labels, (array_max(packed) % 8 - 2).cast("int")))
  }

  /** T5-style SPAN CORRUPTION, deterministic (Raffel et al., JMLR'20 §3.1.4
    * objective): the corpus-to-training-pairs step of a denoising
    * pretraining pipeline — contiguous token spans are replaced by
    * numbered sentinels in the input and emitted after their sentinel in
    * the target. Fate is a pure function of (doc id, span ordinal, salt):
    * positions group into fixed `groupLen`-token spans and span g masks
    * iff hashBucket(docId:g, salt) < rate — the sp1 hash-fate discipline,
    * so re-runs, retries and the oracle agree row for row (T5's random
    * span sampling is exactly what a distributed, replayable pipeline
    * cannot use). Sentinels number 0,1,… in span order per document.
    *
    * Returns (doc_id, masked_text, target_text, n_masked): masked_text =
    * the document with each masked span collapsed to `<extra_id_K>`,
    * target_text = the masked spans each prefixed by its sentinel (NULL
    * when nothing masked — the degenerate doc contributes no denoising
    * pair), n_masked = masked token count.
    *
    * Shape at scale: posexplode → one (doc, span) aggregate → one
    * running-count window + final per-doc aggregate, all keyed by doc id
    * — the sessionization cost class (per-doc sort, no self-join). The
    * per-token explode is the honest relational form; a fused native
    * expression (one pass per document string) is the documented swap if
    * this ever dominates a pipeline. */
  def maskSpans(docs: DataFrame, idCol: String, textCol: String,
                salt: String, rate: Int = 15, groupLen: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(rate >= 0 && rate <= 100 && groupLen >= 1)
    val tk = graft.core.Par.fanOut(
        docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
          .where(size(col("toks")) > 0))
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("p", "tok")))
      .withColumn("g", floor(col("p") / groupLen))
    val grp = tk.groupBy("doc_id", "g")
      .agg(transform(sort_array(collect_list(struct(col("p"), col("tok")))),
        s => s.getField("tok")).as("gtoks"))
      .withColumn("flag", Sampling.hashBucket(
        concat(col("doc_id").cast("string"), lit(":"), col("g").cast("string")),
        salt, 100) < rate)
    // sentinel ordinal = masked spans strictly BEFORE this span
    val w = Window.partitionBy("doc_id").orderBy("g")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val numbered = grp
      .withColumn("k",
        sum(when(col("flag"), 1L).otherwise(0L)).over(w) -
          when(col("flag"), 1L).otherwise(0L))
      .withColumn("sentinel", concat(lit("<extra_id_"), col("k"), lit(">")))
    val pieces = numbered.select(col("doc_id"), col("g"),
      when(col("flag"), col("sentinel"))
        .otherwise(array_join(col("gtoks"), " ")).as("mstr"),
      when(col("flag"),
        concat(col("sentinel"), lit(" "), array_join(col("gtoks"), " ")))
        .as("tstr"),
      when(col("flag"), size(col("gtoks")).cast("long")).otherwise(lit(0L))
        .as("nm"))
    pieces.groupBy("doc_id")
      .agg(
        array_join(transform(
          sort_array(collect_list(struct(col("g"), col("mstr")))),
          s => s.getField("mstr")), " ").as("masked_text"),
        array_join(transform(
          sort_array(collect_list(when(col("tstr").isNotNull,
            struct(col("g"), col("tstr"))))),
          s => s.getField("tstr")), " ").as("target0"),
        sum(col("nm")).as("n_masked"))
      .select(col("doc_id"), col("masked_text"),
        when(col("n_masked") > 0, col("target0")).as("target_text"),
        col("n_masked"))
  }
}
