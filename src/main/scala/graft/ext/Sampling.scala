package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment for dataset curation.
  *
  * Training-data pipelines need train/val/test splits and down-samples that
  * are (a) reproducible across runs and engines, (b) stable under
  * re-partitioning and incremental reprocessing — a document keeps its split
  * forever, no matter when or where it is processed — and (c) pure
  * projections: no shuffle, no RNG state, no sort. `rand()`-based sampling
  * violates all three at 100 TB (non-deterministic per task retry,
  * partitioning-dependent, unrepeatable). The standard fix is hashing a
  * stable key with a salt: bucket = H(key, salt) mod buckets.
  *
  * The hash is the same portable sha256-prefix used by the graded SimHash
  * path ([[Dedup.shaTokenHash]] note): first 60 bits of sha256, positive in
  * a signed 64-bit space everywhere, so any engine (the DuckDB oracle
  * included) reproduces buckets bit-for-bit. Salting gives independent
  * splits for independent purposes (change the salt → a fresh, uncorrelated
  * assignment).
  */
object Sampling {

  /** Stable bucket in [0, buckets) from a key column and salt: first 60
    * bits of sha256(key ":" salt) mod buckets. Pure projection, engine-
    * portable, uniform to ~2⁻⁶⁰. */
  def hashBucket(key: Column, salt: String, buckets: Int = 100): Column = {
    require(buckets > 0)
    conv(substring(sha2(concat(key.cast("string"), lit(":" + salt)).cast("binary"),
      256), 1, 15), 16, 10).cast("long") % buckets
  }

  /** Deterministic percentage down-sample: keep rows whose bucket falls
    * below `pct` (of 100). */
  def sampleByHash(df: DataFrame, key: Column, salt: String, pct: Int): DataFrame =
    df.where(hashBucket(key, salt) < pct)

  /** Deterministic WEIGHTED (per-row-probability) sample: keep each row
    * with its own probability `prob` ∈ [0, 1] — the source-mixing /
    * importance-sampling primitive (upweight rare sources, downweight
    * boilerplate) with the same guarantees as [[sampleByHash]]: a row's
    * fate is a pure function of (key, salt), so the sample is reproducible
    * across runs, engines and repartitioning, and independent samples come
    * from distinct salts. The hash is compared at 10⁶ resolution, so
    * probabilities are honored to ±10⁻⁶. */
  def sampleByProb(df: DataFrame, key: Column, salt: String, prob: Column): DataFrame =
    df.where(hashBucket(key, salt, 1000000).cast("double") / 1e6 < prob)

  /** Fractional EPOCH up/down-sampling — the mixing spec "2.25 epochs of
    * zh, 0.5 epochs of en" that turns a per-source epoch count into an
    * actual replicated row stream: each row appears
    * floor(e) + [fate < frac(e)] times, where e = `epochsPermille`∕1000
    * (an integer-permille Column, usually a CASE over source/lang) and
    * fate is the [[hashBucket]] salted-hash of the key — so replication
    * is a pure projection of the row: reproducible across runs, engines
    * and partitioning (the [[sampleByHash]] guarantees), with e < 1
    * degrading to deterministic down-sampling ([[sampleByProb]] at
    * permille resolution) and e ≥ 1 emitting every copy tagged
    * `epoch_copy` 1..n. The fan-out is sequence+explode in the
    * projection — no shuffle, no join; downstream packing (`pack1`)
    * receives copies as ordinary rows. Expected stream size multiplies
    * by the weighted mean epoch count — the caller's mixing budget, by
    * definition. */
  def epochUpsample(df: DataFrame, key: Column, salt: String,
                    epochsPermille: Column): DataFrame = {
    val epm = epochsPermille.cast("long")
    val copies = call_function("div", epm, lit(1000L)) +
      when(hashBucket(key, salt, 1000) < epm % 1000, lit(1L)).otherwise(lit(0L))
    // sequence(1, 0) counts DOWN in Spark — guard the zero-copy case to
    // an empty array so explode (not explode_outer) drops the row
    df.withColumn("epoch_copy", explode(
      when(copies >= 1L, sequence(lit(1L), copies))
        .otherwise(array().cast("array<long>"))))
  }

  /** SHARDED sequence packing — assign documents to fixed-capacity training
    * chunks, the "concatenate the corpus, cut every ctxLen tokens" layout
    * every autoregressive training run performs before batching. Within a
    * shard (`id mod shards`), documents concatenate in deterministic id
    * order; a document's `chunk_id` is the chunk containing its FIRST
    * token, floor(tokens-before-it / ctxLen) (long documents simply span
    * into following chunks). Returns (doc_id, shard, n_tokens, chunk_id).
    *
    * Scale: a single global running sum would serialize the corpus through
    * one partition — the classic global-window trap — so packing is per
    * shard, which is how real pipelines pack anyway (each output shard is
    * an independent file of training sequences). The window's sort rides
    * the shard shuffle; parallelism = shards. Deterministic: shard and
    * order are pure functions of the id, so the layout is reproducible
    * across runs and engines. */
  def packSequences(df: DataFrame, id: Column, nTokens: Column,
                    ctxLen: Long = 2048, shards: Int = 32): DataFrame = {
    require(ctxLen > 0 && shards > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
    df.select(id.cast("long").as("doc_id"), nTokens.cast("long").as("n_tokens"))
      .withColumn("shard", pmod(col("doc_id"), lit(shards.toLong)))
      // integer floor-division (`div`), not double `/`: exact at any
      // cumulative token count, and engine-portable (DuckDB `//`)
      .withColumn("chunk_id", call_function("div",
        sum(col("n_tokens")).over(w) - col("n_tokens"), lit(ctxLen)))
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("chunk_id"))
  }

  /** Deterministic STRATIFIED sample: the k rows per stratum whose salted
    * hash is smallest — the language/source-rebalancing primitive (cap the
    * dominant stratum, keep rare strata whole) with the same guarantees as
    * [[sampleByHash]]: membership is a pure function of (key, salt, the
    * stratum's population), so the sample reproduces across runs, engines
    * and partitionings. Hash-order selection (not "first k by id") keeps
    * the within-stratum pick uniform; the key tiebreaks equal hashes.
    *
    * Scale: one shuffle on the stratum columns; the `row_number ≤ k`
    * filter is recognized by Catalyst's WindowGroupLimit rule, which
    * installs a partial per-partition group limit BEFORE the exchange —
    * at most k rows per stratum per input partition shuffle, not the full
    * corpus (PlanSpec asserts the node). A giant stratum therefore costs
    * k·partitions shuffled rows, not its population. */
  def stratifiedSample(df: DataFrame, strata: Seq[String], key: Column,
                       salt: String, k: Int): DataFrame = {
    require(k > 0 && strata.nonEmpty)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strata.map(col): _*).orderBy(col("graft_rk"), key)
    df.withColumn("graft_rk", hashBucket(key, salt, 1000000))
      .withColumn("graft_rn", row_number().over(w))
      .where(col("graft_rn") <= k)
      .drop("graft_rk", "graft_rn")
  }

  /** TEMPERATURE-flattened domain mixture: per-domain deterministic
    * down-sample with keep-rate (N_min/N_domain)^(1−α), so expected kept
    * counts are ∝ N_domain^α — the multilingual / multi-source rebalancing
    * rule (α = 1 keeps the natural distribution, α = 0 equalizes domains;
    * α ≈ 0.5−0.7 is the usual LM-pretraining compromise, cf. XLM's
    * temperature sampling). The smallest domain keeps everything; larger
    * domains thin toward it. Per-row fate is [[sampleByProb]]'s pure
    * (key, salt) hash, so the mixture reproduces across runs, engines and
    * partitionings — no RNG, no sort.
    *
    * α is restricted to 0.5 here so the rate is `sqrt` (IEEE-correctly-
    * rounded, bit-identical in every engine); a general `pow(x, 1-α)` is
    * only faithfully rounded and can differ in the last ulp across libm
    * implementations, flipping rows whose hash lands exactly at the rate
    * boundary.
    *
    * Scale: the per-domain count aggregate collapses map-side to |domains|
    * rows; the rate table (|domains| rows, keyed by the domain vocabulary)
    * is joined back — it carries NO broadcast hint (domain vocabularies
    * are usually bounded, but nothing enforces it; AQE broadcasts while it
    * fits). Everything else is a pure projection. */
  def temperatureMix(df: DataFrame, domain: Column, key: Column,
                     salt: String): DataFrame = {
    val counts = df.groupBy(domain.as("graft_dom"))
      .agg(count(lit(1)).as("graft_n"))
    val minN = counts.agg(min(col("graft_n")).as("graft_nmin"))
    val rates = counts.crossJoin(broadcast(minN))
      .select(col("graft_dom"),
        sqrt(col("graft_nmin").cast("double") / col("graft_n")).as("graft_rate"))
    sampleByProb(df.join(rates, domain === col("graft_dom")),
        key, salt, col("graft_rate"))
      .drop("graft_dom", "graft_rate")
  }

  /** LENGTH-bucketed batching stats — the padding-efficiency planner for
    * batched training/inference: group documents into power-of-two token-
    * length buckets (bucket = ⌊log₂ n⌋) and report, per bucket, the count,
    * length range and the PADDING WASTE a batch padded to the bucket max
    * would spend (max·count − Σ tokens). Length-bucketed batching is the
    * standard fix for padding blowup on skewed length distributions; the
    * power-of-two rule (vs ntile) keeps it a PURE PROJECTION — a global
    * ntile is a single-partition sort, the classic scale trap — and
    * integer-exact in any engine (⌊log₂⌋ via binary-string length, never
    * float log). Zero-token docs land in bucket −1. */
  def lengthBuckets(df: DataFrame, id: Column, nTokens: Column): DataFrame =
    df.select(id.cast("long").as("doc_id"), nTokens.cast("long").as("n_tokens"))
      .withColumn("bucket",
        when(col("n_tokens") <= 0, lit(-1L))
          .otherwise(length(bin(col("n_tokens"))).cast("long") - 1))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        sum(col("n_tokens")).cast("long").as("sum_tokens"),
        (max(col("n_tokens")) * count(lit(1)) - sum(col("n_tokens")))
          .cast("long").as("padding_waste"))

  /** Deterministic SHARD MANIFEST — the export "last mile" of a training
    * pipeline: assign every document to one of `shards` fixed output shards
    * by salted hash (stable across runs/engines/partitionings, same
    * guarantees as [[sampleByHash]]) and emit one manifest row per shard:
    * document count, token and character totals, and an ORDER-FREE content
    * fingerprint (exact DECIMAL sum of a per-doc content hash, mod a
    * prime) — enough for a consumer to verify a shard it downloaded
    * without re-reading the corpus. Returns
    * (shard, n_docs, n_tokens, n_chars, content_fp).
    *
    * The physical write is the same assignment:
    * `df.repartition(shards, shardCol).write...` (or
    * `partitionBy(shard)`) puts each shard in exactly one task = one
    * file, and this manifest is its sidecar. Scale: one hash-partitioned
    * aggregate with map-side combine; output = `shards` rows. The
    * fingerprint sum rides DECIMAL(30,0) (exact to 10²¹ docs, order-free,
    * engine-portable — the [[graft.core.Num.dsum]] rationale; a plain
    * BIGINT sum would wrap differently in Spark and the HUGEINT-widening
    * oracle). */
  def shardManifest(df: DataFrame, id: Column, content: Column,
                    nTokens: Column, salt: String, shards: Int): DataFrame = {
    require(shards > 0)
    val FpPrime = 1000000007L
    df.select(
        hashBucket(id, salt, shards).as("shard"),
        nTokens.cast("long").as("graft_tok"),
        length(content).cast("long").as("graft_chars"),
        // per-doc content hash bounded to 2^30 so the decimal sum stays
        // far inside DECIMAL(30,0) at any corpus size
        hashBucket(content, salt + ":fp", 1 << 30)
          .cast("decimal(30,0)").as("graft_h"))
      .groupBy("shard")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("graft_tok")).cast("long").as("n_tokens"),
        sum(col("graft_chars")).cast("long").as("n_chars"),
        (sum(col("graft_h")) % lit(FpPrime)).cast("long").as("content_fp"))
  }

  /** TOKEN-BUDGET fill — take documents per source in deterministic
    * salted-hash priority order until the source's token budget is
    * exhausted: the way production mixes are actually specified ("50 B
    * tokens of web, 5 B of code"), complementing [[temperatureMix]]'s
    * rate-based flattening with exact token targets. A document is kept
    * iff the running token sum up to and including it (ordered by
    * (priority, key) within its source) stays ≤ `budget`. Deterministic:
    * fate is a pure function of (key, salt, the source's population).
    * Returns the kept rows as (doc_id, source, n_tokens).
    *
    * Scale: the naive shape — one running-sum window per source — funnels
    * each source through ONE partition (the global-window trap, see
    * [[packSequences]]). Instead the priority space is pre-bucketed by its
    * top bits: a per-(source, bucket) token aggregate (tiny:
    * |sources|·1024 rows) gets a running sum over buckets, classifying
    * every bucket as fully-inside the budget, fully-outside, or THE
    * boundary bucket of its source; the corpus then keeps full buckets by
    * a plain join+filter and resolves boundary buckets with a running-sum
    * window partitioned by (source, BUCKET) — 1024-way parallel per
    * source, never one partition per source. Ordering by (bucket,
    * priority, key) equals ordering by (priority, key) because the bucket
    * is the priority's own top bits — so the result is bit-identical to
    * the single-window definition the oracle recomputes (including
    * zero-token rows sitting exactly at an exhausted budget: the boundary
    * class admits before == budget so the exact window can see them).
    *
    * Cost accounting: the tokenized 5-column projection has two consumers
    * with DIVERGENT prunings — the bucket aggregate reads (source,
    * graft_b, n_tokens), the join probe reads all five — so their
    * subplans de-canonicalize below the shared fan-out exchange and the
    * tokenize runs twice (the LayoutSpec-pinned divergent-consumer
    * caveat; no projection trick survives column pruning here). A run
    * where the tokenize dominates should pass `materializeDocs = true`
    * (MEMORY_AND_DISK persist of the narrow 5-column projection —
    * ~40 B/row, spill-safe; the spec pins that it collapses the two
    * pipelines onto one scan). It stays OFF by default because pinning a
    * corpus-sized frame is a deployment decision, not an operator
    * default; the caller owns the eventual `unpersist` — the cur2
    * `materializeKept` contract. The base carries the join's isNotNull
    * explicitly so constraint inference adds nothing one-sided (the q15
    * rule); NULL-source rows are excluded by that predicate — a keyed
    * fill has no budget line to charge them to.
    *
    * Precondition: `nTokens` must be non-negative — the two-phase bucket
    * classification equals the single-running-sum-window definition only
    * when the cumulative sum is MONOTONE, which a negative count breaks
    * (round-6 advice). A negative count is malformed upstream data, not a
    * budget line: such rows are excluded by the base predicate below, the
    * same treatment as a NULL source, so the operator degrades to
    * "ignore garbage" instead of silently diverging from its contract. */
  def tokenBudgetFill(df: DataFrame, source: Column, key: Column,
                      salt: String, nTokens: Column, budget: Long,
                      materializeDocs: Boolean = false): DataFrame = {
    require(budget >= 0)
    val docs0 = graft.core.Par.fanOut(
      df.select(key.cast("long").as("doc_id"),
          source.cast("string").as("source"),
          nTokens.cast("long").as("n_tokens"),
          hashBucket(key, salt, 1 << 20).as("graft_p"))
        .withColumn("graft_b", shiftright(col("graft_p"), 10)) // top 10 bits
        .where(col("source").isNotNull && col("graft_b").isNotNull
          && col("n_tokens") >= 0))
    val docs =
      if (materializeDocs)
        docs0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else docs0
    // per (source, bucket) token totals: |sources|·1024 groups
    val buckets = docs
      .groupBy(col("source").as("graft_src"), col("graft_b").as("graft_cb"))
      .agg(sum(col("n_tokens")).as("graft_btok"))
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(col("graft_src")).orderBy(col("graft_cb"))
    // running bucket totals over the TINY relation; before = exclusive cum
    val classed = buckets
      .withColumn("graft_cum", sum(col("graft_btok")).over(wb))
      .select(col("graft_src"), col("graft_cb"),
        (col("graft_cum") - col("graft_btok")).as("graft_before"),
        (col("graft_cum") <= budget).as("graft_full"),
        ((col("graft_cum") - col("graft_btok")) <= budget
          && col("graft_cum") > budget).as("graft_boundary"))
    // ONE join, ONE output-sized window: full-bucket rows pass the filter
    // unconditionally; boundary-bucket rows pass iff their exact running
    // sum (before + intra-bucket run) stays within budget. classed is
    // |sources|·1024 rows — no broadcast hint, AQE broadcasts while it fits
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"), col("graft_b"))
      .orderBy(col("graft_p"), col("doc_id"))
    docs.join(classed,
        col("source") === col("graft_src") && col("graft_b") === col("graft_cb"))
      .where(col("graft_full") || col("graft_boundary"))
      .withColumn("graft_run",
        col("graft_before") + sum(col("n_tokens")).over(win))
      .where(col("graft_full") || col("graft_run") <= budget)
      .select(col("doc_id"), col("source"), col("n_tokens"))
  }

  /** Train/val/test assignment: adds `bucket` (0-99) and `split` columns.
    * Buckets < trainPct → "train", < trainPct+valPct → "val", rest "test".
    * One codegen'd projection over the corpus — zero shuffles. */
  def withSplit(df: DataFrame, key: Column, salt: String,
                trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100)
    df.withColumn("bucket", hashBucket(key, salt))
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + valPct, lit("val"))
          .otherwise(lit("test")))
  }
}
