package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus curation: the composition every training-data pipeline
  * runs before tokenization — quality filter → exact dedup → deterministic
  * split assignment — expressed as ONE declarative plan so Catalyst fuses
  * the projections and the corpus is read once.
  *
  * Stage shapes (100 TB):
  *  - quality stats + fingerprint: pure codegen'd projection, no shuffle;
  *  - the quality filter runs BEFORE the dedup shuffle, so rejected docs
  *    never shuffle at all;
  *  - exact dedup: one hash-aggregate on the 16-hex-char fingerprint
  *    (map-side combine collapses each partition's duplicates first);
  *  - split assignment: salted-hash projection, stable across runs,
  *    engines and repartitioning (see [[Sampling]]).
  */
object Curation {

  /** Curate `docs`: drop low-quality documents (token count below
    * `minTokens` or stopword ratio below `minStopwordRatio` — the classic
    * gibberish/boilerplate screens), keep ONE copy of each distinct
    * normalized text (minimum id wins, for reproducibility), and assign
    * the surviving docs to train/val/test splits. Returns
    * (doc_id, n_tokens, bucket, split), one row per kept document.
    *
    * Duplicate copies share the text, hence every per-text stat — so plain
    * `min` aggregates pick the keeper's values without a join-back. */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             minTokens: Long = 20, minStopwordRatio: Double = 0.04,
             salt: String = "graft"): DataFrame = {
    // fan out BEFORE the compute-bound stage (tokenize + stats + sha256):
    // a few large input files must not serialize the scoring onto a few
    // cores (repo invariant; same shape as exactDedup)
    val stats = TextAnalysis.withTextStats(graft.core.Par.fanOut(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))))
      .where(col("n_tokens") >= minTokens &&
        col("stopword_ratio") >= minStopwordRatio)
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
    val kept = stats.groupBy("fp")
      .agg(min(col("doc_id")).as("doc_id"), min(col("n_tokens")).as("n_tokens"))
    Sampling.withSplit(kept, col("doc_id"), salt)
      .select(col("doc_id"), col("n_tokens"), col("bucket"), col("split"))
  }

  /** Per-SOURCE quality dashboard — the monitoring aggregate a curation
    * pipeline keeps per ingest feed: document count, average length,
    * average stopword ratio, and the share of documents that would survive
    * [[curate]]'s quality filter (same thresholds, so the dashboard
    * predicts the filter's yield per source). A feed whose pass rate
    * collapses is broken upstream — this is how that is caught before a
    * full curation run.
    *
    * Scale: one projection pass + one hash-aggregate with group count =
    * number of sources; token-count averages sum exact longs, ratio
    * averages go through exact decimal ([[graft.core.Num.davg]]) so both
    * are reproducible under any partitioning. */
  def sourceQuality(docs: DataFrame, sourceCol: String, textCol: String,
                    minTokens: Long = 20,
                    minStopwordRatio: Double = 0.04): DataFrame = {
    val stats = TextAnalysis.withTextStats(graft.core.Par.fanOut(
      docs.select(col(sourceCol).as("source"), col(textCol).as("text"))))
    stats.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        (sum(col("n_tokens")).cast("double") / count(lit(1))).as("avg_tokens"),
        graft.core.Num.davg(col("stopword_ratio")).as("avg_stopword_ratio"),
        sum(when(col("n_tokens") >= minTokens &&
            col("stopword_ratio") >= minStopwordRatio, 1L).otherwise(0L))
          .cast("long").as("n_quality_pass"))
      .withColumn("pass_rate",
        col("n_quality_pass").cast("double") / col("n_docs"))
  }

  /** FUZZY curation: [[curate]]'s quality filter → exact dedup, then a
    * NEAR-duplicate collapse — pair detection via `pairFinder` (default:
    * MinHash-LSH, [[Dedup.minhashLshPairs]]) followed by
    * [[Dedup.clusterRoots]] — keeps one doc (the minimum id of each
    * near-dup cluster) and drops the rest, then assigns splits. The full
    * pipeline a web-scale corpus actually runs: exact dedup alone leaves
    * every boilerplate-perturbed copy in the training set.
    *
    * Stage shapes (100 TB): quality+fingerprint are one fan-out projection;
    * exact dedup one hash-aggregate; the LSH pair stage reads the deduped
    * corpus once (single-pass shingle pipeline); cluster collapse iterates
    * over the pair list, which is output-sized (≪ corpus); the final drop
    * is a left-anti join against that small drop set — AQE broadcasts it
    * while it fits, per the repo broadcast policy.
    *
    * Cost accounting: `kept` has two consumers with DIVERGENT prunings
    * (the pair finder reads (doc_id, text); the survivor join reads
    * (doc_id, n_tokens)), so its subplans diverge and the quality+dedup
    * stage runs twice (no exchange reuse across divergent projections —
    * the caveat LayoutSpec pins). A run where input re-reads dominate
    * should materialize the deduped corpus between the stages — pass
    * `materializeKept = true` (MEMORY_AND_DISK persist of the deduped
    * corpus; spill-safe, and ExtSpec pins that it collapses the two
    * divergent pipelines onto one scan). It stays OFF by default because
    * pinning a corpus-sized frame is a deployment decision (cluster cache
    * capacity), not an operator default; the caller owns the eventual
    * `unpersist`. */
  def curateFuzzy(docs: DataFrame, idCol: String, textCol: String,
                  minTokens: Long = 20, minStopwordRatio: Double = 0.04,
                  salt: String = "graft",
                  materializeKept: Boolean = false,
                  stripSpans: Boolean = false, stripSpanLen: Int = 20,
                  pairFinder: (DataFrame, String, String) => DataFrame =
                    Dedup.minhashLshPairs(_, _, _)): DataFrame = {
    // optional span-removal pre-stage (ds2, [[Dedup.stripSharedSpans]]):
    // clip cross-doc boilerplate spans BEFORE quality scoring, so length /
    // stopword stats and the dedup fingerprint see the clipped text — a
    // doc that is boilerplate + thin content is then judged (and deduped)
    // on the content alone. The strip output arrives from a doc-keyed
    // join, already distributed, so the fan-out exchange is skipped.
    val src0 = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val src =
      if (stripSpans)
        Dedup.stripSharedSpans(src0, "doc_id", "text", n = stripSpanLen)
          .select(col("doc_id"), col("kept_text").as("text"))
      else graft.core.Par.fanOut(src0)
    val stats = TextAnalysis.withTextStats(src)
      .where(col("n_tokens") >= minTokens &&
        col("stopword_ratio") >= minStopwordRatio)
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
    // min(text) not first(text): texts in an fp-group share the NORMALIZED
    // token stream but may differ raw (case/whitespace); min is the
    // deterministic representative for the shingling stage
    val kept0 = stats.groupBy("fp")
      .agg(min(col("doc_id")).as("doc_id"), min(col("n_tokens")).as("n_tokens"),
        min(col("text")).as("text"))
    val kept =
      if (materializeKept)
        kept0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else kept0
    val pairs = pairFinder(kept, "doc_id", "text")
    val drops = Dedup.clusterRoots(pairs)
      .where(col("root") =!= col("id"))
      .select(col("id").as("doc_id"))
    val survivors = kept.join(drops, Seq("doc_id"), "left_anti")
    Sampling.withSplit(survivors, col("doc_id"), salt)
      .select(col("doc_id"), col("n_tokens"), col("bucket"), col("split"))
  }

  /** Engine-portable host pattern: scheme, then everything up to the first
    * slash or whitespace — capture group 1 is the host. Same RE2-safe
    * character-class style as the t7 redaction patterns. */
  val UrlHostRe = "https?://([^/\\s]+)"

  /** URL-domain screen — the web-corpus provenance filter (block spam /
    * SEO / adult domains before any content-level scoring): extract each
    * document's FIRST URL's host, drop documents whose host is on the
    * blocklist; URL-free documents pass. The blocklist is bounded BY
    * DEFINITION (a curated list, not data-derived) — the one relation the
    * broadcast policy always allows — and membership is a broadcast LEFT
    * ANTI join, so the corpus never shuffles. Returns (doc_id, host) for
    * surviving docs ('' for URL-free). */
  def domainFilter(docs: DataFrame, idCol: String, textCol: String,
                   blocklist: Seq[String]): DataFrame = {
    val hosts = docs.select(col(idCol).as("doc_id"),
      regexp_extract(col(textCol), UrlHostRe, 1).as("host"))
    val spark = docs.sparkSession
    import spark.implicits._
    val block = blocklist.toDF("blocked_host")
    hosts.join(broadcast(block), col("host") === col("blocked_host"), "left_anti")
  }
}
