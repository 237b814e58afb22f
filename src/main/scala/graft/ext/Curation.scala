package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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

  /** QUALITY-FILTER THRESHOLD SWEEP — the tuning table BEFORE committing
    * to a curation cut ([[curate]]/[[sourceQuality]] apply ONE threshold
    * pair; a corpus team first wants the whole yield surface: "how many
    * documents and tokens survive at each candidate setting"). One corpus
    * scan computes integer (n_tokens, stopword-micro-ratio) per document;
    * the bounded literal grid (|minTokens|·|minStopMicro| cells) explodes
    * against it and a single hash-aggregate yields per-cell survivors,
    * surviving token mass and pass rate.
    *
    * Determinism: the stopword ratio is the TRUNCATING integer division
    * n_stop·10⁶ div n_tokens (never a float ratio compared against a
    * float threshold — the ewma1 half-boundary discipline); pass_rate is
    * one exact-long/exact-long double division, reproducible under any
    * partitioning. The tokenizer emits [""] for empty text, so n_tokens
    * ≥ 1 and the division is total.
    *
    * Scale: grid cells multiply the scan ROW COUNT, not its I/O — the
    * explode sits above the projection, partial aggregation collapses
    * per-task, and the group count is the grid size. */
  def thresholdSweep(docs: DataFrame, textCol: String,
                     minTokens: Seq[Long], minStopMicro: Seq[Long]): DataFrame = {
    require(minTokens.nonEmpty && minStopMicro.nonEmpty,
      "thresholdSweep needs a non-empty grid on both axes")
    val toks = graft.core.Par.fanOut(docs.select(col(textCol).as("text")))
      .select(TextAnalysis.tokens(col("text")).as("t"))
    val stats = toks.select(size(col("t")).cast("long").as("n_tokens"),
        size(filter(col("t"), x => x.isin(TextAnalysis.EnStop: _*)))
          .cast("long").as("n_stop"))
      .withColumn("swr_micro", call_function("div",
        col("n_stop") * lit(1000000L), col("n_tokens")))
    val grid = array((for { mt <- minTokens; ms <- minStopMicro } yield
      struct(lit(mt).as("mt"), lit(ms).as("ms"))): _*)
    val pass = col("n_tokens") >= col("g.mt") &&
      col("swr_micro") >= col("g.ms")
    stats.select(col("n_tokens"), col("swr_micro"), explode(grid).as("g"))
      .groupBy(col("g.mt").as("min_tokens"), col("g.ms").as("min_swr_micro"))
      .agg(sum(when(pass, 1L).otherwise(0L)).cast("long").as("n_docs_pass"),
        sum(when(pass, col("n_tokens")).otherwise(0L)).cast("long")
          .as("n_tokens_pass"),
        (sum(when(pass, 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("pass_rate"))
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

  /** 2-D PARETO FRONTIER (skyline) selection — multi-criteria curation
    * without collapsing criteria into one weighted score: keep every row
    * NOT strictly dominated, where q dominates p iff q.x > p.x AND
    * q.y > p.y (both criteria maximized; ties never dominate). The
    * frontier is the set of efficient quality/length (cost/coverage, …)
    * trade-offs — mix1/bud1 pick WITHIN a criterion, this picks ACROSS
    * criteria.
    *
    * Scale shape: the textbook O(n log n) skyline is one GLOBAL window
    * (sort by x, suffix-max of y) — the single-partition trap
    * [[Sampling.tokenBudgetFill]] documents. Instead x is coarsened into
    * `bucketWidth`-wide grid cells: a per-cell max(y) aggregate (rows =
    * x-range / width, a data-bounded few hundred) takes the suffix-max
    * window on that TINY relation only; every row then needs just (a) the
    * cross-cell screen — a higher cell's max beats my y (any member of a
    * strictly higher cell has strictly higher x, so this is exact) — and
    * (b) an intra-cell window partitioned BY CELL (grid-way parallel,
    * never one global partition) with a strict RANGE frame
    * `[x+1, ∞)` for same-cell dominators. Both tests together equal the
    * NOT EXISTS definition exactly; no screen-then-window staging is
    * needed (dominance is transitive, but computing both predicates in
    * one pass avoids relying on it). The cell join carries no broadcast
    * hint: cell count is a data property (AQE broadcasts while it fits —
    * the round-2 rule).
    *
    * Returns (doc_id, x, y), frontier members only. */
  def paretoFrontier(df: DataFrame, idCol: Column, xCol: Column,
                     yCol: Column, bucketWidth: Long = 256): DataFrame = {
    require(bucketWidth > 0)
    import org.apache.spark.sql.expressions.Window
    val base = df.select(idCol.cast("long").as("doc_id"),
        xCol.cast("long").as("x"), yCol.cast("long").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull)
      // floor-div grid cell; pmod-free because x >= 0 is not assumed:
      // floor(x / w) keeps cell order aligned with x order for negatives
      .withColumn("graft_cell", floor(col("x").cast("double") / bucketWidth)
        .cast("long"))
    val cellMax = base.groupBy("graft_cell").agg(max("y").as("graft_cy"))
    // suffix max over STRICTLY higher cells — tiny relation, the one
    // intentionally-global window (bud1's classed-buckets shape)
    val wCells = Window.orderBy(col("graft_cell"))
      .rangeBetween(1L, Window.unboundedFollowing)
    val hi = cellMax
      .withColumn("graft_hi", max(col("graft_cy")).over(wCells))
      .drop("graft_cy")
    // strict same-cell frame: dominators have x in [x+1, inf) of my cell
    val wIntra = Window.partitionBy("graft_cell").orderBy(col("x"))
      .rangeBetween(1L, Window.unboundedFollowing)
    base.join(hi, Seq("graft_cell"), "left")
      .withColumn("graft_in", max(col("y")).over(wIntra))
      .where((col("graft_hi").isNull || col("graft_hi") <= col("y"))
        && (col("graft_in").isNull || col("graft_in") <= col("y")))
      .select("doc_id", "x", "y")
  }

  /** GLOBAL ORDINALS without a single-reducer sort — every row gets its
    * 1-based rank in `sortCols` order (the export "stable id" step: shard
    * offsets, curriculum positions, resumable cursor keys). The naive
    * `row_number() OVER (ORDER BY …)` plans as ONE task holding the whole
    * table — the classic global-sort bottleneck; this is the two-phase
    * zipWithIndex shape expressed relationally: range-repartition on the
    * sort key (Spark's sampled range partitioner — partition i's keys all
    * precede partition i+1's), count rows per partition (ONE bounded
    * driver action: `numRanges` longs, cluster-sized state, never data-
    * sized), turn the exclusive prefix sums into a LITERAL map, and add
    * each partition's offset to its LOCAL row_number — a per-partition
    * window, no global exchange. The composite must be UNIQUE (pass a
    * tie-break column): equal keys co-locate under range partitioning, but
    * a non-unique order would make ranks partition-order-dependent.
    *
    * Output ordinals are INVARIANT to where the sampled range boundaries
    * land: ranges are contiguous in sort order, so offset + local rank is
    * the global rank for ANY boundary placement — the oracle states it as
    * the plain window. The input persists once (two consumers: the count
    * pass and the rank pass; the bounded count action doubles as the cache
    * materializer, the pr1 budget discipline) and stays resident after the
    * call — use [[globalOrdinalsManaged]] to release it once the result is
    * materialized. */
  def globalOrdinals(df: DataFrame, sortCols: Seq[Column],
                     numRanges: Int = 64): DataFrame =
    globalOrdinalsManaged(df, sortCols, numRanges)._1

  /** QUANTILE NORMALIZATION across groups — the batch-effect remover for
    * scores that mean different things per source (a quality classifier
    * trained per domain, review scores per marketplace): each row's value
    * is replaced by the POOLED distribution's value at the same quantile,
    * so every group's normalized distribution is the pooled one and
    * cross-group thresholds become comparable (the microarray-era
    * technique, Bolstad 2003, generalized to unequal group sizes by
    * integer target ranks ⌈r·N/n_g⌉ — the qq1 discipline: never
    * ceil(p·N) in floats). Emitted normalized values are ACTUAL data
    * values selected by exact integer ranks — engine-free determinism.
    *
    * Shape at scale: two [[globalOrdinals]] passes (range-partitioned
    * two-phase ranking — no single-reducer sort, and no per-group sort
    * either: a handful of giant groups would each land on ONE reducer
    * under a group-partitioned window, so within-group ranks derive from
    * the (group, value, id)-ordered GLOBAL ordinals minus per-group
    * offsets collected in one bounded |groups|-row action), then one
    * equi-join on the target rank. The row-sized result localCheckpoints
    * so both internal caches release before return (the qq1 contract);
    * integer bound: r·N — past ~3·10⁹ rows widen to DECIMAL(38,0)
    * (documented swap). */
  def quantileNormalize(df: DataFrame, id: Column, group: Column,
                        value: Column, numRanges: Int = 64,
                        maxGroups: Int = 4096): DataFrame = {
    // NULL values are excluded up front: the two engines disagree on NULL
    // sort position (Spark first, DuckDB last), so a null value would
    // silently shift every rank after it — the equiDepthHistogram lesson.
    // A null value has no quantile; callers impute first (imp1) if they
    // want nulls repaired.
    val base = df.select(id.as("id"), group.as("grp"), value.as("v"))
      .where(col("v").isNotNull && col("grp").isNotNull)
    val (og, relG) = globalOrdinalsManaged(base,
      Seq(col("grp"), col("v"), col("id")), numRanges)
    // Loud contract guard (round-10 verdict #2): the per-group offsets are
    // collected to the driver and inlined as map(...) PLAN LITERALS, so
    // both driver state and plan size grow with |groups| — correct only
    // for the documented FEW-GIANT-GROUPS shape. A high-cardinality group
    // column would kill a 100× run silently-slowly; fail loudly instead —
    // and BEFORE the unbounded collect (a limit-probed count, so the
    // guard itself can never OOM what it guards against).
    val gcAgg = og.groupBy("grp").agg(count(lit(1)).as("c"))
    // ONE bounded job does probe and fetch: orderBy+limit plans as
    // TakeOrderedAndProject (per-partition top-K, never a full sort
    // shuffle, driver result capped at maxGroups+1 rows regardless of
    // group cardinality), an overflowing row count trips the require,
    // and a passing collect already holds ALL groups in Spark's own
    // sort order — which the offset walk below must match, so no
    // driver-side re-sort (whose Ordering could diverge from Spark's,
    // e.g. UTF8-binary vs UTF-16 strings) is involved.
    val gc = gcAgg.orderBy("grp").limit(maxGroups + 1).collect()
    require(gc.length <= maxGroups,
      s"quantileNormalize: more than maxGroups=$maxGroups groups " +
        "— this operator inlines |groups|-sized plan literals and is built " +
        "for FEW GIANT groups; for high-cardinality groups use a " +
        "PARTITION BY grp window (percent_rank over Window.partitionBy) " +
        "instead, where each group fits a single reducer")
    var acc = 0L
    val offs = gc.map { r =>
      val o = (r.get(0), acc, r.getLong(1)); acc += r.getLong(1); o
    }
    val n = acc
    val offMap = map(offs.flatMap(t =>
      Seq(lit(t._1), lit(t._2))).toIndexedSeq: _*)
    val cntMap = map(offs.flatMap(t =>
      Seq(lit(t._1), lit(t._3))).toIndexedSeq: _*)
    val ranked = og.select(col("id"), col("grp"), col("v"),
        (col("ordinal") - element_at(offMap, col("grp"))).as("r"),
        element_at(cntMap, col("grp")).as("ng"))
      .withColumn("t", call_function("div",
        col("r") * lit(n) + col("ng") - lit(1L), col("ng")))
    val (op, relP) = globalOrdinalsManaged(base,
      Seq(col("v"), col("id")), numRanges)
    val pooled = op.select(col("ordinal").as("t"), col("v").as("norm_v"))
    val res = ranked.join(pooled, "t")
      .select(col("id"), col("grp"), col("v"), col("norm_v"))
      .localCheckpoint()
    relG(); relP()
    res
  }

  /** [[globalOrdinals]] plus an explicit RELEASE handle for the internal
    * range-partitioned cache: the rank pass necessarily persists its
    * repartitioned input (two consumers — the bounded count pass and the
    * window pass), and the bare [[globalOrdinals]] leaves that cache
    * resident for library callers outside the bench's per-query
    * clearCache. Callers that materialize the result (qq1 consumes both
    * sides into a (splits−1)-row checkpoint) invoke the handle to free
    * the partitions; calling it before the result is fully consumed
    * forces a recompute of the repartition, nothing worse. */
  def globalOrdinalsManaged(df: DataFrame, sortCols: Seq[Column],
                            numRanges: Int = 64): (DataFrame, () => Unit) = {
    val (ranked, _, release) = globalOrdinalsCounted(df, sortCols, numRanges)
    (ranked, release)
  }

  /** [[globalOrdinalsManaged]] plus the TOTAL row count that the internal
    * bounded collect already holds — callers that need n (NTILE bucket
    * arithmetic in rfm1, quantile target ranks) read it here instead of
    * paying a second count action over the cache (guide §1.2 job count). */
  def globalOrdinalsCounted(df: DataFrame, sortCols: Seq[Column],
                            numRanges: Int = 64)
      : (DataFrame, Long, () => Unit) = {
    import org.apache.spark.sql.expressions.Window
    require(sortCols.nonEmpty && numRanges >= 1)
    val parted = df.repartitionByRange(numRanges, sortCols: _*)
      .withColumn("graft_pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = parted.groupBy("graft_pid").agg(count(lit(1)).as("c"))
      .orderBy("graft_pid").collect()
    var acc = 0L
    val offs = counts.map { r =>
      val o = (r.getInt(0), acc); acc += r.getLong(1); o
    }
    val offMap = map(offs.flatMap { case (p, o) =>
      Seq(lit(p), lit(o)) }.toIndexedSeq: _*)
    val w = Window.partitionBy("graft_pid").orderBy(sortCols: _*)
    val ranked = parted
      .withColumn("ordinal",
        element_at(offMap, col("graft_pid")) + row_number().over(w))
      .drop("graft_pid")
    (ranked, acc, () => { parted.unpersist(); () })
  }
}
