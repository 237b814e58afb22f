package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline: exact (content
  * hash), n-gram-Jaccard near-dup with inverted-index blocking, MinHash+LSH,
  * SimHash, all as declarative Spark plans.
  *
  * Scale design (100 TB corpus):
  *  - Exact dedup is one hash-aggregate: map-side combine collapses each
  *    partition to its distinct hashes before the shuffle.
  *  - All-pairs similarity is O(n²) and never acceptable; both near-dup
  *    paths reduce the candidate space first — inverted-index blocking
  *    (pairs must share a shingle) or LSH banding (pairs must collide in a
  *    band). The verify step then computes exact Jaccard ONLY on candidates.
  *  - Shingle explosion is bounded by `maxShingleDocFreq`: shingles
  *    occurring in more than N docs are "stop-shingles" and removed from
  *    the index (a shingle shared by 10⁶ docs would create 10¹² candidate
  *    pairs while carrying no signal). Planted near-dups share many rare
  *    shingles, so recall is unaffected.
  */
object Dedup {

  /** Word n-gram shingle set (distinct) of a text column; empty array when
    * the document has fewer than n tokens. */
  def shingles(text: Column, n: Int = 3): Column = {
    val t = TextAnalysis.tokens(text)
    when(size(t) >= n,
      array_distinct(transform(sequence(lit(1), size(t) - (n - 1)),
        i => array_join(slice(t, i, lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup by content hash: one row per distinct normalized text with
    * the kept (minimum) id and the duplicate count. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("content_fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact Jaccard between two shingle-array columns, in double space. */
  private def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - size(array_intersect(a, b)))
  }

  /** Near-duplicate pairs by n-gram Jaccard with inverted-index blocking:
    * candidates = id pairs sharing ≥1 (non-stop) shingle; output = candidates
    * whose exact shingle-Jaccard ≥ `minJaccard`. Returns (id_a, id_b, j).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, minJaccard: Double = 0.7,
                        maxShingleDocFreq: Option[Long] = None): DataFrame = {
    val sh = graft.core.Par.fanOut(
      df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh")))
    val sizes = sh.select(col("id"), size(col("sh")).as("sz"))
    val inv0 = sh.select(col("id"), explode(col("sh")).as("s"))
    maxShingleDocFreq match {
      case None =>
        // Count-based Jaccard straight off the inverted index: the postings
        // self-join yields |A∩B| as a plain count per pair — no shingle
        // arrays ever travel through the join, the shuffle carries only
        // (id_a, id_b) pairs, and |A|/|B| attach as two scalar lookups.
        val shared = inv0.as("x").join(inv0.as("y"),
            col("x.s") === col("y.s") && col("x.id") < col("y.id"))
          .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
          .agg(count(lit(1)).as("c"))
        shared
          .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), "id_a")
          .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), "id_b")
          .select(col("id_a"), col("id_b"),
            (col("c").cast("double") / (col("sz_a") + col("sz_b") - col("c"))).as("j"))
          .where(col("j") >= minJaccard)
      case Some(maxDf) =>
        // Stop-shingle path: candidates come from the PRUNED index (bounded
        // fan-out), but Jaccard must still be exact over the full shingle
        // sets — verify just the candidate pairs against the arrays.
        val ok = inv0.groupBy("s").agg(count(lit(1)).as("df"))
          .where(col("df") <= maxDf).select("s")
        val inv = inv0.join(ok, "s")
        val cand = inv.as("x").join(inv.as("y"),
            col("x.s") === col("y.s") && col("x.id") < col("y.id"))
          .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
          .distinct()
        cand
          .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
          .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
          .select(col("id_a"), col("id_b"),
            jaccard(col("sh_a"), col("sh_b")).as("j"))
          .where(col("j") >= minJaccard)
    }
  }

  /** MinHash signature: `numHashes` independent permutations approximated by
    * seeded xxhash64; sig[i] = min over shingles of xxhash64(i, shingle). */
  def minhashSignature(sh: Column, numHashes: Int = 128): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(sh, s => xxhash64(i, s))))

  /** MinHash + LSH banding near-dup pairs, exact-verified.
    *
    * numHashes=128, bands=32 (rows r=4): P(candidate | J) = 1-(1-J⁴)³².
    * At J=0.8 recall ≈ 1-4.6e-7; at J=0.3 candidate rate ≈ 2.3e-2 — a sharp
    * threshold around J≈0.5. Candidates are then verified with exact
    * Jaccard, so precision is exact; only recall is probabilistic.
    * Returns (id_a, id_b, j) with j ≥ minJaccard.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3, numHashes: Int = 128, bands: Int = 32,
                      minJaccard: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sh = graft.core.Par.fanOut(
      df.select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
        .where(size(col("sh")) > 0))
    val sig = sh.select(col("id"), minhashSignature(col("sh"), numHashes).as("sig"))
    val banded = sig.select(col("id"), posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          b => hash(slice(col("sig"), b * r + 1, lit(r))))).as(Seq("band", "bh")))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("j"))
      .where(col("j") >= minJaccard)
  }

  /** 64-bit SimHash over whitespace tokens: bit b of the fingerprint is the
    * sign of Σ_tokens (±1 depending on bit b of xxhash64(token)). */
  def simhash(text: Column): Column = {
    val t = TextAnalysis.tokens(text)
    val votes = aggregate(
      t,
      array_repeat(lit(0L), 64),
      (acc, tok) => {
        val h = xxhash64(tok)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, b) => a + when(call_function("shiftright", h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      })
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, b) => when(v > 0, call_function("shiftleft", lit(1L), b)).otherwise(0L)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on 4×16-bit chunks (pigeonhole: any pair
    * with hamming ≤ 3 shares at least one chunk), verify hamming ≤ maxDist.
    * Returns (id_a, id_b, dist). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxDist: Int = 3): DataFrame = {
    val fp = graft.core.Par.fanOut(
      df.select(col(idCol).as("id"), simhash(col(textCol)).as("fp")))
    val chunked = fp.select(col("id"), col("fp"), posexplode(
        transform(sequence(lit(0), lit(3)),
          c => call_function("shiftright", col("fp"), c * 16).bitwiseAND(lit(0xffffL))))
        .as(Seq("chunk", "ck")))
    chunked.as("x").join(chunked.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ck") === col("y.ck") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        hamming64(col("x.fp"), col("y.fp")).as("dist"))
      .distinct()
      .where(col("dist") <= maxDist)
  }

  /** Embedding-cosine near-dup pairs above a similarity threshold.
    * Brute-force all-pairs — correct at test scale; at corpus scale feed
    * LSH-bucketed candidates (Similarity.hyperplaneBucket) instead. */
  def embeddingNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                            minCos: Double): DataFrame = {
    // norms once per vector, not per pair; fan the pair loop out to all cores
    val v = graft.core.Par.fanOut(df.select(col(idCol).as("id"),
      Similarity.toDoubleArr(col(vecCol)).as("v"),
      Similarity.l2norm(col(vecCol)).as("nrm")))
    v.as("x").join(v.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        (Similarity.dot(col("x.v"), col("y.v")) / (col("x.nrm") * col("y.nrm"))).as("cos"))
      .where(col("cos") >= minCos)
  }
}
