package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Dedup
import graft.queries.Stats

/** Round-7 pins: the round-6 ADVICE items.
  *
  *  - inc2s LSH recall margin: the graded fuzzy-ingest row holds only
  *    while no corpus pair sits in the band-miss / hash-collision flake
  *    zone around the 0.7 threshold — this spec MEASURES that margin on
  *    the graded fixture so a testdata regeneration that lands a
  *    borderline pair fails HERE with the offending J values, not as an
  *    opaque oracle hash mismatch.
  *  - Stats.bivariate centered two-pass: bit-identical to the one-pass
  *    identities (shift invariance is exact in integer arithmetic), and
  *    it survives magnitudes where the one-pass moments overflow
  *    DECIMAL(38) into an ANSI error.
  */
class Round7Spec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"
  private val sf = "/root/testdata/sf0.001"

  test("inc2s fixture: no corpus pair sits in the LSH flake zone around J = 0.7") {
    // the inc2s planted fixture, rebuilt verbatim (SparkEntry keeps its
    // builder private): every doc plus a copy with one appended token
    val docs = Tables.documents(spark, sf001).select("doc_id", "text")
    val pu = docs.agg(max(col("doc_id"))).head.getLong(0) / 3 * 3 + 4
    val planted = docs.union(docs.select((col("doc_id") + pu).as("doc_id"),
      concat(col("text"), lit(" graftdup")).as("text")))
    // ALL candidate pairs (shared-shingle blocking is lossless for J > 0)
    // down to J = 0.6 — a superset of every batch-vs-archive pair inc2s
    // can ever verify
    val pairs = Dedup.ngramJaccardPairs(planted, "doc_id", "text",
        minJaccard = 0.6)
      .select(col("j")).as[Double](org.apache.spark.sql.Encoders.scalaDouble)
      .collect()
    val below = pairs.filter(_ < 0.7)
    val above = pairs.filter(_ >= 0.7)
    // hash-collision zone: a 32-bit shingle collision can perturb the
    // engine's hashed-shingle J by ~1/|union| relative to the oracle's
    // raw-string J — a pair just UNDER the threshold could cross it.
    // The fixture must keep a clear gap under 0.7.
    val nearestBelow = if (below.isEmpty) 0.0 else below.max
    assert(nearestBelow < 0.695,
      f"pair at J = $nearestBelow%.4f is within hash-collision reach of the " +
        "0.7 gate — regenerated testdata landed a borderline pair")
    // band-miss risk: P[all 32 bands of 4 miss] = (1 - J^4)^32 per
    // qualifying pair; the summed expectation over every pair the gate
    // must catch stays well under 1% per run
    val risk = above.map(j => math.pow(1 - math.pow(j, 4), 32)).sum
    assert(risk < 0.005,
      f"summed LSH band-miss expectation $risk%.5f too high " +
        f"(${above.length} pairs >= 0.7, min J = ${above.min}%.4f)")
    info(f"margin: nearest miss J = $nearestBelow%.4f, " +
      f"lowest qualifying J = ${above.min}%.4f over ${above.length} pairs, " +
      f"band-miss expectation = $risk%.2e")
  }

  test("bivariate centered two-pass ≡ one-pass, bit for bit") {
    val li = Tables.lineitem(spark, sf)
    def run(centered: Boolean) =
      Stats.bivariate(li, Seq("l_returnflag"), col("l_quantity"),
          col("l_extendedprice"), scale = 2, centered = centered)
        .orderBy("l_returnflag")
        .collect().toSeq
    assert(run(centered = true) == run(centered = false))
  }

  test("bivariate centered survives magnitudes that overflow the one-pass moments") {
    import spark.implicits._
    // x ≈ 3e15 with small deviations: Σx² ≈ 9e34 still fits DECIMAL(38),
    // but the one-pass identity's n·Σx² ≈ 9e38 overflows → ANSI error;
    // the centered pass works off deviations (≤ 5e3) and sails through
    val big = spark.range(0, 10000L, 1, 4)
      .select(lit("g").as("grp"),
        (lit(3.0e15) + ($"id" % 997).cast("double")).as("x"),
        ($"id" % 31).cast("double").as("y"))
    intercept[Exception] {
      Stats.bivariate(big, Seq("grp"), $"x", $"y", scale = 0).collect()
    }
    val r = Stats.bivariate(big, Seq("grp"), $"x", $"y", scale = 0,
      centered = true).collect()
    assert(r.length == 1 && r.head.getLong(1) == 10000L)
    val corr = r.head.getDouble(2)
    assert(!corr.isNaN && math.abs(corr) <= 1.0)
  }

  test("rocAuc: separation, inversion, and midrank tie handling") {
    import spark.implicits._
    def auc(rows: Seq[(Long, Boolean)]): Double =
      ext.Eval.rocAuc(rows.toDF("s", "l").withColumn("g", lit("g")),
        Seq("g"), $"s", $"l").collect().head.getDouble(3)
    // perfect separation → 1.0; perfect inversion → 0.0
    assert(auc(Seq((1L, false), (2L, false), (3L, true), (4L, true))) == 1.0)
    assert(auc(Seq((4L, false), (3L, false), (1L, true), (2L, true))) == 0.0)
    // all scores tied → midranks make AUC exactly 0.5
    assert(auc(Seq((7L, false), (7L, true), (7L, false), (7L, true))) == 0.5)
    // hand case with a cross-class tie: scores 1,2,2,3 labels F,F,T,T —
    // pairs: (1,2)=1, (1,3)=1, (2,2)=0.5, (2,3)=1 → U=3.5, AUC=3.5/4
    assert(auc(Seq((1L, false), (2L, false), (2L, true), (3L, true))) == 0.875)
    // degenerate single-class group → NULL (try_divide contract)
    val r = ext.Eval.rocAuc(Seq((1L, true), (2L, true)).toDF("s", "l")
        .withColumn("g", lit("g")), Seq("g"), $"s", $"l").collect().head
    assert(r.isNullAt(3))
  }

  test("sourceTokenKl: zero against itself, non-negative in general") {
    import spark.implicits._
    // single source ⇒ P = Q ⇒ every per-term contribution is ln(1) = 0
    val one = Seq((1L, "a b c a", "s0"), (2L, "b c d", "s0"))
      .toDF("doc_id", "text", "source")
    val k0 = ext.TextAnalysis.sourceTokenKl(one, "text", "source")
      .select("kl").as[Double].collect()
    assert(k0.toSeq == Seq(0.0), k0.toSeq.toString)
    // Gibbs: KL ≥ 0 for every source (up to the 1e-6 quantization grain)
    val kls = ext.TextAnalysis.sourceTokenKl(
        Tables.documents(spark, sf), "text", "source")
      .select("kl").as[Double].collect()
    assert(kls.nonEmpty && kls.forall(_ >= -1e-5), kls.toSeq.toString)
  }

  test("bm25TopK: term-matching docs outrank partial matches; absent terms score nothing") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join table spark join"), // all three query terms, repeated
      (2L, "spark filter filter filter"),  // one query term
      (3L, "sort merge hash"),             // zero query terms for q0
      (4L, "spark join table")).toDF("doc_id", "text")
    val out = ext.Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq(0 -> Seq("spark", "join", "table")), k = 4)
      .select("doc_id", "rk").as[(Long, Long)].collect().toMap
    // doc 3 shares no term → absent from the ranking entirely
    assert(!out.contains(3L), out.toString)
    // full-coverage docs beat the single-term doc
    assert(out(1L) < out(2L) && out(4L) < out(2L), out.toString)
  }

  test("tokenBudgetFill ignores malformed negative token counts") {
    import spark.implicits._
    // contract guard (round-6 advice): a negative count breaks the
    // monotone-cum precondition; the operator must EXCLUDE such rows —
    // same treatment as a NULL source — not silently diverge
    val rows = Seq((1L, "web", 10L), (2L, "web", -5L), (3L, "web", 10L),
      (4L, "web", 10L)).toDF("doc_id", "src", "n_tokens")
    val kept = graft.ext.Sampling.tokenBudgetFill(rows, $"src", $"doc_id",
        "s7", $"n_tokens", budget = 20L)
      .select("doc_id").as[Long].collect().toSet
    assert(!kept.contains(2L), s"negative-count row must be excluded: $kept")
    // budget accounting over the remaining rows only: exactly two of the
    // three valid 10-token docs fit the 20-token budget
    assert(kept.size == 2, s"got $kept")
  }
}
