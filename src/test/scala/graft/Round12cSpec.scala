package graft

import org.apache.spark.sql.functions._

/** Round-12c pins — property guarantees of the second round-12 operator
  * wave, beyond their value oracles:
  *  - winnowing's SELECTION guarantee (Schleimer et al. 2003): any shared
  *    token run of length ≥ w + k − 1 shares at least one selected
  *    fingerprint — including when the shared passage sits at a DIFFERENT
  *    position in each document (the robustness stride sampling lacks).
  *  - Cohen's kappa closed-form anchors: a hand-built 2×2 with known
  *    κ = 0.6, perfect agreement → exactly 10⁶ micro, a constant
  *    annotator pair (pe = 1) → NULL, not a division error.
  *  - cov1's coverage curve is monotone in V and properly bounded.
  */
class Round12cSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("winnowing: a shared run of ≥ w+k−1 tokens shares a fingerprint, " +
    "position-shifted") {
    val shared = (5 to 16).map(i => s"a$i").mkString(" ") // 12-token run
    val docA = ((1 to 4).map(i => s"a$i") ++ (5 to 16).map(i => s"a$i") ++
      (17 to 20).map(i => s"a$i")).mkString(" ")
    val docB = (1 to 7).map(i => s"j$i").mkString(" ") + " " + shared
    val docC = (1 to 12).map(i => s"z$i").mkString(" ") // unrelated
    val df = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val pairs = ext.Dedup.winnowingCandidates(df, "doc_id", "text",
        k = 5, w = 4, maxDf = 10, minShared = 1L, topK = 20)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)),
      "the w+k−1 selection guarantee: shifted shared passage must match")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "an unrelated document must not pair")
  }

  test("cohensKappa: closed-form anchors, perfect agreement, degenerate pe") {
    def mk(n11: Int, n00: Int, n10: Int, n01: Int) =
      (Seq.fill(n11)((true, true)) ++ Seq.fill(n00)((false, false)) ++
        Seq.fill(n10)((true, false)) ++ Seq.fill(n01)((false, true)))
        .map { case (a, b) => ("g", a, b) }.toDF("g", "a", "b")
    // po = 0.8, pe = 0.5 → κ = 0.6 exactly
    val r1 = ext.Eval.cohensKappa(mk(40, 40, 10, 10), Seq("g"),
      col("a"), col("b")).head()
    assert(r1.getAs[Long]("po_micro") == 800000L)
    assert(r1.getAs[Long]("pe_micro") == 500000L)
    assert(r1.getAs[Long]("kappa_micro") == 600000L)
    // perfect agreement with both classes present → κ = 1 exactly
    val r2 = ext.Eval.cohensKappa(mk(30, 70, 0, 0), Seq("g"),
      col("a"), col("b")).head()
    assert(r2.getAs[Long]("kappa_micro") == 1000000L)
    // constant annotators → pe = 1 → NULL (an answer, not an error)
    val r3 = ext.Eval.cohensKappa(mk(25, 0, 0, 0), Seq("g"),
      col("a"), col("b")).head()
    assert(r3.isNullAt(r3.fieldIndex("kappa_micro")))
  }

  test("batchDriftKl: same-distribution batch scores far below a shifted one") {
    val baseDocs = (1 to 40).map(i =>
      (i.toLong, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val dir = tmpDir("qm1-drift") + "/baseline"
    ext.TextAnalysis.writeTokenBaseline(baseDocs, "text", dir)
    // identity anchor: a batch with EXACTLY the baseline's distribution
    // AND size has cp = cq and np = nq bucket-for-bucket, so every
    // smoothed term cancels — KL is 0.0 exactly, not merely small
    // (smaller same-distribution batches score ABOVE zero by the
    // smoothing-scale mismatch alone; the monitor compares batches of
    // like size against the threshold, or normalizes np)
    val klSame = ext.TextAnalysis.batchDriftKl(
      baseDocs, "text", dir).head().getAs[Double]("kl")
    val shifted = (1 to 10).map(i =>
      (i.toLong, "omega psi chi phi upsilon tau")).toDF("doc_id", "text")
    val klShift = ext.TextAnalysis.batchDriftKl(shifted, "text", dir)
      .head().getAs[Double]("kl")
    assert(klSame == 0.0, s"identical batch must score exactly 0, got $klSame")
    assert(klShift > 0.5, s"full vocabulary shift must score high, got $klShift")
  }

  test("qm1s sink discipline: re-running a batch id rewrites, not duplicates") {
    val docs = (1 to 20).map(i =>
      (i.toLong, "alpha beta gamma delta")).toDF("doc_id", "text")
    val root = tmpDir("qm1-idem")
    ext.TextAnalysis.writeTokenBaseline(docs, "text", s"$root/baseline")
    def writeBatch(): Unit =
      ext.TextAnalysis.batchDriftKl(docs.limit(5), "text", s"$root/baseline")
        .select(lit(0L).as("batch_id"), col("n_tokens"), col("kl"))
        .coalesce(1).write.mode("overwrite").parquet(s"$root/results/batch=0")
    writeBatch(); writeBatch() // at-least-once retry of the same batch id
    assert(spark.read.parquet(s"$root/results/batch=0").count() == 1L,
      "batch-keyed overwrite: the retry rewrites the row, never duplicates")
  }

  test("kcenterGonzalez: centers self-assign at distance 0, farthest-first") {
    // three tight groups far apart + k = 3: farthest-first must pick one
    // vector from each group, and every center row assigns to itself
    val rows = (0 until 9).map { i =>
      val base = (i / 3) * 100.0
      (i.toLong, Array(base + i % 3 * 0.01, base - i % 3 * 0.01))
    }
    val df = rows.toDF("vec_id", "embedding")
    val out = ext.Clustering.kcenterGonzalez(df, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val centers = out.map(_._2).distinct.sorted
    assert(centers.length == 3, "three distinct centers")
    assert(centers.contains(0L), "the first center is the lowest id")
    assert(centers.map(_ / 3).toSet.size == 3,
      "farthest-first picks one center per well-separated group")
    out.filter(t => centers.contains(t._1)).foreach { case (id, cid, d2) =>
      assert(cid == id && d2 == 0L, s"center $id must self-assign at 0")
    }
    out.foreach { case (id, cid, _) =>
      assert(id / 3 == cid / 3, "every vector assigns within its group")
    }
  }

  test("sourceTokenJsd: zero on identity, bounded by ln 2") {
    // single source: P = Q term-for-term, every log ratio is ln 1 —
    // jsd is 0.0 EXACTLY (the absent-mass block is empty too)
    val one = Seq((1L, "s", "alpha beta gamma"), (2L, "s", "beta gamma delta"))
      .toDF("doc_id", "source", "text")
    val j0 = ext.TextAnalysis.sourceTokenJsd(one, "text", "source")
      .head().getAs[Double]("jsd")
    assert(j0 == 0.0, s"identity must score exactly 0, got $j0")
    // two disjoint-vocabulary sources: both bounded by ln 2, both > 0
    val two = Seq((1L, "s1", "alpha beta gamma alpha"),
      (2L, "s2", "omega psi chi omega")).toDF("doc_id", "source", "text")
    val js = ext.TextAnalysis.sourceTokenJsd(two, "text", "source")
      .collect().map(_.getAs[Double]("jsd"))
    js.foreach { j =>
      assert(j > 0.0 && j <= math.log(2.0) + 1e-6,
        s"JSD must sit in (0, ln 2], got $j")
    }
  }

  test("cov1: coverage monotone in V, bounded, covered ≤ total") {
    val rows = SparkEntry.queries("cov1_vocab_coverage_curve")(spark, sf)
      .orderBy("v").collect()
    assert(rows.length == 4)
    val cov = rows.map(_.getAs[Long]("coverage_micro"))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b },
      "coverage must be monotone nondecreasing in V")
    rows.foreach { r =>
      assert(r.getAs[Long]("covered") <= r.getAs[Long]("total"))
      assert(r.getAs[Long]("coverage_micro") <= 1000000L)
    }
  }
}
