package graft

import org.apache.spark.sql.functions._
import graft.functions.Bloom
import graft.ext.Dedup

/** Round-6 second batch: bloom-filter membership sketch + bloom-pruned
  * incremental dedup. */
class Round6bSpec extends SparkSpec {
  import spark.implicits._

  test("Bloom kernel: no false negatives, merge is exact union") {
    val bits = 1 << 12
    val k = 5
    val inserted = (0L until 500L).map(i => i * 0x9e3779b97f4a7c15L + i)
    val a = new Array[Byte](bits / 8)
    inserted.foreach(x => Bloom.add(a, x, k))
    assert(inserted.forall(x => Bloom.mightContain(a, x, k)),
      "an inserted key must always probe true")
    // merge(bloom(A), bloom(B)) == bloom(A ∪ B), byte for byte
    val (ha, hb) = inserted.splitAt(250)
    val ba = new Array[Byte](bits / 8)
    val bb = new Array[Byte](bits / 8)
    ha.foreach(x => Bloom.add(ba, x, k))
    hb.foreach(x => Bloom.add(bb, x, k))
    val merged = ba.zip(bb).map { case (x, y) => (x | y).toByte }
    assert(java.util.Arrays.equals(merged, a))
  }

  test("Bloom kernel: false-positive rate near theory at sized load") {
    val bits = 1 << 14 // m/n = 32.8 at n=500, k=5 → fp ≈ 0.04%
    val k = 5
    val b = new Array[Byte](bits / 8)
    (0L until 500L).foreach(x => Bloom.add(b, Bloom.mix(x), k))
    val probes = (10000L until 30000L).map(Bloom.mix)
    val fp = probes.count(x => Bloom.mightContain(b, x, k))
    assert(fp < 60, s"fp=$fp of 20000 probes — far above the ~8 expected")
  }

  test("BloomFilterAgg over a frame matches the local kernel; probe expression agrees") {
    val keys = (0L until 300L).map(i => s"key_$i")
    val df = keys.toDF("s").select(xxhash64(col("s")).as("h"))
    val agg = df.agg(Bloom.bloomAgg(1 << 12, 5)(col("h"))).as[Array[Byte]].head()
    val local = new Array[Byte](1 << 9)
    df.as[Long].collect().foreach(h => Bloom.add(local, h, 5))
    assert(java.util.Arrays.equals(agg, local),
      "distributed fold (partial + merge) must equal the sequential fold")
    // native probe over the aggregated filter: every member true
    val bloomDf = df.agg(Bloom.bloomAgg(1 << 12, 5)(col("h")).as("bloom"))
    val misses = df.crossJoin(broadcast(bloomDf))
      .where(!Bloom.bloomMightContain(col("bloom"), col("h"), 5))
      .count()
    assert(misses == 0L)
  }

  test("dedupLines: first-occurrence order, counts, custom delimiter, degenerate docs") {
    val df = Seq(
      (1L, "nav|body one|nav|footer|body two|footer"),
      (2L, "only line"),
      (3L, ""),
      (4L, "x|x|x|x")).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis
      .dedupLines(df, "doc_id", "text", delim = "|", outSep = " / ")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 6L, 4L, "nav / body one / footer / body two")),
      s"order must be first-occurrence, got ${out(0)}")
    assert(out(1) == ((2L, 1L, 1L, "only line")))
    assert(out(2) == ((3L, 1L, 1L, "")), "empty text is one empty line")
    assert(out(3) == ((4L, 4L, 1L, "x")))
  }

  test("dedupLines: regex metacharacter delimiter is taken literally") {
    val df = Seq((1L, "a.b.a.c")).toDF("doc_id", "text")
    val out = graft.ext.TextAnalysis
      .dedupLines(df, "doc_id", "text", delim = ".", outSep = ",")
      .as[(Long, Long, Long, String)].head()
    assert(out == ((1L, 4L, 3L, "a,b,c")),
      s"'.' must split on dots, not every char: $out")
  }

  test("pageRankFixedPoint: regular graph stays exactly uniform; matches a local simulation") {
    // undirected 4-cycle: every node degree 2 — uniform rank is a fixed
    // point of the integer recurrence (inc = r, r' = base + 85r/100 = r0)
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    val cycEdges = (cyc ++ cyc.map(_.swap)).toDF("src", "dst")
    val uni = graft.ext.Graph.pageRankFixedPoint(cycEdges, iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert(uni.values.toSet == Set(1000000000000000L / 4),
      s"regular graph must stay uniform: $uni")

    // irregular directed graph vs an exact local replay of the recurrence
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 2L))
    val got = graft.ext.Graph
      .pageRankFixedPoint(edges.toDF("src", "dst"), iterations = 3)
      .as[(Long, Long)].collect().toMap
    val scale = 1000000000000000L
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val r0 = scale / nodes.size
    val base = (15L * r0) / 100L
    var r = nodes.map(_ -> r0).toMap
    for (_ <- 1 to 3) {
      val inc = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => r(e._1) / outdeg(e._1)).sum
      }
      r = nodes.map(v => v -> (base + (85L * inc.getOrElse(v, 0L)) / 100L)).toMap
    }
    assert(got == r, s"got $got\nexpected $r")
  }

  test("triangleCounts: exact per-node counts under skew, duplicates and mixed edge order") {
    // K4 on {0,1,2,3} (4 triangles, each node in 3), a pendant node 4 (no
    // triangle), and a celebrity hub 9 joined to 0..4 — hub triangles are
    // exactly the K4 edges + (0-4? no: 4 adjacent to 0 only via hub? 4-0
    // not an edge) → hub forms a triangle per K4 edge: {9,a,b} for each of
    // the 6 K4 edges. Edges fed in MIXED order with duplicates.
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val extra = Seq((4L, 0L)) // pendant-ish: 4-0 edge (makes {9,4,0} a triangle too)
    val hub = (0L to 4L).map(x => (9L, x))
    val dups = Seq((1L, 0L), (0L, 1L)) // duplicates in both orders
    val edges = (k4 ++ extra ++ hub ++ dups).toDF("u", "v")
    val got = graft.ext.Graph.triangleCounts(edges)
      .as[(Long, Long)].collect().toMap
    // triangles: K4's 4; hub over each K4 edge (6) + hub over edge 4-0 (1);
    // plus {0,?}: edge 4-0 with K4? 4 adjacent only to 0 and 9 → no more.
    // per-node: brute-force check instead of hand counting:
    val und = (k4 ++ extra ++ hub).flatMap(e => Seq(e, e.swap)).toSet
    val ns = und.map(_._1).toSeq.distinct.sorted
    val expect = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      i <- ns; j <- ns if j > i; k <- ns if k > j
      if und((i, j)) && und((j, k)) && und((i, k))
    } { expect(i) += 1; expect(j) += 1; expect(k) += 1 }
    assert(got == expect.toMap, s"got $got\nexpected $expect")
  }

  test("labelPropagation: synchronous min-tie-break rounds match a brute-force simulator") {
    // two K4 cliques bridged by one edge, plus a pendant chain — enough
    // structure for non-trivial votes; expectation from a direct simulator
    // of the documented rule (most frequent neighbor label, min tie-break)
    val k4a = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    val k4b = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    val und = (k4a ++ k4b ++ Seq((3L, 10L), (13L, 20L), (20L, 21L))).toSet
    def simulate(iters: Int): Map[Long, Long] = {
      val dir = und ++ und.map(_.swap)
      val adj = dir.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      var lab: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
      for (_ <- 1 to iters) {
        lab = adj.map { case (n, nbrs) =>
          val cnt = nbrs.map(lab).groupBy(identity).view.mapValues(_.size)
          n -> cnt.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
        }
      }
      lab
    }
    val edges = (und ++ und.map(_.swap)).toSeq.toDF("src", "dst")
    for (iters <- Seq(1, 2, 3)) {
      val got = graft.ext.Graph.labelPropagation(edges, iters)
        .as[(Long, Long)].collect().toMap
      assert(got == simulate(iters), s"iteration count $iters")
    }
  }

  test("dedupIncrementalBloom ≡ dedupIncremental, including at adversarial bloom sizes") {
    val docs = Tuple2SeqDocs.docs.toDF("doc_id", "text")
    val archive = docs.where(col("doc_id") % 2 === 0)
    val batch = docs.union(
      docs.select((col("doc_id") + 1000).as("doc_id"), col("text")))
    val exact = Dedup.dedupIncremental(batch, archive, "doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    // tiny filter (64 bits over ~20 archive keys): near-saturated, nearly
    // every row becomes a candidate — results must still be identical
    for (bits <- Seq(64, 1 << 20)) {
      val pruned = Dedup.dedupIncrementalBloom(batch, archive, "doc_id", "text",
          numBits = bits, numHashes = 3)
        .as[(Long, String)].collect().sortBy(_._1)
      assert(pruned.toSeq == exact.toSeq, s"diverged at numBits=$bits")
    }
  }

  test("nearDupIncremental: a redelivered batch (same ids) never drops itself") {
    // round-7 retry contract: candidate SELF-pairs (arch_id = doc_id, which
    // only a redelivered id can produce) are excluded, so a batch replayed
    // against artifacts it already appended re-keeps every row — the ingest
    // sink's per-store id anti-joins then make the re-appends no-ops
    // (previously idempotence leaned on the J = 1 self-match, which lost
    // data when a crash landed between the artifact and archive appends)
    val batch = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "entirely different words compose this second document here"),
      (3L, "tiny doc")). // < 3 tokens: no shingles, passes through
      toDF("doc_id", "text")
    val kept = graft.ext.Dedup.nearDupIncremental(batch, batch,
      "doc_id", "text").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L), s"self-pairs excluded, all rows keep: $kept")
    // the same text under a DIFFERENT id still drops (J = 1, not a self-pair)
    val rekeyed = batch.select((col("doc_id") + 10).as("doc_id"), col("text"))
    val kept2 = graft.ext.Dedup.nearDupIncremental(rekeyed, batch,
      "doc_id", "text").as[Long].collect().toSet
    assert(kept2 == Set(13L), s"only the shingle-less doc survives: $kept2")
  }

  test("Reshape: pivot counts wide, melt restores long incl. zero cells") {
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "b")).toDF("k", "tag")
    val wide = graft.queries.Reshape.pivotCounts(df, col("k"), col("tag"),
      Seq("a", "b", "c"))
    val w = wide.orderBy("id").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(w.toSeq == Seq((1L, 2L, 1L, 0L), (2L, 0L, 1L, 0L)), w.mkString(","))
    // out-of-vocabulary tags are dropped at plan time, zero cells survive
    val long = graft.queries.Reshape.melt(wide, col("id"),
        Seq("n_a", "n_b", "n_c"), "tag", "n")
      .as[(Long, String, Long)].collect().toSet
    assert(long == Set((1L, "n_a", 2L), (1L, "n_b", 1L), (1L, "n_c", 0L),
      (2L, "n_a", 0L), (2L, "n_b", 1L), (2L, "n_c", 0L)), long.toString)
  }

  test("Stats.bivariate: exact corr/slope on a perfect line; order-free") {
    // y = 2x + 1 exactly: corr must be exactly 1.0 and slope exactly 2.0 —
    // the integer-moment formulation has no accumulation error to round
    val pts = (1 to 200).map(i => ("g", i.toDouble, 2.0 * i + 1))
    val df = pts.toDF("grp", "x", "y")
    val r = graft.queries.Stats.bivariate(df, Seq("grp"), col("x"), col("y"))
      .collect().head
    assert(r.getLong(1) == 200L)
    // corr lands within 2 ulp of 1.0 (sqrt(vx)·sqrt(vy) vs sqrt(vx·vy)
    // rounding); what the oracle compare needs is bit-DETERMINISM, pinned
    // by the partitioning-invariance assertion below
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12, s"corr ${r.getDouble(2)}")
    assert(r.getDouble(4) == 2.0, s"slope ${r.getDouble(4)}")
    // partitioning invariance: the exact sums make the doubles bit-equal
    val r2 = graft.queries.Stats.bivariate(df.repartition(13), Seq("grp"),
      col("x"), col("y")).collect().head
    assert(r.getDouble(2) == r2.getDouble(2) && r.getDouble(3) == r2.getDouble(3)
      && r.getDouble(4) == r2.getDouble(4), "must not depend on partitioning")
    // zero x-variance: slope/corr divide by zero → NULL, not crash
    val z = graft.queries.Stats.bivariate(
        Seq(("g", 1.0, 1.0), ("g", 1.0, 2.0)).toDF("grp", "x", "y"),
        Seq("grp"), col("x"), col("y")).collect().head
    assert(z.isNullAt(2) && z.isNullAt(4), "zero variance reports NULL")
  }
}

private object Tuple2SeqDocs {
  // small corpus with internal dups (ids 3/13 share text) and archive hits
  val docs: Seq[(Long, String)] =
    (0L until 40L).map(i => (i, s"alpha beta gamma ${i % 17} delta")) :+
      (99L, "alpha beta gamma 3 delta")
}
