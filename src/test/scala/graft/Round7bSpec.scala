package graft

import org.apache.spark.sql.functions._

/** Round-7 additions: connected components as a first-class graph
  * operator (ccmp1) and reciprocal-rank fusion (ret2).
  *
  * The chain test doubles as the LINEAGE regression for the clusterRoots
  * fixpoint: a 30-node path needs ~29 min-label rounds, and before the
  * per-round localCheckpoint the logical plan doubled every round (lbl
  * feeds the next round twice) — planning a 2^29-node tree OOMed long
  * before any data pressure. With truncation the loop is constant-size
  * per round at any depth.
  */
class Round7bSpec extends SparkSpec {

  test("connectedComponents: long chain converges (lineage stays flat)") {
    import spark.implicits._
    // path 0-1-2-...-29 plus a disjoint triangle {100, 101, 102}
    val chain = (0L until 29L).map(i => (i, i + 1))
    val tri = Seq((100L, 101L), (101L, 102L), (100L, 102L))
    val edges = (chain ++ tri).toDF("src", "dst")
    val got = ext.Graph.connectedComponents(edges, maxIters = 40)
      .as[(Long, Long)].collect().toMap
    assert((0L to 29L).forall(got(_) == 0L), got.toString)
    assert(Seq(100L, 101L, 102L).forall(got(_) == 100L), got.toString)
    assert(got.size == 33)
  }

  test("connectedComponents: singletons are absent, orientation is irrelevant") {
    import spark.implicits._
    val got = ext.Graph.connectedComponents(
        Seq((5L, 2L), (2L, 5L), (9L, 9L)).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    // self-loop node 9 forms its own single-node component; {2,5} collapse
    assert(got == Map(2L -> 2L, 5L -> 2L, 9L -> 9L), got.toString)
  }

  test("nfcNormalizeNative: composes combining marks, ASCII fast-path is identity, null-safe") {
    import spark.implicits._
    val got = Seq(("cafe\u0301 nin\u0303o", 1), ("plain ascii", 2),
        (null.asInstanceOf[String], 3), ("caf\u00e9", 4))
      .toDF("s", "i")
      .select(graft.functions.VectorExpressions.nfcNormalizeNative($"s"), $"i")
      .as[(String, Int)].collect().sortBy(_._2).map(_._1)
    assert(got(0) == "caf\u00e9 ni\u00f1o", got(0))   // composed, shorter
    assert(got(0).length == 9)
    assert(got(1) == "plain ascii" && got(2) == null && got(3) == "caf\u00e9")
  }

  test("epochUpsample: whole epochs replicate exactly, zero rounds drop, fractional is hash-deterministic") {
    import spark.implicits._
    val df = (0L until 200L).toDF("id")
    def run(epm: Int) = graft.ext.Sampling.epochUpsample(df, $"id", "t", lit(epm))
      .select("id", "epoch_copy").as[(Long, Long)].collect()
    assert(run(2000).length == 400 && run(2000).count(_._2 == 2L) == 200)
    assert(run(0).isEmpty)
    // e = 0.5: kept set is a pure hash fate — re-running gives the same
    // rows, and the rate lands near half
    val a = run(500).toSet
    assert(a == run(500).toSet && a.forall(_._2 == 1L))
    assert(a.size > 60 && a.size < 140, s"${a.size}")
    // e = 2.5: every id gets 2 copies, the SAME fate set gets a third
    val b = run(2500)
    assert(b.count(_._2 == 2L) == 200 &&
      b.filter(_._2 == 3L).map(x => (x._1, 1L)).toSet == a.map(x => (x._1, 1L)).toSet)
  }

  test("calibrationBins: exact bin edges, rates, and means on a hand fixture") {
    import spark.implicits._
    val rows = Seq((5L, true), (15L, false), (17L, true), (25L, true))
      .map { case (s, l) => ("g", s, l) }.toDF("grp", "s", "l")
    val got = ext.Eval.calibrationBins(rows, Seq("grp"), $"s", $"l", width = 10L)
      .select("bin", "bin_lo", "n", "n_pos", "pos_rate", "mean_score")
      .as[(Long, Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (0L, 0L, 1L, 1L, 1.0, 5.0),
      (1L, 10L, 2L, 1L, 0.5, 16.0),
      (2L, 20L, 1L, 1L, 1.0, 25.0)), got.mkString(","))
  }

  test("binaryFile round trip: ids, lengths, and bytes survive; metadata-only scan prunes content") {
    import spark.implicits._
    val dir = core.Scratch.dir("binspec-")
    val in = Seq((7L, "hello"), (13L, "wörld")).toDF("id", "s")
      .select($"id", $"s".cast("binary").as("payload"))
    sources.BinaryFiles.writeBlobs(in, "id", "payload", dir)
    val back = sources.BinaryFiles.readBlobs(spark, dir)
    val got = back.select($"id", $"n_bytes", $"content".cast("string"))
      .as[(Long, Long, String)].collect().sortBy(_._1)
    // ö is two UTF-8 bytes: listing-side length must be BYTE length
    assert(got.toSeq == Seq((7L, 5L, "hello"), (13L, 6L, "wörld")), got.toSeq)
    // column pruning: a metadata projection plans without the content column
    val meta = back.select("id", "n_bytes")
    assert(!meta.queryExecution.executedPlan.toString.contains("content"))
  }

  test("rrfFuse: hand-computed fusion, rank ties to doc_id, single-leg docs fuse too") {
    import spark.implicits._
    // leg A ranks docs 1,2,3; leg B ranks docs 2,1,4
    val a = Seq((0L, 1L, 1L), (0L, 2L, 2L), (0L, 3L, 3L))
      .toDF("query_id", "doc_id", "rk")
    val b = Seq((0L, 2L, 1L), (0L, 1L, 2L), (0L, 4L, 3L))
      .toDF("query_id", "doc_id", "rk")
    val got = ext.Retrieval.rrfFuse(Seq(a, b), k0 = 60, k = 10)
      .select("doc_id", "rrf", "rk")
      .as[(Long, Double, Long)].collect().sortBy(_._3)
    def c(r: Int): BigDecimal =
      BigDecimal(1.0 / (60.0 + r)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    // docs 1 and 2 tie exactly (1/61 + 1/62 both) → doc_id breaks the tie;
    // docs 3 and 4 tie at 1/63 → doc_id again
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L), got.mkString(","))
    assert(got(0)._2 == (c(1) + c(2)).toDouble, got(0).toString)
    assert(got(2)._2 == c(3).toDouble)
    assert(got.map(_._3).toSeq == Seq(1L, 2L, 3L, 4L))
  }
}
