package graft

import org.apache.spark.sql.functions._

/** Round-7 additions, part 5: global ordinals, equi-depth histogram, and
  * the transformWithState running-totals processor.
  *
  * globalOrdinals is the boundary-sensitive one: the two-phase
  * range-partitioned form must equal the single-window definition for ANY
  * numRanges (1, more-than-rows, in between) including duplicate sort
  * values disambiguated by the tie-break column.
  */
class Round7eSpec extends SparkSpec {

  test("globalOrdinals equals the global window for any range count") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // duplicate sort values on purpose: uniqueness comes from the id
    val rows = (1L to 500L).map(i => (i, rnd.nextInt(40)))
    val df = rows.toDF("id", "v").repartition(7)
    val want = rows.sortBy { case (i, v) => (v, i) }
      .zipWithIndex.map { case ((i, _), ix) => i -> (ix + 1L) }.toMap
    for (ranges <- Seq(1, 3, 64, 1000)) {
      val got = ext.Curation.globalOrdinals(df, Seq(col("v"), col("id")),
          numRanges = ranges)
        .select("id", "ordinal").as[(Long, Long)].collect().toMap
      assert(got == want, s"numRanges=$ranges")
    }
  }

  test("equiDepthHistogram: ~equal depths, contiguous data ranges") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val vals = (1 to 1001).map(_ => rnd.nextDouble() * 100)
    val df = vals.toDF("v")
    val got = queries.Stats.equiDepthHistogram(df, col("v"), splits = 4)
      .orderBy("bucket")
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(0, 1, 2, 3))
    assert(got.map(_._2).sum == 1001L)
    // depths within 1 of n/4 (edges interpolate between distinct values)
    assert(got.forall(b => math.abs(b._2 - 250L) <= 1))
    // buckets tile the data: max of bucket i < min of bucket i+1
    got.sliding(2).foreach { case Seq(a, b) =>
      assert(a._4 < b._3)
    case _ => ()
    }
    assert(got.head._3 == vals.min && got.last._4 == vals.max)
  }

  test("equiDepthHistogram: heavy duplicate mass lands in one bucket") {
    import spark.implicits._
    val df = (Seq.fill(97)(5.0) ++ Seq(1.0, 2.0, 9.0)).toDF("v")
    val got = queries.Stats.equiDepthHistogram(df, col("v"), splits = 4)
      .orderBy("bucket")
      .as[(Int, Long, Double, Double)].collect().toSeq
    // all quartile edges equal 5.0 -> everything <= 5 in bucket 0
    assert(got.map(b => b._1 -> b._2).toMap == Map(0 -> 99L, 3 -> 1L))
  }

  test("bpeMergeRounds: hand-computed merges, lexicographic tie-break") {
    import spark.implicits._
    val docs = Seq((1L, "low lower low"), (2L, "newest low"))
      .toDF("doc_id", "text")
    val got = ext.TextAnalysis.bpeMergeRounds(docs, "text", rounds = 3)
      .orderBy("round")
      .as[(Int, String, String, String, Long)].collect().toSeq
    // r1: (l,o) and (o,w) tie at 4 -> lexicographic 'l' wins; r2: (lo,w)
    // at 4; r3: all pairs tie at 1 -> (e,r) is the lexicographic minimum
    assert(got == Seq((1, "l", "o", "lo", 4L), (2, "lo", "w", "low", 4L),
      (3, "e", "r", "er", 1L)))
  }

  test("bpeMergeRounds: boundary-sharing run follows replace semantics") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got = ext.TextAnalysis.bpeMergeRounds(docs, "text", rounds = 3)
      .orderBy("round")
      .as[(Int, String, String, String, Long)].collect().toSeq
    // " a a a a ": overlapping pair count 3; the literal replace merges
    // only the FIRST occurrence (the second shares its boundary space),
    // then (a,a) < (aa,a) lexicographically, then (aa,aa) closes it —
    // the documented deviation, pinned so both engines stay in lockstep
    assert(got == Seq((1, "a", "a", "aa", 3L), (2, "a", "a", "aa", 1L),
      (3, "aa", "aa", "aaaa", 1L)))
  }

  test("transformWithState running totals: state crosses batch boundaries") {
    import spark.implicits._
    val rows = Seq(
      ("2026-01-01 00:00:00", "u1", 1.5),
      ("2026-01-01 00:10:00", "u2", 2.0),
      ("2026-01-01 01:00:00", "u1", 0.25),   // second slice
      ("2026-01-01 02:00:00", "u1", 4.0),    // third slice
      ("2026-01-01 02:00:01", "u3", 7.0))
      .toDF("ts", "id", "value")
      .select(col("ts").cast("timestamp").as("ts"), col("id"), col("value"))
    val sink = streaming.StateApi.runningTotalsReplay(spark, rows, slices = 3)
      .as[(String, Long, Long)].collect().toSeq
    // u1 touched all 3 batches -> 3 cumulative emissions proving the
    // ValueState survived each boundary
    assert(sink.filter(_._1 == "u1").map(r => (r._2, r._3)).sorted ==
      Seq((1L, 1500000L), (2L, 1750000L), (3L, 5750000L)))
    // final emission per key equals the batch aggregate
    val fin = sink.groupBy(_._1).map { case (k, rs) => k -> rs.maxBy(_._2) }
    assert(fin("u2") == (("u2", 1L, 2000000L)))
    assert(fin("u3") == (("u3", 1L, 7000000L)))
  }
}
