package graft

import org.apache.spark.sql.functions._

/** Round-11 property pins for the operators whose grades are oracle-only:
  *  - crossCorr: time-reversal symmetry — xcorr(x, y) at lag k equals
  *    xcorr(y, x) at lag −k (the defining identity of the estimator);
  *    plus a hand-computed perfectly-anticorrelated fixture.
  *  - linearAttribution: value conservation — attributed micro-units per
  *    conversion sum to vmicro minus the integer-split residue (< n).
  *  - charEntropy: exact anchors — single-char doc = 0, uniform binary
  *    doc = ln 2 rounded to 6 decimals.
  *  - thresholdSweep: monotonicity — tightening either threshold never
  *    increases survivors; the (0, 0) cell passes everything.
  *  - filtered ANN: every returned neighbor satisfies the predicate and
  *    ranks are contiguous from 1.
  */
class Round11bSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int, m: Int = 0) =
    java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("crossCorr: time-reversal symmetry and an anticorrelated fixture") {
    // x peaks when y dips, shifted by one hour: y_t = high iff x_{t-1} low
    val rows = (0 until 12).flatMap { h =>
      val xn = if (h % 2 == 0) 3 else 1
      val yn = if (h % 2 == 1) 3 else 1
      Seq.fill(xn)((ts(h), "x")) ++ Seq.fill(yn)((ts(h), "y"))
    }
    val df = rows.toDF("ts", "et")
    val fwd = queries.TimeSeries.crossCorr(df, col("ts"),
        col("et") === "x", col("et") === "y", lags = 2)
      .collect().map(r => (r.getInt(0), r.getLong(3))).toMap
    val rev = queries.TimeSeries.crossCorr(df, col("ts"),
        col("et") === "y", col("et") === "x", lags = 2)
      .collect().map(r => (r.getInt(0), r.getLong(3))).toMap
    (-2 to 2).foreach { k =>
      assert(fwd(k) == rev(-k),
        s"xcorr(x,y)[$k] must equal xcorr(y,x)[${-k}]")
    }
    // same-hour counts are perfectly anticorrelated: lag 0 = -1.0 exactly
    assert(fwd(0) == -1000000L, s"lag-0 micro was ${fwd(0)}")
    // adjacent hours flip back: lag 1 and -1 strongly positive
    assert(fwd(1) > 800000L && fwd(-1) > 800000L)
  }

  test("linearAttribution: per-conversion value conservation modulo residue") {
    val ev = Seq(
      // conv 100 at 10:30 worth 9.99 -> 3 touches in [09:30, 10:30)
      (1L, ts(9, 40), 7L, "click", 0.0), (2L, ts(10, 0), 7L, "view", 0.0),
      (3L, ts(10, 20), 7L, "click", 0.0),
      (100L, ts(10, 30), 7L, "purchase", 9.99),
      // conv 101 at 12:00 worth 4.0 -> exactly 1 touch
      (4L, ts(11, 30), 7L, "view", 0.0),
      (101L, ts(12, 0), 7L, "purchase", 4.0),
      // a touch outside any window and a conversion with no touches
      (5L, ts(3, 0), 7L, "click", 0.0),
      (102L, ts(5, 0), 8L, "purchase", 100.0),
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = queries.Behavior.linearAttribution(ev, col("user_id"),
        col("ts"), col("event_id"), col("event_type"), col("value"),
        Seq("click", "view"), "purchase", "1 hour")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
      .sortBy(_._1)
    // 9 990 000 div 3 = 3 330 000 exactly; 4 000 000 div 1 = 4 000 000
    assert(got == List((1L, 1L, 3330000L), (2L, 1L, 3330000L),
      (3L, 1L, 3330000L), (4L, 1L, 4000000L)))
    // conservation: conv 100 distributed 9 990 000 exactly (residue 0);
    // touch 5 and conversion 102 appear nowhere
    assert(got.map(_._3).sum == 9990000L + 4000000L)
  }

  test("charEntropy: exact anchors") {
    val docs = Seq((1L, "aaaa"), (2L, "abab"), (3L, "a"))
      .toDF("doc_id", "text")
    val got = ext.TextAnalysis.charEntropy(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1).toList
    assert(got(0) == ((1L, 4L, 1L, 0.0)), "constant doc has zero entropy")
    assert(got(1)._4 == math.rint(math.log(2) * 1e6) / 1e6 ||
      math.abs(got(1)._4 - math.log(2)) < 1e-6,
      s"uniform binary doc = ln 2 (rounded): ${got(1)._4}")
    assert(got(2) == ((3L, 1L, 1L, 0.0)), "single char doc is zero")
  }

  test("thresholdSweep: monotone in both thresholds; (0,0) passes all") {
    val docs = (1 to 30).map(i =>
      (i.toLong, (Seq.fill(i)("word") ++ Seq.fill(i % 4)("the"))
        .mkString(" "))).toDF("doc_id", "text")
    val sweep = ext.Curation.thresholdSweep(docs, "text",
        minTokens = Seq(0L, 8L, 16L), minStopMicro = Seq(0L, 50000L))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(sweep((0L, 0L)) == 30L, "the (0,0) cell passes every doc")
    for (ms <- Seq(0L, 50000L))
      assert(sweep((0L, ms)) >= sweep((8L, ms)) &&
        sweep((8L, ms)) >= sweep((16L, ms)), "monotone in min_tokens")
    for (mt <- Seq(0L, 8L, 16L))
      assert(sweep((mt, 0L)) >= sweep((mt, 50000L)), "monotone in ratio")
  }

  test("filtered ANN: predicate holds on every neighbor, ranks contiguous") {
    val rows = (0L until 24L).map { i =>
      (i, s"L${i % 3}", (0 until 8).map(j =>
        math.cos(i * 1.1 + j * 0.5) + (i % 3)).toArray)
    }.toDF("vec_id", "label", "embedding")
    val dir = tmpDir("sim10-spec") + "/idx"
    ext.Similarity.writeIvfIndex(rows, "vec_id", "embedding", "label", dir)
    val got = ext.Similarity.ivfQuantizedTopKFromIndex(
        spark.read.parquet(s"$dir/centroids"),
        spark.read.parquet(s"$dir/qindex").where($"vec_id" % 2 === 0),
        rows.select($"vec_id", $"embedding".as("v")),
        rows.where($"vec_id" < 2), "vec_id", "embedding",
        k = 5, nprobe = 2, shortlist = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.nonEmpty)
    assert(got.forall(_._3 % 2 == 0), "every neighbor satisfies the predicate")
    got.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.size),
        s"query $q ranks must be contiguous from 1")
    }
  }
}
