package graft

import org.apache.spark.sql.functions._

/** Round-7 additions, part 4: BFS hop labeling, dyadic smoothing,
  * MMR diverse selection, governance audit/quarantine, MAD outliers.
  *
  * The MMR test is the load-bearing one: the distributed greedy loop
  * (bounded driver argmax per round) must equal a straightforward
  * driver-side greedy reference on the same vectors — including the
  * tie-break and the "selected items never re-selected" exclusion.
  */
class Round7dSpec extends SparkSpec {

  test("bfsHops: levels, min-hop claim, unreached nodes absent") {
    import spark.implicits._
    // 1-2-3 chain, 1-4, 5-6 disconnected; symmetric edges
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 4L), (5L, 6L), (3L, 7L), (7L, 8L))
    val e = pairs.toDF("src", "dst")
      .unionByName(pairs.map(_.swap).toDF("src", "dst"))
    val seeds = Seq(1L).toDF("node")
    val got = ext.Graph.bfsHops(e, seeds, rounds = 3)
      .as[(Long, Long)].collect().toMap
    // 8 is 4 hops away -> absent; 5/6 disconnected -> absent
    assert(got == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L, 7L -> 3L))
  }

  test("bfsHops: a node reachable from two seeds takes the earlier level") {
    import spark.implicits._
    val pairs = Seq((1L, 3L), (2L, 3L), (3L, 4L), (9L, 4L))
    val e = pairs.toDF("src", "dst")
      .unionByName(pairs.map(_.swap).toDF("src", "dst"))
    val got = ext.Graph.bfsHops(e, Seq(1L, 9L).toDF("node"), rounds = 3)
      .as[(Long, Long)].collect().toMap
    // 4 is 2 hops from seed 1 but 1 hop from seed 9 -> level 1
    assert(got == Map(1L -> 0L, 9L -> 0L, 3L -> 1L, 4L -> 1L, 2L -> 2L))
  }

  test("dyadicSmooth: exact weights, short-window normalization") {
    import spark.implicits._
    val df = Seq(
      ("a", "2026-01-01 00:00:10", 1.0),
      ("a", "2026-01-01 01:00:10", 2.0),
      ("a", "2026-01-01 02:00:10", 3.0),
      ("b", "2026-01-01 00:00:10", 5.0))
      .toDF("k", "ts", "v")
      .select(col("k"), col("ts").cast("timestamp_ntz").as("ts"), col("v"))
    val got = queries.TimeSeries.dyadicSmooth(df, col("k"), col("ts"),
        col("v"), lags = 2)
      .orderBy("id", "hour")
      .select("id", "smooth").as[(String, Long)].collect().toSeq
    // lags=2 -> weights 2 (current), 1 (lag 1); vm = v * 1e6; smooth is
    // truncating integer micro-division
    assert(got == Seq(
      ("a", 1000000L * 2 / 2),                  // no lag present
      ("a", (2000000L * 2 + 1000000L) / 3),
      ("a", (3000000L * 2 + 2000000L) / 3),
      ("b", 5000000L * 2 / 2)))
  }

  test("mmrSelect equals a driver-side greedy reference") {
    import spark.implicits._
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val rnd = new scala.util.Random(42)
    val vecs = (0L until 40L).map(i =>
      (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val k = 4
    val got = ext.Similarity.mmrSelect(df, df.where(col("vec_id") < 2),
        "vec_id", "embedding", k)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().toSet
    // reference: plain greedy per query over double-cast vectors
    val dvecs = vecs.map { case (i, v) => i -> v.map(_.toDouble) }.toMap
    val want = (0L until 2L).flatMap { q =>
      val qv = dvecs(q)
      var sel = Vector.empty[Long]
      (1 to k).map { r =>
        val cands = dvecs.keys.filter(i => i != q && !sel.contains(i))
        val best = cands.minBy { i =>
          val rel = cos(dvecs(i), qv)
          val score = if (sel.isEmpty) rel
            else 0.5 * rel - 0.5 * sel.map(s => cos(dvecs(i), dvecs(s))).max
          (-score, i)
        }
        sel :+= best
        (q, r, best)
      }
    }.toSet
    assert(got == want)
  }

  test("kAnonymityAudit: class sizes, l-diversity, risk flag") {
    import spark.implicits._
    val df = Seq(
      ("US", "A", 1), ("US", "A", 1), ("US", "A", 2),
      ("US", "B", 5),
      ("DE", "A", 7), ("DE", "A", 7))
      .toDF("country", "seg", "sens")
    val got = ext.Governance.kAnonymityAudit(df,
        Seq("country" -> col("country"), "seg" -> col("seg")),
        col("sens"), k = 3)
      .orderBy("country", "seg")
      .as[(String, String, Long, Long, Int)].collect().toSeq
    assert(got == Seq(("DE", "A", 2L, 1L, 1), ("US", "A", 3L, 2L, 0),
      ("US", "B", 1L, 1L, 1)))
  }

  test("quarantine: reason order, null predicate violates, clean rows absent") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(5L), "O"),   // clean
      (2L, None, "O"),       // null passes no predicate -> r1 violation
      (3L, Some(-1L), "X"),  // two violations, declaration order
      (4L, Some(2L), "F"))   // clean
      .toDF("id", "v", "st")
    val got = ext.Governance.quarantine(df, Seq(
        "v_positive" -> (col("v") > 0),
        "st_in_domain" -> col("st").isin("O", "F")))
      .select("id", "reasons").as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "v_positive", 3L -> "v_positive,st_in_domain"))
  }

  test("madOutliers: exact median/MAD flags, constant series unflagged") {
    import spark.implicits._
    val rows =
      (0 until 9).map(h => ("a", f"2026-01-01 $h%02d:00:10", 10.0)) ++
      Seq(("a", "2026-01-01 09:00:10", 11.0), ("a", "2026-01-01 10:00:10", 500.0)) ++
      (0 until 5).map(h => ("c", f"2026-01-01 $h%02d:00:10", 7.0))
    val df = rows.toDF("k", "ts", "v")
      .select(col("k"), col("ts").cast("timestamp_ntz").as("ts"), col("v"))
    val got = queries.TimeSeries.madOutliers(df, col("k"), col("ts"),
        col("v"), nMads = 3)
      .orderBy("id", "hour")
      .select("id", "vm").as[(String, Long)].collect().toSeq
    // key a: med = 10e6, deviations (0x9, 1e6, 490e6) -> MAD = 0 ->
    // every nonzero deviation flags (robustness: the spike AND the 11)
    // key c: constant -> MAD 0, deviations 0 -> nothing flags
    assert(got == Seq(("a", 11000000L), ("a", 500000000L)))
  }
}
