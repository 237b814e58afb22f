package graft

import org.apache.spark.sql.functions._

/** Round-7 additions, part 7: the prefix-filter AllPairs set-similarity
  * join. Recall-exactness is the whole point — the test is brute-force
  * equivalence on a SMALL-vocabulary corpus (the adversarial case the
  * operator exists for: every token is common, so nothing is selective
  * except the prefix theorem), across thresholds including 0.8, whose
  * binary representation sits above 0.8 and would silently shrink the
  * prefix without the ceil guard.
  */
class Round7gSpec extends SparkSpec {

  private def bruteJ(rows: Seq[(Long, String)],
                     t: Double): Set[(Long, Long, Double)] = {
    val sets = rows.map { case (i, s) =>
      i -> s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size.toDouble
      j = inter / (sa.size + sb.size - inter) if j >= t
    } yield (a, b, j)).toSet
  }

  test("setJaccardPairsPrefix equals brute force on a small-vocab catalog") {
    import spark.implicits._
    val vocab = Vector("red", "blue", "lime", "teal", "plum", "mint",
      "rose", "gold", "jade", "rust", "sand", "snow")
    val rnd = new scala.util.Random(21)
    val rows = (0L until 200L).map { i =>
      val n = 4 + rnd.nextInt(6)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } :+ (500L, "")     // empty name: excluded, never crashes the plan
    val df = rows.toDF("id", "name")
    for (t <- Seq(0.5, 0.75, 0.8)) {
      val got = ext.Dedup.setJaccardPairsPrefix(df, "id", "name", t)
        .as[(Long, Long, Double)].collect().toSet
      assert(got == bruteJ(rows, t), s"t=$t")
    }
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("editDistance2Pairs equals brute force incl. short strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val alpha = "abc"
    // short random strings over a 3-letter alphabet: dense distance
    // structure, zero-length segments (|s| < 3), shifts from indels
    val rows = (0L until 250L).map { i =>
      val n = rnd.nextInt(9)   // 0..8, includes empty strings
      (i, Seq.fill(n)(alpha(rnd.nextInt(3))).mkString)
    }
    val want = (for {
      (a, sa) <- rows; (b, sb) <- rows
      if a < b && lev(sa, sb) <= 2
    } yield (a, b, lev(sa, sb).toLong)).toSet
    val got = ext.Dedup.editDistance2Pairs(rows.toDF("id", "t"), "id", "t")
      .select(col("id_a"), col("id_b"), col("dist").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("confusionAtThreshold: counts, micro rates, NULL on empty denominators") {
    import spark.implicits._
    val df = Seq(
      ("s1", 10L, true), ("s1", 9L, true), ("s1", 10L, false),
      ("s1", 1L, true), ("s1", 1L, false),
      ("s2", 1L, false), ("s2", 2L, false))   // no positives, none predicted
      .toDF("g", "score", "lab")
    val got = ext.Eval.confusionAtThreshold(df, Seq("g"), col("score"),
        col("lab"), threshold = 9L)
      .orderBy("g")
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long],
        Option[Long])].collect().toSeq
    // s1: tp=2 fp=1 fn=1 tn=1 -> p=2/3, r=2/3, f1=4/6 (all 666666 micro)
    assert(got == Seq(
      ("s1", 2L, 1L, 1L, 1L, Some(666666L), Some(666666L), Some(666666L)),
      ("s2", 0L, 0L, 0L, 2L, None, None, None)))
  }

  test("asofBackwardWithin: tolerance nulls stale matches, boundary inclusive") {
    import spark.implicits._
    def t(s: String) = s"2026-01-01 $s"
    val left = Seq((1L, 10L, t("10:00:00")), (2L, 10L, t("13:00:00")),
      (3L, 20L, t("10:00:00")), (4L, 30L, t("10:00:00")))
      .toDF("event_id", "user_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val right = Seq((100L, 10L, t("09:30:00")),   // fresh for ev1, stale for ev2
      (200L, 20L, t("08:00:00")))                  // exactly 2h before ev3
      .toDF("click_id", "user_id", "ts")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val got = queries.AsOf.asofBackwardWithin(left, right,
        key = "user_id", ts = "ts", rightCols = Seq("click_id"),
        tolerance = "2 HOURS", prefix = "m_")
      .orderBy("event_id")
      .select("event_id", "m_click_id")
      .as[(Long, Option[Long])].collect().toSeq
    assert(got == Seq((1L, Some(100L)), (2L, None),   // 3.5 h stale
      (3L, Some(200L)),                               // boundary inclusive
      (4L, None)))                                    // no right row at all
  }

  test("trailingRangeSum: value-bounded frame ignores row gaps") {
    import spark.implicits._
    val rows = Seq(0, 1, 2, 6, 7).zipWithIndex.map { case (h, i) =>
      ("a", f"2026-01-01 $h%02d:30:00", (i + 1).toDouble)
    }
    val df = rows.toDF("k", "ts", "v")
      .select(col("k"), col("ts").cast("timestamp_ntz").as("ts"), col("v"))
    val got = queries.TimeSeries.trailingRangeSum(df, col("k"), col("ts"),
        col("v"), "3 hours")
      .orderBy("hour").select("vm_trailing").as[Long].collect().toSeq
    // hour 6 is 4 hours past hour 2: a ROWS(-3..0) frame would still
    // include it; the RANGE frame must not
    assert(got.map(_ / 1000000L) == Seq(1L, 3L, 6L, 4L, 9L))
  }

  test("rfmScores: ntile boundaries with tie-break, segment code") {
    import spark.implicits._
    // 5 customers, metrics engineered so each quintile has one member;
    // customer 5 ties customer 4 on frequency -> key break decides
    val orders = Seq(
      (1L, "2026-01-05 00:00:00", 500.0), (1L, "2026-01-04 00:00:00", 500.0),
      (1L, "2026-01-03 00:00:00", 500.0), (1L, "2026-01-02 00:00:00", 500.0),
      (1L, "2026-01-01 00:00:00", 500.0),
      (2L, "2026-01-04 12:00:00", 400.0), (2L, "2026-01-01 00:00:00", 400.0),
      (2L, "2026-01-01 01:00:00", 400.0), (2L, "2026-01-01 02:00:00", 400.0),
      (3L, "2026-01-03 12:00:00", 300.0), (3L, "2026-01-01 00:00:00", 300.0),
      (3L, "2026-01-01 01:00:00", 300.0),
      (4L, "2026-01-02 12:00:00", 200.0), (4L, "2026-01-01 00:00:00", 200.0),
      (5L, "2026-01-01 12:00:00", 100.0), (5L, "2026-01-01 00:00:00", 50.0))
      .toDF("cust", "ts", "amt")
      .select(col("cust"), col("ts").cast("timestamp_ntz").as("ts"), col("amt"))
    val got = queries.Behavior.rfmScores(orders, col("cust"), col("ts"),
        col("amt"))
      .orderBy("cust").as[(Long, Int, Int, Int, Int)].collect().toSeq
    // recency/frequency/monetary all rank 1<2<3<4<5 best-to-worst except
    // freq ties (4 and 5 both have 2 orders -> cust 4 gets the better
    // bucket by key)
    assert(got == Seq((1L, 1, 1, 1, 111), (2L, 2, 2, 2, 222),
      (3L, 3, 3, 3, 333), (4L, 4, 4, 4, 444), (5L, 5, 5, 5, 555)))
  }

  test("abLift: counts, truncating micro rates, pooled z") {
    import spark.implicits._
    val pop = (1L to 10L).map(i =>
      (i, if (i <= 4) "A" else "B")).toDF("unit", "variant")
    val conv = Seq(1L, 5L, 6L, 7L, 99L).toDF("cu")   // 99 outside population
    val got = queries.Behavior.abLift(pop, col("unit"), col("variant"),
        conv, col("cu"), "A", "B")
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)].collect().head
    val z = (0.5 - 0.25) / math.sqrt(0.4 * (1.0 - 0.4) * (1.0 / 4 + 1.0 / 6))
    val zr = BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(got == ((4L, 1L, 6L, 3L, 250000L, 500000L, 250000L, zr)))
  }

  test("setJaccardPairsPrefix: verbatim duplicate sets pair at J=1") {
    import spark.implicits._
    val df = Seq((1L, "red blue lime"), (2L, "blue red lime red"),
      (3L, "red blue teal"), (4L, "gold jade"))
      .toDF("id", "name")
    val got = ext.Dedup.setJaccardPairsPrefix(df, "id", "name", 0.9)
      .as[(Long, Long, Double)].collect().toSet
    // 1 and 2 have the same token SET (order/multiplicity ignored)
    assert(got == Set((1L, 2L, 1.0)))
  }
}
