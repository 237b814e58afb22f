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
