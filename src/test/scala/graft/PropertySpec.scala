package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.core.{Agg, Num}
import graft.ext.Dedup

/** Property-based invariants (survey §5.3): results must not depend on row
  * order or partitioning, window totals must equal global totals, sketch
  * distances must satisfy metric bounds. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic stand-in for scalatest+scalacheck integration (the
    * scalatestplus bridge isn't in the offline dependency cache): sample
    * the generator N times from fixed seeds and run the property. */
  private def forAll[A](gen: Gen[A], n: Int = 8)(prop: A => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(prop)
    }
  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private val rowsGen = Gen.listOfN(40, for {
    dim <- Gen.oneOf("a", "b", "c")
    minute <- Gen.choose(0, 300)
    v <- Gen.choose(-1000, 1000).map(_ / 100.0)
  } yield (dim, minute, v))

  test("windowed sums are invariant under row permutation and partitioning") {
    forAll(rowsGen) { rows =>
      whenever(rows.nonEmpty) {
        def run(rs: List[(String, Int, Double)], parts: Int) = {
          val df = rs.map { case (d, m, v) =>
            (d, new Timestamp(1700000000000L + m * 60000L), v)
          }.toDF("dim", "ts", "v").repartition(parts)
          Agg.windowedSum(df, col("dim"), col("ts"), "90 seconds", col("v"), "t")
            .as[(Timestamp, String, Double, String)].collect().toSet
        }
        assert(run(rows, 1) == run(scala.util.Random.shuffle(rows), 7))
      }
    }
  }

  test("window totals equal the global total (exact decimal arithmetic)") {
    forAll(rowsGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.map { case (d, m, v) =>
          (d, new Timestamp(1700000000000L + m * 60000L), v)
        }.toDF("dim", "ts", "v")
        val windowed = Agg.windowedSum(df, col("dim"), col("ts"), "90 seconds",
          col("v"), "t").agg(Num.dsum(col("value"))).as[Double].head()
        val global = df.agg(Num.dsum(col("v"))).as[Double].head()
        assert(windowed == global)
      }
    }
  }

  test("simhash hamming distance is a pseudo-metric: d(x,x)=0, symmetry, ≤64") {
    val texts = Gen.listOfN(6, Gen.nonEmptyListOf(
      Gen.oneOf("spark", "query", "table", "scan", "the", "fast"))
      .map(_.mkString(" ")))
    forAll(texts) { ts =>
      whenever(ts.nonEmpty) {
        val fps = ts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("id", "text")
          .select(col("id"), Dedup.simhash(col("text")).as("fp"))
          .as[(Long, Long)].collect().toMap
        for ((i, ti) <- ts.zipWithIndex.map(_.swap); (j, tj) <- ts.zipWithIndex.map(_.swap)) {
          val d = java.lang.Long.bitCount(fps(i.toLong) ^ fps(j.toLong))
          assert(d >= 0 && d <= 64)
          if (ti == tj) assert(d == 0, s"identical texts must collide: '$ti'")
        }
      }
    }
  }

  test("jaccard pairs: j within (0,1], symmetric by construction (a<b)") {
    forAll(Gen.listOfN(8, Gen.chooseNum(0, 3))) { picks =>
      val base = Seq(
        "the quick brown fox jumps over the lazy dog tonight",
        "the quick brown fox jumps over the sleepy dog tonight",
        "completely different text about spark query planning today",
        "another unrelated document mentioning tables and scans only")
      val docs = picks.zipWithIndex.map { case (p, i) => (i.toLong, base(p)) }
        .toDF("doc_id", "text")
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", minJaccard = 0.01)
        .as[(Long, Long, Double)].collect()
      pairs.foreach { case (a, b, j) =>
        assert(a < b && j > 0.0 && j <= 1.0 + 1e-12, s"($a,$b,$j)")
      }
    }
  }
}
