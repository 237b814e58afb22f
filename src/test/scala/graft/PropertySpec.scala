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

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(b.length + 1)(identity)
    for (i <- 1 to a.length) {
      var prev = d(0); d(0) = i
      for (j <- 1 to b.length) {
        val t = d(j)
        d(j) = math.min(math.min(d(j) + 1, d(j - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = t
      }
    }
    d(b.length)
  }

  test("editDistancePairs == brute-force Levenshtein ≤ 1 (exact recall AND precision)") {
    // short strings over a 3-letter alphabet force dense dist-0/1/2
    // neighborhoods — the regime where SymSpell blocking could over- or
    // under-generate if the deletion-variant pigeonhole were wrong
    val strGen = Gen.listOfN(20,
      Gen.choose(0, 5).flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c'))))
    forAll(strGen, n = 5) { strs =>
      whenever(strs.nonEmpty) {
        val docs = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        val got = Dedup.editDistancePairs(docs.toDF("id", "s"), "id", "s")
          .as[(Long, Long, Int)].collect().toSet
        val want = (for {
          (i, a) <- docs; (j, b) <- docs if i < j
          d = lev(a, b) if d <= 1
        } yield (i, j, d)).toSet
        assert(got == want,
          s"strs=$strs\nmissing=${want -- got}\nspurious=${got -- want}")
      }
    }
  }

  test("PairCrossExpandExpr == naive packed cross product") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, LongType}
    val expr = graft.functions.PairCrossExpandExpr(
      BoundReference(0, ArrayType(LongType), nullable = false),
      BoundReference(1, ArrayType(LongType), nullable = false))
    val idsGen = Gen.listOf(Gen.choose(0L, 1000L)).map(_.distinct)
    forAll(Gen.zip(idsGen, idsGen)) { case (as, bs) =>
      val out = expr.eval(InternalRow(
          new GenericArrayData(as), new GenericArrayData(bs)))
        .asInstanceOf[ArrayData].toLongArray.toSeq
      val want = for (a <- as; b <- bs)
        yield if (a < b) (a << 32) | b else (b << 32) | a
      assert(out == want)
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

  test("chunkTokens: stride-strided chunks reconstruct every doc exactly") {
    val docGen = Gen.listOfN(6, Gen.choose(1, 120).map(n =>
      (1 to n).map(i => s"t$i").mkString(" ")))
    forAll(docGen) { texts =>
      val (chunkLen, stride) = (16, 11)
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = graft.ext.TextAnalysis
        .chunkTokens(docs, "doc_id", "text", chunkLen, stride)
        .as[(Long, Long, Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val toks = t.split(" ")
        val chunks = out(i.toLong)
        // chunk count formula, start alignment, token-exact reconstruction
        // from the stride-strided prefix of each chunk + the full tail
        assert(chunks.length == 1 + math.max(0, (toks.length - chunkLen + stride - 1) / stride))
        chunks.foreach { case (_, idx, n, text) =>
          val body = text.split(" ")
          assert(body.length == n && (body.isEmpty || body.head == toks(idx.toInt * stride)))
        }
        val rebuilt = chunks.init.flatMap(_._4.split(" ").take(stride)) ++
          chunks.last._4.split(" ")
        assert(rebuilt.toSeq == toks.toSeq, s"doc $i reconstruction")
      }
    }
  }

  test("quantizeInt8: |x − q/scale| ≤ 0.5/scale and |q| ≤ 127, any vector") {
    val vecGen = Gen.listOfN(12, Gen.choose(-10000, 10000).map(_ / 1000.0f))
    forAll(vecGen) { xs =>
      whenever(xs.exists(_ != 0.0f)) {
        val df = Seq((1L, xs.toArray)).toDF("vec_id", "embedding")
        val (scale, q) = graft.ext.Similarity
          .quantizeInt8(df, "vec_id", "embedding")
          .as[(Long, Double, Seq[Int])].head() match { case (_, s, qq) => (s, qq) }
        assert(q.forall(v => v >= -127 && v <= 127), "int8 range")
        xs.zip(q).foreach { case (x, v) =>
          assert(math.abs(x.toDouble - v / scale) <= 0.5 / scale + 1e-12,
            s"dequant error bound: x=$x q=$v scale=$scale")
        }
      }
    }
  }

  private val cdcGen = for {
    nBase <- Gen.choose(0, 8)
    nChanges <- Gen.choose(0, 12)
    base <- Gen.listOfN(nBase, Gen.choose(0L, 5L)).map(_.distinct)
    changes <- Gen.listOfN(nChanges, for {
      key <- Gen.choose(0L, 7L)
      op <- Gen.oneOf("I", "U", "D")
      payload <- Gen.choose(0L, 99L)
    } yield (key, op, payload))
  } yield (base, changes)

  test("CDC apply: one batch with latest-wins == replaying changes one at a time") {
    // the MERGE contract: folding a whole change batch (highest seq per key
    // wins) must equal applying each change in seq order as its own batch —
    // the associativity that lets an ingest pipeline batch arbitrarily
    forAll(cdcGen) { case (baseKeys, changes) =>
      val base = baseKeys.map(k => (k, k * 10)).toDF("k", "payload")
      def batch(cs: Seq[(Long, String, Long)], seqOffset: Long) =
        cs.zipWithIndex.map { case ((k, op, p), i) =>
          (k, p, seqOffset + i, op)
        }.toDF("k", "payload", "seq", "op")
      val allAtOnce = graft.queries.Cdc
        .applyChanges(base, batch(changes, 1L), "k", "seq", "op")
        .as[(Long, Long)].collect().toSet
      val oneAtATime = changes.zipWithIndex.foldLeft(base) {
        case (snap, (c, i)) =>
          graft.queries.Cdc.applyChanges(snap, batch(Seq(c), i + 1L), "k", "seq", "op")
      }.as[(Long, Long)].collect().toSet
      assert(allAtOnce == oneAtATime,
        s"base=$baseKeys changes=$changes: batch=$allAtOnce seq=$oneAtATime")
    }
  }

  test("clusterRoots equals a union-find reference on random graphs") {
    // random multigraphs incl. self-referential duplicates and both edge
    // directions; the distributed min-label fixpoint (self-loop round
    // shape, k=2 checkpoint cadence) must assign every node the MINIMUM
    // id reachable in its component — the exact contract a driver-side
    // union-find states independently
    val gen = for {
      n <- Gen.choose(2, 24)
      m <- Gen.choose(1, 40)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n - 1L); b <- Gen.choose(0L, n - 1L)
      } yield (a, b))
    } yield edges.filter(e => e._1 != e._2)
    forAll(gen, n = 5) { edges =>
      whenever(edges.nonEmpty) {
        val got = Dedup.clusterRoots(edges.toDF("id_a", "id_b"))
          .as[(Long, Long)].collect().toMap
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        edges.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val want = parent.keys.map(x => x -> find(x)).toMap
        assert(got == want, s"edges=$edges:\n got=$got\nwant=$want")
      }
    }
  }

  test("tokenBudgetFill equals the single-window definition on random corpora") {
    // randomized sources/sizes (including zero-token rows, NEGATIVE-token
    // rows — malformed upstream data the operator contractually EXCLUDES,
    // like NULL sources — and budgets that land anywhere from nothing-kept
    // to everything-kept); the bucketed two-phase implementation must
    // match the naive per-source running-sum window over the well-formed
    // rows bit-for-bit — the bud1 oracle contract, fuzzed
    val gen = for {
      n <- Gen.choose(1, 60)
      rows <- Gen.listOfN(n, for {
        src <- Gen.oneOf("w", "c", "m")
        tok <- Gen.frequency(5 -> Gen.choose(1L, 40L), 1 -> Gen.const(0L),
          1 -> Gen.choose(-40L, -1L))
      } yield (src, tok))
      budget <- Gen.choose(0L, 400L)
    } yield (rows, budget)
    forAll(gen) { case (rows, budget) =>
      val df = rows.zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
        .toDF("doc_id", "source", "n_tokens")
      val got = graft.ext.Sampling.tokenBudgetFill(df, col("source"),
          col("doc_id"), "fz", col("n_tokens"), budget)
        .as[(Long, String, Long)].collect().toSet
      df.createOrReplaceTempView("fz_docs")
      val want = spark.sql(s"""
        SELECT doc_id, source, n_tokens FROM (
          SELECT doc_id, source, n_tokens,
            SUM(n_tokens) OVER (PARTITION BY source ORDER BY
              CAST(conv(substring(sha2(cast(concat(cast(doc_id AS STRING), ':fz') AS BINARY), 256), 1, 15), 16, 10) AS BIGINT) % 1048576,
              doc_id) AS cum
          FROM fz_docs WHERE n_tokens >= 0) WHERE cum <= $budget""")
        .as[(Long, String, Long)].collect().toSet
      assert(got == want,
        s"budget=$budget: missing ${want -- got}, extra ${got -- want}")
    }
  }
}
