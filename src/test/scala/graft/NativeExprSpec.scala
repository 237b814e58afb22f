package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Similarity, TextAnalysis}
import graft.functions.VectorExpressions

/** The native Catalyst expressions must agree with the compositional
  * (built-in HOF) formulations they replaced — these specs pin that
  * equivalence so performance refactors can't drift semantics. */
class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c",
    "one two",          // shorter than n=3 → empty shingle set
    "x x x x x x",      // heavy duplication
  ).toDF("text")

  test("ShingleHashExpr == sorted distinct xxhash64(array_join(slice(...)))") {
    val toks = texts.select(TextAnalysis.tokens(col("text")).as("toks"))
    val native = toks.select(
      VectorExpressions.shingleHashesNative(col("toks"), 3).as("h"))
      .as[Seq[Long]].collect()
    val compositional = texts.select(
      transform(Dedup.shingles(col("text"), 3), s => xxhash64(s)).as("h"))
      .as[Seq[Long]].collect()
    native.zip(compositional).foreach { case (n, c) =>
      assert(n == c.distinct.sorted, s"native $n vs compositional ${c.distinct.sorted}")
    }
  }

  test("PairExpandExpr: packed ordered pairs of a sorted id list") {
    val out = Seq(Seq(1L, 2L, 3L)).toDF("ids")
      .select(VectorExpressions.pairExpandNative(col("ids")).as("p"))
      .as[Seq[Long]].head()
    def pack(a: Long, b: Long) = (a << 32) | b
    assert(out == Seq(pack(1, 2), pack(1, 3), pack(2, 3)))
    val empty = Seq(Seq(7L)).toDF("ids")
      .select(VectorExpressions.pairExpandNative(col("ids")).as("p"))
      .as[Seq[Long]].head()
    assert(empty.isEmpty)
  }

  test("XxTokenHashExpr == transform(arr, x => xxhash64(x))") {
    val toks = texts.select(TextAnalysis.tokens(col("text")).as("toks"))
    val native = toks.select(
      VectorExpressions.xxTokenHashesNative(col("toks"))).as[Seq[Long]].collect()
    val hof = toks.select(
      transform(col("toks"), t => xxhash64(t))).as[Seq[Long]].collect()
    assert(native.toSeq == hof.toSeq)
  }

  test("Sha60TokenHashExpr == conv(substring(sha2(x), 1, 15), 16, 10) per element") {
    val toks = (texts.collect().map(_.getString(0)).toSeq :+ "中文 désolé ")
      .toDF("text").select(TextAnalysis.tokens(col("text")).as("toks"))
    val native = toks.select(
      VectorExpressions.sha60TokenHashesNative(col("toks"))).as[Seq[Long]].collect()
    val hof = toks.select(transform(col("toks"), t =>
      conv(substring(sha2(t.cast("binary"), 256), 1, 15), 16, 10).cast("long")))
      .as[Seq[Long]].collect()
    assert(native.toSeq == hof.toSeq)
  }

  test("DotProductExpr == HOF aggregate(zip_with) formulation") {
    val vecs = Seq(
      (Array(1.5, -2.0, 3.25), Array(0.5, 4.0, -1.0)),
      (Array(0.0, 0.0, 0.0), Array(1.0, 2.0, 3.0)),
    ).toDF("a", "b")
    val native = vecs.select(Similarity.dot(col("a"), col("b"))).as[Double].collect()
    val hof = vecs.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)).as[Double].collect()
    assert(native.toSeq == hof.toSeq)
  }

  test("MinHashSigExpr: fixed length, deterministic, element-order invariant") {
    val a = Seq(Seq(10L, 20L, 30L)).toDF("h")
      .select(VectorExpressions.minhashSigNative(col("h"), 128)).as[Seq[Long]].head()
    val b = Seq(Seq(30L, 10L, 20L)).toDF("h")
      .select(VectorExpressions.minhashSigNative(col("h"), 128)).as[Seq[Long]].head()
    assert(a.length == 128 && a == b, "min over a set is order-free")
  }

  test("HyperplaneSigExpr: equal vectors share a sig; negation complements it") {
    val v = Array.tabulate(16)(i => math.sin(i + 1).toFloat)
    val df = Seq(("v", v), ("same", v), ("neg", v.map(-_))).toDF("name", "vec")
    val sigs = df.select(col("name"),
      VectorExpressions.hyperplaneSigNative(col("vec"), 12)).as[(String, Long)]
      .collect().toMap
    assert(sigs("v") == sigs("same"))
    assert((sigs("v") ^ sigs("neg")) == ((1L << 12) - 1),
      "negated vector flips every plane sign")
  }

  test("HyperplaneSigExpr: seeds give independent tables, seed 0 is the default") {
    val v = Array.tabulate(16)(i => math.sin(i + 1).toFloat)
    val df = Seq(Tuple1(v)).toDF("vec")
    def sig(seed: Long) = df.select(
      VectorExpressions.hyperplaneSigNative(col("vec"), 16, seed)).as[Long].head()
    assert(sig(0L) == df.select(
      VectorExpressions.hyperplaneSigNative(col("vec"), 16)).as[Long].head(),
      "explicit seed 0 ≡ default single-table signature")
    assert(Seq(0L, 1L, 2L, 3L).map(sig).distinct.size == 4,
      "distinct seeds must draw distinct plane sets")
  }

  test("DeletionVariantHashExpr == sorted array_distinct(transform(substr-concat)) lambda form") {
    val strs = Seq("promo burnished steel", "", "a", "aa", "中文désolé mixé",
      "same same same").toDF("t")
    val native = strs.select(
      VectorExpressions.deletionVariantHashesNative(col("t")).as("h"))
      .as[Seq[Long]].collect()
    val t = col("t")
    val lambda = strs.select(array_distinct(transform(sequence(lit(0), length(t)),
      i => xxhash64(when(i === lit(0), t).otherwise(
        concat(t.substr(lit(1), i - 1), t.substr(i + 1, length(t) - i)))))).as("h"))
      .as[Seq[Long]].collect()
    native.zip(lambda).foreach { case (n, c) =>
      assert(n == c.sorted, s"native $n vs lambda ${c.sorted}")
    }
  }

  test("TokenLenSumExpr == aggregate(arr, 0L, acc + length(x))") {
    val toks = (texts.collect().map(_.getString(0)).toSeq :+ "中文 désolé x")
      .toDF("text").select(TextAnalysis.tokens(col("text")).as("toks"))
    val native = toks.select(
      VectorExpressions.tokenLenSumNative(col("toks"))).as[Long].collect()
    val hof = toks.select(
      aggregate(col("toks"), lit(0L), (acc, x) => acc + length(x))).as[Long].collect()
    assert(native.toSeq == hof.toSeq)
  }

  test("CjkCountExpr == length(regexp_replace keep-CJK)") {
    val strs = Seq("no cjk at all", "", "这是一个中文句子没有空格",
      "mixed 中文 and English 漢字 done", "édgé çäse ünïcode", "中").toDF("t")
    val native = strs.select(
      VectorExpressions.cjkCountNative(col("t"))).as[Int].collect()
    val regex = strs.select(
      length(regexp_replace(col("t"), "[^\\x{4e00}-\\x{9fff}]", ""))).as[Int].collect()
    assert(native.toSeq == regex.toSeq, s"${native.toSeq} vs ${regex.toSeq}")
  }

  test("DeletionVariantHashExpr: truncated multibyte UTF-8 must not crash") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    // parquet does not validate UTF-8: a dangling lead byte claims more
    // bytes than the buffer holds — must clamp, not overrun
    val expr = graft.functions.DeletionVariantHashExpr(
      BoundReference(0, StringType, nullable = false))
    for (bad <- Seq(Array(0xC3.toByte), Array('a'.toByte, 0xE2.toByte),
        Array(0xF0.toByte, 0x9F.toByte))) {
      val out = expr.eval(InternalRow(UTF8String.fromBytes(bad)))
        .asInstanceOf[ArrayData].toLongArray
      assert(out.nonEmpty, "identity hash plus clamped deletions expected")
    }
  }

  test("stateful CodegenFallback exprs: shared-instance concurrent eval is safe") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}
    import org.apache.spark.unsafe.types.UTF8String

    // ONE instance each, evaluated from many threads — the regime a shared
    // evaluator would create; ThreadLocal state must keep results identical
    val sha = graft.functions.Sha60TokenHashExpr(
      BoundReference(0, ArrayType(StringType), nullable = false))
    val hyp = graft.functions.HyperplaneSigExpr(
      BoundReference(0, ArrayType(DoubleType), nullable = false), 16, 3L)
    def tokRow(ts: Seq[String]): InternalRow =
      InternalRow(new GenericArrayData(ts.map(UTF8String.fromString)))
    def vecRow(vs: Seq[Double]): InternalRow = InternalRow(new GenericArrayData(vs))
    val tokIn = (0 until 32).map(i => Seq(s"tok$i", s"word$i", "shared"))
    val vecIn = (0 until 32).map(i => Seq.tabulate(16)(d => math.sin(i + d + 1)))
    val wantSha = tokIn.map(x =>
      sha.eval(tokRow(x)).asInstanceOf[ArrayData].toLongArray.toSeq)
    val wantHyp = vecIn.map(x => hyp.eval(vecRow(x)))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val fs = (0 until 8).map(_ => pool.submit(
        new java.util.concurrent.Callable[Boolean] {
          def call(): Boolean = (0 until 500).forall { k =>
            val i = k % tokIn.size
            sha.eval(tokRow(tokIn(i))).asInstanceOf[ArrayData].toLongArray.toSeq ==
              wantSha(i) && hyp.eval(vecRow(vecIn(i))) == wantHyp(i)
          }
        }))
      assert(fs.forall(_.get()),
        "concurrent shared-instance eval must match single-threaded results")
    } finally pool.shutdown()
  }

  test("PairExpandExpr: ids outside [0, 2^31) fail loudly, never corrupt") {
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    for (bad <- Seq(1L << 31, -1L)) {
      val e = intercept[Throwable] {
        Seq(Seq(1L, bad).sorted).toDF("ids")
          .select(VectorExpressions.pairExpandNative(col("ids")).as("p"))
          .collect()
      }
      assert(chain(e).exists(t =>
        Option(t.getMessage).exists(_.contains("graft_pair_expand"))),
        s"expected a loud pair_expand range failure for id $bad, got: $e")
    }
  }
}
