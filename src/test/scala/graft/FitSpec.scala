package graft

import org.apache.spark.sql.functions._
import graft.ext.Fit

/** Exact fixed-point gradient descent (ext.Fit). */
class FitSpec extends SparkSpec {
  import spark.implicits._

  test("linearProbeGd: bias-only problem converges to the target") {
    // one feature (bias), y = 5: r = w − 5S, step = (w − 5S)/2 with
    // etaBits = 1 — a clean geometric contraction to w = 5·2^16
    val df = (1 to 64).map(i => (i.toLong, 5L)).toDF("id", "y")
    val out = Fit.linearProbeGd(df, Seq(lit(1L)), col("y"),
        iters = 30, scaleBits = 16, etaBits = 1)
      .orderBy(col("iter").desc).limit(1)
      .select("w0").as[Long].head()
    assert(math.abs(out - 5L * 65536L) <= 2, s"w0=$out should be ≈ ${5 * 65536}")
  }

  test("linearProbeGd: loss strictly decreases on the planted doc fixture") {
    val docs = core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), ext.TextAnalysis.tokens(col("text")).as("toks"),
        col("text"))
      .select(lit(1L).as("x0"),
        least(size(col("toks")).cast("long"), lit(100L)).as("x1"),
        least(size(array_distinct(col("toks"))).cast("long"), lit(100L)).as("x2"),
        least((length(col("text")) / 10).cast("long"), lit(100L)).as("x3"))
      .withColumn("y", lit(2L) * col("x1") + lit(3L) * col("x2") - col("x3") + lit(7L))
    val losses = Fit.linearProbeGd(docs,
        Seq(col("x0"), col("x1"), col("x2"), col("x3")), col("y"), iters = 4)
      .orderBy("iter").select("loss").as[Double].collect().toSeq
    assert(losses.size == 4)
    losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b < a, s"loss must strictly decrease: $losses") }
  }

  test("linearProbeGd: trajectory invariant under repartitioning") {
    val df = (1 to 200).map(i =>
      (i.toLong, (i % 7).toLong, (i % 11).toLong, (3 * (i % 7) - (i % 11) + 2).toLong))
      .toDF("id", "a", "b", "y")
    def run(parts: Int) = Fit.linearProbeGd(df.repartition(parts),
        Seq(lit(1L), col("a"), col("b")), col("y"), iters = 5)
      .orderBy("iter").collect().toSeq.map(_.toString)
    assert(run(13) == run(3), "integer GD must not depend on partitioning")
  }
}
