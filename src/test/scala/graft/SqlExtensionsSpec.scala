package graft

import org.apache.spark.sql.SparkSession
import graft.functions.VectorExpressions
import graft.plans.{GraftExtensions, GraftFunctions}
import org.apache.spark.sql.functions._

/** The SQL registration surface must expose exactly the semantics of the
  * DataFrame-API column builders — same expressions, two entry points. */
class SqlExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("GraftFunctions.register: SQL calls match the DataFrame-API builders") {
    GraftFunctions.register(spark)

    assert(spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .as[Double].head() == 11.0)

    val sqlVariants = spark.sql(
      "SELECT graft_deletion_variant_hashes('promo steel')").as[Seq[Long]].head()
    val apiVariants = Seq("promo steel").toDF("t")
      .select(VectorExpressions.deletionVariantHashesNative(col("t")))
      .as[Seq[Long]].head()
    assert(sqlVariants == apiVariants)

    val sqlShingles = spark.sql(
      "SELECT graft_shingle_hashes(array('a','b','c','d'), 2)").as[Seq[Long]].head()
    val apiShingles = Seq(Seq("a", "b", "c", "d")).toDF("toks")
      .select(VectorExpressions.shingleHashesNative(col("toks"), 2))
      .as[Seq[Long]].head()
    assert(sqlShingles == apiShingles && sqlShingles.nonEmpty)

    assert(spark.sql("SELECT graft_pair_expand(array(1L, 2L, 3L))")
      .as[Seq[Long]].head() == Seq((1L << 32) | 2L, (1L << 32) | 3L, (2L << 32) | 3L))

    val sqlSig = spark.sql(
      "SELECT graft_hyperplane_sig(array(0.5D, -1.0D, 2.0D), 8, 1)").as[Long].head()
    val apiSig = Seq(Seq(0.5, -1.0, 2.0)).toDF("v")
      .select(VectorExpressions.hyperplaneSigNative(col("v"), 8, 1L)).as[Long].head()
    assert(sqlSig == apiSig)

    // sizing args are codegen parameters — a non-literal must fail loudly
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingle_hashes(array('a','b'), cast(rand()*3 AS INT))")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"), e.getMessage)
  }

  test("GraftExtensions entry point registers the same table at session build") {
    // `--conf spark.sql.extensions=graft.plans.GraftExtensions` is a STATIC
    // conf read from the SparkContext, which this JVM already holds — so
    // drive the same injection hook programmatically (withExtensions calls
    // exactly what the conf path calls) on a fresh session object over the
    // existing context, then restore the suite session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val extSession = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(extSession ne spark, "extensions need a fresh session object")
      assert(extSession.sql("SELECT graft_simhash64(array(3L, 3L, 3L))")
        .collect().head.getLong(0) == 3L,
        "unanimous token votes reproduce the shared bits")
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("RewriteHofDotProduct: HOF pattern becomes the native kernel, results bit-equal") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = SparkSession.builder()
        .withExtensions(new GraftExtensions).getOrCreate()
      def hof(df: org.apache.spark.sql.DataFrame) =
        df.select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
          lit(0.0), (acc, x) => acc + x).as("d"))

      // dense double arrays from PARQUET (a literal local relation would be
      // constant-folded before the plan can be inspected): the rule fires
      // and values match the un-rewritten session bit-for-bit
      val p = tmpDir("dot-rewrite")
      ext.createDataFrame(Seq(
          (Array(1.5, -2.0, 3.25), Array(0.5, 4.0, -1.0)),
          (Array(0.1, 0.2), Array(0.3, 0.7)),
          (Array(1.0, 2.0, 3.0), Array(1.0, 2.0)))) // length mismatch → null
        .toDF("a", "b").write.mode("overwrite").parquet(p)
      val extDf = hof(ext.read.parquet(p))
      assert(extDf.queryExecution.optimizedPlan.toString.contains("graft_dot"),
        extDf.queryExecution.optimizedPlan.toString)
      val plainDf = hof(spark.read.parquet(p))
      val got = extDf.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      val want = plainDf.collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      assert(got.toSeq == want.toSeq && got.count(_.isEmpty) == 1,
        s"got=${got.toSeq} want=${want.toSeq} (exactly the mismatched row is null)")

      // null ELEMENT: the HOF nulls the whole fold; strict mode must do
      // the same (parquet-read arrays are always nullable-element, so the
      // rule still fires — equivalence comes from strictness, not typing)
      import ext.implicits._
      val np = tmpDir("dot-rewrite-null")
      Seq((Seq[Option[Double]](Some(1.0), None),
        Seq[Option[Double]](Some(2.0), Some(3.0))))
        .toDF("a", "b").write.mode("overwrite").parquet(np)
      val ndf = hof(ext.read.parquet(np))
      assert(ndf.queryExecution.optimizedPlan.toString.contains("graft_dot"))
      assert(ndf.collect().head.isNullAt(0),
        "null element must null the strict dot exactly like the HOF")
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
