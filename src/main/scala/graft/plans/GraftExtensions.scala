package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType, LongType}
import graft.functions._

/** SQL surface for the native graft expressions: pure-SQL users (spark.sql,
  * JDBC/Thrift, notebooks) get the same codegen'd kernels the DataFrame API
  * uses — `SELECT graft_dot(a, b)`, `graft_shingle_hashes(toks, 3)`, … —
  * instead of reimplementing them as slow UDFs.
  *
  * Two registration paths, one function table:
  *  - cluster deployment: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  *    (applied at session construction, the standard extension mechanism);
  *  - live session (tests/notebooks): `GraftFunctions.register(spark)`.
  *
  * Sizing arguments (shingle n, signature bits/width, seeds) must be
  * INTEGER LITERALS: they parameterize code generation / per-instance
  * tables, a per-row value cannot. The builders fail loudly at analysis
  * time otherwise.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => RewriteHofDotProduct)
  }
}

object GraftFunctions {
  type FnDef = (FunctionIdentifier, ExpressionInfo,
    Seq[Expression] => Expression)

  private def intLit(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def longLit(e: Expression, fn: String, arg: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType)   => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], ns: Int*): Unit =
    require(ns.contains(args.size),
      s"$fn expects ${ns.mkString(" or ")} arguments, got ${args.size}")

  private def dbl(e: Expression): Expression = Cast(e, ArrayType(DoubleType))

  private def fn(name: String, clazz: Class[_])(
      builder: Seq[Expression] => Expression): FnDef =
    (FunctionIdentifier(name),
      new ExpressionInfo(clazz.getCanonicalName, name), builder)

  /** The whole SQL-visible function table (names mirror prettyName). */
  val all: Seq[FnDef] = Seq(
    fn("graft_dot", classOf[DotProductExpr]) { args =>
      arity("graft_dot", args, 2)
      DotProductExpr(dbl(args(0)), dbl(args(1)))
    },
    fn("graft_minhash_sig", classOf[MinHashSigExpr]) { args =>
      arity("graft_minhash_sig", args, 2)
      MinHashSigExpr(args(0), intLit(args(1), "graft_minhash_sig", "numHashes"))
    },
    fn("graft_simhash64", classOf[SimHash64Expr]) { args =>
      arity("graft_simhash64", args, 1)
      SimHash64Expr(args(0))
    },
    fn("graft_shingle_hashes", classOf[ShingleHashExpr]) { args =>
      arity("graft_shingle_hashes", args, 2)
      ShingleHashExpr(args(0), intLit(args(1), "graft_shingle_hashes", "n"))
    },
    fn("graft_pair_expand", classOf[PairExpandExpr]) { args =>
      arity("graft_pair_expand", args, 1)
      PairExpandExpr(args(0))
    },
    fn("graft_pair_cross_expand", classOf[PairCrossExpandExpr]) { args =>
      arity("graft_pair_cross_expand", args, 2)
      PairCrossExpandExpr(args(0), args(1))
    },
    fn("graft_deletion_variant_hashes", classOf[DeletionVariantHashExpr]) { args =>
      arity("graft_deletion_variant_hashes", args, 1)
      DeletionVariantHashExpr(args(0))
    },
    fn("graft_cjk_count", classOf[CjkCountExpr]) { args =>
      arity("graft_cjk_count", args, 1)
      CjkCountExpr(args(0))
    },
    fn("graft_token_len_sum", classOf[TokenLenSumExpr]) { args =>
      arity("graft_token_len_sum", args, 1)
      TokenLenSumExpr(args(0))
    },
    fn("graft_top_token_count", classOf[TopTokenCountExpr]) { args =>
      arity("graft_top_token_count", args, 1)
      TopTokenCountExpr(args(0))
    },
    fn("graft_xx_token_hashes", classOf[XxTokenHashExpr]) { args =>
      arity("graft_xx_token_hashes", args, 1)
      XxTokenHashExpr(args(0))
    },
    fn("graft_sha60_token_hashes", classOf[Sha60TokenHashExpr]) { args =>
      arity("graft_sha60_token_hashes", args, 1)
      Sha60TokenHashExpr(args(0))
    },
    fn("graft_hyperplane_sig", classOf[HyperplaneSigExpr]) { args =>
      arity("graft_hyperplane_sig", args, 2, 3)
      HyperplaneSigExpr(dbl(args(0)),
        intLit(args(1), "graft_hyperplane_sig", "bits"),
        if (args.size == 3) longLit(args(2), "graft_hyperplane_sig", "seed") else 0L)
    },
  )

  /** Register every graft function into a live session. Idempotent
    * (registerFunction overwrites). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, b) => Bridge.registerFunction(spark, id, info, b) }
}
