package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Par, Tables}
import graft.ext.{Dedup, TextAnalysis}
object ProfileD2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-18s ${(System.nanoTime()-t0)/1e9}%7.2f s -> $r")
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, d)
    val base = Par.fanOut(docs.select(col("doc_id").as("id"), TextAnalysis.tokens(col("text")).as("toks")))
    val sh = base.select(col("id"), Dedup.shingleHashesFromTokens(col("toks")).as("shh"))
    val inv0 = sh.select(col("id"), explode(col("shh")).as("s"))
    val ids = inv0.groupBy("s").agg(sort_array(collect_list(col("id"))).as("ids"))
      .where(size(col("ids")) > 1 && size(col("ids")) <= 10000)
    val pairs = ids.select(explode(graft.functions.VectorExpressions.pairExpandNative(col("ids"))).as("p"))
    val shared = pairs.groupBy(col("p")).agg(count(lit(1)).as("c"))
    time("sh")(sh.count())
    time("inv0")(inv0.count())
    time("ids")(ids.count())
    time("pairs")(pairs.count())
    time("shared")(shared.count())
    time("full")(Dedup.ngramJaccardPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
