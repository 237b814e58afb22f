package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Par, Tables}

object ProfileD6 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s -> $r")
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val part = Tables.part(spark, d)
    println("rows=" + part.count())
    val base = Par.fanOut(part.select(col("p_partkey").as("id"), col("p_name").as("t")))
    val postings = base.select(explode(
      graft.functions.VectorExpressions.deletionVariantHashesNative(col("t"))).as("vh"), col("id"))
    val ids = postings.groupBy("vh").agg(sort_array(collect_list(col("id"))).as("ids"))
      .where(size(col("ids")) > 1)
    val pairs = ids.select(explode(
      graft.functions.VectorExpressions.pairExpandNative(col("ids"))).as("p"))
    val cand = pairs.distinct()
    time("postings")(postings.count())
    time("ids")(ids.count())
    time("maxlist")(ids.agg(max(size(col("ids")))).head())
    time("pairs")(pairs.count())
    time("cand")(cand.count())
    time("full")(graft.ext.Dedup.editDistancePairs(part, "p_partkey", "p_name").count())
    spark.stop()
  }
}
