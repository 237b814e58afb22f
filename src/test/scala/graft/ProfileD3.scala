package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Par, Tables}
import graft.ext.Dedup

object ProfileD3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $label%-22s ${(System.nanoTime()-t0)/1e9}%8.2f s  -> $r")
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, d)
    val base = Par.fanOut(docs.select(col("doc_id").as("id"), graft.ext.TextAnalysis.tokens(col("text")).as("toks")))
    time("base fanout")(base.count() + " parts=" + base.rdd.getNumPartitions)
    val sh = base.select(col("id"), Dedup.shingleHashesFromTokens(col("toks")).as("shh")).where(size(col("shh")) > 0)
    time("shingleHashes(32p)")(sh.selectExpr("sum(size(shh))").collect()(0))
    val sig = sh.select(col("id"), Dedup.minhashSignature(col("shh"), 128).as("sig"))
    time("signatures")(sig.selectExpr("sum(size(sig))").collect()(0))
    val banded = sig.select(col("id"), posexplode(
      transform(sequence(lit(0), lit(31)), b => hash(slice(col("sig"), b * 4 + 1, lit(4))))).as(Seq("band", "bh")))
    time("banding")(banded.count())
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct()
    time("candidates")(cand.count())
    time("full d3 (1st)")(Dedup.minhashLshPairs(docs, "doc_id", "text").count())
    time("full d3 (2nd)")(Dedup.minhashLshPairs(docs, "doc_id", "text").count())
    time("full d2 (1st)")(Dedup.ngramJaccardPairs(docs, "doc_id", "text").count())
    time("full d2 (2nd)")(Dedup.ngramJaccardPairs(docs, "doc_id", "text").count())
    spark.stop()
  }
}
