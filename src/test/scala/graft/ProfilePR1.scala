package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfilePR1 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def edges() = {
      val e0 = graft.core.Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
        .join(graft.core.Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), (col("l_suppkey") + 1000000000L).as("s"))
        .distinct()
      e0.select(col("c").as("src"), col("s").as("dst"))
        .union(e0.select(col("s").as("src"), col("c").as("dst")))
    }
    time("edge build count") { println("edges=" + edges().count()) }
    for (k <- Seq(1, 2, 3)) {
      time(s"pagerank iters=$k") {
        graft.ext.Graph.pageRankFixedPoint(edges(), iterations = k)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
