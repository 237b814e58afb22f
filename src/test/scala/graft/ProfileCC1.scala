package graft

import org.apache.spark.sql.SparkSession

object ProfileCC1 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.core.Tables.documents(spark, d).count()
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $label%-14s ${(System.nanoTime()-t0)/1e9}%8.2f s  -> $r")
    }
    for (i <- 1 to 3)
      time(s"cc1 run$i") {
        SparkEntry.queries("cc1_contamination")(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
    spark.stop()
  }
}
