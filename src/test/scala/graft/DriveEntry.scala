package graft

import org.apache.spark.sql.SparkSession

/** Mimics the driver's smoke check: fresh default session, call entry(). */
object DriveEntry {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println(s"ENTRY_ROWS=${df.count()} SCHEMA=${df.schema.map(_.name).mkString(",")}")
    spark.stop()
  }
}
