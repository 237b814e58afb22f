package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Speed
import graft.core.Sinks

/** Dev harness (not a test): drives the streaming layer end-to-end through
  * the public API, printing what a reviewer would inspect. */
object DriveStreaming {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[String]
    val parsed = Speed.parseJson(in.toDF(), "value")
    val agg = Speed.windowedSumLong(parsed, col("antenna_id"), "timestamp",
      "90 seconds", "15 seconds", col("bytes"), "antenna_bytes_total")
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("drive").start()
    in.addData("""{"timestamp":"2022-02-26T00:00:10Z","id":"u1","antenna_id":"ant1","bytes":100,"app":"FB"}""",
               """{"timestamp":"2022-02-26T00:02:00Z","id":"u2","antenna_id":"ant2","bytes":7,"app":"IG"}""")
    q.processAllAvailable()
    in.addData("""{"timestamp":"2022-02-26T00:00:20Z","id":"u3","antenna_id":"ant1","bytes":999,"app":"FB"}""",
               """{"timestamp":"2022-02-26T00:05:00Z","id":"u1","antenna_id":"ant3","bytes":1,"app":"IG"}""")
    q.processAllAvailable()
    println("DRIVE_RESULT_BEGIN")
    spark.table("drive").orderBy("timestamp", "id").show(false)
    println("DRIVE_RESULT_END")
    q.stop()
    val path = java.nio.file.Files.createTempDirectory("drv").toString
    val in2 = MemoryStream[String]
    val q2 = Sinks.archiveStream(Speed.parseJson(in2.toDF(), "value"),
      "timestamp", s"$path/data", s"$path/chk").start()
    in2.addData("""{"timestamp":"2022-02-26T13:10:00Z","id":"u2","antenna_id":"ant2","bytes":50,"app":"IG"}""")
    q2.processAllAvailable(); q2.stop()
    println("ARCHIVE_LAYOUT: " +
      new java.io.File(s"$path/data/year=2022/month=2/day=26/hour=13").isDirectory)
    spark.stop()
  }
}
