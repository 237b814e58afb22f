package graft

import org.apache.spark.sql.SparkSession

/** Dev helper: run ONE named SparkEntry query exactly as Verify would
  * (same session config), write it to parquet, print rows or the error.
  * Usage: sbt "Test/runMain graft.DriveQuery <name> [sfDir] [outDir]" */
object DriveQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) args(2) else s"/tmp/drivequery/$name"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(outDir)
      println(s"OK rows=${spark.read.parquet(outDir).count()} out=$outDir")
    } catch {
      case e: Throwable =>
        println(s"QUERY FAILED: $name")
        e.printStackTrace()
        sys.exit(1)
    } finally spark.stop()
  }
}
