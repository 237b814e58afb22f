package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc finalized-plan dump: sbt "Test/runMain graft.ShowPlan <name> [sfDir]"
  * — collect()s the query so AQE finalizes, then prints the executed plan
  * (the same discipline as DumpPlans' inventory). */
object ShowPlan {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: ShowPlan <query> [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
