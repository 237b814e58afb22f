package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc per-query timing: sbt "Test/runMain graft.ProfileQ <name>[,<name>…] [sfDir]"
  * — same session config as Bench, min-of-two like the bench, so numbers
  * are comparable without running the whole suite. */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(',').toSeq)
      .getOrElse(sys.error("usage: ProfileQ <query>[,<query>…] [sfDir]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFQ $name%-28s ${math.min(once(), once())}%7.2f s (min of 2)")
    }
    spark.stop()
  }
}
