package graft

import org.apache.spark.sql.SparkSession

/** Dev experiment: er1 wall time with AQE on vs off (not a spec).
  * Usage: sbt "Test/runMain graft.ProfileER1b [sfDir]" */
object ProfileER1b {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    def run() = SparkEntry.queries("er1_golden_record")(spark, sfDir).count()
    t("warm (aqe on)")(run())
    t("aqe on  run2")(run())
    t("aqe on  run3")(run())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t("aqe off run1")(run())
    t("aqe off run2")(run())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    t("aqe on  run4")(run())
    spark.stop()
  }
}
