package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Round-17 optimization evidence: writes `plans/r17/<query>_<tag>.txt`
  * with BOTH the formatted explain (initial adaptive plan — where
  * PushedFilters/ReadSchema are legible) and the FINALIZED executed plan
  * (isFinalPlan=true — where ReusedExchange and runtime join strategy are
  * real; the DumpPlans lesson).
  *
  * Usage: sbt "Test/runMain graft.DumpR17Plans <before|after> q1,q2,..."
  * Runs at sf0.001 (plan SHAPE is scale-independent; AQE numbers are not
  * comparable to sf0.1 runtimes and are not the claim being evidenced). */
object DumpR17Plans {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: DumpR17Plans <tag> <q1,q2,...>")
    val tag = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    Files.createDirectories(Paths.get("/root/repo/plans/r17"))
    names.foreach { name =>
      // rfm1's public entry localCheckpoints (the qq1 release contract),
      // so its graded plan is just a checkpoint scan — the pseudo-name
      // dumps the REAL pre-materialization pipeline instead (the shape
      // the single-reducer claim is about)
      val df = if (name == "rfm1_internal") {
        import org.apache.spark.sql.functions.col
        graft.queries.Behavior.rfmScoresLazy(
          graft.core.Tables.orders(spark, sf), col("o_custkey"),
          col("o_orderdate"), col("o_totalprice"), 5)._1.orderBy("cust")
      } else SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))(spark, sf)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      df.collect() // finalize the adaptive plan (count() derives a different plan)
      val finalized = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val out = new StringBuilder
      out.append(s"# $name ($tag, sf0.001)\n\n")
      out.append("== explain(\"formatted\") ==\n\n")
      out.append(formatted)
      out.append("\n\n== finalized adaptive plan (executed; isFinalPlan=true) ==\n\n")
      out.append(finalized)
      Files.writeString(
        Paths.get(s"/root/repo/plans/r17/${name}_$tag.txt"), out.toString)
      println(s"WROTE plans/r17/${name}_$tag.txt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
