package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Regenerates PLANS.md: formatted physical plans for the scale-critical
  * queries, as reviewable evidence of pushdown/broadcast/top-k plan shapes.
  * Run: sbt "Test/runMain graft.DumpPlans"  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.core.Tables.NanosAsLongKey, "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val picks = Seq(
      "s2_hour_slice", "q1_pricing_summary", "a5_email_1h", "q3_top_orders",
      "w1_top_order_per_customer", "q4_priority_semijoin", "d3_minhash_lsh",
      "sim1_ann_topk", "d5_emb_neardup", "rj1_price_band", "x2_tfidf",
      "a9_salted_total", "x1_top_tokens", "q11_important_parts",
      "q13_order_distribution", "d6_editdist")
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans (auto-generated)\n\n")
    sb.append("Regenerate with `sbt \"Test/runMain graft.DumpPlans\"` (sf0.001 inputs).\n")
    sb.append("What to look for: `PushedFilters` on scans, `BroadcastHashJoin` for\n")
    sb.append("dimensions, `TakeOrderedAndProject` for top-k, `WindowGroupLimit`\n")
    sb.append("for rank<=k, `partial_sum` map-side combines.\n")
    picks.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      sb.append(s"\n## $name\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(8000))
      sb.append("\n```\n")
    }
    // Whole-suite efficiency inventory from FINALIZED adaptive plans (the
    // initial plan hides ReusedExchange — each query is executed first).
    // Columns are node counts in the printed tree: reused exchanges print
    // once as a reference, so scans/shuffles count actual executions.
    sb.append("\n## Plan inventory — all graded queries (finalized plans, sf0.001)\n\n")
    sb.append("| query | scans | shuffles | broadcasts | reused exchanges |\n")
    sb.append("|---|---|---|---|---|\n")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sf)
      df.collect()
      // the finalized AdaptiveSparkPlan prints final + "Initial Plan"
      // sections — keep only the final one or every count doubles
      val p = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      def c(pat: String) = pat.r.findAllIn(p).length
      val shuffles = c("Exchange hashpartitioning") + c("Exchange rangepartitioning") +
        c("Exchange RoundRobinPartitioning") + c("Exchange SinglePartition")
      sb.append(s"| $name | ${c("FileScan parquet")} | $shuffles | " +
        s"${c("BroadcastExchange")} | ${c("ReusedExchange")} |\n")
    }
    Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
    println("WROTE /root/repo/PLANS.md")
    spark.stop()
  }
}
