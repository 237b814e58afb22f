package graft

import org.apache.spark.sql.functions._

/** Stage-level profiling for the mst3 lifecycle at an arbitrary SF dir:
  * edge generation, build fixpoint, append fixpoint, store read — run via
  * `Test/runMain graft.ProfileMST /root/testdata/sf0.1`. */
object ProfileMST {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROFILE $tag%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      val p = t("frequentPairs") {
        queries.Basket.frequentPairs(core.Tables.lineitem(spark, dir), 2L)
          .localCheckpoint()
      }
      val w = greatest(lit(1L), lit(8L) - col("n_orders"))
      val e = p.select(col("part_a").as("src"), col("part_b").as("dst"), w.as("w"))
        .unionByName(p.select(col("part_b").as("src"), col("part_a").as("dst"),
          w.as("w")))
      val msf = core.Scratch.dir(s"profile-mst3-$pass-") + "/msf"
      t("writeMsfForest(even)") {
        ext.Graph.writeMsfForest(e.where((col("src") + col("dst")) % 2 === 0), msf)
      }
      t("appendToMsfForest(odd)") {
        ext.Graph.appendToMsfForest(e.where((col("src") + col("dst")) % 2 === 1), msf)
      }
      t("msfFromStore+collect") {
        ext.Graph.msfFromStore(spark, msf).orderBy("a", "b").collect()
      }
      t("boruvkaForest(full)") {
        ext.Graph.boruvkaForest(e).collect()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
