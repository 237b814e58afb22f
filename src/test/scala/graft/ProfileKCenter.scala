package graft

/** Scaling evidence for the kc1 incremental running-min rework (round-12
  * verdict #2): kcenterGonzalez now folds only each round's ONE new
  * center into a cached (vec_id, qv, dmin) frame, so total distance work
  * is O(k·dim·N) — wall time per round should stay FLAT as k grows,
  * where the old full-recompute's round cost grew linearly in k (O(k²)
  * total). Run via `Test/runMain graft.ProfileKCenter
  * /root/testdata/sf0.1` and read the per-k seconds: near-linear in k
  * confirms one distance kernel per round.
  */
object ProfileKCenter {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    val emb = core.Tables.embeddings(spark, dir)
    emb.count() // warm the scan
    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      for (k <- Seq(4, 8, 16, 32)) {
        val t0 = System.nanoTime()
        val n = ext.Clustering.kcenterGonzalez(emb, "vec_id", "embedding", k)
          .count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"PROFILE kcenter k=$k%-3d ${sec}%.2f s  ($n rows, ${sec / k}%.3f s/round)")
      }
    }
    spark.stop()
  }
}
