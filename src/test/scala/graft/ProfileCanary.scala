package graft

import org.apache.spark.sql.SparkSession

/** Measure the bench drift-canary's OWN curve on an idle JVM (round-13
  * verdict #2: canary_start has exceeded canary_end for three rounds even
  * after a throwaway warmup pass — is that the box warming UP over a
  * session, or warmup induced by executing the ~300-query suite?). This
  * main executes NOTHING but the canary: warm-touch tables exactly like
  * Bench, throwaway pass, then the identical min-of-3 probe every ~20 s
  * for ~4 minutes with the JVM otherwise idle. A falling curve here means
  * the box/JVM itself speeds up with session age (and per-query deltas
  * must be read against the END canary); a flat curve means the in-run
  * inversion comes from the query executions themselves.
  */
object ProfileCanary {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.core.Tables.events(spark, sfDir).count()
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"))
      graft.core.Tables.table(spark, sfDir, t).count()
    def canary(): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        spark.range(0, 8000000L, 1, 8)
          .selectExpr("id % 1024 AS k", "pmod(xxhash64(id), 1000003) AS h")
          .groupBy("k").agg(org.apache.spark.sql.functions.sum("h"))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(math.min(once(), once()), once())
    }
    canary() // the same throwaway Bench runs
    val t0 = System.nanoTime()
    for (i <- 0 until 12) {
      val v = canary()
      val at = (System.nanoTime() - t0) / 1e9
      println(f"[canary-curve] t=$at%6.1fs sample=$i%2d min3=$v%.3f")
      Thread.sleep(20000)
    }
    spark.stop()
  }
}
