package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Timing of the PQ build/query lifecycle at sf0.1 — attribution for
  * pq1..pq6s (and pipe2s's PQ leg). The corpus is 2 000 vectors at this
  * scale, so the build is job-overhead-bound: the cost driver is the
  * number of driver actions the m-subspace k-means training pays
  * (round 16: m·iters per-subspace jobs → one lockstep job per round).
  * Run: SPARK_GRAFT_CPUS=32 sbt "Test/runMain graft.ProfilePq [sfDir]" */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val actions = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            d: Long): Unit = actions.incrementAndGet()
        override def onFailure(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            e: Exception): Unit = actions.incrementAndGet()
      })
    def t[A](label: String)(f: => A): A = {
      Thread.sleep(300) // listener delivery is async
      val a0 = actions.get()
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[pq-prof] $label%-30s $dt%7.2f s  actions=${actions.get() - a0}")
      r
    }
    for (round <- 0 until 2) {
      println(s"[pq-prof] ===== round $round =====")
      val emb = graft.core.Tables.table(spark, sfDir, "embeddings")
      val dims = emb.select(size(col("embedding"))).head().getInt(0)
      val dir = graft.core.Scratch.dir("pqprof-")
      t("writePqIndex (build+train)") {
        graft.ext.Similarity.writePqIndex(emb, "vec_id", "embedding", dir,
          dims = dims)
      }
      t("append (odd half, fresh=0)") {
        graft.ext.Similarity.appendToPqIndex(
          emb.where(col("vec_id") % 2 === 1), "vec_id", "embedding", dir)
      }
      val queries = emb.where(col("vec_id") % 500 === 0)
      t("pqTopKFromIndex") {
        graft.ext.Similarity.pqTopKFromIndex(spark, dir,
            emb.select(col("vec_id"), col("embedding").as("v")),
            queries, "vec_id", "embedding", k = 5)
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
