package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for cur2's stages (not a spec).
  * Usage: sbt "Test/runMain graft.ProfileCur2 [sfDir]" */
object ProfileCur2 {
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
    def run() = SparkEntry.queries("cur2_fuzzy_curation")(spark, sfDir).count()
    t("full cur2 (cold)")(run())
    t("full cur2 run2")(run())
    val pu = {
      val m = core.Tables.documents(spark, sfDir)
        .agg(max("doc_id")).head().getLong(0)
      m / 3 * 3 + 4 // mirror SparkEntry.plantUnit
    }
    val docs = core.Tables.documents(spark, sfDir).select("doc_id", "text")
    val planted = docs
      .union(docs.select((col("doc_id") + pu).as("doc_id"), col("text")))
      .union(docs.select((col("doc_id") + 2 * pu).as("doc_id"),
        concat(col("text"), lit(" graftdup")).as("text")))
      .localCheckpoint()
    t("planted checkpoint")(())
    val src = graft.core.Par.fanOut(planted)
    val stats = ext.TextAnalysis.withTextStats(src)
      .where(col("n_tokens") >= 20 && col("stopword_ratio") >= 0.04)
      .withColumn("fp", ext.TextAnalysis.fingerprint(col("text")))
    val kept = stats.groupBy("fp")
      .agg(min(col("doc_id")).as("doc_id"), min(col("n_tokens")).as("n_tokens"),
        min(col("text")).as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("kept persist")(println(s"  -> ${kept.count()} kept"))
    val pairs = ext.Dedup.minhashLshPairs(kept, "doc_id", "text")
    t("lsh pairs")(println(s"  -> ${pairs.count()} pairs"))
    val roots = ext.Dedup.clusterRoots(pairs)
    t("clusterRoots")(println(s"  -> ${roots.count()} roots"))
    spark.stop()
  }
}
