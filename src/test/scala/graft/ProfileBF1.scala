package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing for bf1's pieces at a given sf dir. */
object ProfileBF1 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.{Dedup, TextAnalysis}
    val docs = graft.core.Tables.documents(spark, sfDir).select("doc_id", "text")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val archive = docs.where(col("doc_id") % 2 === 0)
    time("archive fingerprint count") {
      archive.select(TextAnalysis.fingerprint(col("text")).as("fp")).count()
    }
    time("bloom agg only") {
      archive.select(TextAnalysis.fingerprint(col("text")).as("fp"))
        .agg(graft.functions.Bloom.bloomAgg(1 << 23, 5)(xxhash64(col("fp")))).collect()
    }
    time("bloom agg small (1<<16)") {
      archive.select(TextAnalysis.fingerprint(col("text")).as("fp"))
        .agg(graft.functions.Bloom.bloomAgg(1 << 16, 5)(xxhash64(col("fp")))).collect()
    }
    val batch = docs.union(docs.select((col("doc_id") + 100000).as("doc_id"), col("text")))
    time("full dedupIncrementalBloom") {
      Dedup.dedupIncrementalBloom(batch, archive, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    time("plain dedupIncremental") {
      Dedup.dedupIncremental(batch, archive, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    time("plain again (warm)") {
      Dedup.dedupIncremental(batch, archive, "doc_id", "text")
        .write.format("noop").mode("overwrite").save()
    }
    time("batch fp+groupBy only") {
      graft.core.Par.fanOut(batch.select(col("doc_id"), col("text")))
        .groupBy(TextAnalysis.fingerprint(col("text")).as("content_fp"))
        .agg(min(col("doc_id")).as("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    time("batch count") { println(batch.count()) }
    spark.stop()
  }
}
