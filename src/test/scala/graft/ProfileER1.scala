package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev profiler for er1's stages (not a spec). Usage:
  * sbt "Test/runMain graft.ProfileER1 [sfDir]" */
object ProfileER1 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    val pu = {
      val m = core.Tables.table(spark, sfDir, "part")
        .agg(max("p_partkey")).head().getLong(0)
      m / 2 * 2 + 2
    }
    val p0 = core.Tables.table(spark, sfDir, "part").select(
      col("p_partkey").cast("long").as("pk"),
      concat_ws(" ", col("p_name"), col("p_brand"), col("p_type")).as("p_name"),
      col("p_retailprice").cast("double").as("price"))
    val sku = concat(lit("S"), col("pk"))
    val recs = p0.select(col("pk").as("id"), col("p_name").as("name"),
        sku.as("sku"), col("price"))
      .unionAll(p0.where(col("pk") % 10 === 0)
        .select((col("pk") + pu).as("id"),
          concat(lit("zz "), col("p_name")).as("name"),
          lit(null).cast("string").as("sku"), (col("price") + 10).as("price")))
      .unionAll(p0.where(col("pk") % 10 === 1)
        .select((col("pk") + 2 * pu).as("id"),
          concat(lit("listing "), col("pk").cast("string")).as("name"),
          sku.as("sku"), (col("price") - 5).as("price")))
      .unionAll(p0.where(col("pk") % 20 === 0)
        .select((col("pk") + 3 * pu).as("id"),
          concat(lit("yy "), col("p_name")).as("name"),
          lit(null).cast("string").as("sku"), (col("price") + 20).as("price")))
    t("warm recs")(recs.write.format("noop").mode("overwrite").save())
    val np = t("namePairs (prefix join)")(
      ext.Dedup.setJaccardPairsPrefix(recs, "id", "name", 0.75).count())
    println(s"  -> $np name pairs")
    val np2 = t("namePairs again (warm)")(
      ext.Dedup.setJaccardPairsPrefix(recs, "id", "name", 0.75).count())
    println(s"  -> $np2 name pairs")
    val keyPairs = recs
      .select(col("id").cast("long").as("id"), col("sku").as("k"))
      .where(col("k").isNotNull)
      .groupBy("k").agg(array_distinct(sort_array(collect_list(col("id")))).as("ids"))
      .where(size(col("ids")) > 1)
      .select(explode(
        graft.functions.VectorExpressions.pairExpandNative(col("ids"))).as("p"))
      .select(call_function("shiftright", col("p"), lit(32)).as("id_a"),
        col("p").bitwiseAND(lit(0xffffffffL)).as("id_b"))
    val nk = t("keyPairs")(keyPairs.count())
    println(s"  -> $nk key pairs")
    val allPairs = keyPairs.union(
      ext.Dedup.setJaccardPairsPrefix(recs, "id", "name", 0.75)
        .select(col("id_a"), col("id_b"))).localCheckpoint()
    t("pairs checkpoint")(())
    val nr = t("clusterRoots on pairs")(
      ext.Dedup.clusterRoots(allPairs).count())
    println(s"  -> $nr labeled")
    val comp = t("matchComponents (full)")(
      ext.EntityResolution.matchComponents(recs, "id", "name", "sku", 0.75)
        .count())
    println(s"  -> $comp component rows")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(js.jobId, js.time)
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = jobs.getOrDefault(je.jobId, je.time)
        println(f"    job ${je.jobId}%4d  ${(je.time - t0) / 1e3}%6.2f s")
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val nr2 = t("clusterRoots again (jobs)")(
      ext.Dedup.clusterRoots(allPairs).count())
    println(s"  -> $nr2 labeled")
    val full = t("full er1 query")(
      SparkEntry.queries("er1_golden_record")(spark, sfDir).count())
    println(s"  -> $full golden records")
    spark.sparkContext.removeSparkListener(listener)
    spark.stop()
  }
}
