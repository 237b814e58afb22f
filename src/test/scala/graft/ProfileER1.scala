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
    val comp = t("matchComponents (full)")(
      ext.EntityResolution.matchComponents(recs, "id", "name", "sku", 0.75)
        .count())
    println(s"  -> $comp component rows")
    val full = t("full er1 query")(
      SparkEntry.queries("er1_golden_record")(spark, sfDir).count())
    println(s"  -> $full golden records")
    spark.stop()
  }
}
