package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Dev profiler for setJaccardPairsPrefix's internal stages (not a spec).
  * Usage: sbt "Test/runMain graft.ProfileSSJ [sfDir]" */
object ProfileSSJ {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
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
      .localCheckpoint()
    t("warm recs")(recs.write.format("noop").mode("overwrite").save())

    val minJaccard = 0.75
    val V = graft.functions.VectorExpressions
    val sh0 = graft.core.Par.fanOut(
        recs.select(col("id").cast("long").as("id"),
          sort_array(array_distinct(ext.Dedup.shingleHashesFromTokens(
            ext.TextAnalysis.tokens(col("name")), 1))).as("ts")))
      .where(size(col("ts")) > 0)
    val groups = sh0.groupBy("ts")
      .agg(array_distinct(sort_array(collect_list(col("id")))).as("members"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("groups persist")(println(s"  -> ${groups.count()} distinct sets"))
    val reps = groups.select(col("members").getItem(0).as("id"), col("ts"))
    val postings = reps.select(col("id"), explode(col("ts")).as("s"))
    val dfreq = postings.groupBy("s").agg(count(lit(1)).as("df"))
    t("dfreq")(println(s"  -> ${dfreq.count()} vocab"))
    val wRank = Window.partitionBy("id").orderBy(col("df"), col("s"))
    val ranked = postings.join(dfreq, "s")
      .select(col("id"), col("s"), row_number().over(wRank).as("rk"),
        count(lit(1)).over(Window.partitionBy("id")).as("m"))
    val prefix = ranked.where(col("rk") <=
      col("m") - ceil(lit(minJaccard) * col("m") - lit(1e-9)) + 1)
    t("prefix rank")(println(s"  -> ${prefix.count()} prefix postings"))
    val packedv = shiftleft(col("rk").cast("long"), 47)
      .bitwiseOR(shiftleft(col("m").cast("long"), 31))
      .bitwiseOR(col("id"))
    val candF = prefix
      .select(col("s"), packedv.as("pv"))
      .groupBy("s").agg(sort_array(collect_list(col("pv"))).as("pvs"))
      .where(size(col("pvs")) > 1)
      .select(explode(V.pairExpandPositionalNative(col("pvs"), 0.75)).as("p"))
    t("filtered generations")(println(s"  -> ${candF.count()} filtered generations"))
    t("filtered distinct")(println(s"  -> ${candF.distinct().count()} filtered candidates"))
    val cand = prefix.groupBy("s")
      .agg(array_distinct(sort_array(collect_list(col("id")))).as("ids"))
      .where(size(col("ids")) > 1)
      .select(explode(V.pairExpandNative(col("ids"))).as("p"))
      .distinct()
    t("candidates")(println(s"  -> ${cand.count()} candidate pairs"))
    def unpack(p: org.apache.spark.sql.Column) = Seq(
      call_function("shiftright", p, lit(32)).as("id_a"),
      p.bitwiseAND(lit(0xffffffffL)).as("id_b"))
    val verified = cand
      .select(unpack(col("p")): _*)
      .join(reps.select(col("id").as("id_a"), col("ts").as("sh_a")), "id_a")
      .join(reps.select(col("id").as("id_b"), col("ts").as("sh_b")), "id_b")
      .withColumn("_inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("j", col("_inter") / (size(col("sh_a")) + size(col("sh_b")) - col("_inter")))
      .where(col("j") >= minJaccard)
    t("verify")(println(s"  -> ${verified.count()} verified"))
    val full = t("full prefix join")(
      ext.Dedup.setJaccardPairsPrefix(recs, "id", "name", minJaccard).count())
    println(s"  -> $full pairs")
    val again = t("full prefix join again")(
      ext.Dedup.setJaccardPairsPrefix(recs, "id", "name", minJaccard).count())
    println(s"  -> $again pairs")
    spark.stop()
  }
}
