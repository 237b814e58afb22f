package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.Tables

/** Stage-level timing of tri1's wedge pipeline at sf0.1. */
object ProfileTri1 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROF $label%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s -> $r")
    }
    spark.range(1000).selectExpr("sum(id)").collect()

    val pl = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val edges = pl.groupBy("l_orderkey")
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .select(explode(
        graft.functions.VectorExpressions.pairExpandNative(col("ps"))).as("p"))
      .select(call_function("shiftright", col("p"), lit(32)).as("u"),
        col("p").bitwiseAND(lit(0xffffffffL)).as("v"))
    time("edges_build")(edges.count())

    val e0 = edges.select(least(col("u"), col("v")).cast("long").as("u"),
        greatest(col("u"), col("v")).cast("long").as("v"))
      .where(col("u") =!= col("v") && col("u").isNotNull)
      .distinct()
    time("e0_distinct")(e0.count())
    val deg = e0.select(col("u").as("n")).union(e0.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val oriented = e0
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
            struct(col("u").as("s"), col("v").as("t"), col("dv").as("td")))
          .otherwise(struct(col("v").as("s"), col("u").as("t"), col("du").as("td")))
          .as("e"))
      .select(col("e.s").as("src"), col("e.t").as("dst"), col("e.td").as("dd"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pk = shiftleft(col("src"), 32) bitwiseOR col("dst")
    var bloomBytes: Array[Byte] = null
    time("orient+bloom") {
      val a = oriented.select(graft.functions.Bloom.bloomAgg(1 << 24, 5)(
        xxhash64(pk)).as("bf"))
      bloomBytes = a.head().getAs[Array[Byte]](0); bloomBytes.length
    }
    val wedgesNoBloom = oriented
      .groupBy("src")
      .agg(array_sort(collect_list(struct(col("dd"), col("dst")))).as("adj"))
      .select(col("src").as("n0"), explode(
        graft.functions.VectorExpressions.pairExpandNative(
          transform(col("adj"), s => s.getField("dst")))).as("pk"))
    time("wedges_gen")(wedgesNoBloom.count())
    val wedges = wedgesNoBloom
      .where(graft.functions.Bloom.bloomMightContain(
        bloomBytes, xxhash64(col("pk")), 5))
    time("wedges+bloom")(wedges.count())
    val tri = wedges.join(oriented.select(pk.as("pk")), Seq("pk"))
    time("close_join")(tri.count())
    val out = tri.select(explode(array(col("n0"),
        call_function("shiftright", col("pk"), lit(32)),
        col("pk").bitwiseAND(lit(0xffffffffL)))).as("node"))
      .groupBy("node").agg(count(lit(1)).cast("long").as("n_tri"))
    time("final_agg")(out.count())
    time("full_query")(SparkEntry.queries("tri1_triangle_counts")(spark, d)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
