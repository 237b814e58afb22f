package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev experiment: kcore1's per-round materialization vs a lazily-chained
  * peel with one final action (not a spec).
  * Usage: sbt "Test/runMain graft.ProfileKCore [sfDir]" */
object ProfileKCore {
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
    def full() = SparkEntry.queries("kcore1_peel")(spark, sfDir).count()
    t("kcore1 full (cold)")(full())
    t("kcore1 full run2")(full())
    t("kcore1 full run3")(full())

    // lazily-chained variant on the same fixture edges
    val q = SparkEntry.queries("kcore1_peel")(spark, sfDir)
    // rebuild the fixture edge set the way the entry does (co-purchase)
    // — cheat: reuse the graded entry up to the peel by calling kCorePeel
    // on a directly derived edge frame is not accessible; instead time
    // the lazy peel on a synthetic-but-similar edge set from lineitem
    val li = core.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
    val pairs = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("src"), col("b.p").as("dst"))
      .agg(count(lit(1)).as("n")).where(col("n") >= 2)
      .select("src", "dst")
    val sym = pairs.union(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    t("fixture edges")(println(s"  -> ${sym.count()} edges"))
    def peelEager(rounds: Int): Long = {
      import org.apache.spark.storage.StorageLevel
      var e = sym.distinct().persist(StorageLevel.MEMORY_AND_DISK)
      val stats = e.agg(count(lit(1)).as("m"), countDistinct(col("src")).as("n")).head()
      val k = stats.getLong(0) / math.max(stats.getLong(1), 1L) * 3L / 4L + 1L
      for (_ <- 1 to rounds) {
        val keep = e.groupBy("src").agg(count(lit(1)).as("deg"))
          .where(col("deg") >= k).select("src")
        val e2 = e.join(keep, Seq("src"), "left_semi")
          .join(keep.select(col("src").as("dst")), Seq("dst"), "left_semi")
          .persist(StorageLevel.MEMORY_AND_DISK)
        e2.count(); e.unpersist(); e = e2
      }
      val n = e.groupBy("src").count().count(); e.unpersist(); n
    }
    def peelLazy(rounds: Int): Long = {
      import org.apache.spark.storage.StorageLevel
      val e0 = sym.distinct().persist(StorageLevel.MEMORY_AND_DISK)
      val stats = e0.agg(count(lit(1)).as("m"), countDistinct(col("src")).as("n")).head()
      val k = stats.getLong(0) / math.max(stats.getLong(1), 1L) * 3L / 4L + 1L
      var e: DataFrame = e0
      for (_ <- 1 to rounds) {
        val keep = e.groupBy("src").agg(count(lit(1)).as("deg"))
          .where(col("deg") >= k).select("src")
        e = e.join(keep, Seq("src"), "left_semi")
          .join(keep.select(col("src").as("dst")), Seq("dst"), "left_semi")
      }
      val n = e.groupBy("src").count().count(); e0.unpersist(); n
    }
    t("peel eager (3)")(println(s"  -> ${peelEager(3)} nodes"))
    t("peel lazy  (3)")(println(s"  -> ${peelLazy(3)} nodes"))
    t("peel eager again")(println(s"  -> ${peelEager(3)} nodes"))
    t("peel lazy  again")(println(s"  -> ${peelLazy(3)} nodes"))
    spark.stop()
  }
}
